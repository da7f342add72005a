"""Exact-distribution tests for the MCMC kernels.

The reference ships NO tests for its Gibbs kernels (SURVEY.md §5) — the
collapsed weights (GibbsUpdates.scala:363-395, 534-599) are the subtlest
math in the system, validated there only via end-to-end metric quality.
These tests close that gap: for tiny enumerable domains we compute each
update's conditional distribution directly from the model density and
assert the kernel's empirical sampling frequencies match within Monte
Carlo tolerance (≥4σ slack on n in the tens of thousands).

Crucially, the *perturbation-sampling* code paths (sparse neighbor-map
mixture draws) are checked against *direct enumeration* of the same
conditional — two independent formulations that must agree.
"""

from __future__ import annotations

import numpy as np
import pytest

from dblink_spark.er.attributes import Attribute, BetaParams, ConstantSim, LevenshteinSim
from dblink_spark.er.cache import build_records_cache
from dblink_spark.er.model import (
    PartitionState,
    update_distortions,
    update_entity_values,
    update_links_dense,
    update_links_indexed,
)


def _state(ent_vals, rec_vals, rec_dist, link):
    ent = np.asarray(ent_vals, dtype=np.int32).reshape(-1, 1)
    rv = np.asarray(rec_vals, dtype=np.int32).reshape(-1, 1)
    R = rv.shape[0]
    return PartitionState(
        entities=ent,
        rec_ids=np.array([f"r{i}" for i in range(R)], dtype=object),
        rec_fids=np.zeros(R, dtype=np.int32),
        rec_values=rv,
        rec_dist=np.asarray(rec_dist, dtype=bool).reshape(-1, 1),
        link=np.asarray(link, dtype=np.int64),
    )


@pytest.fixture(scope="module")
def const_cache(spark):
    """1 constant-similarity attribute, domain {A: 0.75, B: 0.25}."""
    rows = [("r1", "0", "A"), ("r2", "0", "A"), ("r3", "0", "A"), ("r4", "0", "B")]
    records = spark.createDataFrame(rows, "rec_id: string, file_id: string, x: string")
    attrs = [Attribute("x", ConstantSim(), BetaParams(1.0, 1.0))]
    return build_records_cache(records, attrs, expected_max_cluster_size=5)


@pytest.fixture(scope="module")
def lev_cache(spark):
    """1 Levenshtein attribute (threshold 5, max 10) over
    {AAAA, AAAB, ZZZZ}: AAAA↔AAAB are similarity neighbors, ZZZZ is not."""
    rows = [
        ("r1", "0", "AAAA"),
        ("r2", "0", "AAAA"),
        ("r3", "0", "AAAB"),
        ("r4", "0", "ZZZZ"),
    ]
    records = spark.createDataFrame(rows, "rec_id: string, file_id: string, x: string")
    attrs = [Attribute("x", LevenshteinSim(5.0, 10.0), BetaParams(1.0, 1.0))]
    return build_records_cache(records, attrs, expected_max_cluster_size=5)


def _vid(cache, value):
    return int(list(cache.indexes[0].values).index(value))


class TestDistortionConditional:
    def test_agree_disagree_missing(self, const_cache):
        """M14 (GibbsUpdates.scala:324-359): given agreement,
        P(z=1) = θ·p(v) / (θ·p(v) + 1−θ); disagreement forces z=1;
        missing values resample the prior Bernoulli(θ)."""
        cache = const_cache
        A_id, B_id = _vid(cache, "A"), _vid(cache, "B")
        n = 30000
        theta = np.array([[0.2]])
        # blocks: [agree] n, [disagree] n, [missing] n — all linked to ent A
        rec_vals = [A_id] * n + [B_id] * n + [-1] * n
        ps = _state([A_id], rec_vals, [False] * (3 * n), [0] * (3 * n))
        rng = np.random.default_rng(42)
        d = update_distortions(rng, ps, cache, theta)[:, 0]

        p1 = 0.2 * 0.75
        expect_agree = p1 / (p1 + 0.8)
        assert d[:n].mean() == pytest.approx(expect_agree, abs=0.012)
        assert d[n : 2 * n].all(), "disagreement must force distortion"
        assert d[2 * n :].mean() == pytest.approx(0.2, abs=0.012)


class TestLinkConditionals:
    def test_collapsed_constant(self, const_cache):
        """M7 (PCG-II, GibbsUpdates.scala:363-395), constant sim:
        w(e) = θ·p(y) + (1−θ)·1{e=y}."""
        cache = const_cache
        A_id, B_id = _vid(cache, "A"), _vid(cache, "B")
        n = 30000
        theta = np.array([[0.3]])
        ps = _state([A_id, B_id], [A_id] * n, [False] * n, [0] * n)
        rng = np.random.default_rng(7)
        link = update_links_dense(rng, ps, cache, theta, collapsed=True)
        w0, w1 = 0.3 * 0.75 + 0.7, 0.3 * 0.75
        assert (link == 0).mean() == pytest.approx(w0 / (w0 + w1), abs=0.012)

    def test_collapsed_levenshtein_matches_enumeration(self, lev_cache):
        """Collapsed link weights with similarity:
        w(e) = θ·p(y)·norm(e)·expSim(y,e) + (1−θ)·1{e=y} — enumerated
        directly from the fitted index."""
        cache = lev_cache
        idx = cache.indexes[0]
        y = _vid(cache, "AAAB")
        ents = [_vid(cache, "AAAA"), _vid(cache, "AAAB"), _vid(cache, "ZZZZ")]
        th = 0.4
        n = 30000
        ps = _state(ents, [y] * n, [False] * n, [1] * n)
        rng = np.random.default_rng(11)
        link = update_links_dense(rng, ps, cache, np.array([[th]]), collapsed=True)
        w = np.array(
            [
                th * idx.probs[y] * idx.sim_norms[e] * idx.exp_sim_of(y, e)
                + (1.0 - th) * (e == y)
                for e in ents
            ]
        )
        w /= w.sum()
        emp = np.bincount(link, minlength=3) / n
        np.testing.assert_allclose(emp, w, atol=0.012)

    def test_gibbs_dense_nondistorted_pins(self, const_cache):
        """M8: a non-distorted observed value restricts links to entities
        sharing it; distorted values weight by the distortion density
        (uniform across entities under constant sim)."""
        cache = const_cache
        A_id, B_id = _vid(cache, "A"), _vid(cache, "B")
        n = 20000
        theta = np.array([[0.3]])
        ps = _state([A_id, B_id], [A_id] * n, [False] * n, [0] * n)
        rng = np.random.default_rng(3)
        link = update_links_dense(rng, ps, cache, theta, collapsed=False)
        assert (link == 0).all()

        ps2 = _state([A_id, B_id], [A_id] * n, [True] * n, [0] * n)
        link2 = update_links_dense(rng, ps2, cache, theta, collapsed=False)
        assert (link2 == 0).mean() == pytest.approx(0.5, abs=0.012)

    def test_indexed_matches_dense_gibbs(self, const_cache):
        """M5/M6 (inverted-index Gibbs) must sample the same conditional as
        the dense Gibbs formulation."""
        cache = const_cache
        A_id, B_id = _vid(cache, "A"), _vid(cache, "B")
        n = 20000
        # entities: A, A, B — non-distorted record 'A' → uniform over the
        # two A-entities via posting-list candidates
        ps = _state([A_id, A_id, B_id], [A_id] * n, [False] * n, [0] * n)
        rng = np.random.default_rng(5)
        link = update_links_indexed(rng, ps, cache)
        counts = np.bincount(link, minlength=3) / n
        assert counts[2] == 0.0
        assert counts[0] == pytest.approx(0.5, abs=0.012)


def _enum_value_conditional_collapsed(idx, obs, th):
    """Direct enumeration of P(e_a = v | linked obs values), distortions
    collapsed: p(v)·∏_y [(1−θ)1{y=v} + θ·p(y)·norm(v)·expSim(y,v)]."""
    V = idx.num_values
    w = idx.probs.copy()
    for y in obs:
        lik = np.empty(V)
        for v in range(V):
            lik[v] = th * idx.probs[y] * idx.sim_norms[v] * idx.exp_sim_of(y, v) + (
                (1.0 - th) if v == y else 0.0
            )
        w = w * lik
    return w / w.sum()


class TestValueConditionals:
    @pytest.mark.parametrize("obs_values", [["AAAB"], ["AAAB", "AAAA"]])
    def test_collapsed_perturbation_matches_enumeration(self, lev_cache, obs_values):
        """M10+M13: the sparse perturbation-mixture sampler must draw from
        the same distribution as brute-force enumeration of the collapsed
        conditional — including the k=2 multiplicative-weights case."""
        cache = lev_cache
        idx = cache.indexes[0]
        th = 0.4
        k = len(obs_values)
        n = 20000
        obs = [_vid(cache, v) for v in obs_values]
        # n entities, each linked to its own copy of the k observed records
        ent = [0] * n
        rec_vals = obs * n
        link = [e for e in range(n) for _ in range(k)]
        ps = _state(ent, rec_vals, [True] * (n * k), link)
        rng = np.random.default_rng(13)
        new_ents = update_entity_values(rng, ps, cache, np.array([[th]]), "PCG-I")
        emp = np.bincount(new_ents[:, 0], minlength=idx.num_values) / n
        expect = _enum_value_conditional_collapsed(idx, obs, th)
        np.testing.assert_allclose(emp, expect, atol=0.015)

    @pytest.mark.parametrize("cache_name,obs,theta", [
        ("lev_cache", "AAAB", 0.4),
        ("lev_cache", "AAAA", 0.07),
        ("lev_cache", "ZZZZ", 0.9),
        ("const_cache", "A", 0.4),
        ("const_cache", "B", 0.07),
    ])
    def test_k1_fast_path_rng_bit_parity(self, request, cache_name, obs, theta):
        """The k=1 singleton fast path in _draw_value_collapsed must consume
        the RNG stream EXACTLY like the general sparse-dict path — same
        draw, same post-draw Generator state — or fused chains would not be
        bit-reproducible across the dispatch. Runs both paths on cloned
        Generators over many successive states."""
        from dblink_spark.er.model import (
            _base_dist,
            _draw_value_collapsed,
            _draw_value_collapsed_general,
        )

        cache = request.getfixturevalue(cache_name)
        idx = cache.indexes[0]
        v = _vid(cache, obs)
        vals_a = np.array([v], dtype=np.int32)
        fids = np.zeros(1, dtype=np.int32)
        rows = np.array([0], dtype=np.int64)
        th = np.array([[theta]])
        rng_fast = np.random.default_rng(97)
        rng_gen = np.random.default_rng(97)
        for _ in range(200):
            d_fast = _draw_value_collapsed(
                rng_fast, idx, 0, rows, vals_a, fids, th, 1
            )
            d_gen = _draw_value_collapsed_general(
                rng_gen, idx, 0, rows, vals_a, fids, th, _base_dist(idx, 1)
            )
            assert int(d_fast) == int(d_gen)
        # identical residual streams
        assert rng_fast.random() == rng_gen.random()

    def test_gibbs_nondistorted_pins_value(self, lev_cache):
        """M11: a non-distorted linked record pins the entity value."""
        cache = lev_cache
        y = _vid(cache, "AAAB")
        n = 5000
        ps = _state([0] * n, [y] * n, [False] * n, list(range(n)))
        rng = np.random.default_rng(17)
        new_ents = update_entity_values(rng, ps, cache, np.array([[0.4]]), "Gibbs")
        assert (new_ents[:, 0] == y).all()

    def test_sequential_enumeration_matches_formula(self, lev_cache):
        """M12: full-domain enumeration with all linked values distorted:
        P(v) ∝ p(v)·∏_y p(y)·norm(v)·expSim(y,v)."""
        cache = lev_cache
        idx = cache.indexes[0]
        y = _vid(cache, "AAAB")
        n = 20000
        ps = _state([0] * n, [y] * n, [True] * n, list(range(n)))
        rng = np.random.default_rng(19)
        new_ents = update_entity_values(
            rng, ps, cache, np.array([[0.4]]), "Gibbs-Sequential"
        )
        V = idx.num_values
        w = np.array(
            [
                idx.probs[v] * idx.probs[y] * idx.sim_norms[v] * idx.exp_sim_of(y, v)
                for v in range(V)
            ]
        )
        w /= w.sum()
        emp = np.bincount(new_ents[:, 0], minlength=V) / n
        np.testing.assert_allclose(emp, w, atol=0.015)

    def test_gibbs_all_distorted_matches_collapsed_shape(self, lev_cache):
        """M11 with every linked value distorted samples
        P(v) ∝ p(v)·norm(v)^k·∏_y expSim(y,v) — the perturbation form of
        the z=1 conditional (GibbsUpdates.scala:605-646)."""
        cache = lev_cache
        idx = cache.indexes[0]
        y = _vid(cache, "AAAB")
        n = 20000
        ps = _state([0] * n, [y] * n, [True] * n, list(range(n)))
        rng = np.random.default_rng(23)
        new_ents = update_entity_values(rng, ps, cache, np.array([[0.4]]), "Gibbs")
        V = idx.num_values
        w = np.array(
            [idx.probs[v] * idx.sim_norms[v] * idx.exp_sim_of(y, v) for v in range(V)]
        )
        w /= w.sum()
        emp = np.bincount(new_ents[:, 0], minlength=V) / n
        np.testing.assert_allclose(emp, w, atol=0.015)
