"""The Gibbs/PCG transition kernel for one entity-space partition.

Numpy re-expression of the reference's per-partition update
(ref: GibbsUpdates.scala:156-211 and the update functions it dispatches to).
Same model semantics, different execution strategy:

- The reference loops record-at-a-time in Scala. Here, link updates are
  *vectorized across records*: within one sweep the entity attribute values
  and the inverted index are fixed, so every record's conditional is
  independent — we evaluate weight matrices chunk-wise and draw one
  categorical per row (ref loop: GibbsUpdates.scala:177-183).
- The entity-value update loops over entities but batches all isolated /
  unobserved cases into single vectorized draws.
- The distortion update is fully vectorized over (record, attribute)
  (ref: GibbsUpdates.scala:324-359).

Sampler variants (ref: ProjectStep.scala:53-58, Sampler.scala:58-60):
  "PCG-I"            collapsed entity values, indexed Gibbs link update
  "PCG-II"           collapsed entity values AND collapsed (dense) link update
  "Gibbs"            indexed Gibbs link update, perturbation value update
  "Gibbs-Sequential" dense link update, full-enumeration value update
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from dblink_spark.er.cache import RecordsCache
from dblink_spark.er.rand import sample_from_probs, sample_rows

SAMPLERS = ("PCG-I", "PCG-II", "Gibbs", "Gibbs-Sequential")

_LINK_CHUNK = 2048


@dataclass
class PartitionState:
    """In-kernel dense representation of one partition's clusters."""

    entities: np.ndarray  # (E, A) int32, -1 never appears (values imputed)
    rec_ids: np.ndarray  # (R,) object
    rec_fids: np.ndarray  # (R,) int32 — index into cache.file_ids
    rec_values: np.ndarray  # (R, A) int32, -1 = missing
    rec_dist: np.ndarray  # (R, A) bool
    link: np.ndarray  # (R,) int64 — entity row index

    @property
    def num_entities(self) -> int:
        return self.entities.shape[0]

    @property
    def num_records(self) -> int:
        return self.rec_ids.shape[0]


def canonicalize_partition_state(ps: PartitionState) -> PartitionState:
    """Reorder a PartitionState into a canonical, content-determined order.

    Kernel RNG consumption follows array order, so without this the chain
    would depend on the order rows arrive from the shuffle fetch — which
    Spark does not guarantee across retries/AQE for multi-partition chains.
    Canonical order: entities sorted by (smallest linked rec_id, "" for
    isolates; tie-break entity values), records sorted by (entity, rec_id).
    Identical isolates are interchangeable, so the order is determined by
    partition CONTENT alone. Cost is two argsorts + one Python keyed sort
    per kernel invocation — negligible next to the sweep itself.
    """
    n_e = ps.num_entities
    first = np.full(n_e, "", dtype=object)
    seen = np.zeros(n_e, dtype=bool)
    for r in np.argsort(ps.rec_ids, kind="stable"):
        e = ps.link[r]
        if not seen[e]:
            seen[e] = True
            first[e] = ps.rec_ids[r]
    perm = sorted(range(n_e), key=lambda e: (first[e], tuple(ps.entities[e])))
    perm = np.asarray(perm, dtype=np.int64)
    inv = np.empty(n_e, dtype=np.int64)
    inv[perm] = np.arange(n_e)
    new_link = inv[ps.link]
    # two stable argsorts == lexsort by (new_link, rec_id)
    o1 = np.argsort(ps.rec_ids, kind="stable")
    order = o1[np.argsort(new_link[o1], kind="stable")]
    return PartitionState(
        entities=ps.entities[perm],
        rec_ids=ps.rec_ids[order],
        rec_fids=ps.rec_fids[order],
        rec_values=ps.rec_values[order],
        rec_dist=ps.rec_dist[order],
        link=new_link[order],
    )


def _expsim_lookup(index, value: int, ent_col: np.ndarray) -> np.ndarray:
    """exp(sim(value, w)) for each w in ent_col; 1.0 for non-neighbors."""
    out = np.ones(ent_col.shape[0], dtype=np.float64)
    nbr = index.neighbor_ids[value]
    if len(nbr):
        pos = np.searchsorted(nbr, ent_col)
        pos_c = np.clip(pos, 0, len(nbr) - 1)
        hit = nbr[pos_c] == ent_col
        out[hit] = index.neighbor_expsims[value][pos_c[hit]]
    return out


class _ExpSimCache:
    """Per-sweep cache of exp-sim vectors keyed by (attr, value) against the
    fixed entity column — reused across records sharing an observed value."""

    def __init__(self, cache: RecordsCache, entities: np.ndarray):
        self._cache = cache
        self._entities = entities
        self._store: dict[tuple[int, int], np.ndarray] = {}

    def get(self, attr_id: int, value: int) -> np.ndarray:
        key = (attr_id, value)
        vec = self._store.get(key)
        if vec is None:
            vec = _expsim_lookup(
                self._cache.indexes[attr_id], value, self._entities[:, attr_id]
            )
            self._store[key] = vec
        return vec


# ---------------------------------------------------------------------------
# Link updates
# ---------------------------------------------------------------------------


def update_links_dense(
    rng: np.random.Generator,
    ps: PartitionState,
    cache: RecordsCache,
    theta: np.ndarray,  # (A, F) distortion probabilities
    collapsed: bool,
) -> np.ndarray:
    """Dense link update over all entities.

    collapsed=True  -> PCG-II weights (ref: GibbsUpdates.scala:363-395)
    collapsed=False -> Gibbs-Sequential weights (ref: GibbsUpdates.scala:434-466)
    """
    E = ps.num_entities
    R = ps.num_records
    A = cache.num_attributes
    new_link = np.empty(R, dtype=np.int64)
    expsims = _ExpSimCache(cache, ps.entities)

    for start in range(0, R, _LINK_CHUNK):
        rows = slice(start, min(start + _LINK_CHUNK, R))
        n = rows.stop - rows.start
        W = np.ones((n, E), dtype=np.float64)
        for a in range(A):
            idx = cache.indexes[a]
            ent_col = ps.entities[:, a]
            vals = ps.rec_values[rows, a]
            obs = vals >= 0
            if not obs.any():
                continue
            sim_norm_col = None if idx.is_constant else idx.sim_norms[ent_col]
            for i in np.nonzero(obs)[0]:
                v = int(vals[i])
                p_v = idx.probs[v]
                if collapsed:
                    th = theta[a, ps.rec_fids[rows][i]]
                    if idx.is_constant:
                        w = th * p_v + np.where(ent_col == v, 1.0 - th, 0.0)
                    else:
                        w = th * p_v * sim_norm_col * expsims.get(a, v)
                        w = w + np.where(ent_col == v, 1.0 - th, 0.0)
                    W[i] *= w
                else:
                    if ps.rec_dist[rows, a][i]:
                        if idx.is_constant:
                            W[i] *= p_v
                        else:
                            W[i] *= p_v * sim_norm_col * expsims.get(a, v)
                    else:
                        W[i] *= ent_col == v
        new_link[rows] = sample_rows(rng, W)
    return new_link


def _build_inverted_index(entities: np.ndarray):
    """(attr, value) -> sorted array of entity row ids
    (ref: GibbsUpdates.scala:41-76, rebuilt each sweep)."""
    postings: dict[tuple[int, int], np.ndarray] = {}
    E, A = entities.shape
    for a in range(A):
        col = entities[:, a]
        order = np.argsort(col, kind="stable")
        sorted_vals = col[order]
        uniq, starts = np.unique(sorted_vals, return_index=True)
        bounds = np.append(starts, E)
        for j, v in enumerate(uniq):
            postings[(a, int(v))] = order[bounds[j] : bounds[j + 1]]
    return postings


def update_links_indexed(
    rng: np.random.Generator,
    ps: PartitionState,
    cache: RecordsCache,
) -> np.ndarray:
    """Inverted-index Gibbs link update (ref: GibbsUpdates.scala:399-430,
    candidate retrieval :473-530). Candidates = intersection of posting lists
    over observed non-distorted attributes, smallest-first."""
    postings = _build_inverted_index(ps.entities)
    A = cache.num_attributes
    all_ents = np.arange(ps.num_entities, dtype=np.int64)
    new_link = np.empty(ps.num_records, dtype=np.int64)
    empty = np.empty(0, dtype=np.int64)

    for r in range(ps.num_records):
        lists = []
        obs_dist_attrs = []
        for a in range(A):
            v = ps.rec_values[r, a]
            if v < 0:
                continue
            if ps.rec_dist[r, a]:
                obs_dist_attrs.append(a)
            else:
                lists.append(postings.get((a, int(v)), empty))
        if not lists:
            cands = all_ents
        elif len(lists) == 1:
            cands = lists[0]
        else:
            lists.sort(key=len)
            cands = lists[0]
            for other in lists[1:]:
                if cands.shape[0] == 0:
                    break
                # posting lists are sorted (stable argsort of row ids), so
                # intersect via searchsorted — np.isin re-sorts per call and
                # its table/min-max heuristics dominated the sweep profile
                pos = np.searchsorted(other, cands)
                pos_c = np.minimum(pos, other.shape[0] - 1)
                cands = cands[other[pos_c] == cands]
        if cands.shape[0] == 0:
            # unreachable under the model invariant (the record's current
            # entity always matches on non-distorted attrs)
            raise RuntimeError("no candidate entities — inconsistent state")
        if not obs_dist_attrs:
            new_link[r] = cands[rng.integers(cands.shape[0])]
        else:
            w = np.ones(cands.shape[0], dtype=np.float64)
            for a in obs_dist_attrs:
                idx = cache.indexes[a]
                v = int(ps.rec_values[r, a])
                if idx.is_constant:
                    w *= idx.probs[v]
                else:
                    ent_col = ps.entities[cands, a]
                    w *= (
                        idx.probs[v]
                        * idx.sim_norms[ent_col]
                        * _expsim_lookup(idx, v, ent_col)
                    )
            cdf = np.cumsum(w)
            if cdf[-1] <= 0:
                raise RuntimeError("zero total weight in link update")
            new_link[r] = cands[np.searchsorted(cdf, rng.random() * cdf[-1], "right")]
    return new_link


# ---------------------------------------------------------------------------
# Entity-value updates
# ---------------------------------------------------------------------------


def _linked_rows_per_entity(link: np.ndarray, num_entities: int):
    order = np.argsort(link, kind="stable")
    counts = np.bincount(link, minlength=num_entities)
    bounds = np.concatenate(([0], np.cumsum(counts)))
    return order, bounds


def update_entity_values(
    rng: np.random.Generator,
    ps: PartitionState,
    cache: RecordsCache,
    theta: np.ndarray,
    mode: str,
) -> np.ndarray:
    """Resample every entity's attribute vector (ref: GibbsUpdates.scala:731-755
    dispatching to :576-698). Returns a new (E, A) matrix."""
    E = ps.num_entities
    A = cache.num_attributes
    new_entities = np.empty_like(ps.entities)
    order, bounds = _linked_rows_per_entity(ps.link, E)

    collapsed = mode in ("PCG-I", "PCG-II")
    sequential = mode == "Gibbs-Sequential"

    for a in range(A):
        idx = cache.indexes[a]
        vals_a = ps.rec_values[:, a]
        dist_a = ps.rec_dist[:, a]
        base_probs = idx.probs

        # First pass: batch-draw for entities with no observed linked values
        # (isolates included) — they all sample the empirical distribution.
        need_loop = []
        no_obs = []
        for e in range(E):
            rows = order[bounds[e] : bounds[e + 1]]
            rows = rows[vals_a[rows] >= 0]
            if rows.shape[0] == 0:
                no_obs.append(e)
            else:
                need_loop.append((e, rows))
        if no_obs:
            draws = sample_from_probs(rng, base_probs, len(no_obs))
            new_entities[np.array(no_obs, dtype=np.int64), a] = draws

        for e, rows in need_loop:
            k = rows.shape[0]
            if collapsed:
                new_entities[e, a] = _draw_value_collapsed(
                    rng, idx, a, rows, vals_a, ps.rec_fids, theta, k
                )
            elif sequential:
                new_entities[e, a] = _draw_value_seq(rng, idx, rows, vals_a, dist_a)
            else:
                new_entities[e, a] = _draw_value_gibbs(rng, idx, rows, vals_a, dist_a, k)
    return new_entities


def _base_dist(idx, k: int) -> np.ndarray:
    return idx.probs if idx.is_constant else idx.sim_norm_dist(k)


def _draw_value_collapsed(rng, idx, attr_id, rows, vals_a, rec_fids, theta, k):
    """ref: GibbsUpdates.scala:576-599 + perturbedDistYCollapsed :534-570."""
    base = _base_dist(idx, k)
    if k == 1:
        # Fast path for the dominant case (singleton clusters): the sparse
        # perturbation weights come from ONE record, so skip the dict merge
        # and operate on the value's neighbor arrays directly. RNG draw
        # order matches the general path exactly (chain bit-parity).
        r = rows[0]
        v = int(vals_a[r])
        th = float(theta[attr_id, rec_fids[r]])
        p_v = float(idx.probs[v])
        if idx.is_constant:
            total = 1.0 / th - 1.0  # pert = base[v]*(w_v-1) = p_v*(1/th-1)/p_v
            if rng.random() < 1.0 / (1.0 + total):
                return sample_from_probs(rng, base, 1)[0]
            rng.random()  # general path draws for the 1-key cdf; keep stream
            return v
        keys = idx.neighbor_ids[v]  # sorted, always contains v
        pert = base[keys] * (idx.neighbor_expsims[v] - 1.0)
        pert[np.searchsorted(keys, v)] += base[v] * (1.0 / th - 1.0) / (
            p_v * float(idx.sim_norms[v])
        )
        pert = np.maximum(pert, 0.0)
        total = pert.sum()
        if rng.random() < 1.0 / (1.0 + total):
            return sample_from_probs(rng, base, 1)[0]
        cdf = np.cumsum(pert)
        return keys[np.searchsorted(cdf, rng.random() * total, "right")]
    return _draw_value_collapsed_general(
        rng, idx, attr_id, rows, vals_a, rec_fids, theta, base
    )


def _draw_value_collapsed_general(rng, idx, attr_id, rows, vals_a, rec_fids, theta, base):
    """General (any-k) collapsed draw — split out so tests can pin the k=1
    fast path's RNG stream equivalence against it on cloned Generators."""
    # perturbation weights, sparse over candidate values
    w: dict[int, float] = {}
    for r in rows:
        v = int(vals_a[r])
        th = float(theta[attr_id, rec_fids[r]])
        p_v = float(idx.probs[v])
        if idx.is_constant:
            weight = 1.0 + (1.0 / th - 1.0) / p_v
            w[v] = w.get(v, 1.0) * weight
        else:
            norm_v = float(idx.sim_norms[v])
            nbr = idx.neighbor_ids[v]
            sims = idx.neighbor_expsims[v]
            for j in range(len(nbr)):
                sv = int(nbr[j])
                weight = float(sims[j])
                if sv == v:
                    weight += (1.0 / th - 1.0) / (p_v * norm_v)
                w[sv] = w.get(sv, 1.0) * weight
    keys = np.fromiter(w.keys(), dtype=np.int64, count=len(w))
    pert = base[keys] * (np.fromiter(w.values(), dtype=np.float64, count=len(w)) - 1.0)
    pert = np.maximum(pert, 0.0)
    total = pert.sum()
    if rng.random() < 1.0 / (1.0 + total):
        return sample_from_probs(rng, base, 1)[0]
    cdf = np.cumsum(pert)
    return keys[np.searchsorted(cdf, rng.random() * total, "right")]


def _draw_value_gibbs(rng, idx, rows, vals_a, dist_a, k):
    """ref: GibbsUpdates.scala:605-646 + perturbedDistY :702-727."""
    nondist = rows[~dist_a[rows]]
    if nondist.shape[0]:
        return vals_a[nondist[0]]  # pinned by a non-distorted linked value
    if idx.is_constant:
        return sample_from_probs(rng, idx.probs, 1)[0]
    base = _base_dist(idx, k)
    w: dict[int, float] = {}
    for r in rows:
        v = int(vals_a[r])
        nbr = idx.neighbor_ids[v]
        sims = idx.neighbor_expsims[v]
        for j in range(len(nbr)):
            sv = int(nbr[j])
            w[sv] = w.get(sv, 1.0) * float(sims[j])
    keys = np.fromiter(w.keys(), dtype=np.int64, count=len(w))
    pert = base[keys] * (np.fromiter(w.values(), dtype=np.float64, count=len(w)) - 1.0)
    pert = np.maximum(pert, 0.0)
    total = pert.sum()
    if rng.random() < 1.0 / (1.0 + total):
        return sample_from_probs(rng, base, 1)[0]
    cdf = np.cumsum(pert)
    return keys[np.searchsorted(cdf, rng.random() * total, "right")]


def _draw_value_seq(rng, idx, rows, vals_a, dist_a):
    """Full-domain enumeration (ref: GibbsUpdates.scala:652-698)."""
    nondist = rows[~dist_a[rows]]
    if nondist.shape[0]:
        return vals_a[nondist[0]]
    if idx.is_constant:
        return sample_from_probs(rng, idx.probs, 1)[0]
    weights = idx.probs.copy()
    for r in rows:
        v = int(vals_a[r])
        ev = np.ones(idx.num_values, dtype=np.float64)
        nbr = idx.neighbor_ids[v]
        if len(nbr):
            ev[nbr] = idx.neighbor_expsims[v]
        weights *= ev * idx.sim_norms * idx.probs[v]
    total = weights.sum()
    if total <= 0:
        raise RuntimeError("zero total weight in entity-value update")
    cdf = np.cumsum(weights)
    return int(np.searchsorted(cdf, rng.random() * total, "right"))


# ---------------------------------------------------------------------------
# Distortion update (vectorized)
# ---------------------------------------------------------------------------


def update_distortions(
    rng: np.random.Generator,
    ps: PartitionState,
    cache: RecordsCache,
    theta: np.ndarray,
) -> np.ndarray:
    """Per-(record, attribute) Bernoulli resample of the distortion flags
    (ref: GibbsUpdates.scala:324-359), fully vectorized."""
    R = ps.num_records
    A = cache.num_attributes
    new_dist = np.empty((R, A), dtype=bool)
    ent_for_rec = ps.entities[ps.link]  # (R, A)
    u = rng.random((R, A))
    for a in range(A):
        idx = cache.indexes[a]
        th = theta[a, ps.rec_fids]  # (R,)
        vals = ps.rec_values[:, a]
        missing = vals < 0
        agree = ~missing & (vals == ent_for_rec[:, a])
        disagree = ~missing & ~agree

        # agree: Bernoulli(p1/(p1+p0))
        v_safe = np.where(missing, 0, vals)
        p_v = idx.probs[v_safe]
        if idx.is_constant:
            p1 = th * p_v
        else:
            # expSim(v, v) = exp(maxSimilarity) for every indexed value
            self_sim = np.exp(
                np.full(R, cache.attributes[a].sim_fn.max_similarity, dtype=np.float64)
            )
            p1 = th * p_v * idx.sim_norms[v_safe] * self_sim
        p0 = 1.0 - th
        denom = p1 + p0
        p_agree = np.where(denom > 0, p1 / np.where(denom > 0, denom, 1.0), 0.0)

        new_dist[:, a] = np.where(
            missing,
            u[:, a] < th,
            np.where(disagree, True, u[:, a] < p_agree),
        )
    return new_dist


# ---------------------------------------------------------------------------
# Summary statistics (per partition)
# ---------------------------------------------------------------------------


def partition_summary(
    ps: PartitionState, cache: RecordsCache
) -> tuple[float, int, np.ndarray, np.ndarray]:
    """Log-likelihood, isolate count, per-(attr,file) distortion counts and
    per-record distortion histogram (ref: GibbsUpdates.scala:219-301 minus
    the driver-side prior term, which lives in sampler.py)."""
    A = cache.num_attributes
    Fn = len(cache.file_ids)
    loglik = 0.0
    ent_linked = np.zeros(ps.num_entities, dtype=bool)
    ent_linked[ps.link] = True
    n_isolates = int((~ent_linked).sum())

    # entity value contribution (all entities)
    for a in range(A):
        loglik += float(np.log(cache.indexes[a].probs[ps.entities[:, a]]).sum())

    agg_dist = np.zeros((A, Fn), dtype=np.int64)
    ent_for_rec = ps.entities[ps.link] if ps.num_records else np.empty((0, A), int)
    for a in range(A):
        idx = cache.indexes[a]
        d = ps.rec_dist[:, a]
        if not d.any():
            continue
        np.add.at(agg_dist[a], ps.rec_fids[d], 1)
        vals = ps.rec_values[:, a]
        obs_dist = d & (vals >= 0)
        if obs_dist.any():
            v = vals[obs_dist]
            p = idx.probs[v]
            if not idx.is_constant:
                ev = ent_for_rec[obs_dist, a]
                expsims = np.array(
                    [idx.exp_sim_of(int(rv), int(e)) for rv, e in zip(v, ev)]
                )
                p = p * idx.sim_norms[ev] * expsims
            loglik += float(np.log(p).sum())

    rec_dist_hist = np.bincount(
        ps.rec_dist.sum(axis=1), minlength=A + 1
    ).astype(np.int64)[: A + 1]
    return loglik, n_isolates, agg_dist.ravel(), rec_dist_hist


# ---------------------------------------------------------------------------
# Full transition for one partition
# ---------------------------------------------------------------------------


def transition_partition(
    rng: np.random.Generator,
    ps: PartitionState,
    cache: RecordsCache,
    theta: np.ndarray,
    mode: str,
) -> PartitionState:
    """One Markov transition on a partition (ref: GibbsUpdates.scala:156-211):
    resample links, then entity values, then distortions."""
    if mode not in SAMPLERS:
        raise ValueError(f"unknown sampler {mode!r}; expected one of {SAMPLERS}")
    if mode == "PCG-II":
        ps.link = update_links_dense(rng, ps, cache, theta, collapsed=True)
    elif mode == "Gibbs-Sequential":
        ps.link = update_links_dense(rng, ps, cache, theta, collapsed=False)
    else:  # PCG-I, Gibbs
        ps.link = update_links_indexed(rng, ps, cache)
    ps.entities = update_entity_values(rng, ps, cache, theta, mode)
    ps.rec_dist = update_distortions(rng, ps, cache, theta)
    return ps
