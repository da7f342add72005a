"""Structural pins for the composite inventory checksum (the one-slot
external gate over the rotated registry tail). The VALUE-level check lives
in tests/test_queries_oracle.py (parametrized over REGISTRY) and the edge
behavior in the per-query suites; this module pins the gate GEOMETRY —
if any pin breaks, some query silently left the driver's verified set."""

from __future__ import annotations

from dblink_spark.queries import _GATE_TAIL, REGISTRY, queries
from dblink_spark.queries.inventory import CHECKSUM_KINDS


def test_checksum_covers_exactly_the_rotated_tail():
    assert set(CHECKSUM_KINDS) == set(_GATE_TAIL), (
        "every rotated (beyond-window) query must be digest-covered; "
        "rotating a query without adding it to CHECKSUM_KINDS removes it "
        "from the driver's external verification"
    )


def test_head_fits_driver_window_and_contains_checksum():
    names = list(queries())
    head = names[:50]
    assert len(names) - len(_GATE_TAIL) == 50, (
        "head must be EXACTLY 50: smaller wastes externally-gated slots, "
        "larger silently drops the overflow from the driver's file"
    )
    assert "q_inventory_checksum_a" in head, (
        "the checksum must sit inside the driver's 50-entry window — "
        "outside it, it verifies nothing externally"
    )


def test_covered_queries_all_have_oracles():
    # the digest SQL embeds each covered query's oracle; a rows-only entry
    # (oracle=None) cannot rotate into the tail
    for name in CHECKSUM_KINDS:
        assert REGISTRY[name].oracle is not None, name


def test_checksum_shards_partition_the_tail():
    """r14: the digest is sharded into two slots (shard-at-60s rule) —
    the shards must PARTITION the rotated set (disjoint, exhaustive,
    deterministic) and both must sit in the driver's window.

    r15 (VERDICT r14 task 3): balance is by MEASURED per-entry cost, not
    by count — the r14 half-by-count split read 23.4s vs 7.9s because
    per-entry cost spans 15x. The LPT split must keep the weighted totals
    within 2x of each other (the committed-payload criterion), and in
    practice lands within a few percent."""
    import statistics

    from dblink_spark.queries.inventory import _SHARD_WEIGHTS, _shard_names

    a, b = _shard_names(0), _shard_names(1)
    assert set(a) | set(b) == set(CHECKSUM_KINDS)
    assert not set(a) & set(b)
    default = statistics.median(_SHARD_WEIGHTS.values())
    wa = sum(_SHARD_WEIGHTS.get(n, default) for n in a)
    wb = sum(_SHARD_WEIGHTS.get(n, default) for n in b)
    assert max(wa, wb) <= 2 * min(wa, wb), (wa, wb)
    head = list(queries())[:50]
    assert "q_inventory_checksum_b" in head
    # determinism across calls (the split feeds registered oracle SQL)
    assert _shard_names(0) == a and _shard_names(1) == b


def test_checksum_slot_budget_rule():
    """r16 (VERDICT r15 task 7): the shard-at-60s rule was documented but
    not tested — gate overhead grows ~0.45s per rotated entry, so a
    rotation that pushes a slot past its budget should fail HERE (geometry
    test), not be discovered in a bench artifact. Projected slot cost =
    sum of the slot members' measured `_SHARD_WEIGHTS` (milliseconds at
    sf0.1, isolated best-of-2). Budget 60s with a safety margin: fail at
    50s projected so there is headroom for host drift before the
    documented 60s line is actually breached (r15 measured totals: 19.4s
    and 17.5s — plenty of rotations left before a third slot is due)."""
    import statistics

    from dblink_spark.queries.inventory import _SHARD_WEIGHTS, _shard_names

    default = statistics.median(_SHARD_WEIGHTS.values())
    for shard in (0, 1):
        names = _shard_names(shard)
        projected_ms = sum(_SHARD_WEIGHTS.get(n, default) for n in names)
        assert projected_ms <= 50_000, (
            f"slot {shard} projects {projected_ms / 1000:.1f}s of digest "
            "work — approaching the 60s/slot budget; split the digest "
            "into a third versioned slot (new _shard_spec markers, new "
            "slot names) before rotating more entries in"
        )


def test_shard_spec_marker_versions_membership():
    """r15 (r14 ADVICE): each slot carries an in-band _shard_spec row —
    member count + md5 of the comma-joined member names — so a membership
    change flips the driver's hash gate instead of silently re-labeling a
    different digest as the same slot. The oracle SQL must embed the SAME
    spec the Spark side computes."""
    from dblink_spark.queries.inventory import _checksum_oracle, _shard_spec

    for shard in (0, 1):
        marker, n, spec = _shard_spec(shard)
        sql = _checksum_oracle(shard)
        assert f"'{marker}'" in sql
        assert f"md5('{spec}')" in sql
        assert n == len(spec.split(","))
