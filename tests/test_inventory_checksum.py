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
    assert "q_inventory_checksum" in head, (
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
    deterministic) and both must sit in the driver's window."""
    from dblink_spark.queries.inventory import _shard_names

    a, b = _shard_names(0), _shard_names(1)
    assert set(a) | set(b) == set(CHECKSUM_KINDS)
    assert not set(a) & set(b)
    assert abs(len(a) - len(b)) <= 1, "split must stay balanced"
    head = list(queries())[:50]
    assert "q_inventory_checksum_b" in head
