"""Parse `explain("formatted")` output into checkable plan properties.

Used two ways:

- tests assert plan shape for the headline queries (pushdown reached the
  parquet scan, dimension joins broadcast, shuffle counts don't regress);
- ``python -m dblink_spark.plans.audit [sf_dir [query ...]]`` prints an
  audit table over the whole query registry — the per-operator answer to
  "would this plan survive a 100× scale-up?".

Parsing the formatted text keeps this independent of py4j internals; the
formatted mode is a stable public surface (used by Spark's own SQL tests).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The physical plan in `formatted` mode as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@dataclass
class ScanInfo:
    """One `Scan parquet` node."""

    location: str = ""
    read_schema: str = ""
    pushed_filters: list[str] = field(default_factory=list)

    @property
    def read_columns(self) -> list[str]:
        return re.findall(r"(\w+):", self.read_schema)


def scan_infos(plan: str) -> list[ScanInfo]:
    """All parquet scans with their pushed filters and read schemas."""
    scans = []
    # formatted mode lists node details as "(N) Scan parquet\n<attrs...>"
    for block in re.split(r"\n\(\d+\) ", plan):
        if not block.startswith("Scan parquet"):
            continue
        info = ScanInfo()
        m = re.search(r"Location:.*?\[(.*?)\]", block)
        if m:
            info.location = m.group(1)
        m = re.search(r"ReadSchema: struct<(.*?)>", block, re.DOTALL)
        if m:
            info.read_schema = m.group(1)
        m = re.search(r"PushedFilters: \[(.*?)\]", block, re.DOTALL)
        if m and m.group(1).strip():
            info.pushed_filters = [f.strip() for f in m.group(1).split(",")]
        scans.append(info)
    return scans


def broadcast_hinted_relations(df: DataFrame) -> list[tuple[str, bool]]:
    """Base relations sitting under an explicit broadcast hint, read from the
    ANALYZED logical plan (the optimizer erases ``ResolvedHint`` nodes into
    join-node hints, so the analyzed plan is where a forced ``F.broadcast()``
    is still visible as a distinct operator).

    Returns ``[(first_column_of_relation, hint_subtree_has_limit), ...]`` —
    the first column identifies the table (``n_nationkey`` → nation), and
    ``has_limit`` marks frames whose cardinality is bounded by a LIMIT
    regardless of SF (e.g. a top-k query-vector frame), which are safe to
    broadcast at any scale.

    The hint's subtree is bounded by plan-tree indentation (the column of
    the ``+-``/``:-`` branch marker): every relation strictly deeper than
    the hint node belongs to it, so a hint wrapping a multi-relation frame
    (join/union under the hint) reports ALL its relations, and a LIMIT in a
    *sibling* subtree is not misattributed to the hint.
    """
    plan = df._jdf.queryExecution().analyzed().toString()
    out: list[tuple[str, bool]] = []
    lines = plan.splitlines()

    def depth(ln: str) -> int:
        m = re.search(r"[+:]- ", ln)
        return m.start() if m else -1

    for i, line in enumerate(lines):
        if "ResolvedHint" not in line:
            continue
        d_hint = depth(line)
        subtree: list[str] = []
        for nxt in lines[i + 1 :]:
            if depth(nxt) <= d_hint:
                break  # left the hint's subtree
            subtree.append(nxt)
        has_limit = any(
            "GlobalLimit" in ln or "LocalLimit" in ln for ln in subtree
        )
        for ln in subtree:
            m = re.search(r"Relation \[([A-Za-z_][A-Za-z0-9_]*)#", ln)
            if m:
                out.append((m.group(1), has_limit))
    return out


def exchange_count(plan: str) -> int:
    """Shuffle exchanges in the plan (BroadcastExchange excluded — those
    are the cheap kind we *want*)."""
    return len(re.findall(r"\(\d+\) Exchange", plan))


def broadcast_join_count(plan: str) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def sortmerge_join_count(plan: str) -> int:
    return len(re.findall(r"SortMergeJoin", plan))


def codegen_span_count(plan: str) -> int:
    """WholeStageCodegen spans — wider/fewer is better (more operators fused
    into single JVM loops)."""
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


@dataclass
class PlanAudit:
    n_scans: int
    scans_with_pushdown: int
    total_read_columns: int
    exchanges: int
    broadcast_joins: int
    sortmerge_joins: int
    codegen_spans: int
    python_ops: int  # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas


def audit_plan(df: DataFrame) -> PlanAudit:
    plan = formatted_plan(df)
    scans = scan_infos(plan)
    return PlanAudit(
        n_scans=len(scans),
        scans_with_pushdown=sum(1 for s in scans if s.pushed_filters),
        total_read_columns=sum(len(s.read_columns) for s in scans),
        exchanges=exchange_count(plan),
        broadcast_joins=broadcast_join_count(plan),
        sortmerge_joins=sortmerge_join_count(plan),
        codegen_spans=codegen_span_count(plan),
        # detail-section headers only ("(8) FlatMapGroupsInPandas") — the
        # tree rendering repeats each node, so a raw substring count would
        # double-count every kernel
        python_ops=len(
            re.findall(
                r"^\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)",
                plan,
                re.M,
            )
        ),
    )


def _main() -> None:  # pragma: no cover - exercised via CLI
    import sys

    from dblink_spark import queries as q
    from dblink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(q.REGISTRY)
    spark = get_spark()
    hdr = f"{'query':34s} scans pushed cols xchg bcast smj codegen pyops"
    print(hdr)
    print("-" * len(hdr))
    for name in names:
        a = audit_plan(q.REGISTRY[name].fn(spark, sf_dir))
        print(
            f"{name:34s} {a.n_scans:5d} {a.scans_with_pushdown:6d} "
            f"{a.total_read_columns:4d} {a.exchanges:4d} {a.broadcast_joins:5d} "
            f"{a.sortmerge_joins:3d} {a.codegen_spans:7d} {a.python_ops:5d}"
        )


if __name__ == "__main__":  # pragma: no cover
    _main()
