"""`functions.eval_once` (the §4.4 pushdown barrier): its value-exactness
argument is ``x + 0.0 == x`` for every double EXCEPT -0.0 — so every call
site must wrap a column that can never be negative zero. r17 (VERDICT r16
"wrong" #4): pin both halves — the behavior (exact on non-negative values,
-0.0 silently flips) and the call-site inventory (a NEW site fails this
test until its non-negativity has been checked and the list updated)."""

from __future__ import annotations

import math
import re
from pathlib import Path

import pyspark.sql.functions as F

from dblink_spark.functions import eval_once

#: every reviewed `eval_once(` call site in the package, with the reason
#: its wrapped column can never be -0.0. Adding a site without reviewing
#: the -0.0 precondition is exactly the silent-value-flip hazard the
#: VERDICT flagged; update this map in the same commit as the new site.
REVIEWED_CALL_SITES = {
    "queries/dedup.py": 2,  # sketch jaccards: n_inter>=0 int-derived / k>0
    "queries/vectors.py": 3,  # cosines: CASE-guarded (else +0.0), never -0.0
}


def test_eval_once_value_exact_on_non_negative(spark):
    vals = [0.0, 1e-308, 0.5, 1.0, 3.141592653589793, 1e100, float("inf")]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select(
        F.col("x"), eval_once(F.col("x")).alias("y")
    ).collect()
    for r in rows:
        # bit-exact: struct-pack equality, not ==, so +0.0 vs -0.0 differ
        import struct

        assert struct.pack("d", r["x"]) == struct.pack("d", r["y"])


def test_eval_once_flips_negative_zero(spark):
    """The documented PRECONDITION, pinned as behavior: -0.0 + 0.0 is +0.0
    (IEEE round-to-nearest), so a signed column through eval_once silently
    loses its -0.0s — which is why REVIEWED_CALL_SITES exists."""
    import struct

    df = spark.createDataFrame([(-0.0,)], "x double")
    y = df.select(eval_once(F.col("x")).alias("y")).collect()[0]["y"]
    assert y == 0.0
    assert struct.pack("d", y) == struct.pack("d", 0.0)  # +0.0, NOT -0.0
    assert math.copysign(1.0, y) == 1.0


def test_eval_once_call_sites_are_reviewed():
    pkg = Path(__file__).resolve().parents[1] / "dblink_spark"
    found: dict[str, int] = {}
    for path in pkg.rglob("*.py"):
        rel = str(path.relative_to(pkg))
        text = path.read_text()
        n = len(re.findall(r"(?<![\w.])eval_once\(", text))
        # skip the definition module (the name appears in its docstring)
        if rel.startswith("functions/"):
            continue
        if n:
            found[rel] = n
    assert found == REVIEWED_CALL_SITES, (
        "eval_once call sites changed — review each new site's column for "
        f"the -0.0 precondition, then update REVIEWED_CALL_SITES: {found}"
    )
