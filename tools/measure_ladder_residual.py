"""Measure the span-surgeon stack's residual miss rate over a crafted
edit-density sweep (VERDICT r14 task 5).

The ladder tier (`text_strip_ladder_spans`) documents its own floor:
copies edited every <= 4 tokens kill width-5 grams too, and a block in
more than `_LADDER_UBIQUITY_CAP` docs loses its evidence to the rarity
gate. Until now those classes were crafted-corpus PINNED (one example
each) but not MEASURED as a rate over a parameter sweep. This script
puts a number on the residual:

- Corpus: N_BG background docs of uniform-random tokens from a large
  vocabulary (no cross-doc shared 5-grams in practice), plus one cell
  per (edit_period E, copy_count C): C copies of a B-token block whose
  position tokens are unique to the cell (cells cannot interact through
  shared grams). Every copy is independently edited — every E-th
  position replaced by a token unique to (cell, copy, position) — so no
  two copies share any gram spanning an edit; E=0 means verbatim copies.
  This is exactly the no-anchor construction the ladder exists for,
  swept across its documented boundaries (E over 3..8, C through and
  past the ubiquity cap).

- Stack: the four span surgeons (`text_strip_maximal_spans`,
  `text_strip_gapped_spans`, `text_strip_confirmed_spans`,
  `text_strip_ladder_spans`) each run over the same corpus; a block
  token is CAUGHT if any tier removed it (union), and the per-cell miss
  rate is surviving-block-tokens / original-block-tokens. The ladder's
  solo miss rate is reported alongside.

Gates unchanged — this is measurement only; the committed table lands in
COVERAGE.md and LADDER_RESIDUAL_r15.json.

Usage:  python tools/measure_ladder_residual.py
Writes: LADDER_RESIDUAL_r15.json at the repo root, markdown to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_TOKENS = 64
N_BG = 200
BG_TOKENS = 100
EDIT_PERIODS = (0, 3, 4, 5, 6, 7, 8)  # 0 = verbatim copies
COPY_COUNTS = (2, 4, 8, 12, 16)  # through and past the ubiquity cap (8)
TIERS = (
    "text_strip_maximal_spans",
    "text_strip_gapped_spans",
    "text_strip_confirmed_spans",
    "text_strip_ladder_spans",
    # r15: the fifth tier this measurement motivated — the C>8 rows below
    # measured miss=1.00 under the four-tier stack (committed as the
    # first LADDER_RESIDUAL_r15.json); the template band + confirmation
    # gates close exactly that class.
    "text_strip_template_spans",
)


def build_corpus() -> tuple[list[dict], dict[int, tuple[int, int, set[str]]]]:
    """Rows for documents.parquet + per-doc (E, C, original block-token set)."""
    import numpy as np

    rng = np.random.default_rng(1515)
    vocab = [f"w{j}" for j in range(8000)]
    rows: list[dict] = []
    doc_meta: dict[int, tuple[int, int, set[str]]] = {}
    doc_id = 0
    for _ in range(N_BG):
        text = " ".join(rng.choice(vocab, BG_TOKENS))
        rows.append(doc_id_row(doc_id, text))
        doc_id += 1
    for e in EDIT_PERIODS:
        for c in COPY_COUNTS:
            cell = f"c{e}x{c}"
            base = [f"blk_{cell}_{i}" for i in range(BLOCK_TOKENS)]
            for copy in range(c):
                toks = list(base)
                if e > 0:
                    for i in range(e - 1, BLOCK_TOKENS, e):
                        toks[i] = f"edt_{cell}_{copy}_{i}"
                # unique pad on both sides so copies share nothing else
                pad_l = [f"pad_{cell}_{copy}_l{i}" for i in range(6)]
                pad_r = [f"pad_{cell}_{copy}_r{i}" for i in range(6)]
                text = " ".join(pad_l + toks + pad_r)
                rows.append(doc_id_row(doc_id, text))
                doc_meta[doc_id] = (e, c, set(t for t in toks if t.startswith("blk_")))
                doc_id += 1
    return rows, doc_meta


def doc_id_row(doc_id: int, text: str) -> dict:
    return {
        "doc_id": doc_id,
        "text": text,
        "lang": "en",
        "source": "crafted",
        "n_chars": len(text),
    }


def main() -> None:
    import pandas as pd

    from dblink_spark.queries import REGISTRY, materialized
    from dblink_spark.session import get_spark

    spark = get_spark("ladder_residual")
    spark.sparkContext.setLogLevel("ERROR")

    rows, doc_meta = build_corpus()
    tmp = tempfile.mkdtemp(prefix="ladder_residual_")
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(4).write.parquet(
        os.path.join(tmp, "documents.parquet")
    )

    # per tier: doc_id -> surviving block-token set
    survivors: dict[str, dict[int, set[str]]] = {}
    for tier in TIERS:
        with materialized(REGISTRY[tier].fn(spark, tmp)) as out:
            got = {
                r["doc_id"]: set(
                    t for t in (r["clean_text"] or "").split(" ")
                    if t.startswith("blk_")
                )
                for r in out.select("doc_id", "clean_text").collect()
                if r["doc_id"] in doc_meta
            }
        survivors[tier] = got
        print(f"# ran {tier}", file=sys.stderr, flush=True)

    cells: dict[str, dict] = {}
    for e in EDIT_PERIODS:
        for c in COPY_COUNTS:
            docs = [d for d, (de, dc, _) in doc_meta.items() if de == e and dc == c]
            total = sum(len(doc_meta[d][2]) for d in docs)
            per_tier = {}
            union_left = 0
            for d in docs:
                orig = doc_meta[d][2]
                left_union = set(orig)
                for tier in TIERS:
                    left = survivors[tier].get(d, orig) & orig
                    per_tier.setdefault(tier, 0)
                    per_tier[tier] += len(left)
                    left_union &= left
                union_left += len(left_union)
            cells[f"E{e}_C{c}"] = {
                "edit_period": e,
                "copies": c,
                "block_tokens_total": total,
                "miss_rate_union": round(union_left / total, 4),
                "miss_rate_ladder": round(
                    per_tier["text_strip_ladder_spans"] / total, 4
                ),
                **{
                    f"miss_{t.removeprefix('text_strip_').removesuffix('_spans')}":
                        round(n / total, 4)
                    for t, n in per_tier.items()
                },
            }

    # markdown table: rows = edit period, cols = copy count, cell = union miss
    lines = [
        "| edits every | " + " | ".join(f"C={c}" for c in COPY_COUNTS) + " |",
        "|---|" + "|".join("---" for _ in COPY_COUNTS) + "|",
    ]
    for e in EDIT_PERIODS:
        label = "verbatim" if e == 0 else f"{e} tokens"
        vals = [
            f"{cells[f'E{e}_C{c}']['miss_rate_union']:.2f}"
            for c in COPY_COUNTS
        ]
        lines.append(f"| {label} | " + " | ".join(vals) + " |")
    table = "\n".join(lines)
    print(table)

    # --- near-dup hand-off arm (r15): the E<=5 residual is out of reach
    # for ANY substring method — with every copy edited at the same
    # positions using copy-unique tokens, the longest repeated token run
    # between copies is <= E-1 <= 4, below even a suffix array's useful
    # threshold (4-token repeats are ubiquitous in natural text). The
    # honest closure is the NEAR-DUP family: an E=3 copy still shares
    # ~2/3 of its tokens (doc-level Jaccard ~0.4), squarely in sketch
    # territory at an appropriate threshold. Measure: bottom-k sketch
    # pairs (k=64, threshold 0.3 — the operators are parameterized; the
    # registered gate entry's 0.99 is its exact-dup configuration) ->
    # closure, then per cell: do all C copies land in one component?
    from dblink_spark.operators.components import connected_components
    from dblink_spark.queries import release_caches
    from dblink_spark.queries.dedup import bottomk_sketch_pairs, load

    nd_pairs = bottomk_sketch_pairs(
        load(spark, tmp, "documents"), k=64, threshold=0.3
    )
    comp_df = connected_components(nd_pairs, "doc1", "doc2")
    comp = {
        r["node"]: r["component"]
        for r in comp_df.collect()
        if r["node"] in doc_meta
    }
    release_caches(nd_pairs)
    for e in EDIT_PERIODS:
        for c in COPY_COUNTS:
            docs = [d for d, (de, dc, _) in doc_meta.items() if de == e and dc == c]
            comps = [comp.get(d) for d in docs]
            linked = (
                len(docs) > 1
                and all(x is not None for x in comps)
                and len(set(comps)) == 1
            )
            cells[f"E{e}_C{c}"]["neardup_cell_linked"] = bool(linked)
    handoff_ok = all(
        cells[f"E{e}_C{c}"]["neardup_cell_linked"]
        for e in (3, 4, 5)
        for c in COPY_COUNTS
    )
    print(
        f"# near-dup hand-off (bottom-k k=64 t=0.3 -> closure links every "
        f"E<=5 cell): {handoff_ok}", file=sys.stderr,
    )

    out = {
        "block_tokens": BLOCK_TOKENS,
        "n_background_docs": N_BG,
        "neardup_handoff": {
            "ok_for_all_E_le_5_cells": handoff_ok,
            "note": (
                "E<=5 same-position copy-unique edits leave no repeated "
                "token run >= 5 — below even a suffix array's useful "
                "threshold, so the residual is out of substring-dedup "
                "reach INFORMATION-THEORETICALLY; the near-dup sketch "
                "family is the hand-off (bottom-k k=64 threshold=0.3 -> "
                "closure), and it links every E<=5 cell's copies into "
                "one component in this corpus"
            ),
        },
        "ubiquity_cap_note": (
            "cap=8 distinct docs (queries/text.py:_LADDER_UBIQUITY_CAP); "
            "C>8 cells measure the past-the-cap class"
        ),
        "construction": (
            "every copy independently edited every E tokens with "
            "copy-unique tokens — no two copies share any gram spanning "
            "an edit (the no-anchor class); E=0 = verbatim"
        ),
        "miss_rate": "surviving block tokens / original block tokens",
        "cells": cells,
        "markdown": table,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "LADDER_RESIDUAL_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
