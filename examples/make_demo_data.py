"""Generate the demo data set used by docs/guide.md.

The reference walks its guide through RLdata500 — 500 real German
name/birth-date records, 10% of which are duplicates distorted by
TYPOS (the regime the Levenshtein similarity model is built for, and
where nearly every person has a distinct name). This repo synthesizes
an equivalent file instead of vendoring one: syllable-composed names
(~6k distinct values per name column, so cross-entity collisions are
rare at 500 records, like the real data) and character-level edits for
the duplicates (transpose / substitute / drop one character), plus a
sprinkle of NA missing values. Ground-truth entity ids are kept so the
config's `evaluate` step has something to score against.

This is deliberately NOT `dblink_spark.er.datagen.make_rldata`: that
generator draws from small name pools with whole-value distortions —
a much harder, collision-heavy regime used to stress the sampler in
benchmarks, not to demo it.

Usage:  python examples/make_demo_data.py [out_csv]
Writes: examples/demo500.csv by default (500 records, 50 duplicates,
        ~2% missing encoded as NA, seed 319).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

_SYL1 = ["AN", "BER", "CHRIS", "DIE", "ELI", "FRAN", "GER", "HAN", "ING",
         "JO", "KARS", "LU", "MAR", "NOR", "OT", "PE", "RE", "SA", "TOR", "UL"]
_SYL2 = ["BE", "DA", "FRIE", "GA", "HIL", "KA", "LIE", "MO", "NA", "RI",
         "SO", "TA", "VE", "WAL", "ZI"]
_SYL3 = ["D", "L", "N", "R", "S", "T", "TH", "TTE", "KE", "CK"]


def _typo(rng: np.random.Generator, s: str) -> str:
    """One character-level edit: transpose, substitute, or drop."""
    if len(s) < 3:
        return s + "E"
    i = int(rng.integers(1, len(s) - 1))
    kind = int(rng.integers(3))
    if kind == 0:  # transpose
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    if kind == 1:  # substitute
        return s[:i] + chr(ord("A") + int(rng.integers(26))) + s[i + 1:]
    return s[:i] + s[i + 1:]  # drop


def make_demo(n_records: int = 500, n_dups: int = 50, seed: int = 319) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n_ents = n_records - n_dups

    def name() -> str:
        return (
            _SYL1[int(rng.integers(len(_SYL1)))]
            + _SYL2[int(rng.integers(len(_SYL2)))]
            + _SYL3[int(rng.integers(len(_SYL3)))]
        )

    ents = pd.DataFrame(
        {
            "fname": [name() for _ in range(n_ents)],
            "lname": [name() for _ in range(n_ents)],
            "by": rng.integers(1920, 2000, n_ents).astype(str),
            "bm": rng.integers(1, 13, n_ents).astype(str),
            "bd": rng.integers(1, 29, n_ents).astype(str),
            "ent_id": np.arange(n_ents).astype(str),
        }
    )
    dups = ents.iloc[rng.integers(0, n_ents, n_dups)].copy().reset_index(drop=True)
    # like the real RLdata500: each duplicate carries exactly ONE error
    for i in range(n_dups):
        a = ["fname", "lname", "by", "bm", "bd"][int(rng.integers(5))]
        if a in ("fname", "lname"):
            dups.loc[i, a] = _typo(rng, dups.loc[i, a])
        else:  # date fields: off-by-one, the common transcription slip
            dups.loc[i, a] = str(int(dups.loc[i, a]) + int(rng.choice([-1, 1])))
    pdf = pd.concat([ents, dups], ignore_index=True)
    pdf = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    pdf["rec_id"] = np.arange(len(pdf)).astype(str)
    # ~2% missing values across the matching attributes
    for a in ("fname", "lname", "by", "bm", "bd"):
        mask = rng.random(len(pdf)) < 0.02
        pdf.loc[mask, a] = None
    return pdf


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(os.path.dirname(os.path.abspath(__file__)), "demo500.csv")
    )
    pdf = make_demo()
    pdf.to_csv(out, index=False, na_rep="NA")
    print(f"wrote {out} ({len(pdf)} records)")


if __name__ == "__main__":
    main()
