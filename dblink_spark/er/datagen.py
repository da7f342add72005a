"""Synthetic RLdata-style test data (see FIXTURES.md §1).

Mirrors the *shape* of the reference's RLdata500/RLdata10000 examples
(~10% duplicated records with character-edit distortions, ground-truth
entity ids) without copying the data files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_FNAMES = [
    "GERD", "CARSTEN", "PETER", "HANS", "WERNER", "KLAUS", "JUERGEN", "DIETER",
    "HORST", "MANFRED", "UWE", "WOLFGANG", "MICHAEL", "THOMAS", "ANDREAS",
    "FRANK", "BERND", "KARL", "HEINZ", "GERHARD", "MONIKA", "URSULA", "HELGA",
    "RENATE", "KARIN", "INGRID", "ERIKA", "ELKE", "GISELA", "BRIGITTE",
]
_LNAMES = [
    "MUELLER", "SCHMIDT", "SCHNEIDER", "FISCHER", "WEBER", "MEYER", "WAGNER",
    "BECKER", "SCHULZ", "HOFFMANN", "KOCH", "BAUER", "RICHTER", "KLEIN",
    "WOLF", "SCHROEDER", "NEUMANN", "SCHWARZ", "ZIMMERMANN", "BRAUN",
]


def _distort(rng: np.random.Generator, s: str) -> str:
    """One random character edit (substitute/delete/insert/transpose)."""
    if not s:
        return s
    op = rng.integers(4)
    i = int(rng.integers(len(s)))
    alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    c = alpha[rng.integers(26)]
    if op == 0:
        return s[:i] + c + s[i + 1 :]
    if op == 1 and len(s) > 2:
        return s[:i] + s[i + 1 :]
    if op == 2:
        return s[:i] + c + s[i:]
    if i + 1 < len(s):
        return s[:i] + s[i + 1] + s[i] + s[i + 2 :]
    return s


def make_rldata(
    n_records: int = 500,
    dup_fraction: float = 0.1,
    missing_fraction: float = 0.0,
    seed: int = 42,
) -> pd.DataFrame:
    """Generate records with ground truth: columns fname, lname, by, bm, bd,
    rec_id, ent_id. Duplicates get 1-2 attribute distortions."""
    rng = np.random.default_rng(seed)
    n_dups = int(n_records * dup_fraction)
    n_ents = n_records - n_dups
    ents = pd.DataFrame(
        {
            "fname": rng.choice(_FNAMES, n_ents),
            "lname": rng.choice(_LNAMES, n_ents),
            "by": rng.integers(1920, 2000, n_ents).astype(str),
            "bm": rng.integers(1, 13, n_ents).astype(str),
            "bd": rng.integers(1, 29, n_ents).astype(str),
            "ent_id": np.arange(n_ents).astype(str),
        }
    )
    dup_src = rng.integers(0, n_ents, n_dups)
    dups = ents.iloc[dup_src].copy().reset_index(drop=True)
    attrs = ["fname", "lname", "by", "bm", "bd"]
    for i in range(n_dups):
        for a in rng.choice(attrs, size=int(rng.integers(1, 3)), replace=False):
            v = dups.at[i, a]
            dups.at[i, a] = (
                _distort(rng, v)
                if a in ("fname", "lname")
                else str(int(v) + int(rng.integers(-1, 2)))
            )
    df = pd.concat([ents, dups], ignore_index=True)
    df = df.sample(frac=1.0, random_state=int(rng.integers(1 << 31))).reset_index(drop=True)
    df["rec_id"] = np.arange(len(df)).astype(str)
    if missing_fraction > 0:
        for a in attrs:
            mask = rng.random(len(df)) < missing_fraction
            df.loc[mask, a] = None
    return df
