"""The quickstart (docs/guide.md + examples/) must actually work — and
produce exactly the numbers the guide quotes.

Runs the shipped demo end-to-end the way the guide tells a new user to:
generate examples/demo500.csv with the seeded generator, run
examples/demo500.conf through the same Project pipeline
`python -m dblink_spark` drives, and check the outputs. Both the data
generator and the chain are seeded, so the quality numbers the guide
states (P 1.0 / R 0.8148 / F1 0.8980 / ARI 0.8979) are exact pins, not
thresholds — if the kernel or the generator changes, this test and the
guide text must move together.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONF = os.path.join(ROOT, "examples", "demo500.conf")
GEN = os.path.join(ROOT, "examples", "make_demo_data.py")
GUIDE = os.path.join(ROOT, "docs", "guide.md")


@pytest.fixture(scope="module")
def results(spark, tmp_path_factory):
    from dblink_spark.config import load_config
    from dblink_spark.project import Project

    out = tmp_path_factory.mktemp("demo500")
    csv = str(out / "demo500.csv")
    subprocess.run([sys.executable, GEN, csv], check=True, cwd=ROOT)
    cfg = load_config(CONF)
    d = cfg["dblink"]
    d["data"]["path"] = csv
    d["outputPath"] = str(out / "results") + "/"
    d["checkpointPath"] = str(out / "ckpt")
    project = Project.from_config(spark, cfg)
    return project, project.run(), str(out / "results")


def test_demo_config_matches_guide_walkthrough(results):
    project, res, _ = results
    assert res["sample"]["iteration"] == 1000  # 400 burn-in + 60 kept x 10
    assert res["sample"]["num_partitions"] == 1
    assert [a.name for a in project.matching_attrs] == [
        "fname", "lname", "by", "bm", "bd",
    ]


def test_demo_quality_exactly_as_documented(results):
    _, res, _ = results
    pw = res["evaluate"]["pairwise"]
    assert round(pw["precision"], 4) == 1.0, pw
    assert round(pw["recall"], 4) == 0.8148, pw
    assert round(pw["f1"], 4) == 0.8980, pw
    assert round(res["evaluate"]["cluster"]["adjusted_rand_index"], 4) == 0.8979


def test_demo_writes_every_artifact_the_guide_lists(results):
    _, _, out = results
    for name in (
        "run.txt",
        "diagnostics.csv",
        "linkage-chain.parquet",
        "final-state",
        "cluster-size-distribution.csv",
        "partition-sizes.csv",
        "shared-most-probable-clusters.csv",
        "evaluation-results.txt",
    ):
        assert os.path.exists(os.path.join(out, name)), name


def test_guide_quotes_the_pinned_numbers():
    """The guide's stated metrics must be the pinned ones — a kernel
    change that shifts the demo chain has to update both together."""
    text = open(GUIDE).read()
    for needle in ("precision 1.0", "recall 0.815", "F1 0.898", "ARI 0.898"):
        assert needle in text, needle


def test_demo_generator_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    subprocess.run([sys.executable, GEN, a], check=True, cwd=ROOT)
    subprocess.run([sys.executable, GEN, b], check=True, cwd=ROOT)
    assert open(a).read() == open(b).read()
    head = open(a).readline().strip()
    assert head == "fname,lname,by,bm,bd,ent_id,rec_id"


def test_guide_file_references_exist():
    """Every repo path the guide mentions must exist (docs rot guard)."""
    text = open(GUIDE).read()
    for rel in re.findall(r"`((?:examples|docs|dblink_spark)/[\w./]+)`", text):
        assert os.path.exists(os.path.join(ROOT, rel)), rel
