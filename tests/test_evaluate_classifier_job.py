"""End-to-end drive of jobs/evaluate_classifier.py: all six reports
land, the AUC report separates a planted good classifier from noise,
calibration/CI/ttest rows are shaped right, and the no-key run skips
ci/."""

import sys
from pathlib import Path

import pytest

JOBS = Path(__file__).resolve().parent.parent / "jobs"


@pytest.mark.spark
def test_evaluate_classifier_end_to_end(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    for g in ("good", "noise"):
        for i in range(400):
            lab = rng.random() < 0.4
            s = (
                rng.random() * 0.5 + (0.45 if lab else 0.0)
                if g == "good"
                else rng.random()
            )
            rows.append((g, i, round(s, 6), lab))
    df = spark.createDataFrame(rows, "grp string, rid long, score double, label boolean")
    inp = str(tmp_path / "scored.parquet")
    df.write.parquet(inp)

    sys.path.insert(0, str(JOBS))
    try:
        import evaluate_classifier
    finally:
        sys.path.pop(0)
    out = tmp_path / "report"
    summary = evaluate_classifier.main(
        ["--input", inp, "-o", str(out), "--score", "score", "--label", "label",
         "--group", "grp", "--key", "rid", "--replicates", "16"]
    )
    for sub in ("auc", "sweep", "calibration", "shift", "ttest", "ci"):
        assert (out / sub).exists(), sub
        assert summary[sub] > 0, sub

    auc = {r.grp: r.auc for r in spark.read.parquet(str(out / "auc")).collect()}
    assert auc["good"] > 0.85 and 0.4 < auc["noise"] < 0.6
    # separation views agree with AUC: good separates, noise doesn't
    ks = {r.grp: r.d for r in spark.read.parquet(str(out / "shift")).collect()}
    assert ks["good"] > 0.5 and ks["noise"] < 0.2
    t = {r.grp: r.t for r in spark.read.parquet(str(out / "ttest")).collect()}
    assert abs(t["good"]) > 10 and abs(t["noise"]) < 3
    # ci/ is per (group, label cohort): 4 rows, lo <= mean <= hi
    ci = spark.read.parquet(str(out / "ci")).collect()
    assert len(ci) == 4
    assert all(r.ci_lo <= r.mean <= r.ci_hi for r in ci)
    # calibration: bins rows per group, ece repeated per group
    cal = spark.read.parquet(str(out / "calibration")).toPandas()
    assert set(cal.grp) == {"good", "noise"}
    assert (cal.groupby("grp").ece.nunique() == 1).all()


@pytest.mark.spark
def test_evaluate_classifier_no_key_skips_ci(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i / 100.0, i % 3 == 0) for i in range(100)],
        "rid long, score double, label boolean",
    )
    inp = str(tmp_path / "scored.parquet")
    df.write.parquet(inp)
    sys.path.insert(0, str(JOBS))
    try:
        import evaluate_classifier
    finally:
        sys.path.pop(0)
    out = tmp_path / "report"
    summary = evaluate_classifier.main(
        ["--input", inp, "-o", str(out), "--score", "score", "--label", "label"]
    )
    assert "ci" not in summary and not (out / "ci").exists()
    assert (out / "auc").exists() and summary["auc"] == 1  # one global group


@pytest.mark.spark
def test_evaluate_classifier_null_labels_no_phantom_cohort(spark, tmp_path):
    """Unlabeled rows must be dropped from ci/ like every other
    report — no label_int=NULL third cohort (review finding)."""
    rows = [(i, i / 60.0 % 1.0, (i % 3 == 0) if i % 5 else None) for i in range(60)]
    df = spark.createDataFrame(rows, "rid long, score double, label boolean")
    inp = str(tmp_path / "scored.parquet")
    df.write.parquet(inp)
    sys.path.insert(0, str(JOBS))
    try:
        import evaluate_classifier
    finally:
        sys.path.pop(0)
    out = tmp_path / "report"
    evaluate_classifier.main(
        ["--input", inp, "-o", str(out), "--score", "score", "--label", "label",
         "--key", "rid", "--replicates", "8"]
    )
    ci = spark.read.parquet(str(out / "ci")).collect()
    assert {r.label_int for r in ci} == {0, 1}
    assert len(ci) == 2
