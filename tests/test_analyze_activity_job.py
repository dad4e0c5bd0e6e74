"""End-to-end drive of jobs/analyze_activity.py: all four reports
land with the operators' invariants (age-0 retention, monotone
funnel, changepoint localization), optional reports skip cleanly,
and mismatched funnel flags error."""

import datetime as dt
import random
import sys
from pathlib import Path

import pytest

JOBS = Path(__file__).resolve().parent.parent / "jobs"


def _job():
    sys.path.insert(0, str(JOBS))
    try:
        import analyze_activity
    finally:
        sys.path.pop(0)
    return analyze_activity


@pytest.mark.spark
def test_analyze_activity_end_to_end(spark, tmp_path):
    rng = random.Random(42)
    rows = []
    for u in range(150):
        start = dt.datetime(2024, 1, 1) + dt.timedelta(days=rng.randrange(0, 40))
        for _ in range(rng.randrange(2, 12)):
            t = start + dt.timedelta(days=rng.randrange(0, 60),
                                     seconds=rng.randrange(0, 86400))
            step = rng.choice(["view", "view", "click", "purchase", "error"])
            # plant a mean shift at day 30 for the changepoint report
            v = rng.gauss(10, 1) + (4.0 if (t - dt.datetime(2024, 1, 1)).days >= 30 else 0.0)
            rows.append((u, t, step, v))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, value double")
    inp = str(tmp_path / "events.parquet")
    df.write.parquet(inp)
    out = tmp_path / "report"

    summary = _job().main([
        "--input", inp, "-o", str(out),
        "--step-col", "event_type", "--funnel", "view,click,purchase",
        "--value", "value",
    ])
    assert set(summary) == {"retention", "active", "funnel", "changepoint"}
    ret = spark.read.parquet(str(out / "retention"))
    a0 = ret.where("age = 0").collect()
    assert a0 and all(r.retention == 1.0 for r in a0)
    act = spark.read.parquet(str(out / "active")).collect()
    assert act and all(r.n_active >= 1 for r in act)
    fr = {r.stage: r for r in spark.read.parquet(str(out / "funnel")).collect()}
    assert fr[1].n_reached >= fr[2].n_reached >= fr[3].n_reached
    cp = spark.read.parquet(str(out / "changepoint")).collect()
    assert len(cp) == 1
    # planted shift at day 30 of a 0..100-day span: localized loosely
    assert cp[0].shift > 0.5


@pytest.mark.spark
def test_analyze_activity_minimal_and_flag_errors(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 9))],
        "user_id long, ts timestamp",
    )
    inp = str(tmp_path / "ev.parquet")
    df.write.parquet(inp)
    out = tmp_path / "rep"
    summary = _job().main(["--input", inp, "-o", str(out)])
    assert set(summary) == {"retention", "active"}
    with pytest.raises(SystemExit):
        _job().main(["--input", inp, "-o", str(out), "--funnel", "a,b"])
