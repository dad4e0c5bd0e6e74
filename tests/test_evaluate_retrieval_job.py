"""End-to-end drive of jobs/evaluate_retrieval.py: single- and
two-system runs, planted good-vs-random rankers discriminate, the
RRF fusion report lands between/above them, agreement sane."""

import random
import sys
from pathlib import Path

import pytest

JOBS = Path(__file__).resolve().parent.parent / "jobs"


def _job():
    sys.path.insert(0, str(JOBS))
    try:
        import evaluate_retrieval
    finally:
        sys.path.pop(0)
    return evaluate_retrieval


@pytest.mark.spark
def test_evaluate_retrieval_end_to_end(spark, tmp_path):
    rng = random.Random(7)
    rows = []
    for q in range(60):
        for d in range(20):
            rel = 2 if d == 0 else (1 if d < 3 else 0)
            # system A: strongly informed; system B: pure noise
            score_a = 10.0 - d + rng.gauss(0, 0.5)
            score_b = rng.random() * 10
            rows.append((q, q * 100 + d, score_a, score_b, rel, f"seg{q % 3}"))
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, score_b double, "
              "rel long, segment string"
    )
    inp = str(tmp_path / "runs.parquet")
    df.write.parquet(inp)
    out = tmp_path / "report"

    summary = _job().main([
        "--input", inp, "-o", str(out),
        "--score-b", "score_b", "--group", "segment", "--k", "5",
    ])
    assert set(summary) == {
        "metrics_a", "summary_a", "metrics_b", "summary_b",
        "agreement", "metrics_rrf", "summary_rrf",
    }
    assert summary["metrics_a"] == 60 and summary["summary_a"] == 3

    sa = {r.segment: r for r in spark.read.parquet(str(out / "summary_a")).collect()}
    sb = {r.segment: r for r in spark.read.parquet(str(out / "summary_b")).collect()}
    sr = {r.segment: r for r in spark.read.parquet(str(out / "summary_rrf")).collect()}
    for seg in ("seg0", "seg1", "seg2"):
        # the informed ranker beats noise decisively on every metric
        assert sa[seg].mrr > 0.8 and sa[seg].mrr > sb[seg].mrr
        assert sa[seg].micro_ndcg > sb[seg].micro_ndcg
        # fusing a good and a random system stays far above random
        assert sr[seg].micro_ndcg > sb[seg].micro_ndcg
    ag = spark.read.parquet(str(out / "agreement")).collect()
    assert len(ag) == 60
    for r in ag:
        assert 0.0 <= r.agreement_k <= 1.0

    # single-system run: only the A reports
    out2 = tmp_path / "report2"
    s2 = _job().main(["--input", inp, "-o", str(out2)])
    assert set(s2) == {"metrics_a", "summary_a"}
    glob = spark.read.parquet(str(out2 / "summary_a")).collect()
    assert len(glob) == 1 and glob[0].queries == 60
