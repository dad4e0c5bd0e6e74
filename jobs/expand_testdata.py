#!/usr/bin/env python
"""Deterministic 10x test-corpus expansion for the scale-proof bench run.

    python jobs/expand_testdata.py --src /root/testdata/sf0.1 \\
        --out /tmp/sf1 [--factor 10] [--cpus 32]

The 100x-scale claims in BENCH.md rest on plan-shape arguments; this
job converts one order of magnitude of that argument into a measured
data point (VERDICT r4 #3) without external data: every byte is
derived deterministically (seed fixed) from the driver-generated
sf0.1 tables.

Expansion strategies per table (chosen so each query's WORK scales
with the row ratio, i.e. the workload keeps its statistical shape):

- documents: word-level bootstrap — new texts are drawn word by word
  from the source corpus's own vocabulary with per-doc seeded RNGs,
  lengths resampled from the original length distribution.  Literal
  replication would be WRONG here: 10 near-identical copies of every
  document make pair-based operators (span dedup, minhash, jaccard)
  explode quadratically, measuring a different workload, not a bigger
  one.
- events / lineitem / orders: replicate with per-copy key offsets
  (user_id / orderkey) — aggregations, sketches and quantiles see 10x
  genuine rows, distinct counts grow ~10x.
- embeddings: replicate with per-copy deterministic unit-norm jitter
  so vectors are distinct but the similarity workload keeps its shape.
- region/nation/customer/supplier/part: copied as-is (dimensions).

Everything runs as Spark jobs (no driver-side row materialization),
so the expander itself is scale-shaped.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEED = 20260817


def expand_documents(spark, src: str, out: str, factor: int) -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src}/documents.parquet")
    pdf = docs.toPandas()  # sf0.1 source is small; the OUTPUT is what scales
    vocab = sorted({w for t in pdf["text"] for w in str(t).split()})
    lengths = np.array([len(str(t).split()) for t in pdf["text"]])
    sources = sorted(pdf["source"].unique())
    n_out = len(pdf) * factor
    vocab_arr = np.array(vocab)

    plan = spark.range(n_out).repartition(64)

    def gen(batches):
        import pyarrow as pa

        for rb in batches:
            ids = rb.column(0).to_numpy()
            texts = []
            srcs = []
            for i in ids:
                rng = np.random.default_rng(SEED + int(i))
                L = int(lengths[rng.integers(0, lengths.size)])
                words = vocab_arr[rng.integers(0, vocab_arr.size, size=max(L, 1))]
                texts.append(" ".join(words))
                srcs.append(sources[int(i) % len(sources)])
            yield pa.record_batch(
                [pa.array(ids), pa.array(srcs), pa.array(texts)],
                names=["doc_id", "source", "text"],
            )

    plan.mapInArrow(gen, "doc_id long, source string, text string").write.mode(
        "overwrite"
    ).parquet(f"{out}/documents.parquet")


def expand_offset(spark, src: str, out: str, table: str, factor: int, offsets: dict) -> None:
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{src}/{table}.parquet")
    copies = []
    for c in range(factor):
        cp = df
        for col, stride in offsets.items():
            cp = cp.withColumn(col, F.col(col) + F.lit(c * stride))
        copies.append(cp)
    outdf = copies[0]
    for cp in copies[1:]:
        outdf = outdf.unionByName(cp)
    outdf.repartition(64).write.mode("overwrite").parquet(f"{out}/{table}.parquet")


def expand_embeddings(spark, src: str, out: str, factor: int) -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n = emb.count()

    def jitter(it):
        for pdf in it:
            rng_cols = pdf["vec_id"].to_numpy()
            outv = []
            for vid, v in zip(rng_cols, pdf["embedding"]):
                a = np.asarray(v, dtype=np.float64)
                rng = np.random.default_rng(SEED + int(vid))
                a = a + rng.normal(0, 0.01, size=a.size)
                nrm = np.linalg.norm(a)
                outv.append((a / nrm if nrm > 0 else a).astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["embedding"] = outv
            yield pdf

    copies = []
    for c in range(factor):
        copies.append(emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * n)))
    outdf = copies[0]
    for cp in copies[1:]:
        outdf = outdf.unionByName(cp)
    outdf.repartition(64).mapInPandas(jitter, emb.schema).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args(argv)

    from btl_bloomfilter_spark.session import get_spark

    spark = get_spark("expand_testdata", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    expand_documents(spark, args.src, args.out, args.factor)
    expand_offset(spark, args.src, args.out, "events", args.factor, {"user_id": 1_000_000})
    expand_offset(
        spark, args.src, args.out, "lineitem", args.factor, {"l_orderkey": 100_000_000}
    )
    expand_offset(spark, args.src, args.out, "orders", args.factor, {"o_orderkey": 100_000_000})
    expand_embeddings(spark, args.src, args.out, args.factor)
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
    for t in ("documents", "events", "lineitem", "orders", "embeddings"):
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
