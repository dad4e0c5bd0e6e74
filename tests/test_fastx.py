"""FASTA/FASTQ source tests: split-safe parallel scan parity with a
driver-side reference parse (the reference's own scan loops,
writeBloom_rolling.cpp:19-58 / ParallelFilter.cpp:104-122)."""

import numpy as np
import pytest

from btl_bloomfilter_spark.sources.fastx import read_fasta, read_fastq


def _write_fasta(path, n=1500, seed=7, crlf=False):
    rng = np.random.default_rng(seed)
    recs = []
    eol = "\r\n" if crlf else "\n"
    for i in range(n):
        seq = "".join(rng.choice(list("ACGTN"), size=int(rng.integers(40, 400))))
        wrapped = eol.join(seq[j : j + 60] for j in range(0, len(seq), 60))
        recs.append((f"contig{i} extra meta", seq))
    with open(path, "w") as f:
        for h, s in recs:
            f.write(">" + h + eol)
            f.write(eol.join(s[j : j + 60] for j in range(0, len(s), 60)) + eol)
    return dict(recs)


@pytest.mark.spark
@pytest.mark.parametrize("crlf", [False, True])
def test_read_fasta_matches_reference_parse(spark, tmp_path, crlf):
    p = str(tmp_path / "refs.fa")
    want = _write_fasta(p, crlf=crlf)
    # force MANY input splits so records straddle split boundaries —
    # the scan must still glue them (Hadoop line-reader contract)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try:
        df = read_fasta(spark, p)
        assert df.rdd.getNumPartitions() > 4  # splits actually happened
        got = {r["header"]: r["seq"] for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert got == want


@pytest.mark.spark
def test_read_fasta_feeds_bloom_build(spark, tmp_path):
    """The reference workflow end-to-end: FASTA scan → insertSeq →
    contains (contigsToBloom parity)."""
    from btl_bloomfilter_spark.operators.bloom import BloomFilter
    from btl_bloomfilter_spark.plans.agg import build_sketch

    p = str(tmp_path / "refs.fa")
    want = _write_fasta(p, n=200)
    seqs = read_fasta(spark, p)
    bf = build_sketch(seqs, "seq", lambda: BloomFilter(1 << 20, 3, 8))
    frac = bf.seen_fraction(list(want.values())[:50])
    assert (frac == 1.0).all()  # no false negatives over every window


@pytest.mark.spark
def test_read_fastq_robust_to_at_in_quality(spark, tmp_path):
    rng = np.random.default_rng(11)
    p = str(tmp_path / "reads.fq")
    want = {}
    with open(p, "w") as f:
        for i in range(400):
            n = int(rng.integers(30, 80))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            # quality strings that START with '@' and '+' — the reason
            # separator-based FASTQ splitting is unsound
            qual = ("@" if i % 3 == 0 else "+") + "".join(
                chr(33 + int(q)) for q in rng.integers(0, 40, size=n - 1)
            )
            want[f"read{i}"] = (seq, qual)
            f.write(f"@read{i}\n{seq}\n+\n{qual}\n")
    df = read_fastq(spark, p)
    got = {r["read_id"]: (r["seq"], r["qual"]) for r in df.collect()}
    assert got == want


@pytest.mark.spark
def test_read_fastq_rejects_malformed(spark, tmp_path):
    p = str(tmp_path / "bad.fq")
    with open(p, "w") as f:
        f.write("@r0\nACGT\n+\n!!!!\n")
        f.write("MISSING_AT\nACGT\n+\n!!!!\n")
    with pytest.raises(ValueError, match="malformed"):
        read_fastq(spark, p)


@pytest.mark.spark
def test_read_fastq_rejects_truncated_and_bad_plus(spark, tmp_path):
    # truncated trailing record (n_lines % 4 != 0) must raise, not be
    # silently dropped
    p = str(tmp_path / "trunc.fq")
    with open(p, "w") as f:
        f.write("@r0\nACGT\n+\n!!!!\n")
        f.write("@r1\nACGT\n")  # incomplete
    with pytest.raises(ValueError, match="multiple of 4"):
        read_fastq(spark, p)
    # third line must open with '+'
    p2 = str(tmp_path / "badplus.fq")
    with open(p2, "w") as f:
        f.write("@r0\nACGT\nX\n!!!!\n")
    with pytest.raises(ValueError, match="malformed"):
        read_fastq(spark, p2)


@pytest.mark.spark
def test_read_fastq_multi_split_framing(spark, tmp_path):
    """Records straddling input-split boundaries must still frame
    correctly: the partition-offset + in-partition-counter line
    numbering (pure JVM, no zipWithIndex) has to agree with file
    order across many splits."""
    rng = np.random.default_rng(23)
    p = str(tmp_path / "big.fq")
    want = {}
    with open(p, "w") as f:
        for i in range(3000):
            n = int(rng.integers(30, 90))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, size=n))
            want[f"read{i}"] = (seq, qual)
            f.write(f"@read{i}\n{seq}\n+\n{qual}\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        df = read_fastq(spark, p)
        got = {r["read_id"]: (r["seq"], r["qual"]) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert got == want


@pytest.mark.spark
def test_read_fastq_multi_file_glob_framing(spark, tmp_path):
    """Framing must be PER FILE (ADVICE r4): Spark orders input splits
    by length descending ACROSS files, so a glob over files of
    different sizes interleaves their splits — global line numbering
    would mis-frame.  Different file sizes + tiny splits force the
    interleaving; every record from every file must survive."""
    rng = np.random.default_rng(31)
    d = tmp_path / "many"
    d.mkdir()
    want = {}
    # deliberately varied file sizes so the length-descending split
    # sort does NOT follow filename enumeration order
    for fi, nrec in enumerate([7, 213, 61, 500, 1]):
        with open(d / f"part{fi}.fq", "w") as f:
            for i in range(nrec):
                n = int(rng.integers(30, 90))
                seq = "".join(rng.choice(list("ACGT"), size=n))
                qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, size=n))
                rid = f"f{fi}r{i}"
                want[rid] = (seq, qual)
                f.write(f"@{rid}\n{seq}\n+\n{qual}\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        df = read_fastq(spark, str(d / "*.fq"))
        got = {r["read_id"]: (r["seq"], r["qual"]) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert got == want


@pytest.mark.spark
def test_read_fastq_multi_file_per_file_truncation(spark, tmp_path):
    """Truncation must be checked PER FILE and the error must name the
    offending file.  Two truncated files whose line counts sum to a
    multiple of 4 (6 + 6 = 12) would sail through a single global
    mod-4 check — the per-file check catches both."""
    d = tmp_path / "mixed"
    d.mkdir()
    with open(d / "bad1.fq", "w") as f:
        f.write("@a\nACGT\n+\n!!!!\n@b\nACGT\n")  # 6 lines
    with open(d / "bad2.fq", "w") as f:
        f.write("@x\nACGT\n+\n!!!!\n@y\nACGT\n")  # 6 lines
    with pytest.raises(ValueError, match=r"bad[12]\.fq.*multiple of 4"):
        read_fastq(spark, str(d / "*.fq"))


@pytest.mark.spark
def test_fastq_to_parquet_job(spark, tmp_path):
    """The one-shot ingest path: convert once, scan Parquet after."""
    import jobs.fastq_to_parquet as cj

    rng = np.random.default_rng(5)
    p = str(tmp_path / "reads.fq")
    want = {}
    with open(p, "w") as f:
        for i in range(200):
            n = int(rng.integers(30, 60))
            seq = "".join(rng.choice(list("ACGT"), size=n))
            qual = "@" + "".join(chr(33 + int(q)) for q in rng.integers(0, 40, size=n - 1))
            want[f"r{i}"] = (seq, qual)
            f.write(f"@r{i}\n{seq}\n+\n{qual}\n")
    out = str(tmp_path / "reads.parquet")
    n = cj.main(["-f", p, "-o", out, "--partitions", "4"])
    assert n == 200
    got = {
        r["read_id"]: (r["seq"], r["qual"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want


@pytest.mark.spark
def test_cli_parity_jobs_roundtrip(spark, tmp_path, monkeypatch):
    """writeBloom_rolling / testBloom_rolling CLI pair: build from
    FASTA with the reference's exact sizing, store in .bf layout,
    reload and find every inserted k-mer window."""
    import io
    import contextlib
    import sys as _sys

    import jobs.write_bloom as wj
    import jobs.test_bloom as tj

    p = str(tmp_path / "refs.fa")
    _write_fasta(p, n=120, seed=3)
    out = str(tmp_path / "f.bf")
    bf = wj.main(["-f", p, "-k", "11", "-p", "0.001", "-o", out])
    # reference sizing law held exactly (word round-up is unconditional)
    import math, os
    n = os.path.getsize(p)
    m_raw = int(math.ceil(-n * math.log(0.001) / math.log(2) ** 2))
    assert bf.m_bits == m_raw + (64 - m_raw % 64)
    assert bf.hash_num == max(1, int((bf.m_bits / n) * math.log(2)))
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        per_contig = tj.main(["-f", p, "--filter", out])
    pdf = per_contig.toPandas()
    assert (pdf.hits == pdf.total).all()  # no false negatives
    assert "Found" in err.getvalue()


@pytest.mark.spark
def test_read_fastq_glob_edge_files(spark, tmp_path):
    """Glob containing an EMPTY file, a CRLF-terminated file and a
    single-record file: empty contributes nothing (and does not trip
    per-file validation), CRLF is stripped, and per-file framing
    handles a 1-record file."""
    d = tmp_path / "edge"
    d.mkdir()
    (d / "empty.fq").write_text("")
    (d / "crlf.fq").write_text("@r1\r\nACGT\r\n+\r\n!!!!\r\n@r2\r\nTTTT\r\n+\r\n####\r\n")
    (d / "single.fq").write_text("@s1\nGGGG\n+\n....\n")
    df = read_fastq(spark, str(d / "*.fq"))
    got = {r["read_id"]: (r["seq"], r["qual"]) for r in df.collect()}
    assert got == {
        "r1": ("ACGT", "!!!!"),
        "r2": ("TTTT", "####"),
        "s1": ("GGGG", "...."),
    }
