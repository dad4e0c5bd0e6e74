"""Reference miBF file layout (MIBloomFilter.hpp:268-305,722-742):
byte-level structural checks + full round-trip."""

import struct

import numpy as np
import pytest

from btl_bloomfilter_spark.operators.mibf import MIBloomFilter, build_mibf
from btl_bloomfilter_spark.sources.mibf_io import (
    BLOCK_BITS,
    MAGIC,
    VERSION,
    load_mibf,
    save_mibf,
)


@pytest.fixture(scope="module")
def small_mibf(spark):
    rng = np.random.default_rng(5)
    rows = []
    for ref in (1, 2, 3):
        vocab = [f"r{ref}w{i}" for i in range(60)]
        for _ in range(10):
            rows.append((" ".join(rng.choice(vocab, 20)), ref))
    df = spark.createDataFrame(rows, "text string, ref_id long")
    return build_mibf(df, "text", "ref_id", m_bits=1 << 15, hash_num=3, k=8), rows


@pytest.mark.spark
def test_header_byte_layout(small_mibf, tmp_path):
    mibf, _ = small_mibf
    p = tmp_path / "f.mibf"
    save_mibf(mibf, p)
    raw = p.read_bytes()
    # packed FileHeader (MIBloomFilter.hpp:108-117): 8s I Q I I I = 32B
    assert raw[:8] == MAGIC
    hlen, size, nhash, kmer, version = struct.unpack_from("<IQIII", raw, 8)
    assert hlen == 32  # no spaced seeds
    assert size == mibf.data.size
    assert nhash == mibf.hash_num and kmer == mibf.k
    assert version == VERSION == 1
    # payload = little-endian uint32 ID words immediately after header
    ids = np.frombuffer(raw, dtype="<u4", count=size, offset=32)
    np.testing.assert_array_equal(ids, mibf.data)
    assert len(raw) == 32 + 4 * size


@pytest.mark.spark
def test_sidecar_interleaved_layout(small_mibf, tmp_path):
    mibf, _ = small_mibf
    p = tmp_path / "f.mibf"
    save_mibf(mibf, p)
    raw = (tmp_path / "f.mibf.sdsl").read_bytes()
    (m_size,) = struct.unpack_from("<Q", raw, 0)
    (iv_bits,) = struct.unpack_from("<Q", raw, 8)
    assert m_size == mibf.m_bits
    words = np.frombuffer(raw, dtype="<u8", count=iv_bits // 64, offset=16)
    wpb = BLOCK_BITS // 64 + 1  # one cum-rank word + 8 data words
    assert words.size % wpb == 0
    blocks = words.reshape(-1, wpb)
    # interleaved rank words are the cumulative popcount of prior blocks
    pops = np.array(
        [bin(int.from_bytes(b[1:].tobytes(), "little")).count("1") for b in blocks]
    )
    np.testing.assert_array_equal(blocks[:, 0], np.concatenate([[0], np.cumsum(pops)[:-1]]))
    # data words match the filter's bit bytes
    data_bytes = np.ascontiguousarray(blocks[:, 1:]).view(np.uint8).reshape(-1)[: mibf.bits.size]
    np.testing.assert_array_equal(data_bytes, mibf.bits)


@pytest.mark.spark
def test_roundtrip_and_classify(small_mibf, tmp_path):
    mibf, rows = small_mibf
    p = tmp_path / "f.mibf"
    save_mibf(mibf, p)
    back, seeds = load_mibf(p)
    assert seeds == []
    assert (back.m_bits, back.hash_num, back.k) == (mibf.m_bits, mibf.hash_num, mibf.k)
    np.testing.assert_array_equal(back.bits, mibf.bits)
    np.testing.assert_array_equal(back.data, mibf.data)
    texts = [t for t, _ in rows[:10]]
    assert back.classify_batch(texts).best_id.tolist() == mibf.classify_batch(texts).best_id.tolist()
    # second save is byte-identical (deterministic writer)
    save_mibf(back, tmp_path / "g.mibf")
    assert (tmp_path / "g.mibf").read_bytes() == p.read_bytes()
    assert (tmp_path / "g.mibf.sdsl").read_bytes() == (tmp_path / "f.mibf.sdsl").read_bytes()


@pytest.mark.spark
def test_spaced_seed_header(small_mibf, tmp_path):
    mibf, _ = small_mibf
    p = tmp_path / "s.mibf"
    seeds = ["10101011", "11010101", "10110101"]
    save_mibf(mibf, p, spaced_seeds=seeds)
    raw = p.read_bytes()
    hlen = struct.unpack_from("<I", raw, 8)[0]
    assert hlen == 32 + mibf.k * len(seeds)
    assert raw[32 : 32 + 8].decode() == seeds[0]
    back, back_seeds = load_mibf(p)
    assert back_seeds == seeds
    with pytest.raises(ValueError):
        save_mibf(mibf, p, spaced_seeds=["101"])  # wrong length


@pytest.mark.spark
def test_validation_errors(small_mibf, tmp_path):
    mibf, _ = small_mibf
    p = tmp_path / "v.mibf"
    save_mibf(mibf, p)
    raw = bytearray(p.read_bytes())
    bad = tmp_path / "bad.mibf"
    bad_raw = bytearray(raw)
    bad_raw[:8] = b"NOTMIBLF"
    bad.write_bytes(bytes(bad_raw))
    (tmp_path / "bad.mibf.sdsl").write_bytes((tmp_path / "v.mibf.sdsl").read_bytes())
    with pytest.raises(ValueError, match="magic"):
        load_mibf(bad)
    bad_raw = bytearray(raw)
    struct.pack_into("<I", bad_raw, 28, 99)  # version field
    bad.write_bytes(bytes(bad_raw))
    with pytest.raises(ValueError, match="version"):
        load_mibf(bad)


def test_save_mibf_refuses_canonical(tmp_path):
    """The reference header cannot express canonical mode — saving
    must refuse instead of silently round-tripping to forward-only
    (which would misclassify RC reads)."""
    import pytest
    from btl_bloomfilter_spark.operators.bloom import BloomFilter
    from btl_bloomfilter_spark.operators.mibf import MIBloomFilter
    from btl_bloomfilter_spark.sources.mibf_io import save_mibf, load_mibf

    bf = BloomFilter(1 << 12, 3, 6, canonical=True)
    bf.update(["ACGTACGTACGT"])
    mibf = MIBloomFilter(1 << 12, 3, 6, canonical=True)
    mibf.freeze(bf.bits.copy())
    p = tmp_path / "canon.mibf"
    with pytest.raises(ValueError, match="canonical"):
        save_mibf(mibf, p)
    # out-of-band restore: save the arrays via a forward-mode twin,
    # reload with canonical=True → mode and classification preserved
    twin = MIBloomFilter(1 << 12, 3, 6)
    twin.bits, twin.data = mibf.bits, mibf.data
    twin.freeze_rank_only()
    save_mibf(twin, p)
    back, _ = load_mibf(p, canonical=True)
    assert back.canonical
    import numpy as np
    np.testing.assert_array_equal(back.bits, mibf.bits)
