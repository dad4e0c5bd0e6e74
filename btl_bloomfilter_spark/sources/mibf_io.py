"""Reference-compatible miBF persistence.

Main file (MIBloomFilter.hpp:268-305 store / :155-246 load,
writeHeader :722-742): the #pragma pack(1) FileHeader
(MIBloomFilter.hpp:108-117)

    char    magic[8]   = "MIBLOOMF"
    uint32  hlen       = 32 + kmer * n_seeds
    uint64  size       = ID-array length (m_dSize)
    uint32  nhash
    uint32  kmer
    uint32  version    = 1  (MIBloomFilter.hpp:814)

followed by the spaced-seed strings (kmer bytes each, present iff
hlen > 32) and the raw little-endian ID words (T = uint32 here).

Sidecar ``<path>.sdsl`` (store_to_file(m_bv, path + ".sdsl"),
MIBloomFilter.hpp:295-297): the sdsl-lite ``bit_vector_il<512>``
layout — uint64 bit count m_size, then the serialized
``int_vector<64>`` of interleaved words (uint64 total bit width, then
the words), where each 512-bit block is one cumulative-popcount word
followed by the block's eight raw data words.  sdsl-lite is not
installed in this container, so byte compatibility is asserted by
round-trip + structural tests against this documented layout.

Validation failures raise ValueError (the library convention replacing
the reference CLI's exit(1), matching sources/bfio.py).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

MAGIC = b"MIBLOOMF"
VERSION = 1
BLOCK_BITS = 512
_HEADER = struct.Struct("<8sIQIII")  # magic, hlen, size, nhash, kmer, version

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.int64)


def _interleave_bits(bits_u8: np.ndarray, m_bits: int) -> np.ndarray:
    """bit bytes → interleaved uint64 words (cum-rank word + 8 data
    words per 512-bit block), little-endian bit order."""
    words_per_block = BLOCK_BITS // 64
    n_blocks = max(1, -(-m_bits // BLOCK_BITS))
    padded = np.zeros(n_blocks * words_per_block * 8, dtype=np.uint8)
    padded[: bits_u8.size] = bits_u8
    data_words = padded.view("<u8").reshape(n_blocks, words_per_block)
    per_block_pop = _POP8[padded].reshape(n_blocks, -1).sum(axis=1)
    cum = np.zeros(n_blocks, dtype=np.uint64)
    cum[1:] = np.cumsum(per_block_pop)[:-1].astype(np.uint64)
    out = np.empty((n_blocks, words_per_block + 1), dtype="<u8")
    out[:, 0] = cum
    out[:, 1:] = data_words
    return out.reshape(-1)


def _deinterleave_bits(words: np.ndarray, m_bits: int) -> np.ndarray:
    words_per_block = BLOCK_BITS // 64
    blocks = words.reshape(-1, words_per_block + 1)
    data = np.ascontiguousarray(blocks[:, 1:]).view(np.uint8).reshape(-1)
    n_bytes = -(-m_bits // 8)
    return data[:n_bytes].copy()


def _write_sidecar(path: Path, bits_u8: np.ndarray, m_bits: int) -> None:
    inter = _interleave_bits(bits_u8, m_bits)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", m_bits))  # write_member(m_size)
        f.write(struct.pack("<Q", inter.size * 64))  # int_vector<64> bit width
        f.write(inter.tobytes())


def _read_sidecar(path: Path) -> tuple[np.ndarray, int]:
    raw = path.read_bytes()
    (m_bits,) = struct.unpack_from("<Q", raw, 0)
    (iv_bits,) = struct.unpack_from("<Q", raw, 8)
    if iv_bits % 64:
        raise ValueError(f"corrupt sidecar {path}: int_vector width {iv_bits} not word-aligned")
    n_words = iv_bits // 64
    words = np.frombuffer(raw, dtype="<u8", count=n_words, offset=16)
    if words.size % (BLOCK_BITS // 64 + 1):
        raise ValueError(f"corrupt sidecar {path}: not an interleaved <512> layout")
    return _deinterleave_bits(words, m_bits), int(m_bits)


def save_mibf(mibf, path: str | Path, *, spaced_seeds: list[str] | None = None) -> None:
    """Store in the reference's two-file layout (header+IDs, .sdsl
    bit-vector sidecar).  spaced_seeds must each be k chars if given;
    a spaced-seed filter's own patterns are written by default.

    Canonical (reverse-complement) filters are REFUSED: the reference
    header (MIBloomFilter.hpp:108-117) has no field for the hashing
    mode, so a round-trip would silently come back forward-only and
    misclassify RC reads.  Persist canonical filters with the internal
    envelope (``mibf.serialize()``), or reload explicitly with
    ``load_mibf(path, canonical=True)`` if you accept carrying the
    mode out of band."""
    if getattr(mibf, "canonical", False):
        raise ValueError(
            "the reference miBF file layout cannot express canonical mode; "
            "use mibf.serialize() (internal envelope) or carry canonical=True "
            "to load_mibf out of band"
        )
    path = Path(path)
    seeds = spaced_seeds or getattr(mibf, "spaced_seeds", None) or []
    for s in seeds:
        if len(s) != mibf.k:
            raise ValueError(f"spaced seed {s!r} length != k={mibf.k}")
    hlen = _HEADER.size + mibf.k * len(seeds)
    with open(path, "wb") as f:
        f.write(_HEADER.pack(MAGIC, hlen, mibf.data.size, mibf.hash_num, mibf.k, VERSION))
        for s in seeds:
            f.write(s.encode("ascii"))
        f.write(mibf.data.astype("<u4", copy=False).tobytes())
    _write_sidecar(path.with_name(path.name + ".sdsl"), mibf.bits, mibf.m_bits)


def load_mibf(path: str | Path, *, seed_salt: int = 0, canonical: bool = False):
    """Load a reference-layout miBF pair.  Returns (MIBloomFilter,
    spaced_seeds).  seed_salt / canonical are our hashing-mode
    extensions carried out of band (the reference header has no
    equivalent fields; save_mibf refuses canonical filters so a
    caller passing canonical=True is restoring a mode they tracked
    themselves)."""
    from ..operators.mibf import MIBloomFilter

    path = Path(path)
    raw = path.read_bytes()
    if len(raw) < _HEADER.size:
        raise ValueError(f"{path}: truncated header")
    magic, hlen, d_size, nhash, kmer, version = _HEADER.unpack_from(raw, 0)
    if magic != MAGIC:
        raise ValueError(f"{path}: filter type does not match (magic {magic!r})")
    if version != VERSION:
        raise ValueError(f"{path}: version {version} does not match expected {VERSION}")
    seeds: list[str] = []
    off = _HEADER.size
    if hlen > _HEADER.size:
        n_seeds = (hlen - _HEADER.size) // max(kmer, 1)
        if hlen != _HEADER.size + kmer * n_seeds:
            raise ValueError(f"{path}: header length {hlen} does not match expected layout")
        for _ in range(n_seeds):
            seeds.append(raw[off : off + kmer].decode("ascii"))
            off += kmer
    data = np.frombuffer(raw, dtype="<u4", count=d_size, offset=off).copy()
    bits, m_bits = _read_sidecar(path.with_name(path.name + ".sdsl"))
    mibf = MIBloomFilter(
        m_bits, int(nhash), int(kmer), seed_salt=seed_salt, spaced_seeds=seeds or None,
        canonical=canonical,
    )
    mibf.bits = bits
    mibf.data = data
    mibf.freeze_rank_only()
    if mibf.data.size != int(mibf._byte_cum[-1]):
        raise ValueError(
            f"{path}: ID array length {d_size} != bit-vector popcount {int(mibf._byte_cum[-1])}"
        )
    return mibf, seeds
