"""`.bf` file format store/load — byte-compatible with the reference.

Format (README.md:146-197, BloomFilter.hpp:264-314):

    [BTLBloomFilter_v1]            # or BTLCountingBloomFilter_v1
    BloomFilterSize = <m bits>
    BloomFilterSizeInBytes = <len(payload)>
    HashNum = <h>
    KmerSize = <k>
    dFPR = <double>
    nEntry = <uint64>
    Entry = <uint64>
    [HeaderEnd]
    <raw little-endian array bytes>

cpptoml emits unordered fields; our loader accepts any order and our
writer emits a stable order.  Validation mirrors loadHeader's magic +
size-consistency checks (BloomFilter.hpp:118-166) but raises
ValueError instead of exit(1).
"""

from __future__ import annotations

import re
from pathlib import Path

MAGIC_BLOOM = "BTLBloomFilter_v1"
MAGIC_COUNTING = "BTLCountingBloomFilter_v1"
_HEADER_END = b"[HeaderEnd]\n"


def _fmt_val(v) -> str:
    if isinstance(v, float):
        s = repr(v)
        return s if ("e" in s or "." in s or "inf" in s or "nan" in s) else s + ".0"
    return str(v)


def write_bf(path: str | Path, magic: str, fields: dict, payload: bytes) -> None:
    lines = [f"[{magic}]"]
    for k, v in fields.items():
        lines.append(f"{k} = {_fmt_val(v)}")
    header = ("\n".join(lines) + "\n").encode() + _HEADER_END
    Path(path).write_bytes(header + payload)


def read_bf(path: str | Path, expect_magic: str | None = None) -> tuple[str, dict, bytes]:
    raw = Path(path).read_bytes()
    idx = raw.find(_HEADER_END)
    if idx < 0:
        raise ValueError(f"{path}: missing [HeaderEnd] marker")
    header = raw[:idx].decode()
    payload = raw[idx + len(_HEADER_END):]
    m = re.search(r"^\[([A-Za-z0-9_]+)\]\s*$", header, re.M)
    if not m:
        raise ValueError(f"{path}: no TOML table header found")
    magic = m.group(1)
    if expect_magic is not None and magic != expect_magic:
        raise ValueError(f"{path}: magic {magic!r} != expected {expect_magic!r}")
    fields: dict = {}
    for line in header.splitlines():
        kv = re.match(r"^\s*([A-Za-z0-9_]+)\s*=\s*(.+?)\s*$", line)
        if kv:
            key, val = kv.group(1), kv.group(2)
            if re.fullmatch(r"-?\d+", val):
                fields[key] = int(val)
            else:
                try:
                    fields[key] = float(val)
                except ValueError:
                    fields[key] = val.strip('"')
    size_in_bytes = fields.get("BloomFilterSizeInBytes")
    if size_in_bytes is not None and size_in_bytes != len(payload):
        raise ValueError(
            f"{path}: payload length {len(payload)} != BloomFilterSizeInBytes {size_in_bytes}"
        )
    return magic, fields, payload


def save_bloom(bf, path: str | Path) -> None:
    """Store a BloomFilter in reference `.bf` layout."""
    if getattr(bf, "block_bits", None):
        # the reference .bf header has no block-layout field; a blocked
        # filter reloaded as flat would probe the wrong bits silently.
        # Blocked filters travel via the generic Sketch envelope
        # (serialize/deserialize) instead.
        raise ValueError("BlockedBloomFilter cannot be stored in reference .bf layout")
    fields = {
        "BloomFilterSize": bf.m_bits,
        "BloomFilterSizeInBytes": bf.m_bits // 8,
        "HashNum": bf.hash_num,
        "KmerSize": bf.k,
        "dFPR": bf.dfpr,
        "nEntry": bf.n_entry,
        "Entry": bf.t_entry,
        "SeedSalt": bf.seed_salt,  # extension field (loader-ignored by ref)
    }
    # hash-mode extension fields (quoted → valid TOML for the reference
    # parser, which just ignores unknown keys): without these a spaced/
    # canonical filter silently reloaded as plain forward k-gram mode
    # and probed the wrong bits
    if getattr(bf, "spaced_seeds", None):
        fields["SpacedSeeds"] = '"' + ",".join(bf.spaced_seeds) + '"'
    if getattr(bf, "canonical", False):
        fields["Canonical"] = 1
    write_bf(path, MAGIC_BLOOM, fields, bf.bits.tobytes())


def load_bloom(path: str | Path):
    from ..operators.bloom import BloomFilter

    magic, fields, payload = read_bf(path, MAGIC_BLOOM)
    seeds = fields.get("SpacedSeeds")
    bf = BloomFilter(
        m_bits=int(fields["BloomFilterSize"]),
        hash_num=int(fields["HashNum"]),
        k=int(fields.get("KmerSize", 0)),
        seed_salt=int(fields.get("SeedSalt", 0)),
        dfpr=float(fields.get("dFPR", 0.0)),
        spaced_seeds=str(seeds).split(",") if seeds else None,
        canonical=bool(fields.get("Canonical", 0)),
    )
    import numpy as np

    bf.bits = np.frombuffer(payload, dtype=np.uint8).copy()
    if bf.bits.shape[0] != bf.m_bits // 8:
        raise ValueError(f"{path}: size fields inconsistent with payload")
    bf.n_entry = int(fields.get("nEntry", 0))
    bf.t_entry = int(fields.get("Entry", 0))
    return bf


def save_counting(cbf, path: str | Path) -> None:
    fields = {
        "BloomFilterSize": cbf.m_counters,
        "BloomFilterSizeInBytes": cbf.m_counters * cbf.counter_bytes,
        "HashNum": cbf.hash_num,
        "KmerSize": cbf.k,
        "BitsPerCounter": cbf.counter_bytes * 8,
        "dFPR": cbf.dfpr,
        "nEntry": cbf.n_entry,
        "Entry": cbf.t_entry,
        "SeedSalt": cbf.seed_salt,
        # non-reference extension (like SeedSalt, ignored by the
        # reference loader): without it a reload silently reset the
        # contains() threshold to 1
        "Threshold": cbf.threshold,
    }
    if getattr(cbf, "spaced_seeds", None):
        fields["SpacedSeeds"] = '"' + ",".join(cbf.spaced_seeds) + '"'
    if getattr(cbf, "canonical", False):
        fields["Canonical"] = 1
    write_bf(path, MAGIC_COUNTING, fields, cbf.counters_saturated().tobytes())


def load_counting(path: str | Path):
    from ..operators.counting import CountingBloomFilter

    magic, fields, payload = read_bf(path, MAGIC_COUNTING)
    seeds = fields.get("SpacedSeeds")
    cbf = CountingBloomFilter(
        m_counters=int(fields["BloomFilterSize"]),
        hash_num=int(fields["HashNum"]),
        k=int(fields.get("KmerSize", 0)),
        counter_bits=int(fields.get("BitsPerCounter", 8)),
        seed_salt=int(fields.get("SeedSalt", 0)),
        dfpr=float(fields.get("dFPR", 0.0)),
        threshold=int(fields.get("Threshold", 1)),
        spaced_seeds=str(seeds).split(",") if seeds else None,
        canonical=bool(fields.get("Canonical", 0)),
    )
    cbf.load_counters_saturated(payload)
    cbf.n_entry = int(fields.get("nEntry", 0))
    cbf.t_entry = int(fields.get("Entry", 0))
    return cbf
