"""Distributed mergeable Bloom filter.

Semantics mirror the reference (`BloomFilter.hpp`):
- insert: set h bits at ``hash_i % m`` (BloomFilter.hpp:171-194);
  bit layout is LSB-first within each byte, matching the reference's
  ``bitMask`` table so `.bf` files are byte-compatible.
- contains: AND over the h probed bits (BloomFilter.hpp:237-262).
- merge: bitwise OR — exactly what the reference's concurrent
  ``__sync_or_and_fetch`` inserts compute, hence a P-partition
  distributed build is **bit-identical** to a serial one.
- intersect: bitwise AND (standard BF intersection).
- popcount / FPR math: BloomFilter.hpp:316-367.

Two tokenization modes:
- ``k > 0``: every k-byte rolling window of the string is an element
  (KmerBloomFilter.hpp:47-74 analog, vectorized).
- ``k == 0``: the whole string is one element.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..functions import hashing as H
from .. import params as P
from .base import Sketch

_POPCNT_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint16)


def _as_str_array(values) -> np.ndarray:
    """Batch → object array of python strings (None → '')."""
    arr = np.asarray(values, dtype=object)
    return arr


def _strings_of(values) -> list:
    out = []
    for v in (values.tolist() if hasattr(values, "tolist") else values):
        out.append(v if isinstance(v, str) else ("" if v is None else str(v)))
    return out


class BloomFilter(Sketch):
    def __init__(
        self,
        m_bits: int,
        hash_num: int,
        k: int = 0,
        *,
        seed_salt: int = 0,
        dfpr: float = 0.0,
        n_entry: int = 0,
        t_entry: int = 0,
    ):
        if m_bits % 64:
            raise ValueError("m_bits must be a multiple of 64 (BloomFilter.hpp:389-399)")
        self.m_bits = int(m_bits)
        self.hash_num = int(hash_num)
        self.k = int(k)
        self.seed_salt = int(seed_salt)
        self.dfpr = float(dfpr)
        self.n_entry = int(n_entry)  # elements inserted (windows)
        self.t_entry = int(t_entry)  # rows (strings) processed
        self.bits = np.zeros(self.m_bits // 8, dtype=np.uint8)
        self._seeds = H.seed_table(self.seed_salt)

    # -- construction helpers ---------------------------------------
    @classmethod
    def for_capacity(cls, n: int, fpr: float, k: int = 0, hash_num: int | None = None, **kw) -> "BloomFilter":
        m, h = P.calc_optimal_size(n, fpr, hash_num)
        return cls(m, h, k, dfpr=fpr, **kw)

    def params(self) -> dict[str, Any]:
        return {"m_bits": self.m_bits, "hash_num": self.hash_num, "k": self.k, "seed_salt": self.seed_salt, "dfpr": self.dfpr}

    # -- hashing ------------------------------------------------------
    def _hash_batch(self, values) -> tuple[np.ndarray, np.ndarray]:
        """(hashes (W,h) uint64, row_ids (W,)) for a batch of strings."""
        strings = _strings_of(values)
        if self.k > 0:
            return H.hash_ngrams(strings, self.k, self.hash_num, seeds=self._seeds)
        hashes = H.hash_strings(strings, self.hash_num, seeds=self._seeds)
        return hashes, np.arange(len(strings), dtype=np.int64)

    # -- updates -------------------------------------------------------
    def _set_bits(self, idx: np.ndarray) -> None:
        byte_idx = (idx >> np.uint64(3)).astype(np.int64)
        mask = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        np.bitwise_or.at(self.bits, byte_idx, mask)

    def update(self, values) -> None:
        hashes, rows = self._hash_batch(values)
        if hashes.size:
            idx = (hashes % np.uint64(self.m_bits)).ravel()
            self._set_bits(idx)
        self.n_entry += int(hashes.shape[0])
        self.t_entry += int(len(values))

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Insert pre-hashed (W, h) uint64 blocks (BloomFilter.hpp:185-194)."""
        idx = (hashes % np.uint64(self.m_bits)).ravel()
        self._set_bits(idx)
        self.n_entry += int(hashes.shape[0])

    # -- probes --------------------------------------------------------
    def _probe_bits(self, hashes: np.ndarray) -> np.ndarray:
        """(W, h) hashes → (W,) bool: all h bits set (contains)."""
        if hashes.shape[0] == 0:
            return np.zeros(0, dtype=bool)
        idx = hashes % np.uint64(self.m_bits)
        byte_idx = (idx >> np.uint64(3)).astype(np.int64)
        got = (self.bits[byte_idx] >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return got.all(axis=1)

    def contains_batch(self, values) -> np.ndarray:
        """Whole-element probe: for k==0 one bool per string; for k>0 a
        bool per string that is True iff ALL its windows are present
        (reference containSeq's hits==total, testBloom_rolling.cpp:19-33)."""
        hashes, rows = self._hash_batch(values)
        hit = self._probe_bits(hashes)
        n = len(values)
        if self.k == 0:
            return hit
        out = np.ones(n, dtype=bool)
        total = np.bincount(rows, minlength=n)
        hits = np.bincount(rows, weights=hit.astype(np.float64), minlength=n)
        out = (total > 0) & (hits == total)
        return out

    def seen_fraction(self, values) -> np.ndarray:
        """Per string: fraction of its windows present (k>0 mode)."""
        hashes, rows = self._hash_batch(values)
        hit = self._probe_bits(hashes)
        n = len(values)
        total = np.bincount(rows, minlength=n).astype(np.float64)
        hits = np.bincount(rows, weights=hit.astype(np.float64), minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(total > 0, hits / total, 0.0)
        return frac

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        return self._probe_bits(hashes)

    # -- merge algebra -------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._require_compatible(other)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_entry += other.n_entry
        self.t_entry += other.t_entry
        return self

    union = merge

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        self._require_compatible(other)
        out = BloomFilter(**self.params())
        np.bitwise_and(self.bits, other.bits, out=out.bits)
        return out

    # -- stats ---------------------------------------------------------
    def pop(self) -> int:
        """Set-bit count (getPop, BloomFilter.hpp:316-323)."""
        return int(_POPCNT_LUT[self.bits].sum())

    def fpr(self) -> float:
        return P.observed_fpr(self.pop(), self.m_bits, self.hash_num)

    def theoretical_fpr(self) -> float:
        return P.fpr_num_inserted(self.n_entry, self.m_bits, self.hash_num)

    def metrics(self) -> dict[str, Any]:
        pop = self.pop()
        return {"pop": pop, "fill": pop / self.m_bits, "n_entry": self.n_entry}

    # -- state ---------------------------------------------------------
    def state_bytes(self) -> bytes:
        return (
            np.array([self.n_entry, self.t_entry], dtype=np.uint64).tobytes()
            + self.bits.tobytes()
        )

    def load_state(self, payload: bytes) -> None:
        hdr = np.frombuffer(payload[:16], dtype=np.uint64)
        self.n_entry, self.t_entry = int(hdr[0]), int(hdr[1])
        bits = np.frombuffer(payload[16:], dtype=np.uint8)
        if bits.shape[0] != self.m_bits // 8:
            raise ValueError("payload size mismatch")
        self.bits = bits.copy()
