"""HyperLogLog distinct-count sketch (mergeable).

Not present in the reference (which only has Bloom-family sketches)
but required by the north rule with the same accumulator algebra:
per-partition register arrays merged by elementwise max — the same
"concurrent updates ≡ merged partials" law as the Bloom OR
(BloomFilter.hpp:177-178), since max is associative/commutative.

Published algorithm (Flajolet et al. 2007) with the standard 64-bit
adaptation: m = 2^p uint8 registers; idx = top p bits of the hash;
rho = leading-zero count of the remaining 64-p bits + 1; estimate
alpha_m * m^2 / sum(2^-reg) with linear counting for the small range.
Relative error ≤ 1.04/sqrt(m) (BASELINE.md bound).  Hashing reuses
the library's seeded whole-string hash (functions/hashing.py).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..functions import hashing as H
from .base import Sketch
from .bloom import _strings_of


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog(Sketch):
    def __init__(self, p: int = 14, *, seed_salt: int = 0):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.seed_salt = int(seed_salt)
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.t_entry = 0
        self._seeds = H.seed_table(self.seed_salt)

    def params(self) -> dict[str, Any]:
        return {"p": self.p, "seed_salt": self.seed_salt}

    def update(self, values) -> None:
        strings = _strings_of(values)
        if not strings:
            return
        h = H.hash_strings(strings, 1, seeds=self._seeds)[:, 0]
        self.update_hashes(h)
        self.t_entry += len(strings)

    def update_arrow(self, arr) -> None:
        """Zero-copy update from an Arrow string array; nulls hash as
        '' to match the pandas path."""
        buf, offsets, null_mask = H.arrow_utf8_buffers(arr)
        h = H.hash_strings_from_buffers(buf, offsets, 1, seeds=self._seeds)[:, 0]
        if null_mask is not None and h.size:
            h = h.copy()
            h[null_mask] = H.hash_strings([""], 1, seeds=self._seeds)[0, 0]
        self.update_hashes(h)
        self.t_entry += len(arr)

    def update_hashes(self, h: np.ndarray) -> None:
        p64 = np.uint64(self.p)
        idx = (h >> (np.uint64(64) - p64)).astype(np.int64)
        with np.errstate(over="ignore"):
            rest = (h << p64).astype(np.uint64)
        rho = np.minimum(H.clz64(rest) + np.uint64(1), np.uint64(64 - self.p + 1)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self._require_compatible(other)
        np.maximum(self.registers, other.registers, out=self.registers)
        self.t_entry += other.t_entry
        return self

    def estimate(self) -> float:
        m = float(self.m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int32)).sum()
        e = _alpha(self.m) * m * m / inv
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(e)

    def rel_error_bound(self) -> float:
        return 1.04 / np.sqrt(self.m)

    def metrics(self) -> dict[str, Any]:
        return {"nonzero_regs": int((self.registers > 0).sum()), "estimate": self.estimate()}

    def state_bytes(self) -> bytes:
        return np.array([self.t_entry], dtype=np.uint64).tobytes() + self.registers.tobytes()

    def load_state(self, payload: bytes) -> None:
        self.t_entry = int(np.frombuffer(payload[:8], dtype=np.uint64)[0])
        regs = np.frombuffer(payload[8:], dtype=np.uint8)
        if regs.shape[0] != self.m:
            raise ValueError("payload size mismatch")
        self.registers = regs.copy()
