"""Merging t-digest (Dunning & Ertl), mergeable quantile sketch.

Centroid list compressed under the k1 scale function
k(q) = (delta / 2π) · asin(2q - 1); adjacent centroids merge while
the merged centroid spans < 1 unit of k.  Extreme quantiles get the
tightest centroids, giving sub-percent error at q=.99 with
delta=200.  Merge = concatenate centroid lists + recompress —
associative in distribution; accuracy bounds hold under any merge
order (asserted in tests, not bit-equality, mirroring SURVEY §7's
note on non-bit-exact sketches).
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

from .base import Sketch


class TDigest(Sketch):
    def __init__(self, delta: float = 200.0, *, buffer_size: int = 4096):
        self.delta = float(delta)
        self.buffer_size = int(buffer_size)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    def params(self) -> dict[str, Any]:
        return {"delta": self.delta, "buffer_size": self.buffer_size}

    # -- scale function ----------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    # -- updates -----------------------------------------------------
    def update(self, values) -> None:
        from .kll import _to_float_array

        arr = _to_float_array(values)
        if arr.size == 0:
            return
        self._buf.append(arr)
        self._buf_n += arr.size
        if self._buf_n >= self.buffer_size:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        pts = np.concatenate(self._buf)
        self._buf, self._buf_n = [], 0
        self._merge_arrays(pts, np.ones(pts.size, dtype=np.float64))

    def _merge_arrays(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Vectorized k-boundary clustering (Dunning's merging digest
        with fixed scale-function bins): each sorted point lands in
        bin ⌊k(q_mid) − k(0)⌋; bin width ≤ 1 unit of k ⇒ ≤ ~δ/2+2
        centroids and the standard t-digest accuracy bound.  One numpy
        pass, no per-centroid Python loop."""
        am = np.concatenate([self.means, means])
        aw = np.concatenate([self.weights, weights])
        order = np.argsort(am, kind="stable")
        am, aw = am[order], aw[order]
        total = aw.sum()
        cumw = np.cumsum(aw)
        q_mid = (cumw - aw / 2.0) / total
        kv = self._k(q_mid) - self._k(np.array([0.0]))[0]
        bins = np.floor(kv).astype(np.int64)
        bins = np.maximum.accumulate(bins)  # guard fp non-monotonicity
        nb = int(bins[-1]) + 1
        ws = np.bincount(bins, weights=aw, minlength=nb)
        sums = np.bincount(bins, weights=am * aw, minlength=nb)
        mask = ws > 0
        self.means = sums[mask] / ws[mask]
        self.weights = ws[mask]
        self.n = float(total)

    # -- merge -------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        self._require_compatible(other)
        self._flush()
        other._flush()
        if other.means.size:
            self._merge_arrays(other.means, other.weights)
        return self

    def compatible(self, other: "Sketch") -> bool:
        return isinstance(other, TDigest) and other.delta == self.delta

    # -- queries -----------------------------------------------------
    def quantile(self, q: float) -> float:
        self._flush()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.n
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def quantiles(self, qs: Iterable[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def cdf(self, x: float) -> float:
        self._flush()
        if self.means.size == 0:
            return 0.0
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(x, self.means, cum / self.n, left=0.0, right=1.0))

    def metrics(self) -> dict[str, Any]:
        self._flush()
        return {"n": self.n, "centroids": int(self.means.size)}

    # -- state -------------------------------------------------------
    def state_bytes(self) -> bytes:
        self._flush()
        return (
            np.array([self.n, float(self.means.size)], dtype=np.float64).tobytes()
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    def load_state(self, payload: bytes) -> None:
        hdr = np.frombuffer(payload, dtype=np.float64, count=2)
        self.n = float(hdr[0])
        sz = int(hdr[1])
        self.means = np.frombuffer(payload, dtype=np.float64, count=sz, offset=16).copy()
        self.weights = np.frombuffer(payload, dtype=np.float64, count=sz, offset=16 + sz * 8).copy()
        self._buf, self._buf_n = [], 0
