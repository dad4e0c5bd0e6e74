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
        arr = np.asarray(
            [v for v in (values.tolist() if hasattr(values, "tolist") else values) if v is not None],
            dtype=np.float64,
        )
        arr = arr[~np.isnan(arr)]
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
        am = np.concatenate([self.means, means])
        aw = np.concatenate([self.weights, weights])
        order = np.argsort(am, kind="stable")
        am, aw = am[order], aw[order]
        total = aw.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cum = 0.0
        cur_m, cur_w = am[0], aw[0]
        k_lo = self._k(np.array([0.0]))[0]
        for i in range(1, am.size):
            q_hi = (cum + cur_w + aw[i]) / total
            if self._k(np.array([q_hi]))[0] - k_lo <= 1.0:
                cur_m += (am[i] - cur_m) * (aw[i] / (cur_w + aw[i]))
                cur_w += aw[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                k_lo = self._k(np.array([cum / total]))[0]
                cur_m, cur_w = am[i], aw[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)
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
