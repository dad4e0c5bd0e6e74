"""KLL quantile sketch (Karnin-Lang-Liberty 2016), mergeable.

Level-l compactor holds items each representing 2^l input items;
compaction sorts the level and promotes a random odd/even half to
level l+1.  Normalized rank error is O(1/k) with high probability
(we assert an empirical ≤ 2.2/k bound in tests, the published
constant for the high-weight-biased capacity schedule below).

Randomness: each instance draws its own entropy seed by default so
per-partition compaction coin flips are INDEPENDENT — with a shared
seed the randomized errors of P similar partitions correlate and add
like P·eps instead of cancelling like sqrt(P)·eps.  Pass ``seed=``
explicitly for a reproducible build; the realized seed rides in
params() so serialized blobs round-trip identically.  Merge =
concatenate compactors level-wise, then re-compact: associative in
distribution, with the same error bound.

Odd-length compactions retain the one unpaired item at its level
(standard KLL), so total retained weight always equals n exactly and
rank() never drifts past 1.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

from .base import Sketch

_C = 2.0 / 3.0  # capacity decay per level below the top


def _to_float_array(values) -> np.ndarray:
    """Batch → float64 array with nulls dropped, no per-element Python
    (pandas to_numpy maps None/NA to NaN; NaN inputs are dropped too,
    matching the previous semantics)."""
    if hasattr(values, "to_numpy"):
        arr = values.to_numpy(dtype=np.float64, na_value=np.nan)
    else:
        arr = np.array([np.nan if v is None else v for v in values], dtype=np.float64)
    return arr[~np.isnan(arr)]


class KLL(Sketch):
    def __init__(self, k: int = 200, *, seed: int | None = None):
        self.k = int(k)
        self._seed_from_entropy = seed is None
        self.seed = int(seed) if seed is not None else int(np.random.SeedSequence().entropy & ((1 << 63) - 1))
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(self.seed)

    def params(self) -> dict[str, Any]:
        return {"k": self.k, "seed": self.seed}

    def checkpoint_params(self) -> dict[str, Any]:
        """Checkpoint identity excludes an auto-drawn entropy seed: the
        realized seed doesn't affect merged-result validity, and
        including it would make every rerun's params_json unique —
        checkpoint resume would silently degrade to a full rebuild."""
        return {"k": self.k} if self._seed_from_entropy else {"k": self.k, "seed": self.seed}

    # -- capacities --------------------------------------------------
    def _cap(self, level: int) -> int:
        height = len(self.levels) - 1 - level
        return max(2, int(np.ceil(self.k * (_C**height))))

    def _total_cap(self) -> int:
        return sum(self._cap(l) for l in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(a) for a in self.levels)

    # -- updates -----------------------------------------------------
    def update(self, values) -> None:
        arr = _to_float_array(values)
        if arr.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], arr])
        self.n += arr.size
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._total_cap():
            for l in range(len(self.levels)):
                if len(self.levels[l]) >= self._cap(l):
                    self._compact(l)
                    break
            else:
                break

    def _compact(self, l: int) -> None:
        items = np.sort(self.levels[l])
        # an odd-length level keeps its one unpaired item in place —
        # promoting it would double (or dropping it halve) 2^l weight
        if items.size % 2:
            leftover = items[-1:]
            items = items[:-1]
        else:
            leftover = np.empty(0, dtype=np.float64)
        keep_odd = bool(self._rng.integers(0, 2))
        promoted = items[1::2] if keep_odd else items[0::2]
        self.levels[l] = leftover
        if l + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[l + 1] = np.concatenate([self.levels[l + 1], promoted])

    # -- merge -------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        self._require_compatible(other)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for l, arr in enumerate(other.levels):
            if arr.size:
                self.levels[l] = np.concatenate([self.levels[l], arr])
        self.n += other.n
        self._compress()
        return self

    def compatible(self, other: "Sketch") -> bool:
        # merge tolerates different seeds; k must match
        return isinstance(other, KLL) and other.k == self.k

    # -- queries -----------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for l, arr in enumerate(self.levels):
            if arr.size:
                items.append(arr)
                weights.append(np.full(arr.size, 1 << l, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def rank(self, x: float) -> float:
        """Estimated normalized rank of x (fraction of items ≤ x)."""
        it, wt = self._weighted()
        if self.n == 0:
            return 0.0
        return float(wt[it <= x].sum()) / self.n

    def quantile(self, q: float) -> float:
        it, wt = self._weighted()
        if it.size == 0:
            return float("nan")
        cum = np.cumsum(wt)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(idx, it.size - 1)])

    def quantiles(self, qs: Iterable[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def metrics(self) -> dict[str, Any]:
        return {"n": self.n, "retained": int(self._size()), "levels": len(self.levels)}

    # -- state -------------------------------------------------------
    def state_bytes(self) -> bytes:
        parts = [np.array([self.n, len(self.levels)], dtype=np.int64).tobytes()]
        for arr in self.levels:
            parts.append(np.array([arr.size], dtype=np.int64).tobytes())
            parts.append(arr.tobytes())
        return b"".join(parts)

    def load_state(self, payload: bytes) -> None:
        off = 0
        self.n, nlev = (int(x) for x in np.frombuffer(payload, dtype=np.int64, count=2, offset=off))
        off += 16
        self.levels = []
        for _ in range(nlev):
            (sz,) = np.frombuffer(payload, dtype=np.int64, count=1, offset=off)
            off += 8
            self.levels.append(np.frombuffer(payload, dtype=np.float64, count=int(sz), offset=off).copy())
            off += int(sz) * 8
        if not self.levels:
            self.levels = [np.empty(0, dtype=np.float64)]
