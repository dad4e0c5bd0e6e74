"""Frequent Directions: mergeable low-rank matrix sketch over embeddings.

Liberty (KDD 2013) / Ghashami-Liberty-Phillips-Woodruff (SIAM J.
Comput. 2016): maintain an ell x d matrix B such that for the row
stream A (here: an `array<float>` embedding column),

    0  <=  A'A - B'B  (PSD: the sketch only ever UNDER-counts energy)
    ||A'A - B'B||_2  <=  ||A||_F^2 / ell

— the covariance/Gram structure of a 10^12-row embedding table
summarized in ell*d floats, with a deterministic worst-case bound (no
distributional assumptions).  That is what a training-data pipeline
wants for cheap spectral diagnostics at 100 TB: top principal
directions, energy concentration, drift of the embedding covariance
between snapshots — without ever materializing the d x d Gramian from
raw data twice.

Mergeability (the property that makes it a real distributed sketch,
Ghashami et al. §3): FD(A1) merged with FD(A2) by row-concatenation +
one shrink obeys the SAME bound for A1 stacked on A2.  So the operator
rides the library's standard `plans/agg.build_sketch` partial->merge
machinery: each partition folds its rows into an ell-row sketch
(numpy SVD per 2*ell overflow, Arrow-batch vectorized), partials
merge tree-wise, and the driver holds ell*d*8 bytes.  Merge is
associative only UP TO THE BOUND (SVD is not bit-order-invariant —
unlike Bloom/count sketches the cells are not integers), so the gates
assert the guarantee, not byte equality: q121 runs the build under
two partitionings and checks both sketches satisfy PSD + the spectral
bound against the EXACT Gramian (computed distributed by
`exact_gramian`, a d x d sum of outer products with map-side
combine).

Shrink rule (the classic one the bound is proven for): with the
buffer at 2*ell rows, SVD, sigma_i' = sqrt(max(sigma_i^2 -
sigma_ell^2, 0)) — zeroing at least the bottom half; the discarded
energy per shrink is charged to the bound's ledger
(`shrunk_total`), giving the tighter certificate
||A'A - B'B||_2 <= shrunk_total <= ||A||_F^2 / ell, both reported.
"""

from __future__ import annotations

from typing import Any

import numpy as np
from pyspark.sql import DataFrame

from ..functions.vectors import rows_from_arrow
from .base import Sketch

__all__ = ["FrequentDirections", "exact_gramian"]


class FrequentDirections(Sketch):
    """ell-direction FD sketch of a stream of d-dimensional rows."""

    def __init__(self, ell: int, dim: int):
        if ell < 1 or dim < 1:
            raise ValueError("ell and dim must be >= 1")
        self.ell = int(ell)
        self.dim = int(dim)
        self.n_entry = 0
        self.t_entry = 0
        self.fnorm2 = 0.0  # exact ||A||_F^2 of everything absorbed
        self.shrunk_total = 0.0  # sum of sigma_ell^2 over shrinks (tight ledger)
        self._buf = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
        self._n_buf = 0  # occupied rows in _buf

    def params(self) -> dict[str, Any]:
        return {"ell": self.ell, "dim": self.dim}

    # -- accumulation --------------------------------------------------
    def _rows_of(self, values) -> np.ndarray:
        rows = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in values], dtype=np.float64
        )
        if rows.ndim == 1 and rows.size == 0:
            return np.zeros((0, self.dim))
        if rows.ndim != 2 or rows.shape[1] != self.dim:
            raise ValueError(f"expected rows of dim {self.dim}, got shape {rows.shape}")
        return rows

    def update(self, values) -> None:
        rows = self._rows_of(values)
        self.fnorm2 += float((rows * rows).sum())
        self.n_entry += rows.shape[0]
        self.t_entry += rows.shape[0]
        self._append(rows)

    def _append(self, rows: np.ndarray) -> None:
        """Fold rows into the buffer, shrinking at each overflow.
        Ledger-neutral: callers account fnorm2/n_entry themselves."""
        n, i = rows.shape[0], 0
        while i < n:
            take = min(2 * self.ell - self._n_buf, n - i)
            self._buf[self._n_buf : self._n_buf + take] = rows[i : i + take]
            self._n_buf += take
            i += take
            if self._n_buf == 2 * self.ell:
                self._shrink()

    def update_arrow(self, arr) -> None:
        rows = rows_from_arrow(arr, self.dim)  # nulls/ragged/dim raise
        if rows.shape[0]:
            self.update(rows)

    def _shrink(self) -> None:
        """SVD the buffer; when it holds more than ell directions,
        subtract the (ell+1)-th largest sigma^2 from every squared
        singular value (Liberty's rule — at least the bottom half hits
        exactly zero) and keep the top ell rows.  Losslessness of the
        truncation: s is descending, so every i >= ell has
        s_i^2 - delta <= 0.  Ledger: the shrink removes >= (ell+1) *
        delta of Frobenius energy, so sum(delta) <= ||A||_F^2 / ell."""
        _, s, vt = np.linalg.svd(self._buf[: self._n_buf], full_matrices=False)
        if s.shape[0] <= self.ell:
            # <= ell directions exist (e.g. dim <= ell): representation
            # is exact, nothing to subtract
            kept = s[:, None] * vt
            self._buf[: kept.shape[0]] = kept
            self._buf[kept.shape[0] :] = 0.0
            self._n_buf = kept.shape[0]
            return
        delta = float(s[self.ell] ** 2)
        self.shrunk_total += delta
        snew = np.sqrt(np.maximum(s[: self.ell] ** 2 - delta, 0.0))
        self._buf[: self.ell] = snew[:, None] * vt[: self.ell]
        self._buf[self.ell :] = 0.0
        self._n_buf = self.ell

    # -- queries ---------------------------------------------------------
    def sketch_matrix(self) -> np.ndarray:
        """Current B (<= 2*ell x d; call compress() first for exactly
        <= ell nonzero rows)."""
        return self._buf[: self._n_buf].copy()

    def compress(self) -> None:
        """Force a shrink so at most ell rows remain."""
        if self._n_buf > self.ell:
            self._shrink()

    def gram(self) -> np.ndarray:
        b = self._buf[: self._n_buf]
        return b.T @ b

    def error_bound(self) -> float:
        """Worst-case ||A'A - B'B||_2 certificate: the exact shrink
        ledger (sum of subtracted sigma^2 levels), itself always
        <= ||A||_F^2 / ell."""
        return float(self.shrunk_total)

    def bound_fnorm(self) -> float:
        return float(self.fnorm2 / self.ell)

    # -- merge -------------------------------------------------------
    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        """Row-concatenation merge (Ghashami et al. §3): fold other's
        sketch rows in through the same shrink rule; ledgers add —
        other's TRUE stream energy (fnorm2), not its sketch rows'."""
        self._require_compatible(other)
        self._append(other._buf[: other._n_buf])
        self.fnorm2 += other.fnorm2
        self.shrunk_total += other.shrunk_total
        self.n_entry += other.n_entry
        self.t_entry += other.t_entry
        return self

    # -- state ---------------------------------------------------------
    def state_bytes(self) -> bytes:
        self.compress()
        hdr = np.array(
            [self.n_entry, self.t_entry, self._n_buf], dtype=np.int64
        ).tobytes()
        led = np.array([self.fnorm2, self.shrunk_total], dtype=np.float64).tobytes()
        return hdr + led + self._buf[: self._n_buf].tobytes()

    def load_state(self, payload: bytes) -> None:
        hdr = np.frombuffer(payload[:24], dtype=np.int64)
        self.n_entry, self.t_entry, n_buf = int(hdr[0]), int(hdr[1]), int(hdr[2])
        led = np.frombuffer(payload[24:40], dtype=np.float64)
        self.fnorm2, self.shrunk_total = float(led[0]), float(led[1])
        rows = np.frombuffer(payload[40:], dtype=np.float64)
        if rows.size != n_buf * self.dim:
            raise ValueError("payload size mismatch")
        self._buf = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
        self._buf[:n_buf] = rows.reshape(n_buf, self.dim)
        self._n_buf = n_buf

    def metrics(self) -> dict[str, Any]:
        return {
            "n_entry": self.n_entry,
            "fnorm2": self.fnorm2,
            "shrunk_total": self.shrunk_total,
        }


def exact_gramian(df: DataFrame, col: str, dim: int) -> tuple[np.ndarray, int]:
    """EXACT d x d Gramian A'A of an array<float> column, computed
    distributed: one mapInArrow pass emits per-partition d*d partial
    Gramians (map-side combine in numpy), summed driver-side — d^2
    doubles per partition cross the wire, never the rows.  Returns
    (gram, n_rows).  Same strict conversion as the sketch itself
    (nulls/ragged/dim raise) — a silently misaligned 'exact' Gramian
    would corrupt the very ground truth q121 judges the sketch by."""
    import pyarrow as pa

    d = int(dim)

    def fn(batches):
        acc = np.zeros((d, d), dtype=np.float64)
        n = 0
        for rb in batches:
            arr = rb.column(rb.schema.get_field_index(col))
            rows = rows_from_arrow(arr, d)
            if rows.shape[0]:
                acc += rows.T @ rows
                n += rows.shape[0]
        yield pa.record_batch(
            [pa.array([acc.tobytes()], pa.binary()), pa.array([n], pa.int64())],
            names=["g", "n"],
        )

    parts = df.select(col).mapInArrow(fn, "g binary, n long").collect()
    gram = np.zeros((d, d), dtype=np.float64)
    n = 0
    for r in parts:
        gram += np.frombuffer(bytes(r["g"]), dtype=np.float64).reshape(d, d)
        n += int(r["n"])
    return gram, n
