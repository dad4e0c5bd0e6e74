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
        spaced_seeds: list[str] | None = None,
        canonical: bool = False,
    ):
        if m_bits <= 0 or m_bits % 64:
            raise ValueError("m_bits must be a positive multiple of 64 (BloomFilter.hpp:389-399)")
        if hash_num <= 0:
            raise ValueError("hash_num must be positive")
        self.m_bits = int(m_bits)
        self.hash_num = int(hash_num)
        self.k = int(k)
        self.seed_salt = int(seed_salt)
        self.dfpr = float(dfpr)
        self.n_entry = int(n_entry)  # elements inserted (windows)
        self.t_entry = int(t_entry)  # rows (strings) processed
        # spaced-seed mode (st/ssHashIterator analog): one hash per
        # '1'/'0' pattern, window length = pattern length; masked
        # positions don't contribute (skip-gram matching)
        # canonical (strand-neutral) mode: NTC64 analog — each window's
        # base hash is min(forward, reverse-complement), so a sequence
        # and its reverse complement populate/probe identical bits
        self.canonical = bool(canonical)
        if self.canonical and k <= 0 and not spaced_seeds:
            raise ValueError("canonical hashing requires k-gram mode (k > 0)")
        self.spaced_seeds = list(spaced_seeds) if spaced_seeds else None
        if self.spaced_seeds:
            if len({len(p) for p in self.spaced_seeds}) != 1:
                raise ValueError("all spaced seeds must share one length")
            if self.k and self.k != len(self.spaced_seeds[0]):
                raise ValueError("k must equal the spaced-seed pattern length")
            self.k = len(self.spaced_seeds[0])
            if self.hash_num != len(self.spaced_seeds):
                raise ValueError("hash_num must equal the number of spaced seeds")
            if self.canonical:
                # canonical spaced mode (NTMS64 canonical): strand
                # neutrality needs symmetric care sets — the analog of
                # the reference's symmetric-seed assertion
                for p in self.spaced_seeds:
                    care = H.parse_seed(p)
                    if not (care == (len(p) - 1 - care)[::-1]).all():
                        raise ValueError(
                            f"canonical spaced-seed mode requires symmetric patterns; {p!r} is not"
                        )
        self._bits = np.zeros(self.m_bits // 8, dtype=np.uint8)
        self._seeds = H.seed_table(self.seed_salt)
        self._acc: np.ndarray | None = None  # bool scatter accumulator

    # -- construction helpers ---------------------------------------
    @classmethod
    def for_capacity(cls, n: int, fpr: float, k: int = 0, hash_num: int | None = None, **kw) -> "BloomFilter":
        m, h = P.calc_optimal_size(n, fpr, hash_num)
        return cls(m, h, k, dfpr=fpr, **kw)

    def params(self) -> dict[str, Any]:
        out = {"m_bits": self.m_bits, "hash_num": self.hash_num, "k": self.k, "seed_salt": self.seed_salt, "dfpr": self.dfpr}
        if self.spaced_seeds:
            out["spaced_seeds"] = list(self.spaced_seeds)
        if self.canonical:
            out["canonical"] = True
        return out

    #: windows per fan-out chunk — bounds peak kernel memory at
    #: CHUNK × hash_num × 8 bytes (≈12 MB at h=3) regardless of how
    #: many k-gram windows an Arrow batch explodes into
    CHUNK = 1 << 19

    # -- hashing ------------------------------------------------------
    def _hash_batch(self, values) -> tuple[np.ndarray, np.ndarray]:
        """(hashes (W,h) uint64, row_ids (W,)) for a batch of strings."""
        strings = _strings_of(values)
        if self.spaced_seeds:
            if self.canonical:
                h, rows, _ = H.hash_ngrams_multi_seed_canonical(strings, self.spaced_seeds, seeds=self._seeds)
                return h, rows
            return H.hash_ngrams_multi_seed(strings, self.spaced_seeds, 1, seeds=self._seeds)
        if self.canonical:
            return H.hash_ngrams_canonical(strings, self.k, self.hash_num, seeds=self._seeds)
        if self.k > 0:
            return H.hash_ngrams(strings, self.k, self.hash_num, seeds=self._seeds)
        hashes = H.hash_strings(strings, self.hash_num, seeds=self._seeds)
        return hashes, np.arange(len(strings), dtype=np.int64)

    def _base_hashes(self, values) -> tuple[np.ndarray, np.ndarray]:
        """Base (un-fanned) hashes: ((W,) uint64, row_ids).  The h-way
        NTE64 fan-out happens chunk-wise in the consumer so a text
        batch that explodes into millions of windows never
        materializes a (W, h) matrix at once."""
        strings = _strings_of(values)
        if self.canonical:
            hb, rows = H.hash_ngrams_canonical(strings, self.k, 1, seeds=self._seeds)
            return hb[:, 0], rows
        if self.k > 0:
            hb, rows = H.hash_ngrams(strings, self.k, 1, seeds=self._seeds)
            return hb[:, 0], rows
        hb = H.hash_strings(strings, 1, seeds=self._seeds)
        return hb[:, 0], np.arange(len(strings), dtype=np.int64)

    @property
    def _fanout_k(self) -> int:
        # NTE64 law parameter: window length for k-gram mode, the
        # fixed whole-string convention (=1) otherwise
        return self.k if self.k > 0 else 1

    #: bool-accumulator cap: fancy-index scatter into a bool array is
    #: ~4× faster than np.bitwise_or.at on packed bytes, at the cost of
    #: m_bits bytes of transient worker memory; above the cap fall back
    #: to the packed scatter
    DENSE_ACC_MAX_BITS = 1 << 27

    _BIT_MASKS = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.uint8)

    # -- hash → bit-position mapping ------------------------------------
    # The ONLY layout-dependent step: BloomFilter scatters each hash
    # uniformly over [0, m); BlockedBloomFilter (below) derives a block
    # from the seed-0 hash and confines all hash_num bits to it.  Both
    # update and probe paths funnel through these two hooks so the two
    # layouts share every kernel, merge, and slice code path.
    def _positions_matrix(self, hashes: np.ndarray) -> np.ndarray:
        """(W, h) uint64 hashes → (W, h) bit positions, IN PLACE
        (callers pass scratch).  Column 0 must be the seed-0/base
        hash (the NTE64 law hVal[0] = bVal guarantees this for the
        fan-out path; multi-seed matrices use seed 0's column)."""
        np.remainder(hashes, np.uint64(self.m_bits), out=hashes)
        return hashes

    def _column_context(self, base: np.ndarray):
        """Per-chunk precomputation for the column-wise probe: the
        blocked layout derives each window's block base from the
        seed-0 hashes ONCE here (instead of once per hash column);
        the flat layout needs nothing."""
        return None

    def _positions_column(self, ctx, hi: np.ndarray) -> np.ndarray:
        """One fan-out column → bit positions; ``ctx`` is this chunk's
        ``_column_context`` (subset along with the windows)."""
        return hi % np.uint64(self.m_bits)

    # -- updates -------------------------------------------------------
    def _set_bits(self, idx: np.ndarray) -> None:
        """idx: uint64 bit positions; may be mutated (callers pass scratch)."""
        if self.m_bits <= self.DENSE_ACC_MAX_BITS:
            if self._acc is None:
                self._acc = np.zeros(self.m_bits, dtype=bool)
            self._acc[idx] = True
            return
        bit_in = H._scratch("bf_bit", idx.size)
        np.bitwise_and(idx, np.uint64(7), out=bit_in)
        mask = self._BIT_MASKS[bit_in]  # uint8 gather, no astype pass
        np.right_shift(idx, np.uint64(3), out=idx)
        np.bitwise_or.at(self._bits, idx, mask)

    def _consolidate(self) -> None:
        """Fold the bool accumulator into the packed bit array."""
        if self._acc is not None:
            np.bitwise_or(self._bits, np.packbits(self._acc, bitorder="little"), out=self._bits)
            self._acc = None

    @property
    def bits(self) -> np.ndarray:
        """Packed LSB-first bit array (consolidated view)."""
        self._consolidate()
        return self._bits

    @bits.setter
    def bits(self, value: np.ndarray) -> None:
        self._acc = None
        self._bits = value

    def update(self, values) -> None:
        if self.spaced_seeds:
            hashes, _ = self._hash_batch(values)
            for s in range(0, hashes.shape[0], self.CHUNK):
                idx = self._positions_matrix(hashes[s : s + self.CHUNK].copy())
                self._set_bits(idx.ravel())
            self.n_entry += int(hashes.shape[0])
            self.t_entry += int(len(values))
            return
        base, rows = self._base_hashes(values)
        buf = None
        for s in range(0, base.shape[0], self.CHUNK):
            chunk = base[s : s + self.CHUNK]
            if buf is None or buf.shape[0] != chunk.shape[0]:
                buf = np.empty((chunk.shape[0], self.hash_num), dtype=np.uint64)
            hashes = self._positions_matrix(H.nte64(chunk, self.hash_num, self._fanout_k, out=buf))
            self._set_bits(hashes.ravel())
        self.n_entry += int(base.shape[0])
        self.t_entry += int(len(values))

    def update_arrow(self, arr) -> None:
        """Zero-copy update from an Arrow string array: the Arrow UTF-8
        buffer/offset layout feeds the rolling-hash kernel directly —
        no pandas objects, no per-row re-encode (the hot path for
        mapInArrow builds)."""
        buf, offsets, null_mask = H.arrow_utf8_buffers(arr)
        if self.spaced_seeds:
            if self.canonical:
                hashes, rows, _ = H.hash_ngrams_multi_seed_canonical_from_buffers(
                    buf, offsets, self.spaced_seeds, seeds=self._seeds
                )
            else:
                hashes, rows = H.hash_ngrams_multi_seed_from_buffers(
                    buf, offsets, self.spaced_seeds, 1, seeds=self._seeds
                )
            if null_mask is not None and hashes.shape[0]:
                hashes = hashes[~null_mask[rows]]
            for s in range(0, hashes.shape[0], self.CHUNK):
                idx = self._positions_matrix(hashes[s : s + self.CHUNK].copy())
                self._set_bits(idx.ravel())
            self.n_entry += int(hashes.shape[0])
            self.t_entry += int(len(arr))
            return
        if self.k > 0:
            if self.canonical:
                hb, rows = H.hash_ngrams_canonical_from_buffers(buf, offsets, self.k, 1, seeds=self._seeds)
            else:
                hb, rows = H.hash_ngrams_from_buffers(buf, offsets, self.k, 1, seeds=self._seeds)
            base = hb[:, 0]
            if null_mask is not None and base.size:
                keep = ~null_mask[rows]
                base = base[keep]
        else:
            base = H.hash_strings_from_buffers(buf, offsets, 1, seeds=self._seeds)[:, 0]
            if null_mask is not None and base.size:
                # match the pandas path exactly: null hashes as ""
                base = base.copy()
                base[null_mask] = H.hash_strings([""], 1, seeds=self._seeds)[0, 0]
        bb = None
        for s in range(0, base.shape[0], self.CHUNK):
            chunk = base[s : s + self.CHUNK]
            if bb is None or bb.shape[0] != chunk.shape[0]:
                bb = np.empty((chunk.shape[0], self.hash_num), dtype=np.uint64)
            hashes = self._positions_matrix(H.nte64(chunk, self.hash_num, self._fanout_k, out=bb))
            self._set_bits(hashes.ravel())
        self.n_entry += int(base.shape[0])
        self.t_entry += int(len(arr))

    def update_and_check(self, values) -> np.ndarray:
        """insertAndCheck (BloomFilter.hpp:200-232): insert every
        window; per ROW return True iff all of its windows were
        already present before their own insertion — exact sequential
        semantics, vectorized: a window is 'already present' iff its
        bits were set in the pre-batch state OR an identical window
        occurred earlier in the batch (identical base hash ⇒ identical
        bits, so the earlier occurrence inserted them)."""
        if self.spaced_seeds:
            raise NotImplementedError(
                "insertAndCheck is defined on the dense-hash filter; spaced-seed "
                "filters are probe/build only (reference pairs insertAndCheck with "
                "ntHash, BloomFilter.hpp:200-232)"
            )
        self._consolidate()
        base, rows = self._base_hashes(values)
        n = len(values)
        if base.size == 0:
            return np.zeros(n, dtype=bool)
        uniq, first_pos, inv = np.unique(base, return_index=True, return_inverse=True)
        pre = np.empty(uniq.shape[0], dtype=bool)
        for s in range(0, uniq.shape[0], self.CHUNK):
            hh = H.nte64(uniq[s : s + self.CHUNK], self.hash_num, self._fanout_k)
            pre[s : s + self.CHUNK] = self._probe_bits(hh)
        # insert everything
        buf = None
        for s in range(0, uniq.shape[0], self.CHUNK):
            chunk = uniq[s : s + self.CHUNK]
            if buf is None or buf.shape[0] != chunk.shape[0]:
                buf = np.empty((chunk.shape[0], self.hash_num), dtype=np.uint64)
            hh = self._positions_matrix(H.nte64(chunk, self.hash_num, self._fanout_k, out=buf))
            self._set_bits(hh.ravel())
        self.n_entry += int(base.shape[0])
        self.t_entry += n
        is_first = np.zeros(base.shape[0], dtype=bool)
        is_first[first_pos] = True
        window_present = pre[inv] | ~is_first
        total = np.bincount(rows, minlength=n)
        hits = np.bincount(rows, weights=window_present.astype(np.float64), minlength=n)
        return (total > 0) & (hits == total)

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Insert pre-hashed (W, h) uint64 blocks (BloomFilter.hpp:185-194)."""
        idx = self._positions_matrix(np.array(hashes, dtype=np.uint64)).ravel()
        self._set_bits(idx)
        self.n_entry += int(hashes.shape[0])

    # -- probes --------------------------------------------------------
    def _probe_bits(self, hashes: np.ndarray) -> np.ndarray:
        """(W, h) hashes → (W,) bool: all h bits set (contains)."""
        if hashes.shape[0] == 0:
            return np.zeros(0, dtype=bool)
        idx = self._positions_matrix(hashes.copy())
        byte_idx = (idx >> np.uint64(3)).astype(np.int64)
        got = (self._bits[byte_idx] >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return got.all(axis=1)

    def _probe_bits_base(self, base: np.ndarray) -> np.ndarray:
        """Probe from base (un-fanned) hashes with per-hash
        short-circuit — the vectorized analog of the reference's
        early return on the first unset bit (BloomFilter.hpp:242-244):
        hash column i is computed only for windows still alive, so a
        miss-heavy probe touches ~1/h of the work.  When the first
        column shows a hit-heavy batch the remaining columns fall back
        to one matrix pass (compaction would only add copies)."""
        n = base.shape[0]
        if n == 0:
            return np.zeros(0, dtype=bool)
        k = np.uint64(self._fanout_k)
        h = self.hash_num

        def column_hash(hb: np.ndarray, i: int) -> np.ndarray:
            if i == 0:
                return hb
            with np.errstate(over="ignore"):
                hi = (hb * (np.uint64(i) ^ (k * H.MULTI_SEED))).astype(np.uint64)
            hi ^= hi >> H.MULTI_SHIFT
            return hi

        def gather(ctx, hi: np.ndarray) -> np.ndarray:
            idx = self._positions_column(ctx, hi)
            byte_idx = (idx >> np.uint64(3)).astype(np.int64)
            return ((self._bits[byte_idx] >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)).astype(
                bool
            )

        # dense phase: full-width columns ANDed into one mask — the
        # same work as the matrix probe while most windows are alive,
        # with no (W, h) materialization.  The layout context (blocked:
        # fmix64 block bases) is computed ONCE per chunk, not per column.
        ctx = self._column_context(base)
        alive = gather(ctx, base)
        i = 1
        while i < h and alive.mean() >= 0.5:
            alive &= gather(ctx, column_hash(base, i))
            i += 1
        if i >= h:
            return alive
        # sparse phase: most windows are dead → compact to survivors so
        # each further column touches ~fill·W windows
        alive_idx = np.flatnonzero(alive)
        for j in range(i, h):
            if alive_idx.size == 0:
                break
            sub = base[alive_idx]
            sub_ctx = ctx if ctx is None else ctx[alive_idx]
            alive_idx = alive_idx[gather(sub_ctx, column_hash(sub, j))]
        out = np.zeros(n, dtype=bool)
        out[alive_idx] = True
        return out

    def _probe_all(self, values) -> tuple[np.ndarray, np.ndarray]:
        """Chunked probe: (hit (W,) bool, row_ids)."""
        self._consolidate()
        if self.spaced_seeds:
            hashes, rows = self._hash_batch(values)
            hit = np.empty(hashes.shape[0], dtype=bool)
            for s in range(0, hashes.shape[0], self.CHUNK):
                hit[s : s + self.CHUNK] = self._probe_bits(hashes[s : s + self.CHUNK])
            return hit, rows
        base, rows = self._base_hashes(values)
        hit = np.empty(base.shape[0], dtype=bool)
        for s in range(0, base.shape[0], self.CHUNK):
            hit[s : s + self.CHUNK] = self._probe_bits_base(base[s : s + self.CHUNK])
        return hit, rows

    def contains_batch(self, values) -> np.ndarray:
        """Whole-element probe: for k==0 one bool per string; for k>0 a
        bool per string that is True iff ALL its windows are present
        (reference containSeq's hits==total, testBloom_rolling.cpp:19-33)."""
        hit, rows = self._probe_all(values)
        n = len(values)
        if self.k == 0:
            return hit
        total = np.bincount(rows, minlength=n)
        hits = np.bincount(rows, weights=hit.astype(np.float64), minlength=n)
        return (total > 0) & (hits == total)

    def seen_fraction(self, values) -> np.ndarray:
        """Per string: fraction of its windows present (k>0 mode)."""
        hit, rows = self._probe_all(values)
        n = len(values)
        total = np.bincount(rows, minlength=n).astype(np.float64)
        hits = np.bincount(rows, weights=hit.astype(np.float64), minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(total > 0, hits / total, 0.0)
        return frac

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        self._consolidate()
        return self._probe_bits(hashes)

    # -- zero-copy Arrow probes ----------------------------------------
    def _probe_all_arrow(self, arr) -> tuple[np.ndarray, np.ndarray, int, np.ndarray | None]:
        self._consolidate()
        buf, offsets, null_mask = H.arrow_utf8_buffers(arr)
        if self.spaced_seeds:
            if self.canonical:
                hashes, rows, _ = H.hash_ngrams_multi_seed_canonical_from_buffers(
                    buf, offsets, self.spaced_seeds, seeds=self._seeds
                )
            else:
                hashes, rows = H.hash_ngrams_multi_seed_from_buffers(
                    buf, offsets, self.spaced_seeds, 1, seeds=self._seeds
                )
            hit = np.empty(hashes.shape[0], dtype=bool)
            for s in range(0, hashes.shape[0], self.CHUNK):
                hit[s : s + self.CHUNK] = self._probe_bits(hashes[s : s + self.CHUNK])
            return hit, rows, len(arr), null_mask
        if self.k > 0:
            if self.canonical:
                hb, rows = H.hash_ngrams_canonical_from_buffers(buf, offsets, self.k, 1, seeds=self._seeds)
            else:
                hb, rows = H.hash_ngrams_from_buffers(buf, offsets, self.k, 1, seeds=self._seeds)
            base = hb[:, 0]
        else:
            base = H.hash_strings_from_buffers(buf, offsets, 1, seeds=self._seeds)[:, 0]
            if null_mask is not None and base.size:
                base = base.copy()
                base[null_mask] = H.hash_strings([""], 1, seeds=self._seeds)[0, 0]
            rows = np.arange(len(arr), dtype=np.int64)
        hit = np.empty(base.shape[0], dtype=bool)
        for s in range(0, base.shape[0], self.CHUNK):
            hit[s : s + self.CHUNK] = self._probe_bits_base(base[s : s + self.CHUNK])
        return hit, rows, len(arr), null_mask

    def seen_fraction_arrow(self, arr) -> np.ndarray:
        """seen_fraction over an Arrow string array (no pandas strings)."""
        hit, rows, n, null_mask = self._probe_all_arrow(arr)
        if self.k == 0:
            out = np.zeros(n, dtype=np.float64)
            out[rows] = hit.astype(np.float64)
            return out
        if null_mask is not None and hit.size:
            keep = ~null_mask[rows]
            hit, rows = hit[keep], rows[keep]
        total = np.bincount(rows, minlength=n).astype(np.float64)
        hits = np.bincount(rows, weights=hit.astype(np.float64), minlength=n)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(total > 0, hits / total, 0.0)

    def contains_arrow(self, arr) -> np.ndarray:
        hit, rows, n, null_mask = self._probe_all_arrow(arr)
        if self.k == 0:
            out = np.zeros(n, dtype=bool)
            out[rows] = hit
            return out
        if null_mask is not None and hit.size:
            keep = ~null_mask[rows]
            hit, rows = hit[keep], rows[keep]
        total = np.bincount(rows, minlength=n)
        hits = np.bincount(rows, weights=hit.astype(np.float64), minlength=n)
        return (total > 0) & (hits == total)

    # -- merge algebra -------------------------------------------------
    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._require_compatible(other)
        self._consolidate()
        other._consolidate()
        np.bitwise_or(self._bits, other._bits, out=self._bits)
        self.n_entry += other.n_entry
        self.t_entry += other.t_entry
        return self

    union = merge

    @classmethod
    def bulk_merge(cls, payloads_params: list[tuple[dict, bytes]]) -> "BloomFilter":
        """Batched OR of many serialized partials: dense payloads OR
        directly; ALL sparse payloads concatenate into one scatter —
        ~10× cheaper than per-blob reconstruction when merging many
        low-fill partition sketches."""
        out = cls(**payloads_params[0][0])
        sparse_idx: list[np.ndarray] = []
        for params, payload in payloads_params:
            if params != payloads_params[0][0]:
                raise ValueError("incompatible bloom params in bulk merge")
            hdr = np.frombuffer(payload[:16], dtype=np.uint64)
            out.n_entry += int(hdr[0])
            out.t_entry += int(hdr[1])
            fmt = payload[16]
            body = payload[17:]
            if fmt == 0:
                dense = np.frombuffer(body, dtype=np.uint8)
                if dense.shape[0] != out.m_bits // 8:
                    raise ValueError("payload size mismatch")
                np.bitwise_or(out._bits, dense, out=out._bits)
            else:
                sparse_idx.append(np.frombuffer(body, dtype=np.uint32 if fmt == 1 else np.uint64))
        if sparse_idx:
            all_idx = np.concatenate(sparse_idx)
            # bool-scatter only below the same cap as everywhere else —
            # a 2^32-bit filter would otherwise allocate a 4 GiB bool
            # temporary PER CONCURRENT MERGE TASK
            if out.m_bits <= cls.DENSE_ACC_MAX_BITS:  # one bool scatter, then fold
                acc = np.zeros(out.m_bits, dtype=bool)
                acc[all_idx] = True
                np.bitwise_or(out._bits, np.packbits(acc, bitorder="little"), out=out._bits)
            else:
                bit_in = (all_idx & 7).astype(np.uint8)
                np.bitwise_or.at(out._bits, all_idx >> 3, cls._BIT_MASKS[bit_in])
        return out

    # -- slice-parallel merge (reduce-scatter) -------------------------
    # slice payload layout: [fmt u8][body]; fmt 0 = dense bytes of the
    # slice range, fmt 1 = uint32 bit-indices RELATIVE to slice start.

    def _slice_bounds(self, n_slices: int) -> np.ndarray:
        per = ((self.m_bits // 8) + n_slices - 1) // n_slices
        b = np.minimum(np.arange(n_slices + 1, dtype=np.int64) * per, self.m_bits // 8)
        return b

    def state_slices(self, n_slices: int) -> list[bytes]:
        self._consolidate()
        bounds = self._slice_bounds(n_slices)
        out = []
        for s in range(n_slices):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            chunk = self._bits[lo:hi]
            nzb = np.nonzero(chunk)[0]
            if nzb.size == 0:
                # untouched slice: 1-byte sparse blob, not dense zeros
                out.append(b"\x01")
                continue
            # sparse if clearly smaller (u32 relative indices)
            if nzb.size * 8 * 4 < chunk.size * 5:  # rough pop bound: ≤8 bits/byte
                sub = np.unpackbits(chunk[nzb][:, None], axis=1, bitorder="little")
                rows_, cols_ = np.nonzero(sub)
                idx = (nzb[rows_] * 8 + cols_).astype(np.uint32)
                if idx.size * 4 < chunk.size:
                    out.append(b"\x01" + idx.tobytes())
                    continue
            out.append(b"\x00" + chunk.tobytes())
        return out

    @classmethod
    def merge_slice_blobs(cls, params: dict, slice_idx: int, n_slices: int, blobs: list[bytes]) -> bytes:
        tmp = cls(**params)
        bounds = tmp._slice_bounds(n_slices)
        lo, hi = int(bounds[slice_idx]), int(bounds[slice_idx + 1])
        acc = np.zeros(hi - lo, dtype=np.uint8)
        sparse: list[np.ndarray] = []
        for b in blobs:
            if b[0] == 0:
                dense = np.frombuffer(b, dtype=np.uint8, offset=1)
                if dense.shape[0] != hi - lo:
                    raise ValueError("slice size mismatch")
                np.bitwise_or(acc, dense, out=acc)
            else:
                sparse.append(np.frombuffer(b, dtype=np.uint32, offset=1))
        if sparse:
            idx = np.concatenate(sparse)
            boolacc = np.zeros((hi - lo) * 8, dtype=bool)
            boolacc[idx] = True
            np.bitwise_or(acc, np.packbits(boolacc, bitorder="little"), out=acc)
        return acc.tobytes()

    @classmethod
    def assemble_slices(cls, params: dict, slices: list[bytes], n_entry: int, t_entry: int) -> "BloomFilter":
        out = cls(**params)
        out._bits = np.frombuffer(b"".join(slices), dtype=np.uint8).copy()
        if out._bits.shape[0] != out.m_bits // 8:
            raise ValueError("assembled slice sizes inconsistent")
        out.n_entry = int(n_entry)
        out.t_entry = int(t_entry)
        return out

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        self._require_compatible(other)
        self._consolidate()
        other._consolidate()
        out = type(self)(**self.params())
        np.bitwise_and(self._bits, other._bits, out=out._bits)
        return out

    # -- stats ---------------------------------------------------------
    def pop(self) -> int:
        """Set-bit count (getPop, BloomFilter.hpp:316-323).  Chunked
        LUT gather: a whole-array gather materializes a 2×-sized uint16
        temp and runs ~6× slower at GB scale."""
        self._consolidate()
        total = 0
        step = 1 << 24
        for s in range(0, self._bits.size, step):
            total += int(_POPCNT_LUT[self._bits[s : s + step]].sum())
        return total

    def fpr(self) -> float:
        return P.observed_fpr(self.pop(), self.m_bits, self.hash_num)

    def estimate_cardinality(self) -> float:
        """Distinct-element estimate from the fill level (Swamidass &
        Baldi 2007): n̂ = -(m/h)·ln(1 − X/m) with X = pop().  The
        inverse of the expected-fill law the reference's sizing
        formulas assume (BloomFilter.hpp:406-419) — a Bloom filter
        built for membership doubles as a coarse distinct counter
        with no extra state.  For windowed filters (k>0) the
        "elements" are k-gram windows, not input strings.  Saturated
        filters (X == m) have no finite estimate → inf."""
        import math

        x = self.pop()
        if x >= self.m_bits:
            return float("inf")
        return -(self.m_bits / self.hash_num) * math.log1p(-x / self.m_bits)

    def theoretical_fpr(self) -> float:
        return P.fpr_num_inserted(self.n_entry, self.m_bits, self.hash_num)

    def metrics(self) -> dict[str, Any]:
        pop = self.pop()
        return {"pop": pop, "fill": pop / self.m_bits, "n_entry": self.n_entry}

    # -- state ---------------------------------------------------------
    # Partial-sketch transport format: a sparsely-filled partition
    # serializes sorted set-bit indices (uint32/uint64) instead of the
    # dense array — at 100TB scale this cuts the blob shuffle volume by
    # the fill factor.  Dense reconstruction on load keeps the merge
    # algebra unchanged.  fmt: 0=dense, 1=sparse u32, 2=sparse u64.
    def state_bytes(self) -> bytes:
        self._consolidate()
        hdr = np.array([self.n_entry, self.t_entry], dtype=np.uint64).tobytes()
        idx_bytes = 4 if self.m_bits < (1 << 32) else 8
        # measured locally: blob transport (Arrow/persist) costs more
        # than sparse reconstruction's scatter, so prefer sparse
        # whenever it shrinks the blob meaningfully.  n_entry*h bounds
        # popcount from above — a proxy that avoids a popcount pass on
        # every partial serialization.
        pop_bound = min(self.n_entry * self.hash_num, self.m_bits)
        if pop_bound * idx_bytes < (self.m_bits // 8) * 0.6:
            # extract set-bit positions touching only nonzero bytes:
            # cost ∝ popcount, not m
            nzb = np.nonzero(self._bits)[0]
            sub = np.unpackbits(self._bits[nzb][:, None], axis=1, bitorder="little")
            rows_, cols_ = np.nonzero(sub)
            set_idx = nzb[rows_] * 8 + cols_
            if idx_bytes == 4:
                return hdr + b"\x01" + set_idx.astype(np.uint32).tobytes()
            return hdr + b"\x02" + set_idx.astype(np.uint64).tobytes()
        return hdr + b"\x00" + self._bits.tobytes()

    def load_state(self, payload: bytes) -> None:
        hdr = np.frombuffer(payload[:16], dtype=np.uint64)
        self.n_entry, self.t_entry = int(hdr[0]), int(hdr[1])
        fmt = payload[16]
        body = payload[17:]
        if fmt == 0:
            bits = np.frombuffer(body, dtype=np.uint8)
            if bits.shape[0] != self.m_bits // 8:
                raise ValueError("payload size mismatch")
            self._bits = bits.copy()
        else:
            idx = np.frombuffer(body, dtype=np.uint32 if fmt == 1 else np.uint64).astype(np.int64)
            self._bits = np.zeros(self.m_bits // 8, dtype=np.uint8)
            if self.m_bits <= self.DENSE_ACC_MAX_BITS:
                acc = np.zeros(self.m_bits, dtype=bool)
                acc[idx] = True
                self._bits = np.packbits(acc, bitorder="little")
            else:
                np.bitwise_or.at(
                    self._bits, idx >> 3, (np.uint8(1) << (idx & 7).astype(np.uint8)).astype(np.uint8)
                )
        self._acc = None


class BlockedBloomFilter(BloomFilter):
    """Register-blocked Bloom filter (Putze, Sanders & Singler, JEA
    2009): the seed-0 hash picks ONE ``block_bits``-bit block (default
    512 = one 64-byte cache line) and all ``hash_num`` bits land
    inside it, so a build touches one cache line per key instead of
    ``hash_num`` random lines — measured 7× faster build scatter at
    m = 2^30 in this engine's numpy kernel (8M keys into one array,
    far beyond LLC).  End-to-end caveat, measured honestly: at low
    fill the per-partial slice scan and the rolling-hash kernel
    dominate and the layouts tie; the scatter advantage governs when
    keys-per-executor is large relative to m — the actual 10^12-key
    regime (NOTES_r5 carries both measurements).

    The price is a known FPR penalty (block loads are Poisson, heavy
    blocks false-positive more): ``params.blocked_fpr`` is the
    analytic mixture bound the q108 gate checks; at equal m/n/h it is
    always ≥ the flat filter's rate and shrinks as ``block_bits``
    grows.

    Everything else — NTE64 fan-out, k-gram/canonical/spaced hashing,
    Arrow kernels, OR merges, reduce-scatter slices, the Sketch
    envelope, distributed build/probe — is inherited unchanged: the
    layout is confined to the two ``_positions_*`` hooks, and bitwise
    OR of equal-parameter blocked filters is exactly the blocked build
    of the union (same per-key bits).  Not storable in the reference
    ``.bf`` layout (no block field in that header — ``bfio.save_bloom``
    rejects it); use the generic envelope.
    """

    def __init__(self, m_bits: int, hash_num: int, k: int = 0, *, block_bits: int = 512, **kw):
        if block_bits <= 0 or block_bits % 64:
            raise ValueError("block_bits must be a positive multiple of 64")
        super().__init__(m_bits, hash_num, k, **kw)
        if self.m_bits % block_bits:
            raise ValueError("m_bits must be a multiple of block_bits")
        self.block_bits = int(block_bits)

    def params(self) -> dict[str, Any]:
        out = super().params()
        out["block_bits"] = self.block_bits
        return out

    @classmethod
    def for_capacity(cls, n: int, fpr: float, k: int = 0, hash_num: int | None = None, **kw) -> "BlockedBloomFilter":
        """Flat-formula sizing (the blocked penalty at B = 512 is a few
        tens of percent on FPR, not orders of magnitude); gate against
        ``params.blocked_fpr``, not the flat bound."""
        m, h = P.calc_optimal_size(n, fpr, hash_num)
        bb = int(kw.pop("block_bits", 512))
        m = ((m + bb - 1) // bb) * bb  # round up to whole blocks
        return cls(m, h, k, block_bits=bb, dfpr=fpr, **kw)

    @staticmethod
    def _fmix64(h: np.ndarray) -> np.ndarray:
        """MurmurHash3 fmix64 finalizer (public constants): the block
        selector must NOT share low bits with the in-block offsets —
        ``bVal % nb`` and ``bVal % B`` correlate (measured 3× the
        analytic FPR at B=512) because the NTE64 law keeps
        hVal[0] = bVal."""
        h = h ^ (h >> np.uint64(33))
        with np.errstate(over="ignore"):
            h = h * np.uint64(0xFF51AFD7ED558CCD)
            h = h ^ (h >> np.uint64(33))
            h = h * np.uint64(0xC4CEB9FE1A85EC53)
        return h ^ (h >> np.uint64(33))

    def _positions_matrix(self, hashes: np.ndarray) -> np.ndarray:
        bb = np.uint64(self.block_bits)
        nb = np.uint64(self.m_bits // self.block_bits)
        blk = (self._fmix64(hashes[:, 0]) % nb)[:, None] * bb  # seed-0 column, remixed
        np.remainder(hashes, bb, out=hashes)
        np.add(hashes, blk, out=hashes)
        return hashes

    def _column_context(self, base: np.ndarray):
        bb = np.uint64(self.block_bits)
        nb = np.uint64(self.m_bits // self.block_bits)
        return (self._fmix64(base) % nb) * bb  # block base, once per chunk

    def _positions_column(self, ctx, hi: np.ndarray) -> np.ndarray:
        return ctx + hi % np.uint64(self.block_bits)

    def theoretical_fpr(self) -> float:
        """Analytic blocked bound at the current insert count."""
        return P.blocked_fpr(self.n_entry, self.m_bits, self.hash_num, self.block_bits)
