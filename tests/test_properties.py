"""Property-based tests (hypothesis) for the core laws:
rolling-hash == from-scratch fold on arbitrary unicode, Bloom merge
associativity/commutativity on arbitrary partitionings, sizing-formula
invariants over the (n, fpr) grid (SURVEY §5 item 7)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from btl_bloomfilter_spark import params as P
from btl_bloomfilter_spark.functions import hashing as H
from btl_bloomfilter_spark.operators.bloom import BloomFilter


def _naive_window_hash(data: bytes, start: int, k: int, seeds) -> int:
    h = 0
    for j in range(k):
        s = int(seeds[data[start + j]])
        r = (k - 1 - j) % 64
        h ^= ((s << r) | (s >> (64 - r))) & 0xFFFFFFFFFFFFFFFF if r else s
    return h


@settings(max_examples=40, deadline=None)
@given(
    strings=st.lists(st.text(max_size=60), min_size=1, max_size=8),
    k=st.integers(min_value=1, max_value=12),
)
def test_rolling_hash_matches_naive_any_unicode(strings, k):
    hashes, rows = H.hash_ngrams(strings, k, 1)
    seeds = H.seed_table()
    expect, erow = [], []
    for si, s in enumerate(strings):
        data = s.encode("utf-8", "surrogatepass")
        for t in range(len(data) - k + 1):
            expect.append(_naive_window_hash(data, t, k, seeds))
            erow.append(si)
    assert rows.tolist() == erow
    assert [int(x) for x in hashes[:, 0]] == expect


@settings(max_examples=25, deadline=None)
@given(
    items=st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=59), max_size=4),
    perm_seed=st.integers(min_value=0, max_value=1000),
)
def test_bloom_merge_partition_invariance(items, cuts, perm_seed):
    """Any partitioning + any merge order == serial build, bit-exact."""
    mk = lambda: BloomFilter(1 << 12, 3, 0)
    serial = mk()
    serial.update(items)
    bounds = sorted({0, len(items), *[c % (len(items) + 1) for c in cuts]})
    chunks = [items[a:b] for a, b in zip(bounds, bounds[1:]) if b > a] or [items]
    partials = []
    for c in chunks:
        p = mk()
        p.update(c)
        partials.append(p)
    order = np.random.default_rng(perm_seed).permutation(len(partials))
    acc = mk()
    for i in order:
        acc.merge(partials[i])
    np.testing.assert_array_equal(acc.bits, serial.bits)
    assert acc.n_entry == serial.n_entry


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=10, max_value=10**8),
    fpr=st.floats(min_value=1e-8, max_value=0.5),
)
def test_sizing_invariants(n, fpr):
    m, h = P.calc_optimal_size(n, fpr)
    assert m % 64 == 0 and m > 0 and h >= 1
    # at the chosen geometry the theoretical FPR meets the target
    assert P.fpr_num_inserted(n, m, h) <= fpr * 1.02
    # FPR is monotone in inserts
    assert P.fpr_num_inserted(n, m, h) >= P.fpr_num_inserted(max(n // 2, 1), m, h)


@settings(max_examples=150, deadline=None)
@given(
    rows=st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
            max_size=40,
        ),
        max_size=12,
    )
)
def test_tokenize_buffers_matches_str_split_property(rows):
    """Vectorized tokenizer == str.split() for any unicode rows whose
    whitespace is ASCII (str.split also splits on unicode whitespace,
    which the byte tokenizer deliberately does not — normalize those
    out of the comparison)."""
    uni_ws = [c for c in set("".join(rows)) if c.isspace() and ord(c) > 127]
    for c in uni_ws:
        rows = [r.replace(c, "_") for r in rows]
    buf, offsets = H._flatten_utf8(rows)
    starts, ends, tok_rows = H.tokenize_buffers(buf, offsets)
    got: dict[int, list[str]] = {}
    for s, e, r in zip(starts, ends, tok_rows):
        got.setdefault(int(r), []).append(bytes(buf[s:e]).decode("utf-8", "surrogatepass"))
    for i, row in enumerate(rows):
        assert got.get(i, []) == row.split(), (i, row)


@settings(max_examples=100, deadline=None)
@given(
    toks=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=5), min_size=1, max_size=20),
    n=st.integers(min_value=1, max_value=4),
)
def test_token_ngram_fold_injective_on_position(toks, n):
    """Gram hashes depend only on the token-hash window content: the
    same token list hashed twice (different flat offsets) agrees."""
    th = H.hash_strings(toks + toks, 1)[:, 0]
    offs = np.array([0, len(toks), 2 * len(toks)], dtype=np.int64)
    base, rows = H.hash_token_ngrams_from_hashes(th, offs, n)
    a = base[rows == 0]
    b = base[rows == 1]
    np.testing.assert_array_equal(a, b)


@settings(max_examples=30, deadline=None)
@given(data=st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=50))
def test_nte64_matches_python_ints(data):
    arr = np.array(data, dtype=np.uint64)
    out = H.nte64(arr, 4, k=7)
    M = (1 << 64) - 1
    for r, base in enumerate(data):
        assert int(out[r, 0]) == base
        for i in range(1, 4):
            t = (base * ((i ^ (7 * 0x90B45D39FB6DA1FA)) & M)) & M
            t ^= t >> 27
            assert int(out[r, i]) == t
