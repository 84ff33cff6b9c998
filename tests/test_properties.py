"""Property-based tests (hypothesis) for scalar/batch functions."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pagerank_ray.functions.hashing import (MinHasher, hamming64, jaccard,
                                            shingle_hashes, simhash64)
from pagerank_ray.functions.query import (satisfies_query_batch,
                                          url_satisfies_query)
from pagerank_ray.functions.text import fingerprint64, token_count

urls = st.text(alphabet="abcdef./-:_0123456789", min_size=0, max_size=40)
terms = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=6).map(
        lambda s: s if len(s) % 2 else "-" + s),
    min_size=0, max_size=5)


@given(urls, terms)
@settings(max_examples=200, deadline=None)
def test_predicate_vectorized_equals_scalar(url, term_list):
    query = " ".join(term_list)
    scalar = url_satisfies_query(url, query)
    vec = satisfies_query_batch(pa.array([url]), query).to_pylist()[0]
    assert vec is scalar


@given(urls)
@settings(max_examples=100, deadline=None)
def test_empty_query_always_matches(url):
    assert url_satisfies_query(url, "") is True


@given(urls, st.text(alphabet="abcdef", min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_negation_overrides(url, term):
    # if a negated term is present in the url, result is always False
    if term in url:
        assert url_satisfies_query(url, f"xyzzy -{term}") is False


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_fingerprint_deterministic(text):
    a = fingerprint64([text, text])
    assert a[0] == a[1]
    b = fingerprint64([text])
    assert b[0] == a[0]


@given(st.lists(st.text(alphabet="abc ", max_size=30), min_size=1,
                max_size=10))
@settings(max_examples=100, deadline=None)
def test_token_count_matches_python_split(texts):
    got = token_count(pa.array(texts, pa.string())).to_pylist()
    assert got == [len(t.split()) for t in texts]


@given(st.text(alphabet="abcd efg", min_size=0, max_size=120))
@settings(max_examples=100, deadline=None)
def test_simhash_identical_text_distance_zero(text):
    a = simhash64(text)
    b = simhash64(text)
    assert hamming64(np.array([a]), np.array([b]))[0] == 0


@given(st.integers(0, 2**30), st.integers(0, 2**30))
@settings(max_examples=100, deadline=None)
def test_hamming_symmetry(a, b):
    x = np.array([a], dtype=np.uint64)
    y = np.array([b], dtype=np.uint64)
    assert hamming64(x, y)[0] == hamming64(y, x)[0]
    assert hamming64(x, x)[0] == 0


@given(st.lists(st.sampled_from(
    ["alpha beta gamma delta", "alpha beta gamma epsilon",
     "one two three four five", "alpha beta gamma delta epsilon"]),
    min_size=2, max_size=2, unique=True))
@settings(max_examples=20, deadline=None)
def test_minhash_estimates_jaccard(pair):
    """128-perm MinHash estimate within 0.25 of exact Jaccard."""
    mh = MinHasher(num_perm=128)
    s0 = mh.signature(pair[0])
    s1 = mh.signature(pair[1])
    est = float(np.mean(s0 == s1))
    a = np.sort(shingle_hashes(pair[0]))
    b = np.sort(shingle_hashes(pair[1]))
    exact = jaccard(a, b)
    assert abs(est - exact) <= 0.25


@given(st.integers(0, (1 << 61) - 2), st.integers(1, (1 << 32) - 1),
       st.integers(0, (1 << 61) - 2))
@settings(max_examples=200, deadline=None)
def test_mulmod_m61_full_width_vs_fast_path(a, h, b):
    """_mulmod_m61 (split-multiply, any a < 2^61) equals exact integer
    arithmetic, and the MinHasher fast path (single reduction, a < 2^32)
    agrees with it on its domain — keeps the full-width helper honest."""
    from pagerank_ray.functions.hashing import (_m61_reduce, _mulmod_m61,
                                                MERSENNE61)
    M = (1 << 61) - 1
    got = int(_mulmod_m61(np.array([a], dtype=np.uint64),
                          np.array([h], dtype=np.uint64),
                          np.array([b], dtype=np.uint64))[0])
    assert got == (a * h + b) % M
    if a < (1 << 32):
        t = _m61_reduce(np.array([a], dtype=np.uint64)
                        * np.uint64(h))
        fast = int(_m61_reduce(t + np.uint64(b) % MERSENNE61)[0])
        assert fast % M == (a * h + b) % M


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(
        st.sets(st.integers(0, 2**32 - 1), max_size=40),
        st.sets(st.integers(0, 2**32 - 1), max_size=40)),
    min_size=0, max_size=12))
def test_tagged_set_intersections_matches_intersect1d(rows):
    """The one-sort batch intersection equals per-row np.intersect1d
    for arbitrary distinct uint32 sets (incl. empty sets/batches)."""
    from pagerank_ray.functions.vectors import tagged_set_intersections

    sets_a = [np.sort(np.fromiter(a, np.uint32, len(a))) for a, _ in rows]
    sets_b = [np.sort(np.fromiter(b, np.uint32, len(b))) for _, b in rows]
    va = np.concatenate(sets_a) if sets_a else np.empty(0, np.uint32)
    vb = np.concatenate(sets_b) if sets_b else np.empty(0, np.uint32)
    la = np.array([len(x) for x in sets_a], np.int64)
    lb = np.array([len(x) for x in sets_b], np.int64)
    got = tagged_set_intersections(va, la, vb, lb, len(rows))
    want = np.array([len(np.intersect1d(x, y, assume_unique=True))
                     for x, y in zip(sets_a, sets_b)], np.int64)
    assert np.array_equal(got, want)


@given(st.integers(1, 500), st.integers(1, 20))
@settings(max_examples=200, deadline=None)
def test_ntile_block_formula_matches_definition(n, k):
    """The PRODUCTION closed-form bucket assignment
    (warehouse._ntile_buckets) == NTILE's definition (first n % k
    buckets get ceil(n/k) rows, the rest floor) for every rank,
    regardless of how rows split into blocks."""
    import numpy as np

    from pagerank_ray.pipelines.warehouse import _ntile_buckets

    r = np.arange(1, n + 1, dtype=np.int64)
    got = _ntile_buckets(r, n, k)
    # direct definition: concatenate the bucket sizes
    q, m = n // k, n % k
    sizes = [q + 1] * m + [q] * (k - m)
    want = np.repeat(np.arange(1, k + 1, dtype=np.int64), sizes)[:n]
    assert (got == want).all()
