"""Deterministic hashing primitives for dedup (MinHash, SimHash).

Everything here must be reproducible across processes and machines:
shingle hashing uses crc32 (zlib, C-speed) and token hashing blake2b —
never Python's salted ``hash()``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

MERSENNE61 = np.uint64((1 << 61) - 1)


def _m61_reduce(y: np.ndarray) -> np.ndarray:
    """y mod M61 for y < 2^64, via the Mersenne identity 2^61 ≡ 1."""
    y = (y >> np.uint64(61)) + (y & MERSENNE61)
    return np.where(y >= MERSENNE61, y - MERSENNE61, y)


def _mulmod_m61(a: np.ndarray, h: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a·h + b) mod M61 without uint64 overflow (a < 2^61, h < 2^32).

    Not on the hot path (MinHasher's 32-bit multiplier family needs
    only one reduction) — kept as the full-width reference that the
    property suite cross-checks the fast path against
    (tests/test_properties.py::test_mulmod_m61_full_width_vs_fast_path).

    Split a = a_hi·2^32 + a_lo: a·h = a_hi·h·2^32 + a_lo·h, with
    a_hi·h < 2^61 and a_lo·h < 2^64 both representable; the ·2^32
    term reduces via 2^61 ≡ 1 (mod M61). A naive (a*h+b) % M61 in
    uint64 silently wraps mod 2^64 first and is NOT the universal
    hash family.
    """
    a = a.astype(np.uint64)
    h = h.astype(np.uint64)
    a_hi = a >> np.uint64(32)
    a_lo = a & np.uint64(0xFFFFFFFF)
    t = a_hi * h                                   # < 2^61
    # t·2^32 mod M61 = (t >> 29) + ((t & (2^29-1)) << 32)  (mod M61)
    hi_term = (t >> np.uint64(29)) + \
        ((t & np.uint64((1 << 29) - 1)) << np.uint64(32))
    hi_term = _m61_reduce(hi_term)
    lo_term = _m61_reduce(a_lo * h)
    out = _m61_reduce(hi_term + lo_term)
    return _m61_reduce(out + b.astype(np.uint64))


def word_shingles(text: str, n: int = 3) -> list[str]:
    """Whitespace word n-grams joined by single spaces (DuckDB-parity:
    string_split_regex(text,'\\s+') n-grams)."""
    words = text.split()
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct crc32 hashes of the document's word n-grams (uint64)."""
    sh = {zlib.crc32(s.encode("utf-8")) for s in word_shingles(text, n)}
    return np.fromiter(sh, dtype=np.uint64, count=len(sh))


class MinHasher:
    """128-permutation MinHash over crc32 shingle hashes.

    Universal hashing sig_p = min((a_p·h + b_p) mod M61) — a_p/b_p
    drawn from a fixed seed so signatures merge across batches/nodes.
    Stateful map_batches class: permutation tables built once per actor.
    """

    def __init__(self, num_perm: int = 128, n: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        # multipliers drawn from [1, 2^32): with 32-bit shingle hashes
        # a·h < 2^64 needs no split-multiply — one Mersenne reduction
        # per term instead of four (2x faster signatures); still a
        # (smaller) universal family over Z_M61
        self.a = rng.randint(1, 1 << 32, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1,
                             size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.n = n

    def signature(self, text: str) -> np.ndarray:
        h = shingle_hashes(text, self.n)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # a < 2^32 and h < 2^32: a*h fits uint64 exactly
        t = _m61_reduce(self.a[:, None] * h[None, :])
        m = _m61_reduce(t + self.b[:, None])
        return m.min(axis=1)

    def __call__(self, batch):
        import pyarrow as pa
        texts = batch.column("text").to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) \
            if texts else np.zeros((0, self.num_perm), dtype=np.uint64)
        flat = pa.array(sigs.reshape(-1).view(np.int64))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "minhash": pa.FixedSizeListArray.from_arrays(
                flat, self.num_perm),
        })


_MINHASHER_CACHE: dict = {}


def minhash_batch(batch, num_perm: int = 128, n: int = 3,
                  seed: int = 42):
    """Stateless-task form of MinHasher (process-cached permutation
    tables, keyed by the parameters): lets Ray Data scale it as plain
    tasks with the cluster CPU count instead of a fixed actor pool —
    the permutation build is microseconds, not model-load-class
    state."""
    key = (num_perm, n, seed)
    h = _MINHASHER_CACHE.get(key)
    if h is None:
        h = _MINHASHER_CACHE[key] = MinHasher(num_perm, n, seed)
    return h(batch)


def band_keys(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """LSH banding: one stable uint64 key per band (blake2b of the
    band's rows)."""
    rows = len(sig) // num_bands
    keys = np.empty(num_bands, dtype=np.uint64)
    for b in range(num_bands):
        chunk = sig[b * rows:(b + 1) * rows].tobytes()
        keys[b] = np.frombuffer(
            hashlib.blake2b(chunk, digest_size=8).digest(),
            dtype=np.uint64)[0]
    return keys


def token_hashes64(text: str) -> np.ndarray:
    """Stable 64-bit hash per whitespace token: first 8 bytes of
    sha256(token), little-endian.

    sha256 (not blake2b) so the DuckDB conformance oracle can compute
    the IDENTICAL value in SQL (`sha256()` exists there; blake2b does
    not) — the simhash driver query is hash-checked end-to-end against
    it."""
    toks = text.split()
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        out[i] = np.frombuffer(
            hashlib.sha256(t.encode("utf-8")).digest()[:8],
            dtype=np.uint64)[0]
    return out


def simhash64(text: str) -> np.uint64:
    """Classic 64-bit SimHash over token hashes (unit weights)."""
    h = token_hashes64(text)
    if len(h) == 0:
        return np.uint64(0)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two distinct-hash sets."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0
