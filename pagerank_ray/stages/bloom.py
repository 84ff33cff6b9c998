"""Bloom-filter join pruning — the selective-join scale pattern.

At 100 TB the dominant cost of a selective inner join is shuffling the
BIG side. A Bloom filter built from the small side's keys (one
streaming scan, mergeable bitwise-OR sketches) is broadcast once with
``ray.put``; a vectorized membership filter then prunes non-matching
big-side rows BEFORE the shuffle, so the exchange carries only
(true matches + the fp_rate sliver of false positives). False
positives only let extra rows through — the exact hash join after the
filter removes them — so the result is IDENTICAL to the unpruned
join; the filter is pure traffic reduction.

Hashing is deterministic splitmix64 with Kirsch-Mitzenmacher double
hashing (probe_i = h1 + i*h2 mod m), so filters built on different
workers/batch orders are bit-identical after merge.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

from ..functions.sketch import splitmix64


class BloomFilter:
    """Bloom filter over int64/uint64 keys; bits in a uint64 word
    array (mergeable with bitwise OR — batch-order-independent)."""

    def __init__(self, num_bits: int, num_hashes: int):
        # round bits up to a whole word
        self.m = ((num_bits + 63) // 64) * 64
        self.k = num_hashes
        self.words = np.zeros(self.m // 64, dtype=np.uint64)

    @classmethod
    def from_sizing(cls, n_keys: int, fp_rate: float = 0.01
                    ) -> "BloomFilter":
        n = max(1, n_keys)
        m = int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def _probes(self, v: np.ndarray) -> np.ndarray:
        """(k, len(v)) bit indices via double hashing."""
        h1 = splitmix64(v)
        h2 = splitmix64(h1 ^ np.uint64(0xA5A5A5A5A5A5A5A5))
        h2 |= np.uint64(1)  # odd stride -> full cycle
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :])
                    % np.uint64(self.m)).astype(np.int64)

    def add(self, v: np.ndarray) -> None:
        if len(v) == 0:
            return
        idx = self._probes(np.asarray(v)).ravel()
        np.bitwise_or.at(self.words, idx >> 6,
                         np.uint64(1) << (idx & 63).astype(np.uint64))

    def contains(self, v: np.ndarray) -> np.ndarray:
        """Vectorized membership test -> bool mask."""
        if len(v) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._probes(np.asarray(v))
        bit = (self.words[idx >> 6] >>
               (idx & 63).astype(np.uint64)) & np.uint64(1)
        return (bit == 1).all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, num_hashes: int) -> "BloomFilter":
        words = np.frombuffer(b, dtype=np.uint64).copy()
        f = cls(len(words) * 64, num_hashes)
        f.words = words
        return f


def build_bloom(ds, column: str, n_expected: int,
                fp_rate: float = 0.01) -> BloomFilter:
    """One Bloom filter over ``column`` of ``ds``: per-batch sketches
    inside map_batches (only m/8-byte sketch rows cross the wire,
    never the keys), OR-merged first in a DISTRIBUTED level (one
    merged blob per ~64 input sketches after a coalescing
    repartition) so the driver folds O(blocks/64) blobs, not one per
    input batch."""
    proto = BloomFilter.from_sizing(n_expected, fp_rate)
    m, k = proto.m, proto.k

    def sketch_batch(t: pa.Table) -> pa.Table:
        f = BloomFilter(m, k)
        f.add(t.column(column).to_numpy(zero_copy_only=False))
        return pa.table({"bloom": pa.array([f.to_bytes()], pa.binary())})

    def merge_batch(t: pa.Table) -> pa.Table:
        words = np.zeros(m // 64, dtype=np.uint64)
        for b in t.column("bloom"):
            np.bitwise_or(words, np.frombuffer(b.as_py(), np.uint64),
                          out=words)
        return pa.table({"bloom": pa.array([words.tobytes()],
                                           pa.binary())})

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    reduced = sketches.repartition(8).map_batches(
        merge_batch, batch_size=64, batch_format="pyarrow",
        zero_copy_batch=True)
    out = proto
    for row in reduced.take_all():
        out.merge(BloomFilter.from_bytes(row["bloom"], k))
    return out


class BloomPrune:
    """Actor-pool stage: broadcast filter fetched once per actor in
    __init__ (ray.put upstream), vectorized membership filter per
    batch."""

    def __init__(self, bloom_ref, column: str, num_hashes: int):
        raw = ray.get(bloom_ref) if isinstance(
            bloom_ref, ray.ObjectRef) else bloom_ref
        self.f = BloomFilter.from_bytes(raw, num_hashes)
        self.column = column

    def __call__(self, t: pa.Table) -> pa.Table:
        keep = self.f.contains(
            t.column(self.column).to_numpy(zero_copy_only=False))
        return t.filter(pa.array(keep))


def bloom_prune(ds, bloom: BloomFilter, column: str,
                concurrency=(1, 8)):
    """Filter ``ds`` to rows whose ``column`` MIGHT be in ``bloom``
    (no false negatives). ray.put once; actors read zero-copy."""
    ref = ray.put(bloom.to_bytes())
    return ds.map_batches(BloomPrune,
                          fn_constructor_args=(ref, column, bloom.k),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=concurrency)
