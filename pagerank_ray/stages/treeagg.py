"""Shuffle-free tree aggregation for associative integer reductions.

Ray Data's hash/sort groupby pays ~μs-scale per-row shuffle constants
— measured 124 s for a min() over 26.5M tiny rows at 32 cpus
(graph/walks.py:lexmin_per_key's motivating case) — while the same
exact result falls out of repeated POSITIONAL ``repartition`` +
vectorized batch reduction in seconds: positional coalescing moves
BLOCKS, not keyed rows, and every level shrinks toward the distinct
key count.

``treesum_per_key`` is the SUM instance (exact for int64; addition is
associative and commutative, so combine order is irrelevant — no
float-reduction-order caveat). The tree runs while the surviving row
count fits one worker block (``max_rows``); beyond that the standard
groupby-sum shuffle runs instead, so exactness holds at any scale.

graph/walks.py:lexmin_per_key is the argmin instance of the same
pattern (it needs a tie-break join in its shuffle fallback, so it
stays specialized there).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_I64 = pa.int64()

TREE_MAX_ROWS = 64_000_000
_TREE_FAN = 8


def _batch_sum(keys: list, val: str):
    """Batch-local sum of ``val`` per key tuple (argsort + reduceat)."""
    def comb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: pa.array([], _I64) for k in keys},
                             val: pa.array([], _I64)})
        kcols = [t.column(k).to_numpy(zero_copy_only=False)
                 for k in keys]
        v = t.column(val).to_numpy(zero_copy_only=False)
        order = np.lexsort(tuple(kcols[::-1]))
        kcols = [k[order] for k in kcols]
        v = v[order]
        first = np.empty(len(v), dtype=bool)
        first[0] = True
        first[1:] = False
        for k in kcols:
            first[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(v, starts)
        return pa.table({**{kn: pa.array(kc[starts])
                            for kn, kc in zip(keys, kcols)},
                         val: pa.array(sums.astype(np.int64))})
    return comb


def treesum_per_key(ds, key_cols: tuple = ("key",), val: str = "f"):
    """Exact global int64 SUM of ``val`` per key tuple. Returns a
    Dataset (*key_cols, val) with one row per key. See module
    docstring for the tree-vs-shuffle strategy."""
    keys = list(key_cols)
    comb = _batch_sum(keys, val)

    cur = ds.map_batches(comb, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    while cur.num_blocks() > 1:
        if cur.count() > TREE_MAX_ROWS:
            return _sum_shuffle(cur, keys, val)
        cur = (cur.repartition(
            max(1, cur.num_blocks() // _TREE_FAN))
            .map_batches(comb, batch_format="pyarrow",
                         zero_copy_batch=True).materialize())
    return cur


def _sum_shuffle(ds, keys: list, val: str):
    """groupby-sum fallback for key sets too big for one block."""
    def _rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: pa.array([], _I64) for k in keys},
                             val: pa.array([], _I64)})
        return pa.table({**{k: t.column(k) for k in keys},
                         val: t.column(f"sum({val})").cast(_I64)})

    return ds.groupby(keys).sum(val).map_batches(
        _rename, batch_format="pyarrow", zero_copy_batch=True)
