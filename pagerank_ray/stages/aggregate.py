"""Skew-aware aggregation helpers (SURVEY.md §4.2(2), north_rule).

A bare ``groupby(key).count()/sum()`` shuffles every row and lands
every row of a hot key on ONE reducer. These helpers implement the
two standard mitigations:

* partial (combiner) aggregation — collapse each batch to one row per
  key inside ``map_batches`` BEFORE the shuffle, so the exchange
  carries per-batch partials, not rows;
* salted two-phase aggregation — spread each hot key over ``salt``
  sub-keys for the first shuffle, then combine the (tiny) per-salt
  partials in a second pass. Used when even the partial rows of a hot
  key would swamp one reducer (power-law in-degree at 10^12-edge
  scale).

In the PageRank/CC inner loops skew is already structurally handled —
the exchange is a dense per-partition segment sum, O(1) per edge
regardless of key heat — so these helpers serve the Dataset-level
operators (degree tables, heavy-hitter detection, ad-hoc analytics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def partial_count_batch(key: str):
    """Combiner: one (key, cnt) row per distinct key per batch."""

    def fn(t: pa.Table) -> pa.Table:
        vc = t.column(key).value_counts()
        return pa.table({key: vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    return fn


def grouped_count(ds, key: str, alias: str = "cnt"):
    """Partial-aggregated distributed count by ``key``.

    map_batches combiner -> small groupby(sum) shuffle. Returns a
    Dataset with columns (key, alias).
    """
    partial = ds.map_batches(partial_count_batch(key),
                             batch_format="pyarrow", zero_copy_batch=True)
    out = partial.groupby(key).sum("cnt")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({key: t.column(key),
                         alias: t.column("sum(cnt)")})

    return out.map_batches(rename, batch_format="pyarrow")


def salted_grouped_count(ds, key: str, salt: int = 16,
                         alias: str = "cnt"):
    """Two-phase salted count: groupby((key, hash%salt)) then
    groupby(key) over the per-salt partials.

    Deterministic salt from a stable hash of the key value (not
    Python's randomized hash), so re-runs shuffle identically.
    """

    def add_salt(t: pa.Table) -> pa.Table:
        vc = t.column(key).value_counts()
        keys = vc.field("values")
        cnts = pc.cast(vc.field("counts"), pa.int64())
        if pa.types.is_integer(keys.type):
            h = keys.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            # vectorized stable string hash (pandas siphash with its
            # fixed default key — process-independent, C-speed; the
            # salt assignment only shapes the shuffle, never values)
            import pandas as pd
            h = pd.util.hash_array(
                keys.to_numpy(zero_copy_only=False), categorize=False)
        return pa.table({key: keys, "cnt": cnts,
                         "salt_": pa.array(
                             (h % np.uint64(salt)).astype(np.int32))})

    phase1 = (ds.map_batches(add_salt, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby([key, "salt_"]).sum("cnt"))
    phase2 = phase1.groupby(key).sum("sum(cnt)")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({key: t.column(key),
                         alias: t.column("sum(sum(cnt))")})

    return phase2.map_batches(rename, batch_format="pyarrow")


def degree_histogram(ds, key: str, num_buckets: int = 32) -> pa.Table:
    """log2-bucketed histogram of group sizes — drives the decision of
    WHEN to salt (SURVEY.md §4.2(2): salt keys whose count exceeds the
    per-reducer budget).

    Bucketing happens inside map_batches over the grouped counts and
    only the <= num_buckets histogram rows reach the driver (the
    per-key count table itself can be as large as the key space)."""

    def bucketize(t: pa.Table) -> pa.Table:
        c = t.column("cnt").to_numpy()
        b = np.minimum(np.log2(np.maximum(c, 1)).astype(np.int32),
                       num_buckets - 1)
        return pa.table({"log2_bucket": pa.array(b, pa.int32())})

    rows = (grouped_count(ds, key)
            .map_batches(bucketize, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("log2_bucket").count().take_all())
    rows.sort(key=lambda r: r["log2_bucket"])
    return pa.table({
        "log2_bucket": pa.array([r["log2_bucket"] for r in rows],
                                pa.int32()),
        "num_keys": pa.array([r["count()"] for r in rows], pa.int64()),
    })
