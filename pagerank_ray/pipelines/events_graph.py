"""Derive a deterministic link graph from the ``events`` table.

Edge rule (FIXTURES.md F6): within each event_type, order events by
(ts, event_id); each event's user links to the NEXT event's user of
the same type: user_id -> next user_id. SQL-expressible with a lead()
window, which is the DuckDB oracle for the driver contract.

Node names are stringified user ids so the graph layer's string node
model applies unchanged.

Scale shape: the groupby key is (event_type, time_bucket) — NOT bare
event_type, which would funnel every event of a type through one
group (5 unbounded groups at 100 TB). Buckets parallelize freely;
the only cross-bucket pairs are each bucket's last event -> the next
non-empty bucket's first event, stitched in one extra pass over the
per-group boundary rows (one row per group — metadata-scale).
Bucketing by ts is ORDER-SAFE: equal timestamps share a bucket, so
the (ts, event_id) tiebreak never spans a boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_US_PER_HOUR = 3600 * 1_000_000


def edges_from_events(sf_dir: str, bucket_hours: int = 1):
    """-> Dataset of (src, dst) string edges."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    width = bucket_hours * _US_PER_HOUR

    def add_bucket(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy()
        return t.append_column("bucket", pa.array(us // width))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True)

    def consecutive(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        u = g["user_id"].to_numpy()
        # boundary row: this group's first/last user, for the stitch
        # pass (src == "" marks it; user ids are stringified ints so
        # "" never collides with a real node name)
        et = g["event_type"].iloc[0]
        b = int(g["bucket"].iloc[0])
        edges = pd.DataFrame({
            "src": u[:-1].astype(str) if len(u) > 1
            else pd.Series([], dtype="string"),
            "dst": u[1:].astype(str) if len(u) > 1
            else pd.Series([], dtype="string"),
        })
        marker = pd.DataFrame({
            "src": pd.Series([""], dtype="string"),
            "dst": pd.Series([f"{et}\t{b}\t{u[0]}\t{u[-1]}"],
                             dtype="string"),
        })
        return pd.concat([edges, marker], ignore_index=True)

    grouped = bucketed.groupby(["event_type", "bucket"]).map_groups(
        consecutive, batch_format="pandas")

    def split_markers(t: pa.Table) -> pa.Table:
        # pass real edges through; re-encode markers on a side column
        is_marker = np.asarray(
            t.column("src").to_numpy(zero_copy_only=False)) == ""
        return t.append_column("is_marker", pa.array(is_marker))

    tagged = grouped.map_batches(split_markers,
                                 batch_format="pyarrow").materialize()

    edges = tagged.filter(expr="is_marker == False") \
        .drop_columns(["is_marker"])

    # stitch pass: boundary rows only (one per (type, bucket) group)
    markers = tagged.filter(expr="is_marker == True").take_all()
    by_type: dict[str, list[tuple[int, str, str]]] = {}
    for r in markers:
        et, b, first_u, last_u = r["dst"].split("\t")
        by_type.setdefault(et, []).append((int(b), first_u, last_u))
    src_out, dst_out = [], []
    for et, rows in by_type.items():
        rows.sort()
        for (_, _, last_u), (_, first_u, _) in zip(rows, rows[1:]):
            src_out.append(last_u)
            dst_out.append(first_u)
    boundary = rd.from_arrow(pa.table({
        "src": pa.array(src_out, pa.string()),
        "dst": pa.array(dst_out, pa.string())}))
    return edges.union(boundary)


EDGES_FROM_EVENTS_SQL = """
SELECT CAST(user_id AS VARCHAR) AS src,
       CAST(next_user AS VARCHAR) AS dst
FROM (
    SELECT user_id,
           lead(user_id) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id) AS next_user
    FROM events
)
WHERE next_user IS NOT NULL
"""
