"""Derive a deterministic link graph from the ``events`` table.

Edge rule (FIXTURES.md F6): within each event_type, order events by
(ts, event_id); each event's user links to the NEXT event's user of
the same type: user_id -> next user_id. SQL-expressible with a lead()
window, which is the DuckDB oracle for the driver contract.

Node names are stringified user ids so the graph layer's string node
model applies unchanged.

Scale shape — distributed lead(): one range-partitioned SORT by
(event_type, ts, event_id), then a VECTORIZED per-block pass emitting
consecutive-pair edges where the type doesn't change, then a stitch
pass joining each block's last row to the next block's first row
(same type only). Per-block boundary rows are one row per block —
metadata-scale — so no per-group Python calls anywhere (the round-1
version funneled each event_type through one unbounded pandas group;
the round-2a version made one Python call per (type, hour) bucket).
The sort key is a total order (event_id is unique), so the output is
deterministic and identical across block layouts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


@ray.remote
def _block_edges(block: pa.Table):
    """Edges inside one sorted block + its (first, last) boundary rows.

    Returns (edge_table, first_type, first_user, last_type, last_user)
    — boundary info is O(1) per block."""
    et = block.column("event_type").to_numpy(zero_copy_only=False)
    u = block.column("user_id").to_numpy()
    if len(u) == 0:
        return (pa.table({"src": pa.array([], pa.string()),
                          "dst": pa.array([], pa.string())}),
                None, None, None, None)
    same = et[:-1] == et[1:]
    src = u[:-1][same]
    dst = u[1:][same]
    tbl = pa.table({
        "src": pa.array(src.astype(str), pa.string()),
        "dst": pa.array(dst.astype(str), pa.string()),
    })
    return (tbl, str(et[0]), int(u[0]), str(et[-1]), int(u[-1]))


def edges_from_events(sf_dir: str):
    """-> Dataset of (src, dst) string edges."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    # event_id is unique -> the sort key is a total order; Ray's sort
    # range-partitions into globally ordered blocks
    sorted_ds = ds.sort(["event_type", "ts", "event_id"]).materialize()
    block_refs = [ref for bundle in sorted_ds.iter_internal_ref_bundles()
                  for ref, _ in bundle.blocks]
    results = [_block_edges.options(num_returns=5).remote(b)
               for b in block_refs]
    edge_refs = [r[0] for r in results]
    bounds = ray.get([x for r in results for x in r[1:]])

    # stitch: block i's last row -> block i+1's first row, same type
    # only (one candidate pair per block boundary — metadata-scale)
    src_out, dst_out = [], []
    prev_type = prev_user = None
    for i in range(0, len(bounds), 4):
        ft, fu, lt, lu = bounds[i:i + 4]
        if ft is None:
            continue  # empty block: carry prev through
        if prev_type is not None and prev_type == ft:
            src_out.append(str(prev_user))
            dst_out.append(str(fu))
        prev_type, prev_user = lt, lu
    boundary = rd.from_arrow(pa.table({
        "src": pa.array(src_out, pa.string()),
        "dst": pa.array(dst_out, pa.string())}))
    return rd.from_arrow_refs(edge_refs).union(boundary)


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


@ray.remote
def _block_transitions(block: pa.Table):
    """Per-block (prev_type, next_type) partial counts + (first, last)
    boundary rows — the _block_edges discipline with user/type roles
    swapped (sorted by user, pairs within a user are type→type)."""
    import pyarrow.compute as pc
    u = block.column("user_id").to_numpy()
    empty = pa.table({"prev_type": pa.array([], pa.string()),
                      "next_type": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if len(u) == 0:
        return (empty, None, None, None, None)
    et = block.column("event_type").combine_chunks()
    same = u[1:] == u[:-1]
    idx = pa.array(np.flatnonzero(same))
    pairs = pa.table({
        "prev_type": et.take(idx),
        "next_type": et.take(pc.add(idx, pa.scalar(1, pa.int64())))})
    g = pairs.group_by(["prev_type", "next_type"]).aggregate(
        [("prev_type", "count")])
    tbl = pa.table({"prev_type": g.column("prev_type"),
                    "next_type": g.column("next_type"),
                    "cnt": g.column("prev_type_count").cast(pa.int64())})
    first_t = et[0].as_py()
    last_t = et[len(et) - 1].as_py()
    return (tbl, int(u[0]), first_t, int(u[-1]), last_t)


def transition_counts(sf_dir: str) -> pa.Table:
    """Per-user event-type transition counts — the Markov-chain /
    sequence-modeling sufficient statistics: within each user's
    (ts, event_id)-ordered stream, count each consecutive
    (prev_type → next_type) pair. Returns (prev_type, next_type, cnt)
    sorted, exact int64; row count is at most |types|².

    Scale shape: the edges_from_events distributed-lead discipline —
    one range-partitioned SORT by (user_id, ts, event_id), a
    vectorized per-block pair pass emitting PRE-AGGREGATED partial
    counts (the shuffle carries ≤ types² rows per block), an O(blocks)
    driver stitch of boundary pairs, one tiny groupby."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    sorted_ds = ds.sort(["user_id", "ts", "event_id"]).materialize()
    block_refs = [ref for bundle in sorted_ds.iter_internal_ref_bundles()
                  for ref, _ in bundle.blocks]
    results = [_block_transitions.options(num_returns=5).remote(b)
               for b in block_refs]
    cnt_refs = [r[0] for r in results]
    bounds = ray.get([x for r in results for x in r[1:]])

    prev_rows, next_rows = [], []
    prev_user = prev_type = None
    for i in range(0, len(bounds), 4):
        fu, ft, lu, lt = bounds[i:i + 4]
        if ft is None:
            continue  # empty block: carry prev through
        if prev_user is not None and prev_user == fu:
            prev_rows.append(prev_type)
            next_rows.append(ft)
        prev_user, prev_type = lu, lt
    boundary = rd.from_arrow(pa.table({
        "prev_type": pa.array(prev_rows, pa.string()),
        "next_type": pa.array(next_rows, pa.string()),
        "cnt": pa.array(np.ones(len(prev_rows), np.int64))}))

    agg = (rd.from_arrow_refs(cnt_refs).union(boundary)
           .groupby(["prev_type", "next_type"]).sum("cnt"))
    t = agg.to_pandas()
    i64, s = pa.int64(), pa.string()
    if t.empty:
        return pa.table({"prev_type": pa.array([], s),
                         "next_type": pa.array([], s),
                         "cnt": pa.array([], i64)})
    t = t.sort_values(["prev_type", "next_type"])
    return pa.table({
        "prev_type": pa.array(t["prev_type"], s),
        "next_type": pa.array(t["next_type"], s),
        "cnt": pa.array(t["sum(cnt)"].to_numpy().astype(np.int64),
                        i64)})


TRANSITIONS_SQL = """
    SELECT prev_type, next_type, COUNT(*) AS cnt
    FROM (
        SELECT event_type AS prev_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   AS next_type
        FROM events)
    WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


@ray.remote
def _block_trigrams(block: pa.Table):
    """Per-block (t1, t2, t3) partial counts for windows fully inside
    the block, plus the block's first/last two (user, type) rows —
    the _block_transitions discipline extended to width-3 windows
    (so the driver's boundary carry is two rows instead of one)."""
    import pyarrow.compute as pc
    empty = pa.table({"t1": pa.array([], pa.string()),
                      "t2": pa.array([], pa.string()),
                      "t3": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    u = block.column("user_id").to_numpy()
    n = len(u)
    if n == 0:
        return (empty, [])
    et = block.column("event_type").combine_chunks()
    if n >= 3:
        same = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        idx = pa.array(np.flatnonzero(same))
        tri = pa.table({
            "t1": et.take(idx),
            "t2": et.take(pc.add(idx, pa.scalar(1, pa.int64()))),
            "t3": et.take(pc.add(idx, pa.scalar(2, pa.int64())))})
        g = tri.group_by(["t1", "t2", "t3"]).aggregate(
            [("t1", "count")])
        part = pa.table({"t1": g.column("t1"), "t2": g.column("t2"),
                         "t3": g.column("t3"),
                         "cnt": g.column("t1_count").cast(pa.int64())})
    else:
        part = empty
    first2 = [(int(u[i]), et[i].as_py()) for i in range(min(2, n))]
    last2 = [(int(u[i]), et[i].as_py())
             for i in range(max(0, n - 2), n)]
    return (part, [first2, last2])


def path_counts(sf_dir: str) -> pa.Table:
    """Per-user event-type TRIGRAM counts — the order-3 sequence /
    Markov sufficient statistics (the n-gram path-mining primitive).
    Returns (t1, t2, t3, cnt) sorted, exact int64; at most |types|³
    rows.

    Scale shape: the transition_counts distributed-lead discipline
    widened to 3-windows — one range-partitioned sort, per-block
    vectorized window partials (the shuffle carries ≤ types³ rows
    per block), and an O(blocks) driver stitch that slides a TWO-row
    carry across block junctions, so windows spanning any number of
    tiny blocks are each counted exactly once."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    sorted_ds = ds.sort(["user_id", "ts", "event_id"]).materialize()
    block_refs = [ref for bundle in sorted_ds.iter_internal_ref_bundles()
                  for ref, _ in bundle.blocks]
    results = [_block_trigrams.options(num_returns=2).remote(b)
               for b in block_refs]
    cnt_refs = [r[0] for r in results]
    bounds = ray.get([r[1] for r in results])

    rows = {"t1": [], "t2": [], "t3": []}
    tail: list = []  # last two (user, type) rows of the stream so far
    for b in bounds:
        if not b:
            continue  # empty block: carry the tail through
        first2, last2 = b
        # windows ending at this block's first (and, with >=2 rows,
        # second) row that reach back into the carry
        win = tail + first2
        for j in range(max(0, len(tail) - 2), len(tail)):
            w = win[j:j + 3]
            if len(w) == 3 and w[0][0] == w[1][0] == w[2][0]:
                rows["t1"].append(w[0][1])
                rows["t2"].append(w[1][1])
                rows["t3"].append(w[2][1])
        tail = (tail + first2)[-2:] if len(first2) < 2 else last2
    boundary = rd.from_arrow(pa.table({
        "t1": pa.array(rows["t1"], pa.string()),
        "t2": pa.array(rows["t2"], pa.string()),
        "t3": pa.array(rows["t3"], pa.string()),
        "cnt": pa.array(np.ones(len(rows["t1"]), np.int64))}))

    agg = (rd.from_arrow_refs(cnt_refs).union(boundary)
           .groupby(["t1", "t2", "t3"]).sum("cnt"))
    t = agg.to_pandas()
    i64, s = pa.int64(), pa.string()
    if t.empty:
        return pa.table({"t1": pa.array([], s), "t2": pa.array([], s),
                         "t3": pa.array([], s),
                         "cnt": pa.array([], i64)})
    t = t.sort_values(["t1", "t2", "t3"])
    return pa.table({
        "t1": pa.array(t["t1"], s),
        "t2": pa.array(t["t2"], s),
        "t3": pa.array(t["t3"], s),
        "cnt": pa.array(t["sum(cnt)"].to_numpy().astype(np.int64),
                        i64)})


PATH_COUNTS_SQL = """
    SELECT t1, t2, t3, COUNT(*) AS cnt
    FROM (
        SELECT event_type AS t1,
               lead(event_type, 1) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""
