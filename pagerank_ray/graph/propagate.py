"""Neighborhood feature propagation — the GNN / LightGCN
message-passing primitive (y = A·f repeated ``hops`` times) as a pure
Dataset composition, exact integer semantics.

Hop rule: given int64 per-node features f, hop h computes for every
node u the SUM of its out-neighbors' hop-(h-1) values:

    f_h(u) = Σ_{(u,v) ∈ E} f_{h-1}(v)

with edge MULTIPLICITY counted (parallel edges add — the sparse
matrix-power semantics a GNN aggregation layer has, and the same
duplicate-summing convention as the engine's PageRank weights).
2-hop aggregation is therefore the second application of the SAME
one-hop operator — never an E ⋈ E path enumeration (which blows up
quadratically on hub nodes).

Scale shape per hop: one partitioned edges ⋈ features hash join
(features keyed by the edge's dst), a per-batch (src, partial-sum)
combiner, then one groupby-sum — the shuffle carries at most one row
per (node, block). Nodes whose out-neighborhood has no feature rows
drop out of that hop (inner-join semantics, replayed by the oracle).

Reference parity: engine extension in the training-data layer (the
reference has no feature propagation); kept beside the other graph
operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

_I64 = pa.int64()


def feature_propagation(edges_ds, feats_ds, hops: int = 2,
                        join_partitions: int | None = None,
                        out_dir: str | None = None):
    """-> pa.Table (node, hop, agg) for hop = 1..``hops``, sorted by
    (node, hop) — or ``None`` with rows sunk to ``out_dir``.

    ``edges_ds``: int64 (src, dst) edges (duplicates add).
    ``feats_ds``: int64 (node, f) features, one row per node.
    """
    from ..stages.join import default_join_partitions, hash_join

    if hops < 1:
        raise ValueError(f"hops must be >= 1, got {hops}")
    nparts = join_partitions or default_join_partitions()

    E = edges_ds.materialize()
    cur = feats_ds.materialize()
    outs = []

    for hop in range(1, hops + 1):
        j = hash_join(E.repartition(nparts), cur, on=("dst",),
                      right_on=("node",),
                      left_schema=[("src", _I64), ("dst", _I64)],
                      right_schema=[("node", _I64), ("f", _I64)])

        def _partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"src": pa.array([], _I64),
                                 "f": pa.array([], _I64)})
            src = t.column("src").to_numpy(zero_copy_only=False)
            f = t.column("f").to_numpy(zero_copy_only=False)
            # batch combiner: one (src, partial) row per distinct src
            order = np.argsort(src, kind="stable")
            src, f = src[order], f[order]
            starts = np.flatnonzero(
                np.diff(src, prepend=src[:1] - 1))
            sums = np.add.reduceat(f, starts)
            return pa.table({"src": pa.array(src[starts]),
                             "f": pa.array(sums.astype(np.int64))})

        def _rename(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64),
                                 "f": pa.array([], _I64)})
            return pa.table({"node": t.column("src"),
                             "f": t.column("sum(f)").cast(_I64)})

        cur = (j.map_batches(_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
               .groupby("src").sum("f")
               .map_batches(_rename, batch_format="pyarrow",
                            zero_copy_batch=True).materialize())

        def _out(t: pa.Table, *, hop=hop) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64),
                                 "hop": pa.array([], _I64),
                                 "agg": pa.array([], _I64)})
            return pa.table({
                "node": t.column("node"),
                "hop": pa.array(np.full(t.num_rows, hop, np.int64)),
                "agg": t.column("f")})

        outs.append(cur.map_batches(_out, batch_format="pyarrow",
                                    zero_copy_batch=True))

    result = outs[0]
    for o in outs[1:]:
        result = result.union(o)

    if out_dir is not None:
        from .sink import sink_dataset
        sink_dataset(result, out_dir)
        return None
    df = result.to_pandas()
    if len(df) == 0:
        return pa.table({"node": pa.array([], _I64),
                         "hop": pa.array([], _I64),
                         "agg": pa.array([], _I64)})
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return tbl.sort_by([("node", "ascending"), ("hop", "ascending")])


def propagation_sql(edges_sql: str, feats_sql: str,
                    hops: int = 2) -> str:
    """DuckDB oracle: ``hops`` unrolled join+groupby rounds over
    ``edges_sql`` (BIGINT src, dst) and ``feats_sql``
    (BIGINT node, f)."""
    parts = [f"e AS MATERIALIZED ({edges_sql})",
             f"h0 AS ({feats_sql})"]
    for h in range(1, hops + 1):
        parts.append(f"""
         h{h} AS MATERIALIZED (
             SELECT e.src AS node, SUM(p.f) AS f
             FROM e JOIN h{h - 1} p ON p.node = e.dst
             GROUP BY e.src)""")
    selects = [f"SELECT node, {h} AS hop, f AS agg FROM h{h}"
               for h in range(1, hops + 1)]
    return ("WITH " + ",".join(parts) + "\n"
            + "\nUNION ALL ".join(selects))
