"""Deterministic "random" walks over a directed int-id edge list —
the graph-sampling primitive of node2vec / DeepWalk / GNN-neighbor
training pipelines, made reproducible (and SQL-oracle-checkable) by
replacing the RNG with a full-avalanche hash.

Step rule: a walker standing at ``cur`` on step ``s`` moves to the
out-neighbor ``dst`` minimizing

    h = splitmix64(cur*1000003 + dst*10007 + s*101 + seed)   (mod 2^64)

with ties broken by ``dst`` ASC — a total order, so every engine that
replays the arithmetic (numpy uint64 wraparound here, HUGEINT mod-2^64
in the DuckDB oracle, ``WALKS_SQL``) selects the identical successor.
h has full avalanche in all arguments (splitmix64 finalizer,
functions/sketch.py:17), so successive steps are decorrelated like an
RNG walk while staying bit-reproducible across cluster sizes, retries
and engines. Walkers at dangling nodes simply stop (no more rows).

Scale shape (per step, all vectorized):
  * frontier ⋈ edges is a partitioned hash join (both sides big);
  * the hash + a batch-local lexicographic argmin run inside
    map_batches (the combiner bounds every downstream shuffle to at
    most one row per (walker, block));
  * the exact global argmin is TWO arrow groupbys and one join —
    min(h) per walker, an equi-join back on (start, h), then min(dst)
    per walker to replay the tie-break — never per-group Python;
  * each step's frontier materializes, capping concurrently
    instantiated aggregator pools (the clustering_coefficients
    lesson, graph/triangles.py).
Driver traffic: nothing until the final (walkers × steps) result,
which can instead flow to ``out_dir`` via the crash-safe sink.

Reference parity: the reference engine has no walk operator; this is
an engine extension in the training-data layer (SURVEY.md §6 scope),
kept next to the other graph algorithms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.sketch import splitmix64

_I64 = pa.int64()

# Ray Data's groupby aggregates fall back to pickled-object columns on
# uint64, so h is carried as an MSB-FLIPPED int64: int64(h ^ 2^63)
# orders exactly like unsigned h (an order-preserving bijection), so
# min()/tie-breaks match the oracle's UBIGINT ordering bit-for-bit.
_MSB = np.uint64(1 << 63)

_P_CUR = np.uint64(1000003)
_P_DST = np.uint64(10007)
_P_STEP = np.uint64(101)


def walk_hash(cur: np.ndarray, dst: np.ndarray, step: int,
              seed: int) -> np.ndarray:
    """splitmix64 of the mod-2^64 combine — uint64 in, uint64 out."""
    with np.errstate(over="ignore"):
        v = (cur.astype(np.uint64) * _P_CUR
             + dst.astype(np.uint64) * _P_DST
             + np.uint64(step) * _P_STEP + np.uint64(seed))
    return splitmix64(v)


def _first_per_start(start, h, dst):
    """Lexicographic (h, dst) argmin per start (all np arrays)."""
    order = np.lexsort((dst, h, start))
    start, h, dst = start[order], h[order], dst[order]
    keep = np.empty(len(start), dtype=bool)
    if len(start):
        keep[0] = True
        keep[1:] = start[1:] != start[:-1]
    return start[keep], h[keep], dst[keep]


def lexmin_per_key(ds, nparts: int):
    """Exact global lexicographic argmin of (a, b) per key over a
    Dataset with int64 columns (key, a, b): TWO arrow groupbys and one
    equi-join — min(a) per key, join back on (key, a), min(b) among
    the ties — never per-group Python. Returns a Dataset
    (key, a, b) with one row per key.

    Callers should batch-combine first (``_first_per_start``) so the
    shuffles carry at most one row per (key, block)."""
    from ..stages.join import hash_join

    abc = [("key", _I64), ("a", _I64), ("b", _I64)]

    def _mina(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], _I64),
                             "a": pa.array([], _I64)})
        return pa.table({"key": t.column("key"),
                         "a": t.column("min(a)")})

    g1 = ds.groupby("key").min("a").map_batches(
        _mina, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(ds.repartition(nparts), g1, on=("key", "a"),
                  left_schema=abc,
                  right_schema=[("key", _I64), ("a", _I64)])

    def _minb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], _I64),
                             "a": pa.array([], _I64),
                             "b": pa.array([], _I64)})
        return pa.table({"key": t.column("key"),
                         "a": t.column("a"),
                         "b": t.column("min(b)").cast(_I64)})

    # min(b) per (key, a): a is already the per-key min, so grouping
    # by key alone is equivalent — but keeping a in the group key lets
    # arrow carry it through without a rejoin
    return j.groupby(["key", "a"]).min("b").map_batches(
        _minb, batch_format="pyarrow", zero_copy_batch=True)


def deterministic_walks(edges_ds, num_steps: int = 3, seed: int = 7,
                        join_partitions: int | None = None,
                        out_dir: str | None = None):
    """One walker per distinct source node, ``num_steps`` hash-argmin
    steps. Returns a driver ``pa.Table`` (start, step, node) sorted by
    (start, step) — or ``None`` with the rows sunk to ``out_dir``
    (crash-safe sharded parquet, graph/sink.py discipline).

    ``edges_ds``: Dataset of int64 (src, dst) edges. Duplicate edges
    and self-loops are harmless (identical candidate rows select the
    same successor).
    """
    from ..stages.join import default_join_partitions, hash_join

    if num_steps < 0:
        raise ValueError(f"num_steps must be >= 0, got {num_steps}")
    nparts = join_partitions or default_join_partitions()

    E = edges_ds.materialize()

    def _starts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"start": pa.array([], _I64),
                             "cur": pa.array([], _I64)})
        s = t.column("src").cast(_I64)
        return pa.table({"start": s, "cur": s})

    # distinct walkers: groupby collapses duplicate srcs
    F = (E.groupby("src").count()
         .map_batches(_starts, batch_format="pyarrow",
                      zero_copy_batch=True).materialize())

    def _step0(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"start": pa.array([], _I64),
                             "step": pa.array([], _I64),
                             "node": pa.array([], _I64)})
        return pa.table({"start": t.column("start"),
                         "step": pa.array(
                             np.zeros(t.num_rows, np.int64)),
                         "node": t.column("start")})

    outs = [F.map_batches(_step0, batch_format="pyarrow",
                          zero_copy_batch=True)]

    fe_schema = [("start", _I64), ("cur", _I64)]
    e_schema = [("src", _I64), ("dst", _I64)]

    for step in range(1, num_steps + 1):
        cand = hash_join(F.repartition(nparts), E, on=("cur",),
                         right_on=("src",), left_schema=fe_schema,
                         right_schema=e_schema)

        def _pre(t: pa.Table, *, step=step) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"key": pa.array([], _I64),
                                 "a": pa.array([], _I64),
                                 "b": pa.array([], _I64)})
            start = t.column("start").to_numpy(zero_copy_only=False)
            cur = t.column("cur").to_numpy(zero_copy_only=False)
            dst = t.column("dst").to_numpy(zero_copy_only=False)
            h = (walk_hash(cur, dst, step, seed)
                 ^ _MSB).view(np.int64)
            s2, h2, d2 = _first_per_start(start, h, dst)
            return pa.table({"key": pa.array(s2),
                             "a": pa.array(h2),
                             "b": pa.array(d2)})

        pre = cand.map_batches(_pre, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

        def _next(t: pa.Table, *, step=step) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"start": pa.array([], _I64),
                                 "step": pa.array([], _I64),
                                 "node": pa.array([], _I64)})
            return pa.table({
                "start": t.column("key"),
                "step": pa.array(np.full(t.num_rows, step, np.int64)),
                "node": t.column("b")})

        stepped = (lexmin_per_key(pre, nparts)
                   .map_batches(_next, batch_format="pyarrow",
                                zero_copy_batch=True).materialize())
        outs.append(stepped)

        def _front(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"start": pa.array([], _I64),
                                 "cur": pa.array([], _I64)})
            return pa.table({"start": t.column("start"),
                             "cur": t.column("node")})

        F = stepped.map_batches(_front, batch_format="pyarrow",
                                zero_copy_batch=True)

    result = outs[0]
    for o in outs[1:]:
        result = result.union(o)

    if out_dir is not None:
        from .sink import sink_dataset
        sink_dataset(result, out_dir)
        return None
    df = result.to_pandas()
    if len(df) == 0:
        # an all-empty union loses the schema through pandas
        return pa.table({"start": pa.array([], _I64),
                         "step": pa.array([], _I64),
                         "node": pa.array([], _I64)})
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return tbl.sort_by([("start", "ascending"), ("step", "ascending")])


def _mulmod_sql(col: str, b: int) -> str:
    """(col * b) mod 2^64 in DuckDB HUGEINT, the 64x64 multiply split
    into 32-bit halves so INT128 never overflows (the
    functions/sketch.py:hll_distinct_sql replay)."""
    m64 = "CAST('18446744073709551616' AS HUGEINT)"
    hi, lo = b >> 32, b & 0xFFFFFFFF
    return (f"(((CAST({col} AS HUGEINT) * {lo}) % {m64}"
            f" + ((CAST({col} AS HUGEINT) * {hi}) % 4294967296)"
            f" * 4294967296) % {m64})")


def walks_sql(edges_sql: str, num_steps: int = 3, seed: int = 7
              ) -> str:
    """DuckDB oracle: unrolled ``num_steps`` hash-argmin steps over
    ``edges_sql`` (a SELECT yielding BIGINT src, dst). Replays the
    combine + splitmix64 in mod-2^64 HUGEINT arithmetic and the
    (h ASC, dst ASC) tie-break via row_number."""
    m64 = "CAST('18446744073709551616' AS HUGEINT)"
    parts = [f"e AS ({edges_sql})",
             "f0 AS (SELECT DISTINCT src AS start, src AS cur FROM e)"]
    for s in range(1, num_steps + 1):
        combine = (f"(CAST(f.cur AS HUGEINT) * 1000003"
                   f" + CAST(e.dst AS HUGEINT) * 10007"
                   f" + {s * 101 + seed}"
                   f" + 11400714819323198485) % {m64}")
        parts.append(f"""
         c{s} AS (SELECT f.start, e.dst,
                         CAST({combine} AS UBIGINT) AS z
                  FROM f{s - 1} f JOIN e ON e.src = f.cur)""")
        parts.append(f"""
         m2_{s} AS (SELECT start, dst,
                   CAST({_mulmod_sql("xor(z, z // 1073741824)",
                                     0xBF58476D1CE4E5B9)}
                        AS UBIGINT) AS z FROM c{s})""")
        parts.append(f"""
         m3_{s} AS (SELECT start, dst,
                   CAST({_mulmod_sql("xor(z, z // 134217728)",
                                     0x94D049BB133111EB)}
                        AS UBIGINT) AS z FROM m2_{s})""")
        parts.append(f"""
         h{s} AS (SELECT start, dst, xor(z, z // 2147483648) AS h
                  FROM m3_{s})""")
        parts.append(f"""
         f{s} AS (SELECT start, dst AS cur FROM (
                      SELECT start, dst,
                             row_number() OVER (
                                 PARTITION BY start
                                 ORDER BY h ASC, dst ASC) AS rn
                      FROM h{s}) WHERE rn = 1)""")
    selects = ["SELECT start, 0 AS step, start AS node FROM f0"]
    selects += [f"SELECT start, {s} AS step, cur AS node FROM f{s}"
                for s in range(1, num_steps + 1)]
    return ("WITH " + ",".join(parts) + "\n"
            + "\nUNION ALL ".join(selects))
