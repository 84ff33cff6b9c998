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

Scale shape — successors are walker-independent, so the pipeline is
NOT a per-step frontier join (that formulation measured 328 s on the
10M-edge bench graph; this one 19 s):
  * ONE vectorized scan over the edge table emits each batch's local
    (h, dst) argmin per (step, src) for ALL steps at once;
  * a single ``lexmin_per_key`` resolves the exact global
    (node, step) → successor table — a shuffle-free TREE COMBINE
    (repeated positional repartition + np.lexsort batch argmin,
    fan-in 8) while the key set fits one block, falling back to the
    groupby+equi-join shuffle form beyond ``TREE_MAX_ROWS``;
  * path assembly broadcasts the successor table via ``ray.put``
    (n·k rows) into ONE map_batches over the starts — zero joins —
    or, past ``SUCC_BROADCAST_MAX_ROWS``, chains one O(walkers)
    hash join per step.
Driver traffic: the succ table only on the broadcast path, then
nothing until the final (walkers × steps) result, which can instead
flow to ``out_dir`` via the crash-safe sink.

Reference parity: the reference engine has no walk operator; this is
an engine extension in the training-data layer (SURVEY.md §6 scope),
kept next to the other graph algorithms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


# tree-combine cutover: above this row count the final single-block
# combine could not hold the key set in one worker's heap, so the
# distributed shuffle path runs instead (3 hash exchanges — exact at
# any scale, but its per-row constants are ~50x the vectorized
# combine's, so it is the fallback, not the default)
TREE_MAX_ROWS = 64_000_000
_TREE_FAN = 8


def _batch_lexmin(keys: list):
    """Batch-local lexicographic (a, b) argmin per key tuple."""
    def comb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: pa.array([], _I64) for k in keys},
                             "a": pa.array([], _I64),
                             "b": pa.array([], _I64)})
        kcols = [t.column(k).to_numpy(zero_copy_only=False)
                 for k in keys]
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, *kcols[::-1]))
        kcols = [k[order] for k in kcols]
        a, b = a[order], b[order]
        keep = np.empty(len(a), dtype=bool)
        keep[0] = True
        keep[1:] = False
        for k in kcols:
            keep[1:] |= k[1:] != k[:-1]
        return pa.table({**{kn: pa.array(kc[keep])
                            for kn, kc in zip(keys, kcols)},
                         "a": pa.array(a[keep]),
                         "b": pa.array(b[keep])})
    return comb


def lexmin_per_key(ds, nparts: int, key_cols: tuple = ("key",)):
    """Exact global lexicographic argmin of (a, b) per key over a
    Dataset with int64 columns (*key_cols, a, b). Returns a Dataset
    (*key_cols, a, b) with one row per key.

    Strategy: TREE COMBINE — repeated positional ``repartition`` +
    vectorized batch-local lexmin (np.lexsort, one keep-mask pass) at
    fan-in 8 until one block holds the per-key minima. NO hash
    shuffle anywhere: each level's rows shrink toward the distinct
    key count, and positional coalescing moves blocks, not keyed
    rows. (Measured on 26.5M candidate rows / 750k keys at 32 cpus:
    tree 4 s vs hash-groupby path 124 s.)

    When the row count still exceeds ``TREE_MAX_ROWS`` (the key set
    itself cannot fit one worker's block), the exact-at-any-scale
    shuffle path runs instead: min(a) per key via arrow groupby, an
    equi-join back on (*keys, a), min(b) among the ties — never
    per-group Python either way."""
    keys = list(key_cols)
    comb = _batch_lexmin(keys)

    cur = ds.map_batches(comb, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    while cur.num_blocks() > 1:
        if cur.count() > TREE_MAX_ROWS:
            return _lexmin_shuffle(cur, nparts, keys)
        cur = (cur.repartition(
            max(1, cur.num_blocks() // _TREE_FAN))
            .map_batches(comb, batch_format="pyarrow",
                         zero_copy_batch=True).materialize())
    return cur


def _lexmin_shuffle(ds, nparts: int, keys: list):
    """The distributed lexmin tail for key sets too big for one
    block: two arrow groupbys + one equi-join (exact tie-break)."""
    from ..stages.join import hash_join

    key_schema = [(k, _I64) for k in keys]
    abc = key_schema + [("a", _I64), ("b", _I64)]

    def _mina(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: pa.array([], _I64) for k in keys},
                             "a": pa.array([], _I64)})
        return pa.table({**{k: t.column(k) for k in keys},
                         "a": t.column("min(a)")})

    g1 = ds.groupby(keys).min("a").map_batches(
        _mina, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(ds.repartition(nparts), g1,
                  on=tuple(keys) + ("a",), left_schema=abc,
                  right_schema=key_schema + [("a", _I64)])

    def _minb(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: pa.array([], _I64) for k in keys},
                             "a": pa.array([], _I64),
                             "b": pa.array([], _I64)})
        return pa.table({**{k: t.column(k) for k in keys},
                         "a": t.column("a"),
                         "b": t.column("min(b)").cast(_I64)})

    # min(b) per (*keys, a): a is already the per-key min, so grouping
    # by keys alone is equivalent — but keeping a in the group key
    # lets arrow carry it through without a rejoin
    return j.groupby(keys + ["a"]).min("b").map_batches(
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

    # The successor of (cur, step) is walker-independent, so the
    # per-(node, step) successor table is precomputed in ONE scan
    # over the edge table: each batch emits its local (h, dst)
    # argmin per (step, src) for ALL steps, then a single composite
    # lexmin_per_key resolves every (node, step) successor at once.
    # This replaces num_steps frontier ⋈ edges joins (each O(m) rows)
    # with one O(m) scan + one O(n·k) argmin + num_steps O(n) joins
    # — the full-frontier regime this operator targets (one walker
    # per source). A sparse-start variant would flip back to
    # frontier joins; documented trade-off.
    def _pre_all(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"step": pa.array([], _I64),
                             "key": pa.array([], _I64),
                             "a": pa.array([], _I64),
                             "b": pa.array([], _I64)})
        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        ks, kk, ka, kb = [], [], [], []
        for step in range(1, num_steps + 1):
            h = (walk_hash(src, dst, step, seed)
                 ^ _MSB).view(np.int64)
            s2, h2, d2 = _first_per_start(src, h, dst)
            ks.append(np.full(len(s2), step, np.int64))
            kk.append(s2)
            ka.append(h2)
            kb.append(d2)
        return pa.table({
            "step": pa.array(np.concatenate(ks) if ks
                             else np.array([], np.int64)),
            "key": pa.array(np.concatenate(kk) if kk
                            else np.array([], np.int64)),
            "a": pa.array(np.concatenate(ka) if ka
                          else np.array([], np.int64)),
            "b": pa.array(np.concatenate(kb) if kb
                          else np.array([], np.int64))})

    # distinct walkers = the step-1 successor keys (one row per
    # distinct src by construction) — no separate dedup groupby.
    # num_steps == 0 deduplicates via the same tree combine with a
    # constant (a, b).
    def _dedup0(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], _I64),
                             "a": pa.array([], _I64),
                             "b": pa.array([], _I64)})
        src = np.unique(t.column("src").to_numpy(
            zero_copy_only=False).astype(np.int64))
        z = np.zeros(len(src), np.int64)
        return pa.table({"key": pa.array(src), "a": pa.array(z),
                         "b": pa.array(z)})

    def _starts_of(ds, key_col: str, flt=None):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"start": pa.array([], _I64),
                                 "cur": pa.array([], _I64)})
            if flt is not None:
                t = flt(t)
            s = t.column(key_col).cast(_I64)
            return pa.table({"start": s, "cur": s})
        return ds.map_batches(_f, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _step0(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"start": pa.array([], _I64),
                             "step": pa.array([], _I64),
                             "node": pa.array([], _I64)})
        return pa.table({"start": t.column("start"),
                         "step": pa.array(
                             np.zeros(t.num_rows, np.int64)),
                         "node": t.column("start")})

    if num_steps > 0:
        pre = E.map_batches(_pre_all, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
        succ = lexmin_per_key(pre, nparts,
                              key_cols=("step", "key")).materialize()
        F = _starts_of(
            succ, "key",
            flt=lambda t: t.filter(pc.equal(t.column("step"),
                                            pa.scalar(1)))
        ).materialize()
        outs = [F.map_batches(_step0, batch_format="pyarrow",
                              zero_copy_batch=True)]
        if succ.count() <= SUCC_BROADCAST_MAX_ROWS:
            result = _walk_broadcast(F, succ, num_steps, outs)
        else:
            result = _walk_joins(F, succ, num_steps, nparts, outs)
    else:
        starts = lexmin_per_key(
            E.map_batches(_dedup0, batch_format="pyarrow",
                          zero_copy_batch=True), nparts)
        F = _starts_of(starts, "key").materialize()
        result = F.map_batches(_step0, batch_format="pyarrow",
                               zero_copy_batch=True)

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


# above this successor-table size the driver assembly + ray.put
# broadcast (n·k rows, ~24 B/row -> ~200 MB at the cap) would strain
# the driver and worker heaps; the per-step hash-join chain
# runs instead (exact at any scale)
SUCC_BROADCAST_MAX_ROWS = 8_000_000


def _walk_broadcast(F, succ, num_steps: int, outs: list):
    """Path construction with the successor table BROADCAST: sorted
    per-step (node, next) arrays ship once via ray.put; ONE
    map_batches over the starts walks every step with vectorized
    searchsorted lookups — zero joins, zero per-step materializations.
    """
    import ray

    tbl = pa.Table.from_pandas(succ.to_pandas(), preserve_index=False)
    if tbl.num_rows == 0:
        # no successors anywhere (empty or all-dangling graph) —
        # note the empty table may also have lost its schema
        return outs[0]
    steps = tbl.column("step").to_numpy(zero_copy_only=False)
    nodes = tbl.column("key").to_numpy(zero_copy_only=False)
    nxt = tbl.column("b").to_numpy(zero_copy_only=False)
    per_step = []
    for s in range(1, num_steps + 1):
        m = steps == s
        ns, xs = nodes[m], nxt[m]
        order = np.argsort(ns, kind="stable")
        per_step.append((ns[order], xs[order]))
    sref = ray.put(per_step)

    def _walk(t: pa.Table, *, sref=sref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"start": pa.array([], _I64),
                             "step": pa.array([], _I64),
                             "node": pa.array([], _I64)})
        tables = ray.get(sref) if not isinstance(sref, list) else sref
        start = t.column("start").to_numpy(zero_copy_only=False)
        cur = start.copy()
        alive = np.ones(len(start), dtype=bool)
        ss, kk, nn = [], [], []
        for s, (ns, xs) in enumerate(tables, start=1):
            idx = np.searchsorted(ns, cur)
            ok = alive & (idx < len(ns))
            ok[ok] &= ns[idx[ok]] == cur[ok]
            cur = np.where(ok, xs[np.minimum(idx, len(ns) - 1)]
                           if len(ns) else cur, cur)
            alive = ok
            if not alive.any():
                break
            ss.append(np.full(int(alive.sum()), s, np.int64))
            kk.append(start[alive])
            nn.append(cur[alive])
        if not ss:
            return pa.table({"start": pa.array([], _I64),
                             "step": pa.array([], _I64),
                             "node": pa.array([], _I64)})
        return pa.table({"start": pa.array(np.concatenate(kk)),
                         "step": pa.array(np.concatenate(ss)),
                         "node": pa.array(np.concatenate(nn))})

    result = outs[0]
    stepped = F.map_batches(_walk, batch_format="pyarrow",
                            zero_copy_batch=True)
    return result.union(stepped)


def _walk_joins(F, succ, num_steps: int, nparts: int, outs: list):
    """Path construction for successor tables too big to broadcast:
    per step, one partitioned frontier ⋈ successor hash join
    (both O(walkers) rows)."""
    from ..stages.join import hash_join

    fe_schema = [("start", _I64), ("cur", _I64)]

    for step in range(1, num_steps + 1):
        def _succ_s(t: pa.Table, *, step=step) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64),
                                 "nxt": pa.array([], _I64)})
            t = t.filter(pc.equal(t.column("step"), pa.scalar(step)))
            return pa.table({"node": t.column("key"),
                             "nxt": t.column("b")})

        succ_s = succ.map_batches(_succ_s, batch_format="pyarrow",
                                  zero_copy_batch=True)
        j = hash_join(F.repartition(nparts), succ_s, on=("cur",),
                      right_on=("node",), left_schema=fe_schema,
                      right_schema=[("node", _I64), ("nxt", _I64)])

        def _next(t: pa.Table, *, step=step) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"start": pa.array([], _I64),
                                 "step": pa.array([], _I64),
                                 "node": pa.array([], _I64)})
            return pa.table({
                "start": t.column("start"),
                "step": pa.array(np.full(t.num_rows, step, np.int64)),
                "node": t.column("nxt").cast(_I64)})

        stepped = j.map_batches(_next, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
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
    return result


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
