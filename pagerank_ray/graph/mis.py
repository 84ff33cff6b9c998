"""Maximal independent set via Luby's algorithm with deterministic
hash priorities — the classic O(log n)-round distributed MIS, made
bit-reproducible (and SQL-oracle-checkable) the graph/walks.py way.

Round rule: every alive node u draws priority

    p(u, r) = splitmix64(u*1000003 + r*101 + seed)   (mod 2^64)

and joins the MIS iff (p(u), u) is lexicographically smaller than
(p(v), v) for EVERY alive neighbor v (a total order — priorities are
effectively unique but the node-id tie-break makes determinism
unconditional). Joined nodes and their neighbors leave the alive set;
repeat until empty. Luby's analysis gives O(log n) expected rounds
under random priorities; the fresh full-avalanche hash per round
plays that role deterministically.

The "own-row union" trick avoids any anti-join: each alive node
contributes its OWN (p, node) row alongside its alive-neighbor rows,
and the exact global lexicographic argmin per node
(walks.lexmin_per_key — two arrow groupbys + one equi-join, no
per-group Python) then marks u as MIS exactly when its own row wins
(argmin's b == u; a neighbor row can never equal it since self-loops
are dropped). Isolated-in-the-alive-subgraph nodes trivially win.

Alive-set maintenance is also join-free: union (alive, keep=1) with
(MIS ∪ neighbors(MIS), keep=0), groupby-min(keep), filter keep=1.

Semantics notes: the graph is the SYMMETRIZED simple graph of the
directed (src, dst) input with self-loops dropped; a node whose only
edges are self-loops does not appear at all (both engine and oracle
derive nodes from the symmetrized edge set).

Scale shape per round: one partitioned edges ⋈ priorities join, the
batch-combined argmin, one groupby for the alive update — all
frontier-proportional; driver sees one scalar count per round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .walks import _MSB, _first_per_start, lexmin_per_key, walk_hash

_I64 = pa.int64()


def _prio(node: np.ndarray, rnd: int, seed: int) -> np.ndarray:
    """Per-round priority: walk_hash with dst=0 (the dst term
    vanishes), MSB-flipped to an order-preserving int64."""
    return (walk_hash(node, np.zeros(len(node), np.uint64), rnd, seed)
            ^ _MSB).view(np.int64)


# below this node count, the alive set broadcasts via ray.put each
# round (priorities are PURE hash functions of (node, round), so the
# per-round edges ⋈ priorities joins exist only to restrict to alive
# neighbors — a vectorized membership test replaces both); beyond it,
# the fully-distributed Dataset round loop runs
ALIVE_BROADCAST_MAX_ROWS = 8_000_000


def _mis_broadcast(E, nodes_ds, seed: int, max_rounds: int,
                   nparts: int, out_dir):
    """Luby rounds with the shrinking alive set broadcast: per round,
    ONE edge scan computes alive-restricted neighbor priority rows
    (p is a pure hash — no join), the tree argmin picks winners, a
    second scan collects the winners' neighborhoods, and the driver
    maintains the sorted alive array (bounded by the initial node
    count, which this path only serves when it fits)."""
    import ray as _ray

    from .walks import lexmin_per_key

    tbl = pa.Table.from_pandas(nodes_ds.to_pandas(),
                               preserve_index=False)
    if tbl.num_rows == 0:
        alive = np.array([], np.int64)
    else:
        alive = np.sort(tbl.column("key").to_numpy(
            zero_copy_only=False).astype(np.int64))

    mis_nodes: list = []
    mis_rounds: list = []
    rounds_used = 0
    for rnd in range(1, max_rounds + 1):
        if len(alive) == 0:
            break
        rounds_used = rnd
        aref = _ray.put(alive)

        def _nbr_rows(t: pa.Table, *, aref=aref,
                      rnd=rnd) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"key": pa.array([], _I64),
                                 "a": pa.array([], _I64),
                                 "b": pa.array([], _I64)})
            al = _ray.get(aref) if not isinstance(
                aref, np.ndarray) else aref
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            iu = np.searchsorted(al, u)
            iv = np.searchsorted(al, v)
            ok = (iu < len(al)) & (iv < len(al))
            ok[ok] &= (al[np.minimum(iu, len(al) - 1)][ok] == u[ok])
            ok[ok] &= (al[np.minimum(iv, len(al) - 1)][ok] == v[ok])
            if not ok.any():
                return pa.table({"key": pa.array([], _I64),
                                 "a": pa.array([], _I64),
                                 "b": pa.array([], _I64)})
            u, v = u[ok], v[ok]
            p = _prio(v, rnd, seed)
            k2, a2, b2 = _first_per_start(u, p, v)
            return pa.table({"key": pa.array(k2),
                             "a": pa.array(a2),
                             "b": pa.array(b2)})

        own = rd.from_arrow(pa.table({
            "key": pa.array(alive),
            "a": pa.array(_prio(alive, rnd, seed)),
            "b": pa.array(alive)}))
        cand = (E.map_batches(_nbr_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
                .union(own)).materialize()
        win_t = pa.Table.from_pandas(
            lexmin_per_key(cand, nparts).to_pandas(),
            preserve_index=False)
        if win_t.num_rows == 0:
            winners = np.array([], np.int64)
        else:
            k = win_t.column("key").to_numpy(zero_copy_only=False)
            b = win_t.column("b").to_numpy(zero_copy_only=False)
            winners = np.sort(k[k == b].astype(np.int64))
        mis_nodes.append(winners)
        mis_rounds.append(np.full(len(winners), rnd, np.int64))

        wref = _ray.put(winners)

        def _touched(t: pa.Table, *, wref=wref) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"key": pa.array([], _I64),
                                 "a": pa.array([], _I64),
                                 "b": pa.array([], _I64)})
            w = _ray.get(wref) if not isinstance(
                wref, np.ndarray) else wref
            if len(w) == 0:
                return pa.table({"key": pa.array([], _I64),
                                 "a": pa.array([], _I64),
                                 "b": pa.array([], _I64)})
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            iu = np.searchsorted(w, u)
            ok = iu < len(w)
            ok[ok] &= w[np.minimum(iu, len(w) - 1)][ok] == u[ok]
            nb = np.unique(v[ok].astype(np.int64))
            z = np.zeros(len(nb), np.int64)
            return pa.table({"key": pa.array(nb), "a": pa.array(z),
                             "b": pa.array(z)})

        nb_t = pa.Table.from_pandas(
            lexmin_per_key(
                E.map_batches(_touched, batch_format="pyarrow",
                              zero_copy_batch=True),
                nparts).to_pandas(), preserve_index=False)
        nbrs = (nb_t.column("key").to_numpy(zero_copy_only=False)
                .astype(np.int64) if nb_t.num_rows else
                np.array([], np.int64))
        alive = np.setdiff1d(alive, np.union1d(winners, nbrs),
                             assume_unique=False)
    else:
        if len(alive) > 0:
            raise RuntimeError(
                f"maximal_independent_set: {max_rounds} rounds "
                f"exhausted with {len(alive)} alive nodes — raise "
                f"max_rounds")

    nodes = (np.concatenate(mis_nodes) if mis_nodes
             else np.array([], np.int64))
    rnds = (np.concatenate(mis_rounds) if mis_rounds
            else np.array([], np.int64))
    order = np.argsort(nodes, kind="stable")
    tbl = pa.table({"node": pa.array(nodes[order]),
                    "mis_round": pa.array(rnds[order])})
    if out_dir is not None:
        from .sink import sink_dataset
        sink_dataset(rd.from_arrow(tbl), out_dir)
        return None
    return tbl.replace_schema_metadata(
        {b"rounds_used": str(rounds_used).encode()})


def maximal_independent_set(edges_ds, seed: int = 7,
                            max_rounds: int = 64,
                            join_partitions: int | None = None,
                            out_dir: str | None = None):
    """-> pa.Table (node, mis_round) sorted by node — or ``None``
    with the rows sunk to ``out_dir`` (crash-safe sharded parquet).
    ``mis_round`` is the 1-based round the node joined in (useful as
    the unroll-depth witness for the SQL oracle).

    ``edges_ds``: Dataset of int64 (src, dst) directed edges.
    Raises RuntimeError if ``max_rounds`` is exhausted with alive
    nodes left (a truncated MIS is neither independent-verified nor
    maximal — the kcore_members discipline).
    """
    from ..stages.join import default_join_partitions, hash_join

    nparts = join_partitions or default_join_partitions()

    def _sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], _I64),
                             "v": pa.array([], _I64)})
        s = t.column("src").cast(_I64).to_numpy(zero_copy_only=False)
        d = t.column("dst").cast(_I64).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": pa.array(np.concatenate([s, d])),
                         "v": pa.array(np.concatenate([d, s]))})

    E = edges_ds.map_batches(_sym, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    def _node_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], _I64),
                             "a": pa.array([], _I64),
                             "b": pa.array([], _I64)})
        u = np.unique(t.column("u").to_numpy(
            zero_copy_only=False).astype(np.int64))
        z = np.zeros(len(u), np.int64)
        return pa.table({"key": pa.array(u), "a": pa.array(z),
                         "b": pa.array(z)})

    # distinct endpoints via the shuffle-free tree dedupe
    # (symmetrized, so distinct u covers every endpoint)
    nodes_ds = lexmin_per_key(
        E.map_batches(_node_rows, batch_format="pyarrow",
                      zero_copy_batch=True), nparts).materialize()

    if nodes_ds.count() <= ALIVE_BROADCAST_MAX_ROWS:
        return _mis_broadcast(E, nodes_ds, seed, max_rounds, nparts,
                              out_dir)

    def _nodes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], _I64)})
        return pa.table({"node": t.column("key")})

    A = nodes_ds.map_batches(_nodes, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()

    mis_parts: list = []
    rounds_used = 0
    for rnd in range(1, max_rounds + 1):
        if A.count() == 0:
            break
        rounds_used = rnd

        def _prio_tbl(t: pa.Table, *, rnd=rnd) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64),
                                 "p": pa.array([], _I64)})
            n = t.column("node").to_numpy(zero_copy_only=False)
            return pa.table({"node": t.column("node"),
                             "p": pa.array(_prio(n, rnd, seed))})

        P = A.map_batches(_prio_tbl, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

        # neighbor rows (u, p_v, v) for ALIVE v only (inner join
        # drops dead neighbors), plus each node's own (u, p_u, u) row
        nbr = hash_join(E.repartition(nparts), P, on=("v",),
                        right_on=("node",),
                        left_schema=[("u", _I64), ("v", _I64)],
                        right_schema=[("node", _I64), ("p", _I64)])

        def _nbr_rows(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"key": pa.array([], _I64),
                                 "a": pa.array([], _I64),
                                 "b": pa.array([], _I64)})
            key = t.column("u").to_numpy(zero_copy_only=False)
            a = t.column("p").to_numpy(zero_copy_only=False)
            b = t.column("v").to_numpy(zero_copy_only=False)
            k2, a2, b2 = _first_per_start(key, a, b)
            return pa.table({"key": pa.array(k2), "a": pa.array(a2),
                             "b": pa.array(b2)})

        def _own_rows(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"key": pa.array([], _I64),
                                 "a": pa.array([], _I64),
                                 "b": pa.array([], _I64)})
            return pa.table({"key": t.column("node"),
                             "a": t.column("p"),
                             "b": t.column("node")})

        cand = (nbr.map_batches(_nbr_rows, batch_format="pyarrow",
                                zero_copy_batch=True)
                .union(P.map_batches(_own_rows,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True))
                ).materialize()

        def _winners(t: pa.Table, *, rnd=rnd) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64),
                                 "mis_round": pa.array([], _I64)})
            t = t.filter(pc.equal(t.column("key"),
                                          t.column("b")))
            return pa.table({
                "node": t.column("key"),
                "mis_round": pa.array(
                    np.full(t.num_rows, rnd, np.int64))})

        mis_r = (lexmin_per_key(cand, nparts)
                 .map_batches(_winners, batch_format="pyarrow",
                              zero_copy_batch=True).materialize())
        mis_parts.append(mis_r)

        # removed = MIS ∪ neighbors(MIS); alive update is the
        # keep-flag union trick (no anti-join needed)
        def _mis_key(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"mnode": pa.array([], _I64)})
            return pa.table({"mnode": t.column("node")})

        mk = mis_r.map_batches(_mis_key, batch_format="pyarrow",
                               zero_copy_batch=True)
        touched = hash_join(E.repartition(nparts), mk, on=("u",),
                            right_on=("mnode",),
                            left_schema=[("u", _I64), ("v", _I64)],
                            right_schema=[("mnode", _I64)])

        def _keep1(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64),
                                 "keep": pa.array([], _I64)})
            return pa.table({"node": t.column("node"),
                             "keep": pa.array(
                                 np.ones(t.num_rows, np.int64))})

        def _keep0_nbr(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64),
                                 "keep": pa.array([], _I64)})
            return pa.table({"node": t.column("v").cast(_I64),
                             "keep": pa.array(
                                 np.zeros(t.num_rows, np.int64))})

        def _keep0_mis(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64),
                                 "keep": pa.array([], _I64)})
            return pa.table({"node": t.column("node"),
                             "keep": pa.array(
                                 np.zeros(t.num_rows, np.int64))})

        def _alive(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], _I64)})
            t = t.filter(pc.equal(t.column("min(keep)"),
                                          pa.scalar(1)))
            return pa.table({"node": t.column("node")})

        A = (A.map_batches(_keep1, batch_format="pyarrow",
                           zero_copy_batch=True)
             .union(touched.map_batches(_keep0_nbr,
                                        batch_format="pyarrow",
                                        zero_copy_batch=True))
             .union(mis_r.map_batches(_keep0_mis,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True))
             .groupby("node").min("keep")
             .map_batches(_alive, batch_format="pyarrow",
                          zero_copy_batch=True).materialize())
    else:
        if A.count() > 0:
            raise RuntimeError(
                f"maximal_independent_set: {max_rounds} rounds "
                f"exhausted with {A.count()} alive nodes — raise "
                f"max_rounds")

    if not mis_parts:
        empty = pa.table({"node": pa.array([], _I64),
                          "mis_round": pa.array([], _I64)})
        if out_dir is not None:
            from .sink import sink_dataset
            sink_dataset(rd.from_arrow(empty), out_dir)
            return None
        return empty

    result = mis_parts[0]
    for o in mis_parts[1:]:
        result = result.union(o)
    if out_dir is not None:
        from .sink import sink_dataset
        sink_dataset(result, out_dir)
        return None
    tbl = pa.Table.from_pandas(result.to_pandas(),
                               preserve_index=False)
    tbl = tbl.sort_by([("node", "ascending")])
    # witness for the SQL-unroll assertion (the kcore discipline)
    tbl = tbl.replace_schema_metadata(
        {b"rounds_used": str(rounds_used).encode()})
    return tbl


def mis_sql(edges_sql: str, rounds: int = 12, seed: int = 7) -> str:
    """DuckDB oracle: ``rounds`` UNROLLED Luby rounds over
    ``edges_sql`` (BIGINT src, dst). Replays the splitmix64 priority
    in mod-2^64 HUGEINT arithmetic (graph/walks.py:_mulmod_sql) and
    the (p, node) lexicographic rule via NOT EXISTS. Luby is monotone
    in rounds (extra rounds on an empty alive set are no-ops), so any
    unroll >= the real depth is exact — the engine wrapper asserts
    its ``rounds_used`` against this unroll."""
    from .walks import _mulmod_sql

    m64 = "CAST('18446744073709551616' AS HUGEINT)"
    parts = [f"e0 AS ({edges_sql})", """
         e AS MATERIALIZED (
             SELECT u, v FROM (
                 SELECT src AS u, dst AS v FROM e0
                 UNION ALL
                 SELECT dst AS u, src AS v FROM e0)
             WHERE u <> v)""", """
         a0 AS (SELECT DISTINCT u AS node FROM e)"""]
    for r in range(1, rounds + 1):
        combine = (f"(CAST(node AS HUGEINT) * 1000003"
                   f" + {r * 101 + seed}"
                   f" + 11400714819323198485) % {m64}")
        parts.append(f"""
         c{r} AS (SELECT node, CAST({combine} AS UBIGINT) AS z
                  FROM a{r - 1})""")
        parts.append(f"""
         q2_{r} AS (SELECT node,
                   CAST({_mulmod_sql("xor(z, z // 1073741824)",
                                     0xBF58476D1CE4E5B9)}
                        AS UBIGINT) AS z FROM c{r})""")
        parts.append(f"""
         q3_{r} AS (SELECT node,
                   CAST({_mulmod_sql("xor(z, z // 134217728)",
                                     0x94D049BB133111EB)}
                        AS UBIGINT) AS z FROM q2_{r})""")
        parts.append(f"""
         p{r} AS MATERIALIZED (
             SELECT node, xor(z, z // 2147483648) AS p
             FROM q3_{r})""")
        parts.append(f"""
         m{r} AS MATERIALIZED (
             SELECT a.node FROM p{r} a
             WHERE NOT EXISTS (
                 SELECT 1 FROM e
                 JOIN p{r} b ON b.node = e.v
                 WHERE e.u = a.node
                   AND (b.p < a.p
                        OR (b.p = a.p AND b.node < a.node))))""")
        parts.append(f"""
         a{r} AS MATERIALIZED (
             SELECT node FROM a{r - 1}
             WHERE node NOT IN (SELECT node FROM m{r})
               AND node NOT IN (
                   SELECT e.v FROM e
                   JOIN m{r} m ON m.node = e.u))""")
    selects = [f"SELECT node, {r} AS mis_round FROM m{r}"
               for r in range(1, rounds + 1)]
    return ("WITH " + ",".join(parts) + "\n"
            + "\nUNION ALL ".join(selects))
