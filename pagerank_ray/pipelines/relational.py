"""Relational / stream-shaped operators over the testdata tables.

Ray Data has no event-time windows or watermark semantics; the engine
follows the batch-log pattern (guide): treat ``events`` as an ordered
partitioned log, implement windows as groupby(key).map_groups over
the sorted group, keep every aggregate SQL-expressible so the driver
oracle covers it.

Operators:
  windowed_event_agg  tumbling event-time window per event_type
  asof_join_events_orders
                      each event joined to the latest order of the
                      same customer at-or-before the event time
                      (two-sided bucketed merge_asof)
  range_join_events   same-user event pairs within a trailing window
                      (interval join; searchsorted window bounds)
  topk_docs_per_lang  per-group top-k with partial-top-k combiner
  quantiles_per_type  EXACT per-group quantiles via distributed sort
                      + block-metadata row indexing
  distinct_users_per_type
                      exact COUNT(DISTINCT) per group (pair-dedup
                      shuffle -> per-group count)
  broadcast_join_orders_customer
                      classic small-side broadcast hash join
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def windowed_event_agg(sf_dir: str, window_minutes: int = 60):
    """Tumbling count/sum per (event_type, window).

    Window key = floor(epoch_micros / window) — integral, so it hashes
    identically in DuckDB. Partial aggregation inside map_batches
    (combiner), then a small groupby — the window key is part of the
    shuffle key so event-time skew spreads over windows.
    """
    us = np.int64(window_minutes) * 60_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        win = ts // us
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pylist(),
            "win": win,
            "value": t.column("value").to_numpy(),
        })
        g = (df.groupby(["event_type", "win"], sort=False)
             .agg(cnt=("value", "size"), val_sum=("value", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "win"])
           .sum(["cnt", "val_sum"]))

    def rename(t: pa.Table) -> pa.Table:
        # val_sum rounded to 2 decimals: inputs have 2 decimals, so
        # both engines' float sums agree to ~1e-12 and round to the
        # same representable double (cross-engine hash parity)
        vs = np.round(t.column("sum(val_sum)").to_numpy(), 2)
        return pa.table({
            "event_type": t.column("event_type"),
            "win": t.column("win"),
            "cnt": t.column("sum(cnt)"),
            "val_sum": pa.array(vs),
        })

    return out.map_batches(rename, batch_format="pyarrow")


WINDOWED_EVENT_AGG_SQL = """
    SELECT event_type,
           epoch_us(ts) // {us} AS win,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS val_sum
    FROM events GROUP BY 1, 2
"""


def sliding_event_agg(sf_dir: str, size_minutes: int = 60,
                      hop_minutes: int = 15):
    """SLIDING (hopping) event-time window per event_type: window w
    covers [w*hop, w*hop + size); each event lands in size/hop
    overlapping windows. The fan-out happens INSIDE the per-batch
    combiner (np.repeat before the partial groupby), so the shuffle
    still carries only aggregated (type, window) rows — the standard
    way to keep an overlap factor off the wire. ``size`` must be a
    multiple of ``hop``. Returns (event_type, win, cnt, val_sum)
    where win*hop_minutes is the window start."""
    if size_minutes % hop_minutes:
        raise ValueError("size_minutes must be a multiple of "
                         "hop_minutes")
    hop_us = np.int64(hop_minutes) * 60_000_000
    k = size_minutes // hop_minutes

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        w_last = ts // hop_us
        # event at t is inside windows w_last-(k-1) .. w_last
        wins = (np.repeat(w_last, k)
                - np.tile(np.arange(k, dtype=np.int64), len(ts)))
        df = pd.DataFrame({
            "event_type": np.repeat(np.asarray(
                t.column("event_type").to_pylist(), dtype=object), k),
            "win": wins,
            "value": np.repeat(t.column("value").to_numpy(), k),
        })
        g = (df.groupby(["event_type", "win"], sort=False)
             .agg(cnt=("value", "size"), val_sum=("value", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])
    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "win"])
           .sum(["cnt", "val_sum"]))

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "win": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "val_sum": pa.array([], pa.float64())})
        vs = np.round(t.column("sum(val_sum)").to_numpy(), 2)
        return pa.table({
            "event_type": t.column("event_type"),
            "win": t.column("win"),
            "cnt": pc.cast(t.column("sum(cnt)"), pa.int64()),
            "val_sum": pa.array(vs),
        })

    return out.map_batches(rename, batch_format="pyarrow")


SLIDING_EVENT_AGG_SQL = """
    SELECT event_type,
           (epoch_us(ts) // {hop_us}) - i.i AS win,
           COUNT(*) AS cnt,
           ROUND(SUM(value), 2) AS val_sum
    FROM events, (SELECT unnest(range(0, {k})) AS i) i
    GROUP BY 1, 2
"""


def _derive_buckets(n_rows: int, target_rows: int = 500_000) -> int:
    """Bucket count sized to the DATA, not the cluster: each bucket
    becomes ONE pandas group inside an aggregator heap, so the sizing
    rule is ~``target_rows`` rows per bucket (≈50 MB of packed event
    rows — comfortably inside a worker heap), floored at 8 so small
    inputs still parallelize. Callers can override; results are
    bucket-count invariant (equality-tested in
    tests/test_relational.py)."""
    return max(8, -(-n_rows // target_rows))


def asof_join_events_orders(sf_dir: str, num_buckets: int | None = None):
    """(event_id, o_orderkey): latest order of customer=user_id with
    o_orderdate <= event ts; events with no such order are dropped.

    Two-sided bucketed merge-asof (the scale shape): BOTH sides add a
    ``custkey % num_buckets`` bucket column and shuffle through one
    groupby; each bucket group runs a single vectorized
    ``pd.merge_asof(by=cust)`` — no broadcast order table, no
    per-customer Python loop. Co-partitioning both sides on the same
    key is what makes the per-bucket merge complete.

    ``num_buckets`` defaults to a DATA-derived value (see
    ``_derive_buckets``) — each bucket materializes as one pandas
    group, so it must track input size, not cluster size.
    """
    if num_buckets is None:
        n = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id"]).count()
             + rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey"]).count())
        num_buckets = _derive_buckets(n)

    def ev_side(t: pa.Table) -> pa.Table:
        cust = t.column("user_id").to_numpy()
        return pa.table({
            "bucket": pa.array(cust % num_buckets),
            "cust": pa.array(cust),
            "t": t.column("ts").cast(pa.int64()),
            "id": t.column("event_id"),
            "side": pa.array(np.zeros(len(cust), dtype=np.int8)),
        })

    def ord_side(t: pa.Table) -> pa.Table:
        cust = t.column("o_custkey").to_numpy()
        return pa.table({
            "bucket": pa.array(cust % num_buckets),
            "cust": pa.array(cust),
            "t": t.column("o_orderdate").cast(pa.int64()),
            "id": t.column("o_orderkey"),
            "side": pa.array(np.ones(len(cust), dtype=np.int8)),
        })

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"]).map_batches(
            ev_side, batch_format="pyarrow", zero_copy_batch=True)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            ord_side, batch_format="pyarrow", zero_copy_batch=True)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == 0].sort_values(["t", "id"], kind="stable")
        od = g[g["side"] == 1].sort_values(["t", "id"], kind="stable")
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "o_orderkey": pd.Series([], dtype="int64")})
        if ev.empty or od.empty:
            return empty
        # backward asof per customer; ties on t resolve to the LAST
        # right row in sort order = max o_orderkey (oracle semantics)
        m = pd.merge_asof(ev[["t", "cust", "id"]],
                          od[["t", "cust", "id"]],
                          on="t", by="cust", direction="backward",
                          suffixes=("", "_o"))
        m = m.dropna(subset=["id_o"])
        if m.empty:
            return empty
        return pd.DataFrame({
            "event_id": m["id"].astype(np.int64),
            "o_orderkey": m["id_o"].astype(np.int64)})

    return events.union(orders).groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas")


def range_join_events(sf_dir: str, minutes: int = 60,
                      num_buckets: int | None = None):
    """(event_id, next_event_id): pairs of SAME-USER events where the
    second falls in (ts, ts + minutes] of the first — an interval /
    range join, the general form of the as-of join (which keeps one
    row per probe).

    Shape: hash-bucket on user_id (one groupby shuffle), then one
    vectorized per-bucket sort + two searchsorteds delimiting each
    event's window — no per-user Python loop, no pairwise blowup
    beyond the true output size.
    """
    span_us = np.int64(minutes) * 60_000_000
    if num_buckets is None:
        num_buckets = _derive_buckets(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id"]).count())

    def bucketize(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        return pa.table({
            "bucket": pa.array(u % num_buckets),
            "u": pa.array(u),
            "t": t.column("ts").cast(pa.int64()),
            "id": t.column("event_id"),
        })

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"]).map_batches(
            bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "t", "id"], kind="stable")
        u = g["u"].to_numpy()
        t = g["t"].to_numpy()
        ids = g["id"].to_numpy()
        # per-user time-sorted runs; each run's window bounds come
        # from two searchsorteds and pairs expand with the standard
        # grouped-arange trick (pure numpy, output-sized work)
        out_a, out_b = [], []
        run_starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1])))
        run_ends = np.concatenate((run_starts[1:], [len(u)]))
        for s, e in zip(run_starts, run_ends):
            tt = t[s:e]
            l = np.searchsorted(tt, tt, side="right")
            h = np.searchsorted(tt, tt + span_us, side="right")
            cnt = h - l
            total = int(cnt.sum())
            if total == 0:
                continue
            src = np.repeat(np.arange(e - s), cnt)
            dst = np.repeat(l - cnt.cumsum() + cnt, cnt) \
                + np.arange(total)
            out_a.append(ids[s:e][src])
            out_b.append(ids[s:e][dst])
        if not out_a:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "next_event_id": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "event_id": np.concatenate(out_a).astype(np.int64),
            "next_event_id": np.concatenate(out_b).astype(np.int64)})

    return events.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas")


RANGE_JOIN_SQL = """
    SELECT a.event_id, b.event_id AS next_event_id
    FROM events a JOIN events b
      ON b.user_id = a.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL {minutes} MINUTE
"""


def topk_docs_per_lang(sf_dir: str, k: int = 3):
    """Per-group top-k: the k longest documents (n_tokens desc,
    doc_id asc tiebreak) per language, with dense rank.

    Partial per-batch top-k inside map_batches (the combiner bounds
    the shuffle to k rows per lang per batch), then one tiny
    per-lang merge. Returns (lang, doc_id, n_tokens, rnk).
    """
    from ..functions.text import token_count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"])

    def partial_topk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t.column("lang").to_pylist(),
            "doc_id": t.column("doc_id").to_numpy(),
            "n_tokens": token_count(t.column("text")).to_numpy(),
        })
        df = df.sort_values(["lang", "n_tokens", "doc_id"],
                            ascending=[True, False, True],
                            kind="stable")
        df = df.groupby("lang", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (docs.map_batches(partial_topk, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("lang").map_groups(final_topk,
                                        batch_format="pandas"))


TOPK_PER_LANG_SQL = r"""
    WITH scored AS (
        SELECT lang, doc_id,
               len(regexp_extract_all(text, '\S+')) AS n_tokens
        FROM documents),
         ranked AS (
        SELECT lang, doc_id, n_tokens,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n_tokens DESC, doc_id ASC)
                   AS rnk
        FROM scored)
    SELECT lang, doc_id, n_tokens, rnk FROM ranked WHERE rnk <= {k}
"""


@ray.remote
def _values_at(block: pa.Table, idxs: list[int]) -> list[float]:
    col = block.column("value")
    return [col[i].as_py() for i in idxs]


def quantiles_per_type(sf_dir: str, qs=(0.25, 0.5, 0.9)) -> pa.Table:
    """EXACT per-group quantiles by distributed sort + metadata
    indexing (no per-group materialization): sort (event_type, value)
    range-partitions the data; per-block row counts come from block
    METADATA; each requested quantile maps to one global row index
    (DuckDB quantile_disc semantics: element at max(0, ceil(q*n)-1))
    and only those single rows are fetched, one task per touched
    block. Returns (event_type, q, value).
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    counts = {r["event_type"]: r["count()"]
              for r in ds.groupby("event_type").count().take_all()}

    sorted_ds = ds.sort(["event_type", "value"]).materialize()
    blocks = [(ref, md.num_rows)
              for bundle in sorted_ds.iter_internal_ref_bundles()
              for ref, md in bundle.blocks]
    offsets = np.concatenate(
        [[0], np.cumsum([nr for _, nr in blocks])]).astype(np.int64)

    types = sorted(counts)
    starts = {}
    acc = 0
    for et in types:
        starts[et] = acc
        acc += counts[et]

    # DuckDB quantile_disc index = ceil(q*n) - 1 with q*n taken as the
    # EXACT rational: float ceil(q*n) can land one element high when
    # the double product of an integer-valued q*n rounds up (non-dyadic
    # q, large n) — Fraction keeps the two engines in lockstep
    from fractions import Fraction

    wanted = []  # (event_type, q, global_idx)
    for et in types:
        n_t = counts[et]
        for q in qs:
            exact = Fraction(q).limit_denominator(10**9) * n_t
            ceil_qn = -((-exact.numerator) // exact.denominator)
            idx = min(n_t - 1, max(0, int(ceil_qn) - 1))
            wanted.append((et, float(q), starts[et] + idx))

    by_block: dict[int, list[int]] = {}
    for wi, (_, _, gi) in enumerate(wanted):
        b = int(np.searchsorted(offsets, gi, side="right") - 1)
        by_block.setdefault(b, []).append(wi)
    fetched: dict[int, float] = {}
    refs = {b: _values_at.remote(
        blocks[b][0],
        [int(wanted[wi][2] - offsets[b]) for wi in wis])
        for b, wis in by_block.items()}
    for b, wis in by_block.items():
        for wi, val in zip(wis, ray.get(refs[b])):
            fetched[wi] = val

    return pa.table({
        "event_type": pa.array([w[0] for w in wanted], pa.string()),
        "q": pa.array([w[1] for w in wanted], pa.float64()),
        "value": pa.array([fetched[i] for i in range(len(wanted))],
                          pa.float64()),
    })


QUANTILES_SQL = """
    SELECT event_type, CAST(0.25 AS DOUBLE) AS q,
           quantile_disc(value, 0.25) AS value FROM events GROUP BY 1
    UNION ALL
    SELECT event_type, CAST(0.5 AS DOUBLE), quantile_disc(value, 0.5)
    FROM events GROUP BY 1
    UNION ALL
    SELECT event_type, CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9)
    FROM events GROUP BY 1
"""


def distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type: two shuffles —
    dedup on the pair, then count per type. Both scale freely (the
    pair groupby spreads over the full key space; no hot single
    group). Returns (event_type, distinct_users)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    return (ds.groupby(["event_type", "user_id"]).count()
            .groupby("event_type").count()
            .map_batches(
                lambda t: pa.table({
                    "event_type": t.column("event_type"),
                    "distinct_users": pc.cast(t.column("count()"),
                                              pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True))


DISTINCT_USERS_SQL = """
    SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY event_type
"""


ASOF_JOIN_SQL = """
    SELECT e.event_id,
           (SELECT o.o_orderkey FROM orders o
            WHERE o.o_custkey = e.user_id
              AND o.o_orderdate <= e.ts
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
               AS o_orderkey
    FROM events e
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = e.user_id
                    AND o.o_orderdate <= e.ts)
"""


def sessionize_events(sf_dir: str, gap_minutes: int = 30,
                      num_buckets: int | None = None):
    """Gap-based sessionization: a user's events sorted by (ts,
    event_id) split into sessions wherever the inactivity gap exceeds
    ``gap_minutes``; session_id = the event_id of the session's first
    event (deterministic, join-friendly).

    Shape: the same bucketed batch-log pattern as the range join —
    hash-bucket on user_id (one groupby shuffle, data-derived bucket
    count), then one vectorized per-bucket pass: sort, per-user runs,
    gap flags, cumulative session numbers, first-event broadcast via
    np.maximum.accumulate of start indices. Returns
    (event_id, session_id).
    """
    gap_us = np.int64(gap_minutes) * 60_000_000
    if num_buckets is None:
        num_buckets = _derive_buckets(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id"]).count())

    def bucketize(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        return pa.table({
            "bucket": pa.array(u % num_buckets),
            "u": pa.array(u),
            "t": t.column("ts").cast(pa.int64()),
            "id": t.column("event_id"),
        })

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"]).map_batches(
            bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def sessionize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "session_id": pd.Series([], dtype="int64")})
        g = g.sort_values(["u", "t", "id"], kind="stable")
        u = g["u"].to_numpy()
        t = g["t"].to_numpy()
        ids = g["id"].to_numpy()
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([np.int64(0)], t[1:] - t[:-1]))
        is_start = new_user | (gap > gap_us)
        # index of each row's session-start row: carry the last start
        # index forward with maximum.accumulate
        idx = np.arange(len(u))
        start_idx = np.maximum.accumulate(np.where(is_start, idx, -1))
        return pd.DataFrame({
            "event_id": ids.astype(np.int64),
            "session_id": ids[start_idx].astype(np.int64),
        })

    return events.groupby("bucket").map_groups(
        sessionize_bucket, batch_format="pandas")


SESSIONIZE_SQL = """
    WITH ordered AS (
        SELECT event_id, user_id, ts,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events),
         marks AS (
        SELECT event_id, user_id, ts,
               CASE WHEN prev_ts IS NULL
                      OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
                    THEN 1 ELSE 0 END AS is_start
        FROM ordered),
         sess AS (
        SELECT event_id, user_id, ts,
               SUM(is_start) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS snum
        FROM marks)
    SELECT event_id,
           first_value(event_id) OVER (PARTITION BY user_id, snum
                                       ORDER BY ts, event_id)
               AS session_id
    FROM sess
"""


def modal_event_type_per_user(sf_dir: str):
    """Per-user modal event type (most frequent; ties -> smallest type
    string) — the per-group argmax WITHOUT per-group Python: counts
    via groupby, per-user max via a second groupby, tie-break via a
    min over the equi-count rows joined back on. Every stage is a
    Dataset-native aggregate or partitioned join, so no user's row set
    ever materializes as a Python group. Returns
    (user_id, modal_type, cnt)."""
    from ..stages.join import default_join_partitions, hash_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    counts = (ds.groupby(["user_id", "event_type"]).count()
              .map_batches(
                  lambda t: pa.table({
                      "user_id": t.column("user_id"),
                      "event_type": t.column("event_type"),
                      "cnt": pc.cast(t.column("count()"), pa.int64())})
                  if t.num_rows else
                  pa.table({"user_id": pa.array([], pa.int64()),
                            "event_type": pa.array([], pa.string()),
                            "cnt": pa.array([], pa.int64())}),
                  batch_format="pyarrow", zero_copy_batch=True)
              .materialize())

    mx = counts.groupby("user_id").max("cnt").map_batches(
        lambda t: pa.table({
            "u2": t.column("user_id"),
            "mx": pc.cast(t.column("max(cnt)"), pa.int64())})
        if t.num_rows else
        pa.table({"u2": pa.array([], pa.int64()),
                  "mx": pa.array([], pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True)

    nparts = default_join_partitions()
    mx_schema = [("u2", pa.int64()), ("mx", pa.int64())]
    joined = hash_join(counts, mx, on=("user_id",), right_on=("u2",),
                       left_schema=[("user_id", pa.int64()),
                                    ("event_type", pa.string()),
                                    ("cnt", pa.int64())],
                       right_schema=mx_schema)

    def keep_modal(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        keep = pc.equal(t.column("cnt"), t.column("mx"))
        return pa.table({"user_id": t.column("user_id"),
                         "event_type": t.column("event_type"),
                         "cnt": t.column("cnt")}).filter(keep)

    modal = (joined.map_batches(keep_modal, batch_format="pyarrow",
                                zero_copy_batch=True)
             .repartition(nparts)
             .groupby("user_id").min("event_type"))

    # attach the count back: modal rows are (user, min-type); the
    # count is the user's max, carried via one more tiny join
    m2 = modal.map_batches(
        lambda t: pa.table({
            "u3": t.column("user_id"),
            "modal_type": t.column("min(event_type)")})
        if t.num_rows else
        pa.table({"u3": pa.array([], pa.int64()),
                  "modal_type": pa.array([], pa.string())}),
        batch_format="pyarrow", zero_copy_batch=True).repartition(nparts)
    final = hash_join(m2, mx, on=("u3",), right_on=("u2",),
                      left_schema=[("u3", pa.int64()),
                                   ("modal_type", pa.string())],
                      right_schema=mx_schema)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "modal_type": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"user_id": t.column("u3"),
                         "modal_type": t.column("modal_type"),
                         "cnt": t.column("mx")})

    return final.map_batches(finish, batch_format="pyarrow",
                             zero_copy_batch=True)


MODAL_TYPE_SQL = """
    WITH counts AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
         ranked AS (
        SELECT user_id, event_type, cnt,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type ASC)
                   AS rn
        FROM counts)
    SELECT user_id, event_type AS modal_type, cnt
    FROM ranked WHERE rn = 1
"""


def broadcast_join_orders_customer(sf_dir: str):
    """orders ⋈ customer on custkey — small side broadcast via
    ray.put, vectorized Arrow index_in lookup per batch (no shuffle)."""
    import pyarrow.compute as pc

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"])
    cust_tbl = pa.Table.from_pandas(cust.to_pandas(),
                                    preserve_index=False)
    cref = ray.put(cust_tbl)

    # stateless tasks: the broadcast customer table is a zero-copy
    # plasma get per batch — no actor-pool spin-up for a lookup ref
    def bjoin(t: pa.Table, *, cref) -> pa.Table:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        idx = pc.index_in(t.column("o_custkey"),
                          value_set=c.column("c_custkey"))
        out = pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "o_totalprice": t.column("o_totalprice"),
            "c_name": pc.take(c.column("c_name"), idx),
            "c_mktsegment": pc.take(c.column("c_mktsegment"), idx),
        })
        # inner-join semantics: drop unmatched orders
        return out.filter(pc.is_valid(idx))

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_totalprice"])
    return ds.map_batches(bjoin, fn_kwargs={"cref": cref},
                          batch_format="pyarrow")


BROADCAST_JOIN_SQL = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
"""


def props_key_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer field "k" out of
    the JSON-string ``props`` column (one vectorized RE2 scan per
    batch, no per-row json.loads) and aggregate per event_type.
    Returns (event_type, cnt, k_sum, k_min, k_max) — all integers.

    Partial aggregation inside map_batches (count/sum/min/max per
    type per batch), merged by a groupby with the matching combiners
    (Sum/Sum/Min/Max), so the shuffle carries one row per (batch,
    type), never the parsed values.
    """
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t.column("props"),
                               r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        valid = pc.is_valid(k).to_numpy(zero_copy_only=False)
        if not valid.any():
            # Explicitly typed empty partial: an all-invalid batch would
            # otherwise emit object->null-typed columns via from_pandas,
            # a schema-divergent block into the groupby.
            return pa.table({"event_type": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "k_sum": pa.array([], pa.int64()),
                             "k_min": pa.array([], pa.int64()),
                             "k_max": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "event_type": np.asarray(
                t.column("event_type").to_pylist(), dtype=object)[valid],
            "k": k.to_numpy(zero_copy_only=False)[valid].astype(np.int64),
        })
        g = (df.groupby("event_type", sort=False)
             .agg(cnt=("k", "size"), k_sum=("k", "sum"),
                  k_min=("k", "min"), k_max=("k", "max"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type")
           .aggregate(Sum("cnt"), Sum("k_sum"), Min("k_min"),
                      Max("k_max")))

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "k_sum": pa.array([], pa.int64()),
                             "k_min": pa.array([], pa.int64()),
                             "k_max": pa.array([], pa.int64())})
        return pa.table({
            "event_type": t.column("event_type"),
            "cnt": pc.cast(t.column("sum(cnt)"), pa.int64()),
            "k_sum": pc.cast(t.column("sum(k_sum)"), pa.int64()),
            "k_min": pc.cast(t.column("min(k_min)"), pa.int64()),
            "k_max": pc.cast(t.column("max(k_max)"), pa.int64()),
        })

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


PROPS_KEY_STATS_SQL = r"""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           MIN(k) AS k_min, MAX(k) AS k_max
    FROM (SELECT event_type,
                 CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1),
                             '') AS BIGINT) AS k
          FROM events)
    WHERE k IS NOT NULL
    GROUP BY event_type
"""


def outlier_events(sf_dir: str, q: float = 0.9):
    """Per-type percentile outlier filter: events whose value exceeds
    their type's exact q-quantile. Returns (event_id, event_type,
    value).

    Two-stage composition: the distributed exact-quantile operator
    produces one threshold row per type (O(types) — broadcast via
    ray.put), then a streaming vectorized filter pass. The threshold
    is an actual data value (quantile_disc semantics), so the >
    comparison is float-exact across engines.
    """
    thr = quantiles_per_type(sf_dir, qs=(q,))
    # broadcast READY-TO-USE arrays (Arrow value_set + numpy cuts) so
    # the per-batch filter does zero list->Arrow conversion
    tref = ray.put((thr.column("event_type").combine_chunks(),
                    np.asarray(thr.column("value").to_numpy(),
                               np.float64)))

    # stateless tasks: the broadcast thresholds are a zero-copy
    # plasma get per batch — no actor-pool spin-up for a lookup ref
    def flt(t: pa.Table, *, tref) -> pa.Table:
        types, vals = ray.get(tref) if isinstance(
            tref, ray.ObjectRef) else tref
        pos = pc.index_in(t.column("event_type"),
                          value_set=types).to_numpy(
                              zero_copy_only=False)
        ok = pos == pos
        cut = np.full(t.num_rows, np.inf)
        cut[ok] = vals[pos[ok].astype(np.int64)]
        keep = t.column("value").to_numpy() > cut
        return t.select(["event_id", "event_type",
                         "value"]).filter(pa.array(keep))

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return ds.map_batches(flt, fn_kwargs={"tref": tref},
                          batch_format="pyarrow")


OUTLIER_EVENTS_SQL = """
    WITH thr AS (SELECT event_type, quantile_disc(value, {q}) AS p
                 FROM events GROUP BY 1)
    SELECT e.event_id, e.event_type, e.value
    FROM events e JOIN thr ON thr.event_type = e.event_type
    WHERE e.value > thr.p
"""


# ------------------------------------------------------------- funnel

def funnel_counts(sf_dir: str, date_from: str = "2024-01-01",
                  date_to: str = "2024-01-02",
                  join_partitions: int | None = None) -> pa.Table:
    """Ordered-pair event funnel over a time window: for every
    ordered (type_a, type_b) pair, the number of users with an
    ``type_a`` event strictly BEFORE some ``type_b`` event inside
    [date_from, date_to) — the product-analytics funnel shape.
    "exists a-event < b-event" reduces exactly to
    ``min_ts(a) < max_ts(b)`` per user, so the whole funnel is ONE
    per-(user, type) min/max aggregate + one self-join on user.
    Returns (type_a, type_b, n_users) sorted, exact int64 counts.

    Scale shape: windowed pruned read, per-batch arrow group_by
    combiner for (user, type, min, max) — the shuffle carries one
    row per (user, type, block) — then a partitioned self-join on
    user and a types²-sized groupby of per-batch count partials.
    """
    from ..stages.join import default_join_partitions, hash_join

    lo = np.int64(pd.Timestamp(date_from).value // 1000)
    hi = np.int64(pd.Timestamp(date_to).value // 1000)
    i64, s = pa.int64(), pa.string()
    nparts = join_partitions or default_join_partitions()

    def combine(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], i64),
                          "event_type": pa.array([], s),
                          "mn": pa.array([], i64),
                          "mx": pa.array([], i64)})
        if t.num_rows == 0:
            return empty
        ts = t.column("ts").cast(i64)
        t = pa.table({"user_id": t.column("user_id").cast(i64),
                      "event_type": t.column("event_type"),
                      "ts": ts})
        t = t.filter(pc.and_(
            pc.greater_equal(t.column("ts"), pa.scalar(int(lo), i64)),
            pc.less(t.column("ts"), pa.scalar(int(hi), i64))))
        if t.num_rows == 0:
            return empty
        g = t.group_by(["user_id", "event_type"]).aggregate(
            [("ts", "min"), ("ts", "max")])
        return pa.table({"user_id": g.column("user_id"),
                         "event_type": g.column("event_type"),
                         "mn": g.column("ts_min").cast(i64),
                         "mx": g.column("ts_max").cast(i64)})

    from ray.data.aggregate import Max, Min

    pt = (rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "event_type", "ts"])
          .map_batches(combine, batch_format="pyarrow",
                       zero_copy_batch=True)
          .groupby(["user_id", "event_type"])
          .aggregate(Min("mn"), Max("mx")))

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], i64),
                             "event_type": pa.array([], s),
                             "mn": pa.array([], i64),
                             "mx": pa.array([], i64)})
        return pa.table({"user_id": t.column("user_id"),
                         "event_type": t.column("event_type"),
                         "mn": t.column("min(mn)").cast(i64),
                         "mx": t.column("max(mx)").cast(i64)})

    pt = pt.map_batches(rename, batch_format="pyarrow",
                        zero_copy_batch=True).materialize()

    sch = [("user_id", i64), ("event_type", s), ("mn", i64),
           ("mx", i64)]
    j = hash_join(pt.repartition(nparts), pt, on=("user_id",),
                  left_suffix="_a", right_suffix="_b",
                  left_schema=sch, right_schema=sch)

    def pair_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], s),
                          "type_b": pa.array([], s),
                          "n": pa.array([], i64)})
        if t.num_rows == 0:
            return empty
        keep = pc.and_(
            pc.not_equal(t.column("event_type_a"),
                         t.column("event_type_b")),
            pc.less(t.column("mn_a"), t.column("mx_b")))
        t = t.filter(keep)
        if t.num_rows == 0:
            return empty
        g = (pa.table({"type_a": t.column("event_type_a"),
                       "type_b": t.column("event_type_b")})
             .group_by(["type_a", "type_b"])
             .aggregate([("type_a", "count")]))
        return pa.table({"type_a": g.column("type_a"),
                         "type_b": g.column("type_b"),
                         "n": pc.cast(g.column("type_a_count"), i64)})

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"type_a": pa.array([], s),
                             "type_b": pa.array([], s),
                             "n_users": pa.array([], i64)})
        return pa.table({"type_a": t.column("type_a"),
                         "type_b": t.column("type_b"),
                         "n_users": t.column("sum(n)").cast(i64)})

    out = (j.map_batches(pair_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
           .groupby(["type_a", "type_b"]).sum("n")
           .map_batches(final, batch_format="pyarrow",
                        zero_copy_batch=True))
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    if tbl.num_rows == 0:
        return pa.table({"type_a": pa.array([], s),
                         "type_b": pa.array([], s),
                         "n_users": pa.array([], i64)})
    return tbl.sort_by([("type_a", "ascending"),
                        ("type_b", "ascending")])


FUNNEL_SQL = """
    WITH w AS (SELECT * FROM events
               WHERE ts >= TIMESTAMP '{date_from}'
                 AND ts < TIMESTAMP '{date_to}'),
    pt AS (SELECT user_id, event_type,
                  MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
           FROM w GROUP BY 1, 2)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM pt a JOIN pt b ON b.user_id = a.user_id
    WHERE a.event_type <> b.event_type AND a.mn < b.mx
    GROUP BY 1, 2 ORDER BY 1, 2
"""


def retention_cohorts(sf_dir: str, period_days: int = 7):
    """Cohort retention counts: users bucketed by their FIRST active
    period (cohort), counted once per (cohort, period_offset) they
    were active in — the product-analytics retention triangle. Period
    key = floor(epoch_micros / period) — integral, so it hashes
    identically in DuckDB. Returns (cohort_week, week_offset, n_users)
    sorted, exact int64.

    Scale shape: per-batch (user, period) dedupe bounds the shuffle;
    ONE groupby(user) co-locates each user's periods, and the
    map_groups handler is batch-vectorized (sort + run boundaries +
    reduceat-style firsts — no per-row Python): cohort = min period,
    one output row per distinct (user, period). The final count is a
    tiny groupby over (cohort, offset)."""
    us = np.int64(period_days) * np.int64(86_400_000_000)
    i64 = pa.int64()

    def pair_partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        uid = t.column("user_id").to_numpy()
        pairs = np.unique(np.stack([uid, ts // us], axis=1), axis=0)
        return pa.table({"user_id": pa.array(pairs[:, 0], i64),
                         "week": pa.array(pairs[:, 1], i64)})

    def cohort_rows(t: pa.Table) -> pa.Table:
        """Whole user groups per call (map_groups co-location):
        vectorized cohort/offset emission."""
        if t.num_rows == 0:
            return pa.table({"cohort_week": pa.array([], i64),
                             "week_offset": pa.array([], i64),
                             "n_users": pa.array([], i64)})
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        wk = t.column("week").to_numpy(zero_copy_only=False)
        o = np.lexsort((wk, uid))
        uid, wk = uid[o], wk[o]
        # cross-batch duplicates: drop repeated (user, week) rows
        keep = np.ones(len(uid), dtype=bool)
        keep[1:] = (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])
        uid, wk = uid[keep], wk[keep]
        starts = np.flatnonzero(
            np.r_[True, uid[1:] != uid[:-1]])
        run_id = np.cumsum(np.r_[True, uid[1:] != uid[:-1]]) - 1
        cohort = wk[starts][run_id]          # min week = first (sorted)
        return pa.table({"cohort_week": pa.array(cohort, i64),
                         "week_offset": pa.array(wk - cohort, i64),
                         "n_users": pa.array(
                             np.ones(len(wk), np.int64))})

    out = (rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["ts", "user_id"])
           .map_batches(pair_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("user_id").map_groups(cohort_rows,
                                          batch_format="pyarrow")
           .groupby(["cohort_week", "week_offset"]).sum("n_users"))

    t = out.to_pandas()
    if t.empty:
        return pa.table({"cohort_week": pa.array([], i64),
                         "week_offset": pa.array([], i64),
                         "n_users": pa.array([], i64)})
    t = t.sort_values(["cohort_week", "week_offset"])
    return pa.table({
        "cohort_week": pa.array(t["cohort_week"].to_numpy(), i64),
        "week_offset": pa.array(t["week_offset"].to_numpy(), i64),
        "n_users": pa.array(
            t["sum(n_users)"].to_numpy().astype(np.int64), i64)})


RETENTION_SQL = """
    WITH uw AS (SELECT DISTINCT user_id,
                       epoch_us(ts) // {us} AS week
                FROM events),
         c AS (SELECT user_id, MIN(week) AS cohort FROM uw
               GROUP BY user_id)
    SELECT c.cohort AS cohort_week,
           uw.week - c.cohort AS week_offset,
           COUNT(*) AS n_users
    FROM uw JOIN c USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def audience_overlap(sf_dir: str) -> pa.Table:
    """Pairwise audience overlap between event types: for every pair
    of types with at least one shared user, the EXACT intersection and
    union of their user sets — the integral core of audience Jaccard
    (the one float |∩|/|∪| is the caller's). Returns
    (type_a, type_b, n_common, n_union) with type_a < type_b, sorted.

    Scale shape: per-batch (user, type) dedupe bounds the shuffle; ONE
    groupby(user) co-locates each user's types and the map_groups
    handler is batch-vectorized (sort + shifted-run pair emission, the
    retention_cohorts discipline) — each user emits its ≤ |types|²
    type pairs PLUS a (t, t) self row, so per-type set sizes ride the
    same tiny groupby and n_union = |A| + |B| - |A∩B| is driver
    arithmetic over O(|types|²) rows."""
    i64, s = pa.int64(), pa.string()

    def pair_partial(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy()
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        df = pd.DataFrame({"user_id": uid, "event_type": et})
        df = df.drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def type_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], s),
                          "type_b": pa.array([], s),
                          "cnt": pa.array([], i64)})
        if t.num_rows == 0:
            return empty
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        et = np.asarray(t.column("event_type").to_pylist(),
                        dtype=object)
        o = np.lexsort((et, uid))
        uid, et = uid[o], et[o]
        keep = np.ones(len(uid), dtype=bool)   # cross-batch dupes
        keep[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        uid, et = uid[keep], et[keep]
        ta = [et]                              # (t, t) self rows
        tb = [et]
        d = 1
        while d < len(uid):
            same = uid[d:] == uid[:-d]
            if not same.any():
                break
            idx = np.flatnonzero(same)
            ta.append(et[idx])                 # sorted within a run,
            tb.append(et[idx + d])             # so type_a < type_b
            d += 1
        a = np.concatenate(ta)
        b = np.concatenate(tb)
        return pa.table({"type_a": pa.array(a, s),
                         "type_b": pa.array(b, s),
                         "cnt": pa.array(np.ones(len(a), np.int64))})

    agg = (rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"])
           .map_batches(pair_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("user_id").map_groups(type_pairs,
                                          batch_format="pyarrow")
           .groupby(["type_a", "type_b"]).sum("cnt"))
    t = agg.to_pandas()
    if t.empty:
        return pa.table({"type_a": pa.array([], s),
                         "type_b": pa.array([], s),
                         "n_common": pa.array([], i64),
                         "n_union": pa.array([], i64)})
    selfrows = t[t.type_a == t.type_b]
    sizes = dict(zip(selfrows["type_a"],
                     selfrows["sum(cnt)"].astype(int)))
    t = t[t.type_a != t.type_b].sort_values(["type_a", "type_b"])
    common = t["sum(cnt)"].to_numpy().astype(np.int64)
    union = np.array([sizes[a] + sizes[b] for a, b in
                      zip(t["type_a"], t["type_b"])],
                     np.int64) - common
    return pa.table({
        "type_a": pa.array(t["type_a"], s),
        "type_b": pa.array(t["type_b"], s),
        "n_common": pa.array(common, i64),
        "n_union": pa.array(union, i64)})


AUDIENCE_OVERLAP_SQL = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         c AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
         p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                      COUNT(*) AS common
               FROM ut a JOIN ut b
                 ON b.user_id = a.user_id
                AND b.event_type > a.event_type
               GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.common AS n_common,
           ca.n + cb.n - p.common AS n_union
    FROM p JOIN c ca ON ca.event_type = p.type_a
           JOIN c cb ON cb.event_type = p.type_b
    ORDER BY p.type_a, p.type_b
"""


@ray.remote
def _block_sweep_partial(block: pa.Table):
    """Per-block sweep-line partial for peak_concurrency: the block
    is a globally-ordered slice of (event_type, t, d) boundary rows;
    each event type occupies one contiguous run. Returns one
    (event_type, local_sum, local_max) row per run — the two
    sufficient statistics that let the driver stitch exact per-type
    running maxima across blocks in O(blocks x types)."""
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "local_sum": pa.array([], pa.int64()),
                      "local_max": pa.array([], pa.int64())})
    if block.num_rows == 0:
        return empty
    et = block.column("event_type").to_numpy(zero_copy_only=False)
    d = block.column("d").to_numpy(zero_copy_only=False)
    cum = np.cumsum(d)
    change = np.flatnonzero(et[1:] != et[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(d)]])
    base = np.where(starts > 0, cum[starts - 1], 0)
    runmax = np.maximum.reduceat(cum, starts)
    return pa.table({
        "event_type": pa.array(et[starts], pa.string()),
        "local_sum": pa.array(cum[ends - 1] - base, pa.int64()),
        "local_max": pa.array(runmax - base, pa.int64())})


def peak_concurrency(sf_dir: str,
                     window_minutes: int = 30) -> pa.Table:
    """Max concurrent sessions per event type: each event opens a
    half-open interval [ts, ts + window); the answer is the maximum
    number of simultaneously open intervals — the classic sweep-line
    max-overlap, run distributed. Returns (event_type,
    max_concurrent), exact int64, ordered by event_type.

    Scale shape: ONE map emits the +1/-1 boundary rows; ONE Dataset
    sort by (event_type, t, d) range-partitions them into globally
    ordered blocks (d ascending puts closings before openings at
    equal instants — the half-open semantics); per block a remote
    task reduces each type's contiguous run to (sum, max-prefix) —
    np.cumsum + reduceat, no Python loop — and the driver stitches
    the O(blocks x types) partials with a running carry, the
    edges_from_events boundary discipline. Nothing row-scale ever
    reaches the driver, and the prefix sums never re-shuffle."""
    win_us = np.int64(window_minutes) * 60_000_000
    i64, s = pa.int64(), pa.string()

    def boundaries(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], s),
                             "t": pa.array([], i64),
                             "d": pa.array([], i64)})
        ts = t.column("ts").cast(i64).to_numpy()
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": pa.array(np.concatenate([et, et]), s),
            "t": pa.array(np.concatenate([ts, ts + win_us]), i64),
            "d": pa.array(np.concatenate(
                [np.ones(len(ts), np.int64),
                 -np.ones(len(ts), np.int64)]), i64)})

    sorted_ds = (rd.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["ts", "event_type"])
                 .map_batches(boundaries, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .sort(["event_type", "t", "d"]).materialize())
    block_refs = [ref for bundle in
                  sorted_ds.iter_internal_ref_bundles()
                  for ref, _ in bundle.blocks]
    partials = ray.get([_block_sweep_partial.remote(b)
                        for b in block_refs])

    carry: dict[str, int] = {}
    peak: dict[str, int] = {}
    for tbl in partials:  # blocks arrive in global sort order
        for et, ls, lm in zip(
                tbl.column("event_type").to_pylist(),
                tbl.column("local_sum").to_pylist(),
                tbl.column("local_max").to_pylist()):
            c = carry.get(et, 0)
            peak[et] = max(peak.get(et, -2**63), c + lm)
            carry[et] = c + ls
    types = sorted(peak)
    return pa.table({
        "event_type": pa.array(types, s),
        "max_concurrent": pa.array([peak[t] for t in types], i64)})


PEAK_CONCURRENCY_SQL = """
    WITH b AS (
        SELECT event_type, ts AS t, 1 AS d FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL {window_minutes} MINUTE,
               -1 AS d
        FROM events),
    p AS (SELECT event_type,
                 SUM(d) OVER (PARTITION BY event_type
                              ORDER BY t, d
                              ROWS UNBOUNDED PRECEDING) AS c
          FROM b)
    SELECT event_type, CAST(MAX(c) AS BIGINT) AS max_concurrent
    FROM p GROUP BY 1 ORDER BY 1
"""


def latest_event_per_user(sf_dir: str):
    """The changelog -> snapshot operator (SCD-style upsert dedupe):
    each user's LATEST event row under the total order
    (ts DESC, event_id DESC). Returns a Dataset (user_id, event_id,
    ts, event_type, value) sorted by user_id.

    Scale shape: the per-user argmax runs through the shuffle-free
    tree combine (``walks.lexmin_per_key`` on negated keys — exact
    groupby fallback past its one-block bound), so the full rows
    never enter a shuffle; only the per-user WINNER ids come back,
    and the payload columns arrive via a broadcast id-set filter on
    a second scan (flip to a partitioned hash join on event_id when
    the user count outgrows the broadcast — the returned ids are
    user-scale, not event-scale)."""
    from ..graph.walks import lexmin_per_key
    from ..stages.join import default_join_partitions

    i64 = pa.int64()

    def cand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], i64),
                             "a": pa.array([], i64),
                             "b": pa.array([], i64)})
        return pa.table({
            "key": t.column("user_id"),
            "a": pa.array(-t.column("ts").cast(i64).to_numpy(), i64),
            "b": pa.array(-t.column("event_id").to_numpy(), i64)})

    rows = (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id"])
            .map_batches(cand, batch_format="pyarrow",
                         zero_copy_batch=True))
    win = lexmin_per_key(rows, default_join_partitions()).to_pandas()
    ids = ray.put(pa.array((-win["b"].to_numpy()).astype(np.int64)))

    def fetch(t: pa.Table, *, ids) -> pa.Table:
        keys = ray.get(ids) if isinstance(ids, ray.ObjectRef) else ids
        return t.filter(pc.is_valid(
            pc.index_in(t.column("event_id"), value_set=keys)))

    return (rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"])
        .map_batches(fetch, fn_kwargs={"ids": ids},
                     batch_format="pyarrow")
        .sort("user_id"))


LATEST_EVENT_SQL = """
    SELECT user_id, event_id, ts, event_type, value
    FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    ORDER BY user_id
"""


def user_activity_reconciliation(sf_dir: str):
    """FULL OUTER JOIN reconciliation between two fact tables: every
    user_id/custkey appearing in events OR orders, with both activity
    counts (0 where absent). Returns a Dataset (user_id, n_events,
    n_orders) sorted by user_id, exact int64.

    Scale shape: the outer join never materializes as a join at all —
    each side reduces to per-key counts with per-batch combiners,
    the two count tables UNION with the counts in separate columns
    (the tag-union discipline: (k, n, 0) vs (k, 0, n)), and one
    groupby-sum reconciles. Absence falls out as a zero, so there is
    no null handling and no anti-join."""
    i64 = pa.int64()

    def side(col: str, out: str, other: str):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"user_id": pa.array([], i64),
                                 "n_events": pa.array([], i64),
                                 "n_orders": pa.array([], i64)})
            g = (pa.table({"user_id": t.column(col)})
                 .group_by(["user_id"])
                 .aggregate([("user_id", "count")]))
            n = g.column("user_id_count").cast(i64)
            z = pa.array(np.zeros(g.num_rows, np.int64), i64)
            return pa.table({"user_id": g.column("user_id"),
                             out: n, other: z}
                            ).select(["user_id", "n_events",
                                      "n_orders"])
        return f

    ev = (rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id"])
          .map_batches(side("user_id", "n_events", "n_orders"),
                       batch_format="pyarrow", zero_copy_batch=True))
    od = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey"])
          .map_batches(side("o_custkey", "n_orders", "n_events"),
                       batch_format="pyarrow", zero_copy_batch=True))
    return (ev.union(od).groupby("user_id")
            .aggregate(rd.aggregate.Sum("n_events",
                                        alias_name="n_events"),
                       rd.aggregate.Sum("n_orders",
                                        alias_name="n_orders"))
            .sort("user_id"))


RECONCILIATION_SQL = """
    WITH e AS (SELECT user_id, COUNT(*) AS n_events
               FROM events GROUP BY 1),
         o AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders
               FROM orders GROUP BY 1)
    SELECT COALESCE(e.user_id, o.user_id) AS user_id,
           COALESCE(e.n_events, 0) AS n_events,
           COALESCE(o.n_orders, 0) AS n_orders
    FROM e FULL OUTER JOIN o ON o.user_id = e.user_id
    ORDER BY 1
"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(sf_dir: str, types=_PIVOT_TYPES):
    """The fixed-category PIVOT: per-user event counts spread across
    one column per (closed, a-priori) category list, plus n_other for
    anything outside it — so the output schema never depends on the
    data. Returns a Dataset (user_id, n_<type>..., n_other) sorted by
    user_id, exact int64.

    Scale shape: per-batch combiners reduce each batch to one row
    per (user, batch) with the counts already spread (a bincount over
    category codes — no per-category pass); one groupby sums the
    columns. The category list rides the closure, never the wire."""
    i64 = pa.int64()
    tlist = list(types)
    cols = [f"n_{t}" for t in tlist] + ["n_other"]
    cats = pa.array(tlist, pa.string())

    def spread(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], i64),
                             **{c: pa.array([], i64) for c in cols}})
        u = t.column("user_id").to_numpy()
        code = pc.index_in(t.column("event_type"),
                           value_set=cats).to_numpy(
                               zero_copy_only=False)
        # not-found -> n_other; NULL event_type -> a DISCARD column
        # (SQL FILTER semantics: NULL NOT IN (...) is NULL, so null
        # rows count NOWHERE — but their user still groups, as it
        # does under GROUP BY user_id)
        isnull = ~pc.is_valid(t.column("event_type")).to_numpy(
            zero_copy_only=False)
        code = np.where(code == code, code, len(tlist)).astype(np.int64)
        code[isnull] = len(tlist) + 1
        uu, inv = np.unique(u, return_inverse=True)
        m = np.zeros((len(uu), len(tlist) + 2), np.int64)
        np.add.at(m, (inv, code), 1)
        return pa.table({"user_id": pa.array(uu, i64),
                         **{c: pa.array(m[:, i], i64)
                            for i, c in enumerate(cols)}})

    agg = (rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"])
           .map_batches(spread, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("user_id")
           .aggregate(*[rd.aggregate.Sum(c, alias_name=c)
                        for c in cols]))
    return agg.sort("user_id")


def event_type_pivot_sql(types=_PIVOT_TYPES) -> str:
    cases = ",\n           ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
        for t in types)
    in_list = ", ".join(f"'{t}'" for t in types)
    return f"""
    SELECT user_id,
           {cases},
           COUNT(*) FILTER (WHERE event_type NOT IN ({in_list}))
               AS n_other
    FROM events GROUP BY 1 ORDER BY 1
"""


def table_profile(ds, columns):
    """Data-quality profile: one row per column with (n_rows, n_null,
    n_distinct) — the ingest-validation operator. Exact int64;
    returns a pa.Table sorted by column name.

    Scale shape: one pass per column — a per-batch combiner emits the
    batch's DEDUPED values (float64/timestamp columns go through
    their int64 BIT PATTERNS, an injective recode, so every distinct
    shuffle runs on int64/string keys and float equality semantics
    never cross the wire) plus a (rows, nulls) scalar partial; one
    groupby-count per column reduces to the distinct count. The
    shuffles carry batch-deduped values, never raw rows."""
    i64, s = pa.int64(), pa.string()
    stats = {}

    for col in columns:
        def partial(t: pa.Table, *, col=col) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"k": pa.array([], s),
                                 "rows": pa.array([], i64),
                                 "nulls": pa.array([], i64)})
            c = t.column(col).combine_chunks()
            nulls = c.null_count
            valid = c.drop_null()
            if pa.types.is_floating(valid.type):
                # canonicalize before the bit recode: -0.0 -> +0.0
                # (x + 0.0) and every NaN payload -> one NaN, so
                # DISTINCT agrees with SQL float equality semantics
                v = valid.to_numpy(zero_copy_only=False) + 0.0
                v[np.isnan(v)] = np.nan
                keys = pa.array(v.view(np.int64).astype(str), s)
            elif pa.types.is_temporal(valid.type) or \
                    pa.types.is_integer(valid.type):
                keys = valid.cast(i64).cast(s)
            else:
                keys = valid.cast(s)
            u = pc.unique(keys)
            rows = np.zeros(len(u), np.int64)
            nl = np.zeros(len(u), np.int64)
            if len(u) > 0:
                rows[0] = t.num_rows
                nl[0] = nulls
                return pa.table({"k": u, "rows": pa.array(rows, i64),
                                 "nulls": pa.array(nl, i64)})
            return pa.table({"k": pa.array(["\x00all-null"], s),
                             "rows": pa.array([t.num_rows], i64),
                             "nulls": pa.array([nulls], i64)})

        agg = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("k")
               .aggregate(rd.aggregate.Sum("rows", alias_name="rows"),
                          rd.aggregate.Sum("nulls",
                                           alias_name="nulls")))

        def fold(t: pa.Table) -> pa.Table:
            k = t.column("k").to_numpy(zero_copy_only=False)
            real = k != "\x00all-null"
            return pa.table({
                "n_rows": pa.array(
                    [int(t.column("rows").to_numpy().sum())], i64),
                "n_null": pa.array(
                    [int(t.column("nulls").to_numpy().sum())], i64),
                "n_distinct": pa.array([int(real.sum())], i64)})

        r = (agg.map_batches(fold, batch_format="pyarrow",
                             zero_copy_batch=True)
             .aggregate(rd.aggregate.Sum("n_rows",
                                         alias_name="n_rows"),
                        rd.aggregate.Sum("n_null",
                                         alias_name="n_null"),
                        rd.aggregate.Sum("n_distinct",
                                         alias_name="n_distinct")))
        stats[col] = (int(r["n_rows"] or 0), int(r["n_null"] or 0),
                      int(r["n_distinct"] or 0))

    names = sorted(stats)
    return pa.table({
        "column": pa.array(names, s),
        "n_rows": pa.array([stats[c][0] for c in names], i64),
        "n_null": pa.array([stats[c][1] for c in names], i64),
        "n_distinct": pa.array([stats[c][2] for c in names], i64)})


def events_profile_sql(columns) -> str:
    parts = [
        f"""SELECT '{c}' AS "column", COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               COUNT(DISTINCT {c}) AS n_distinct FROM events"""
        for c in columns]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


def session_paths(sf_dir: str, gap_minutes: int = 30,
                  max_len: int = 5, k: int = 20,
                  num_buckets: int | None = None) -> pa.Table:
    """Top-``k`` session event-type PATHS (the first ``max_len``
    types of each session, '>'-joined) with their session counts —
    the sequence-mining / funnel-path primitive. Total order
    (cnt DESC, path ASC) makes the LIMIT exact. Exact int64 counts.

    Scale shape: ONE bucketed pass does sessionize AND path assembly
    (the sessionize_events bucket pattern: hash-bucket on user, one
    vectorized sort + gap-flag + start-carry per bucket; the
    '>'-join is the bounded per-bucket assembly the map_groups
    exception exists for), emitting per-bucket (path, cnt) partials
    — the shuffle carries path VOCABULARY, never sessions; a tiny
    groupby + sort/limit finishes."""
    gap_us = np.int64(gap_minutes) * 60_000_000
    i64, s = pa.int64(), pa.string()
    if num_buckets is None:
        num_buckets = _derive_buckets(
            rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id"]).count())

    def bucketize(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy()
        return pa.table({
            "bucket": pa.array(u % num_buckets),
            "u": pa.array(u),
            "t": t.column("ts").cast(i64),
            "id": t.column("event_id"),
            "et": t.column("event_type"),
        })

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]
    ).map_batches(bucketize, batch_format="pyarrow",
                  zero_copy_batch=True)

    def paths_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "path": pd.Series([], dtype="object"),
                "cnt": pd.Series([], dtype="int64")})
        g = g.sort_values(["u", "t", "id"], kind="stable")
        u = g["u"].to_numpy()
        t = g["t"].to_numpy()
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([np.int64(0)], t[1:] - t[:-1]))
        is_start = new_user | (gap > gap_us)
        idx = np.arange(len(u))
        start_idx = np.maximum.accumulate(np.where(is_start, idx, -1))
        pos = idx - start_idx
        keep = pos < max_len
        # NULL event_type -> '' (total function on both engines: the
        # oracle COALESCEs identically; raw string_agg would skip
        # NULLs and silently shorten paths)
        et = pd.Series(g["et"].to_numpy()[keep]).fillna("").to_numpy()
        df = pd.DataFrame({"sess": start_idx[keep], "et": et})
        paths = df.groupby("sess", sort=False)["et"].agg(">".join)
        vc = paths.value_counts()
        return pd.DataFrame({"path": vc.index.to_numpy(),
                             "cnt": vc.to_numpy().astype(np.int64)})

    agg = (events.groupby("bucket").map_groups(
        paths_bucket, batch_format="pandas")
        .groupby("path").sum("cnt"))
    t = agg.to_pandas()
    if t.empty:
        return pa.table({"path": pa.array([], s),
                         "cnt": pa.array([], i64)})
    t["cnt"] = t["sum(cnt)"].astype("int64")
    t = t.sort_values(["cnt", "path"],
                      ascending=[False, True]).head(k)
    return pa.table({"path": pa.array(t["path"], s),
                     "cnt": pa.array(t["cnt"].to_numpy(), i64)})


def session_paths_sql(gap_us: int, max_len: int = 5,
                      k: int = 20) -> str:
    sess = SESSIONIZE_SQL.format(gap_us=gap_us)
    return f"""
    WITH sessmap AS ({sess}),
         r AS (SELECT e.event_type, sm.session_id,
                      row_number() OVER (
                          PARTITION BY sm.session_id
                          ORDER BY e.ts, e.event_id) AS rn
               FROM events e
               JOIN sessmap sm ON sm.event_id = e.event_id),
         p AS (SELECT session_id,
                      string_agg(COALESCE(event_type, ''), '>'
                                 ORDER BY rn) AS path
               FROM r WHERE rn <= {max_len} GROUP BY 1)
    SELECT path, COUNT(*) AS cnt FROM p
    GROUP BY 1 ORDER BY cnt DESC, path
    LIMIT {k}
"""
