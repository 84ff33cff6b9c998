"""Warehouse-shaped pipelines over the TPC-H-ish tables.

Two classic shapes a data-engine user expects, expressed
Ray-Data-first:

  pricing_summary     TPC-H Q1 shape — pruned read + per-batch
                      partial aggregation (the combiner bounds the
                      shuffle to a handful of rows per batch) + one
                      tiny groupby. The scan is the whole cost; the
                      shuffle is O(groups).
  top_revenue_orders  TPC-H Q3 shape — small-side broadcast semi-join
                      (segment-filtered customers via ray.put +
                      index_in), date-filtered orders, partitioned
                      hash join against the date-filtered lineitem
                      table, per-batch partial revenue aggregation,
                      top-k by (revenue desc, orderkey).

Float parity with the DuckDB oracles: price inputs carry 2 decimals;
sums are rounded to 2 decimals, where double accumulation error
(~1e-6 absolute at these magnitudes) cannot straddle a rounding
boundary in practice (same rule as windowed_event_agg).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

# epoch micros for the date cutoffs (events/orders span 1995..2001)
_Q1_CUTOFF = "1998-09-02"
_Q3_DATE = "1998-01-01"


def _ts_us(date_str: str) -> np.int64:
    return np.int64(pd.Timestamp(date_str).value // 1000)


def pricing_summary(sf_dir: str):
    """Per (returnflag, linestatus): row count and quantity / price /
    discounted-price / charged sums over lineitems shipped on or
    before _Q1_CUTOFF. Returns (l_returnflag, l_linestatus, sum_qty,
    sum_base_price, sum_disc_price, sum_charge, count_order)."""
    cutoff = _ts_us(_Q1_CUTOFF)

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = ship <= cutoff
        df = pd.DataFrame({
            "l_returnflag": np.asarray(
                t.column("l_returnflag").to_pylist(), dtype=object)[keep],
            "l_linestatus": np.asarray(
                t.column("l_linestatus").to_pylist(), dtype=object)[keep],
            "qty": t.column("l_quantity").to_numpy()[keep],
            "price": t.column("l_extendedprice").to_numpy()[keep],
        })
        disc = t.column("l_discount").to_numpy()[keep]
        tax = t.column("l_tax").to_numpy()[keep]
        df["disc_price"] = df["price"] * (1.0 - disc)
        df["charge"] = df["disc_price"] * (1.0 + tax)
        g = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
             .agg(sum_qty=("qty", "sum"),
                  sum_base_price=("price", "sum"),
                  sum_disc_price=("disc_price", "sum"),
                  sum_charge=("charge", "sum"),
                  count_order=("qty", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .sum(["sum_qty", "sum_base_price", "sum_disc_price",
                 "sum_charge", "count_order"]))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty": pa.array([], pa.float64()),
                "sum_base_price": pa.array([], pa.float64()),
                "sum_disc_price": pa.array([], pa.float64()),
                "sum_charge": pa.array([], pa.float64()),
                "count_order": pa.array([], pa.int64())})
        cols = {"l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus")}
        for c in ("sum_qty", "sum_base_price", "sum_disc_price",
                  "sum_charge"):
            cols[c] = pa.array(
                np.round(t.column(f"sum({c})").to_numpy(), 2))
        cols["count_order"] = pc.cast(t.column("sum(count_order)"),
                                      pa.int64())
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


PRICING_SUMMARY_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
               AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     * (1 + l_tax)), 2) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
"""


def top_revenue_orders(sf_dir: str, segment: str = "BUILDING",
                       k: int = 10) -> pa.Table:
    """TPC-H Q3 shape: revenue of lineitems shipped after _Q3_DATE,
    for orders placed before it by customers of ``segment``; top-k by
    (revenue desc, o_orderkey asc). Returns
    (o_orderkey, revenue, o_orderdate_us).

    Join strategy by side size: customer keys BROADCAST (ray.put +
    index_in semi-join inside the orders scan); orders ⋈ lineitem is
    a partitioned hash join (both sides big at scale). Revenue
    pre-aggregates per batch before the per-order groupby.
    """
    from ..stages.join import default_join_partitions, hash_join

    date = _ts_us(_Q3_DATE)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    keys = cust.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"),
                                    pa.scalar(segment)))
        .select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    kref = ray.put(pa.array(keys["c_custkey"].to_numpy()))

    class OrdersSemi:
        def __init__(self, kref):
            self.keys = ray.get(kref) if isinstance(
                kref, ray.ObjectRef) else kref

        def __call__(self, t: pa.Table) -> pa.Table:
            od = t.column("o_orderdate").cast(pa.int64())
            keep = pc.and_(
                pc.is_valid(pc.index_in(t.column("o_custkey"),
                                        value_set=self.keys)),
                pc.less(od, pa.scalar(int(date), pa.int64())))
            return pa.table({
                "o_orderkey": t.column("o_orderkey"),
                "o_orderdate_us": od,
            }).filter(keep)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            OrdersSemi, fn_constructor_args=(kref,),
            batch_format="pyarrow", concurrency=(1, 4))

    def li_side(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = ship > date
        price = t.column("l_extendedprice").to_numpy()[keep]
        disc = t.column("l_discount").to_numpy()[keep]
        okey = t.column("l_orderkey").to_numpy()[keep]
        # per-batch partial per-order revenue (combiner)
        df = (pd.DataFrame({"l_orderkey": okey,
                            "rev": price * (1.0 - disc)})
              .groupby("l_orderkey", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]).map_batches(
            li_side, batch_format="pyarrow", zero_copy_batch=True)
    rev = lineitem.groupby("l_orderkey").sum("rev")

    nparts = default_join_partitions()
    joined = hash_join(rev.repartition(nparts), orders,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.float64()),
                "o_orderdate_us": pa.array([], pa.int64())})
        return pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "revenue": pa.array(np.round(
                t.column("sum(rev)").to_numpy(), 2)),
            "o_orderdate_us": t.column("o_orderdate_us"),
        })

    top = (joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)
           .sort(["revenue", "o_orderkey"], descending=[True, False])
           .limit(k))
    return pa.Table.from_pandas(top.to_pandas(), preserve_index=False)


def bloom_pruned_order_lines(sf_dir: str, priority: str = "1-URGENT",
                             fp_rate: float = 0.01,
                             use_bloom: bool = True):
    """Per-order lineitem rollup for orders of ``priority``, with the
    BIG side Bloom-pruned before any shuffle — the selective-join
    scale pattern. Returns (orderkey, n_lines, sum_qty).

    The small side (priority-filtered orders) builds a mergeable
    Bloom filter over o_orderkey (per-batch sketches, OR-merge; only
    m/8-byte blobs cross the wire). The filter broadcasts once via
    ray.put; a vectorized membership test prunes lineitem rows at the
    scan, so the per-order combiner + groupby + exact semi-join
    shuffle only matching rows plus the fp_rate sliver (which the
    exact join removes). ``use_bloom=False`` runs the identical plan
    unpruned — results are equal by construction (equality-tested);
    the filter is pure shuffle-traffic reduction.
    """
    from ..stages.bloom import bloom_prune, build_bloom
    from ..stages.join import default_join_partitions, hash_join

    keys = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(pc.equal(t.column("o_orderpriority"),
                                        pa.scalar(priority)))
            .select(["o_orderkey"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    if use_bloom:
        bloom = build_bloom(keys, "o_orderkey",
                            n_expected=keys.count(), fp_rate=fp_rate)
        li = bloom_prune(li, bloom, "l_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        df = (pd.DataFrame({
                "l_orderkey": t.column("l_orderkey").to_numpy(),
                "qty": t.column("l_quantity").to_numpy()})
              .groupby("l_orderkey", sort=False)
              .agg(n_lines=("qty", "size"), qty=("qty", "sum"))
              .reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (li.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("l_orderkey").sum(["n_lines", "qty"]))

    joined = hash_join(agg.repartition(default_join_partitions()),
                       keys, on=("l_orderkey",),
                       right_on=("o_orderkey",))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"orderkey": pa.array([], pa.int64()),
                             "n_lines": pa.array([], pa.int64()),
                             "sum_qty": pa.array([], pa.float64())})
        return pa.table({
            "orderkey": t.column("l_orderkey"),
            "n_lines": pc.cast(t.column("sum(n_lines)"), pa.int64()),
            "sum_qty": pa.array(np.round(
                t.column("sum(qty)").to_numpy(), 2)),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


BLOOM_JOIN_SQL = """
    SELECT l.l_orderkey AS orderkey,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '{priority}'
    GROUP BY 1
"""


TOP_REVENUE_SQL = f"""
    SELECT o.o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue,
           epoch_us(o.o_orderdate) AS o_orderdate_us
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{{segment}}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT {{k}}
"""
