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
    sum_base_price, sum_disc_price, sum_charge, count_order).

    Exactness: every input sits on the 2dp grid, so the sums
    accumulate as EXACT integers — qty, price cents, disc_price in
    10^-4-dollar units (price_c * (100 - disc_c)) and charge in
    10^-6 units (* (100 + tax_c)). The two wide units carry as
    (hi, lo) limbs split at 10^12 (a batch sum stays under 2^63; the
    limb split keeps the GLOBAL sum exact at any row count), and the
    final cents round half-away in INTEGER arithmetic, so the float
    output is identical on both engines by construction — no
    accumulation-order or .005-boundary sensitivity (which bit a
    parallel float sum at sf0.001)."""
    cutoff = _ts_us(_Q1_CUTOFF)
    i64, f64, s = pa.int64(), pa.float64(), pa.string()
    LIMB = 10 ** 12
    num_cols = ["sum_qty", "base_c", "disc_hi", "disc_lo",
                "charge_hi", "charge_lo", "count_order"]
    empty = pa.table({
        "l_returnflag": pa.array([], s),
        "l_linestatus": pa.array([], s),
        **{c: pa.array([], i64) for c in num_cols}})

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(i64).to_numpy()
        keep = ship <= cutoff
        if not keep.any():
            return empty
        qty = np.rint(t.column("l_quantity").to_numpy()[keep]
                      ).astype(np.int64)
        price_c = _cents(t.column("l_extendedprice").to_numpy()[keep])
        d_c = np.rint(t.column("l_discount").to_numpy()[keep] * 100.0
                      ).astype(np.int64)
        t_c = np.rint(t.column("l_tax").to_numpy()[keep] * 100.0
                      ).astype(np.int64)
        disc_u = price_c * (100 - d_c)          # 10^-4 dollars
        charge_u = disc_u * (100 + t_c)         # 10^-6 dollars
        df = pd.DataFrame({
            "l_returnflag": np.asarray(
                t.column("l_returnflag").to_pylist(),
                dtype=object)[keep],
            "l_linestatus": np.asarray(
                t.column("l_linestatus").to_pylist(),
                dtype=object)[keep],
            "sum_qty": qty, "base_c": price_c,
            "disc": disc_u, "charge": charge_u, "count_order": 1})
        g = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
             .sum().reset_index())
        # limb-split the wide sums so groupby-sum stays exact int64
        out = {"l_returnflag": pa.array(g["l_returnflag"], s),
               "l_linestatus": pa.array(g["l_linestatus"], s)}
        for name, col in (("disc", "disc"), ("charge", "charge")):
            v = g[col].to_numpy()
            out[f"{name}_hi"] = pa.array(v // LIMB, i64)
            out[f"{name}_lo"] = pa.array(v % LIMB, i64)
        for c in ("sum_qty", "base_c", "count_order"):
            out[c] = pa.array(g[c].to_numpy().astype(np.int64), i64)
        return pa.table({k: out[k]
                         for k in ["l_returnflag", "l_linestatus"]
                         + num_cols})

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax",
                 "l_shipdate"])
    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .sum(num_cols))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], s),
                "l_linestatus": pa.array([], s),
                "sum_qty": pa.array([], f64),
                "sum_base_price": pa.array([], f64),
                "sum_disc_price": pa.array([], f64),
                "sum_charge": pa.array([], f64),
                "count_order": pa.array([], i64)})
        # exact python ints (O(groups) rows); half-away integer
        # rounding to cents, then ONE shared float division
        def exact(hi, lo):
            return [int(a) * LIMB + int(b) for a, b in zip(
                t.column(hi).to_pylist(), t.column(lo).to_pylist())]
        disc = exact("sum(disc_hi)", "sum(disc_lo)")
        charge = exact("sum(charge_hi)", "sum(charge_lo)")
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "sum_qty": pa.array(
                [float(x) for x in
                 t.column("sum(sum_qty)").to_pylist()], f64),
            "sum_base_price": pa.array(
                [int(x) / 100.0 for x in
                 t.column("sum(base_c)").to_pylist()], f64),
            "sum_disc_price": pa.array(
                [((x + 50) // 100) / 100.0 for x in disc], f64),
            "sum_charge": pa.array(
                [((x + 5000) // 10000) / 100.0 for x in charge], f64),
            "count_order": pc.cast(t.column("sum(count_order)"),
                                   i64)})

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


PRICING_SUMMARY_SQL = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)
               AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
               AS sum_base_price,
           ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             + 50) // 100) / 100.0 AS sum_disc_price,
           ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                 * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
             + 5000) // 10000) / 100.0 AS sum_charge,
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

    # stateless tasks: the broadcast key set is a zero-copy plasma
    # get per batch — no actor-pool spin-up for a lookup ref
    def orders_semi(t: pa.Table, *, kref) -> pa.Table:
        keys = ray.get(kref) if isinstance(
            kref, ray.ObjectRef) else kref
        od = t.column("o_orderdate").cast(pa.int64())
        keep = pc.and_(
            pc.is_valid(pc.index_in(t.column("o_custkey"),
                                    value_set=keys)),
            pc.less(od, pa.scalar(int(date), pa.int64())))
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_orderdate_us": od,
        }).filter(keep)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            orders_semi, fn_kwargs={"kref": kref},
            batch_format="pyarrow")

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


def revenue_by_nation(sf_dir: str, region: str = "ASIA",
                      date_from: str = "1996-01-01",
                      date_to: str = "1998-01-01"):
    """TPC-H Q5 shape: per-nation revenue from lineitems whose
    SUPPLIER sits in the same nation as the ordering CUSTOMER, for
    customers of ``region`` and orders in [date_from, date_to).
    Returns (n_name, revenue).

    Join strategy by side size (the Q5 textbook plan, Ray-Data-first):
    region ⋈ nation collapses to a driver-side nation set (25 rows —
    genuinely constant); customer pre-filters to the region's nations
    BEFORE the join so the orders exchange only carries region
    customers; orders ⋈ customer and lineitem ⋈ orders are partitioned
    hash joins (all three big at scale); supplier's (suppkey ->
    nationkey) map broadcasts via ray.put (here 100 rows; at TPC-H
    scale supplier grows linearly — flip that lookup to a fourth hash
    join, same shape as the other two). Revenue pre-aggregates per
    batch before the O(nations) groupby.
    """
    from ..stages.join import default_join_partitions, hash_join

    lo, hi = _ts_us(date_from), _ts_us(date_to)

    # region -> nation keys + names (25 rows; driver-side constant)
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    regk = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    regk = set(regk.loc[regk["r_name"] == region, "r_regionkey"])
    nation = nation[nation["n_regionkey"].isin(regk)]
    nat_keys = pa.array(nation["n_nationkey"].to_numpy())
    nat_names = dict(zip(nation["n_nationkey"], nation["n_name"]))

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).map_batches(
            lambda t: t.filter(pc.is_valid(pc.index_in(
                t.column("c_nationkey"), value_set=nat_keys))),
            batch_format="pyarrow", zero_copy_batch=True)

    def orders_side(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(od, pa.scalar(int(lo))),
                       pc.less(od, pa.scalar(int(hi))))
        return t.select(["o_orderkey", "o_custkey"]).filter(keep)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            orders_side, batch_format="pyarrow", zero_copy_batch=True)

    nparts = default_join_partitions()
    j1 = hash_join(orders, cust, on=("o_custkey",),
                   right_on=("c_custkey",)).repartition(nparts)

    def li_side(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_suppkey": t.column("l_suppkey"),
            "rev": pa.array(price * (1.0 - disc)),
        })

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(
            li_side, batch_format="pyarrow", zero_copy_batch=True)
    j2 = hash_join(lineitem, j1, on=("l_orderkey",),
                   right_on=("o_orderkey",)).repartition(nparts)

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]
                           ).to_pandas()
    sref = ray.put((pa.array(supp["s_suppkey"].to_numpy()),
                    supp["s_nationkey"].to_numpy()))

    # stateless tasks: the broadcast suppkey->nationkey lookup is a
    # zero-copy plasma get per batch; filter supp_nation ==
    # cust_nation + partial agg per batch
    def same_nation_rev(t: pa.Table, *, sref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_nationkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        skeys, snation = ray.get(sref) if isinstance(
            sref, ray.ObjectRef) else sref
        pos = pc.index_in(t.column("l_suppkey"),
                          value_set=skeys).to_numpy(
                              zero_copy_only=False)
        valid = pos == pos  # non-null
        snat = np.full(t.num_rows, -1, dtype=np.int64)
        snat[valid] = snation[pos[valid].astype(np.int64)]
        keep = snat == t.column("c_nationkey").to_numpy()
        df = (pd.DataFrame({
                "n_nationkey": snat[keep],
                "rev": t.column("rev").to_numpy()[keep]})
              .groupby("n_nationkey", sort=False).sum()
              .reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (j2.map_batches(same_nation_rev, fn_kwargs={"sref": sref},
                          batch_format="pyarrow")
           .groupby("n_nationkey").sum("rev"))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue": pa.array([], pa.float64())})
        keys = t.column("n_nationkey").to_pylist()
        return pa.table({
            "n_name": pa.array([nat_names[k] for k in keys],
                               pa.string()),
            "revenue": pa.array(np.round(
                t.column("sum(rev)").to_numpy(), 2)),
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


REVENUE_BY_NATION_SQL = """
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = '{region}'
      AND o.o_orderdate >= TIMESTAMP '{date_from}'
      AND o.o_orderdate <  TIMESTAMP '{date_to}'
    GROUP BY n.n_name
"""


def promo_revenue_by_month(sf_dir: str):
    """TPC-H Q14 shape: per ship-month, revenue from PROMO-type parts
    and its share of total revenue. Returns
    (month, promo_rev, total_rev, promo_share_pct).

    part ⋈ lineitem is a partitioned hash join (both grow with scale);
    the promo flag rides the join, and the per-month rollup
    pre-aggregates inside map_batches so the groupby shuffle carries
    two floats per (batch, month).
    """
    from ..stages.join import default_join_partitions, hash_join

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table({
            "p_partkey": t.column("p_partkey"),
            "is_promo": pc.cast(pc.equal(t.column("p_type"),
                                         pa.scalar("PROMO")),
                                pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    joined = hash_join(li, part, on=("l_partkey",),
                       right_on=("p_partkey",)).repartition(
                           default_join_partitions())

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"month": pa.array([], pa.string()),
                             "promo_rev": pa.array([], pa.float64()),
                             "total_rev": pa.array([], pa.float64())})
        rev = (t.column("l_extendedprice").to_numpy()
               * (1.0 - t.column("l_discount").to_numpy()))
        month = pc.strftime(t.column("l_shipdate"), format="%Y-%m")
        promo = t.column("is_promo").to_numpy()
        df = (pd.DataFrame({"month": month.to_pylist(),
                            "promo_rev": rev * promo,
                            "total_rev": rev})
              .groupby("month", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (joined.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("month").sum(["promo_rev", "total_rev"]))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "month": pa.array([], pa.string()),
                "promo_rev": pa.array([], pa.float64()),
                "total_rev": pa.array([], pa.float64()),
                "promo_share_pct": pa.array([], pa.float64())})
        p = t.column("sum(promo_rev)").to_numpy()
        tot = t.column("sum(total_rev)").to_numpy()
        # 2-decimal price x 2-decimal discount -> revenue terms live
        # on an EXACT 1e-4 grid; rounding to 4 decimals recovers the
        # grid value on both engines (accumulation error ~1e-9 << the
        # 5e-5 half-grid distance), whereas 2-decimal rounding can
        # straddle when a true sum lands on a .005 half-point
        return pa.table({
            "month": t.column("month"),
            "promo_rev": pa.array(np.round(p, 4)),
            "total_rev": pa.array(np.round(tot, 4)),
            "promo_share_pct": pa.array(np.round(100.0 * p / tot, 4)),
        })

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


PROMO_REVENUE_SQL = """
    SELECT strftime(l.l_shipdate, '%Y-%m') AS month,
           ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 4) AS promo_rev,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS total_rev,
           ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
               AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
"""


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


def forecast_revenue(sf_dir: str, year: int = 1995,
                     disc_lo: float = 0.05, disc_hi: float = 0.07,
                     qty_lt: float = 24.0):
    """TPC-H Q6-style forecast-revenue delta: SUM(extendedprice *
    discount) over lineitems shipped within ``year`` with discount in
    [disc_lo, disc_hi] and quantity < qty_lt. Returns ONE row
    (revenue, n_lines) — revenue rounded to 2dp (the pricing_summary
    grid discipline), n_lines the exact filtered count.

    Scale shape: pruned 4-column read, per-batch vectorized filter +
    scalar partial (one (revenue, n) row per block), O(blocks) global
    sum — no shuffle at all."""
    lo = _ts_us(f"{year}-01-01")
    hi = _ts_us(f"{year + 1}-01-01")

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy()
        disc = t.column("l_discount").to_numpy()
        qty = t.column("l_quantity").to_numpy()
        price = t.column("l_extendedprice").to_numpy()
        keep = ((ship >= lo) & (ship < hi) & (disc >= disc_lo)
                & (disc <= disc_hi) & (qty < qty_lt))
        return pa.table({
            "revenue": pa.array([float((price[keep]
                                        * disc[keep]).sum())]),
            "n_lines": pa.array([int(keep.sum())], pa.int64()),
        })

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])
    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .sum(["revenue", "n_lines"])
    return pa.table({
        "revenue": pa.array([round(agg["sum(revenue)"], 2)]),
        "n_lines": pa.array([int(agg["sum(n_lines)"])], pa.int64()),
    })


def returned_customer_revenue(sf_dir: str,
                              date_from: str = "1996-04-01",
                              date_to: str = "1996-07-01",
                              k: int = 20) -> pa.Table:
    """TPC-H Q10 shape: per-customer revenue lost to returned
    lineitems (l_returnflag = 'R') of orders placed in
    [date_from, date_to); top-k customers by (revenue DESC,
    c_custkey ASC) with name / account balance / nation attached.
    Returns (c_custkey, c_name, revenue, c_acctbal, n_name).

    Scale shape: orders and lineitem are BOTH big, so their join is
    partitioned (date filter first, per-batch per-order revenue
    combiner on the lineitem side). The per-customer aggregate runs
    to completion BEFORE any dimension join — only the ≤ k winning
    rows ever touch customer/nation (a broadcast key fetch + a
    25-row driver join), instead of shipping c_name/c_acctbal
    through the shuffle for every customer.
    """
    from ..stages.join import default_join_partitions, hash_join

    lo, hi = _ts_us(date_from), _ts_us(date_to)
    i64, f64, s = pa.int64(), pa.float64(), pa.string()

    def orders_side(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").cast(i64)
        keep = pc.and_(pc.greater_equal(od, pa.scalar(int(lo), i64)),
                       pc.less(od, pa.scalar(int(hi), i64)))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey")}
                        ).filter(keep)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow",
                  zero_copy_batch=True)

    def li_side(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("l_returnflag"),
                        pa.scalar("R")).to_numpy(zero_copy_only=False)
        if not keep.any():
            return pa.table({"l_orderkey": pa.array([], i64),
                             "rev": pa.array([], f64)})
        okey = t.column("l_orderkey").to_numpy()[keep]
        rev = (t.column("l_extendedprice").to_numpy()[keep]
               * (1.0 - t.column("l_discount").to_numpy()[keep]))
        # per-batch per-order combiner bounds the join input
        df = (pd.DataFrame({"l_orderkey": okey, "rev": rev})
              .groupby("l_orderkey", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"]).map_batches(
            li_side, batch_format="pyarrow", zero_copy_batch=True)

    nparts = default_join_partitions()
    joined = hash_join(lineitem.repartition(nparts), orders,
                       on=("l_orderkey",), right_on=("o_orderkey",),
                       left_schema=[("l_orderkey", i64), ("rev", f64)],
                       right_schema=[("o_orderkey", i64),
                                     ("o_custkey", i64)])

    def cust_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], i64),
                             "rev": pa.array([], f64)})
        df = (pd.DataFrame({"o_custkey": t.column("o_custkey")
                            .to_numpy(zero_copy_only=False),
                            "rev": t.column("rev")
                            .to_numpy(zero_copy_only=False)})
              .groupby("o_custkey", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (joined.map_batches(cust_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("o_custkey").sum("rev"))

    def to_rounded(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c_custkey": pa.array([], i64),
                             "revenue": pa.array([], f64)})
        return pa.table({
            "c_custkey": t.column("o_custkey"),
            "revenue": pa.array(np.round(
                t.column("sum(rev)").to_numpy(), 2))})

    top = (agg.map_batches(to_rounded, batch_format="pyarrow",
                           zero_copy_batch=True)
           .sort(["revenue", "c_custkey"], descending=[True, False])
           .limit(k).to_pandas())

    # dimension fetch for ONLY the winners: broadcast key set into the
    # customer scan, tiny nation table read whole; k-row driver joins
    kref = ray.put(pa.array(top["c_custkey"].to_numpy()))

    def cust_fetch(t: pa.Table, *, kref) -> pa.Table:
        keys = ray.get(kref) if isinstance(
            kref, ray.ObjectRef) else kref
        return t.filter(pc.is_valid(
            pc.index_in(t.column("c_custkey"), value_set=keys)))

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).map_batches(cust_fetch, fn_kwargs={"kref": kref},
                  batch_format="pyarrow").to_pandas()
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name"]).to_pandas()

    out = (top.merge(cust, on="c_custkey")
           .merge(nation, left_on="c_nationkey",
                  right_on="n_nationkey")
           .sort_values(["revenue", "c_custkey"],
                        ascending=[False, True]))
    return pa.table({
        "c_custkey": pa.array(out["c_custkey"].to_numpy(), i64),
        "c_name": pa.array(out["c_name"], s),
        "revenue": pa.array(out["revenue"].to_numpy(), f64),
        "c_acctbal": pa.array(out["c_acctbal"].to_numpy(), f64),
        "n_name": pa.array(out["n_name"], s),
    })


RETURNED_CUSTOMER_SQL = """
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{date_from}'
      AND o.o_orderdate < TIMESTAMP '{date_to}'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT {k}
"""


# ------------------------------------------------------- Q4 / Q18 shapes

_Q4_FROM = "1996-01-01"
_Q4_TO = "1996-07-01"
_Q4_LATE_DAYS = 30


def order_priority_counts(sf_dir: str, date_from: str = _Q4_FROM,
                          date_to: str = _Q4_TO,
                          late_days: int = _Q4_LATE_DAYS) -> pa.Table:
    """TPC-H Q4 shape: per order priority, the number of orders placed
    in [date_from, date_to) with at least one lineitem shipped more
    than ``late_days`` days after the order date (the sandbox tables
    carry no commit/receipt dates, so shipdate-vs-orderdate lateness
    stands in for Q4's l_commitdate < l_receiptdate). Exact integers.

    Scale shape: EXISTS(ship > od + D) == max_ship(order) > od + D,
    so the operator is one per-order MAX (per-batch combiner + one
    groupby) — never a per-(order, line) semi-join. The date-filtered
    orders side builds a mergeable Bloom filter over its keys and
    prunes the lineitem scan BEFORE the combiner shuffle (the
    bloom_pruned_order_lines discipline; false positives are removed
    by the exact hash join). The final conditional count shuffles
    O(priorities) rows per block. Returns
    (o_orderpriority, order_count) sorted by priority.
    """
    from ..stages.bloom import bloom_prune, build_bloom
    from ..stages.join import default_join_partitions, hash_join

    lo, hi = _ts_us(date_from), _ts_us(date_to)
    late_us = np.int64(late_days) * np.int64(86_400_000_000)
    i64, s = pa.int64(), pa.string()

    def orders_side(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").cast(i64)
        keep = pc.and_(pc.greater_equal(od, pa.scalar(int(lo), i64)),
                       pc.less(od, pa.scalar(int(hi), i64)))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "o_orderpriority": t.column("o_orderpriority"),
                         "od_us": od}).filter(keep)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow",
                  zero_copy_batch=True).materialize()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    n_keys = max(1, orders.count())
    bloom = build_bloom(orders.select_columns(["o_orderkey"]),
                        "o_orderkey", n_expected=n_keys)
    li = bloom_prune(li, bloom, "l_orderkey")

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], i64),
                             "max_ship": pa.array([], i64)})
        df = (pd.DataFrame({
                "l_orderkey": t.column("l_orderkey").to_numpy(),
                "max_ship": t.column("l_shipdate").cast(i64).to_numpy()})
              .groupby("l_orderkey", sort=False).max().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    maxship = (li.map_batches(li_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("l_orderkey").max("max_ship"))

    joined = hash_join(
        maxship.repartition(default_join_partitions()), orders,
        on=("l_orderkey",), right_on=("o_orderkey",),
        left_schema=[("l_orderkey", i64), ("max(max_ship)", i64)],
        right_schema=[("o_orderkey", i64), ("o_orderpriority", s),
                      ("od_us", i64)])

    def prio_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderpriority": pa.array([], s),
                             "order_count": pa.array([], i64)})
        late = (t.column("max(max_ship)").to_numpy(zero_copy_only=False)
                > t.column("od_us").to_numpy(zero_copy_only=False)
                + late_us)
        prio = np.asarray(t.column("o_orderpriority").to_pylist(),
                          dtype=object)[late]
        df = (pd.DataFrame({"o_orderpriority": prio})
              .groupby("o_orderpriority", sort=False)
              .size().rename("order_count").reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (joined.map_batches(prio_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("o_orderpriority").sum("order_count"))
    t = agg.to_pandas()
    if t.empty:  # schema-less empty groupby output
        return pa.table({"o_orderpriority": pa.array([], s),
                         "order_count": pa.array([], i64)})
    t = t.sort_values("o_orderpriority")
    return pa.table({
        "o_orderpriority": pa.array(t["o_orderpriority"], s),
        "order_count": pa.array(
            t["sum(order_count)"].to_numpy().astype(np.int64), i64)})


ORDER_PRIORITY_SQL = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{date_from}'
      AND o.o_orderdate < TIMESTAMP '{date_to}'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate
                        + INTERVAL {late_days} DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


def large_volume_orders(sf_dir: str, min_qty: int = 250):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``min_qty``, with customer key and order date attached. Exact
    integers (l_quantity is integral in TPC-H; summed as int64).
    Returns a Dataset (o_orderkey, o_custkey, o_orderdate_us,
    total_qty) sorted by (total_qty DESC, o_orderkey ASC) — a Dataset
    because the qualifying set is a data-sized fraction of orders, not
    a fixed top-k.

    Scale shape: per-order quantity sums via a per-batch combiner +
    one groupby; the HAVING filter runs on the aggregate BEFORE any
    dimension access; the qualifying keys (the small side by
    construction) build a Bloom filter that prunes the orders scan,
    and the exact hash join removes false positives. The orders table
    never shuffles in full.
    """
    from ..stages.bloom import bloom_prune, build_bloom
    from ..stages.join import default_join_partitions, hash_join

    i64 = pa.int64()

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], i64),
                             "qty": pa.array([], i64)})
        q = np.round(t.column("l_quantity").to_numpy()).astype(np.int64)
        df = (pd.DataFrame({
                "l_orderkey": t.column("l_orderkey").to_numpy(),
                "qty": q})
              .groupby("l_orderkey", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    qsum = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])
            .map_batches(li_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("l_orderkey").sum("qty"))

    def keep_big(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], i64),
                             "total_qty": pa.array([], i64)})
        tq = pc.cast(t.column("sum(qty)"), i64)
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "total_qty": tq}).filter(
            pc.greater(tq, pa.scalar(int(min_qty), i64)))

    big = qsum.map_batches(keep_big, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    n_keys = max(1, big.count())
    bloom = build_bloom(big.select_columns(["o_orderkey"]),
                        "o_orderkey", n_expected=n_keys)
    orders = bloom_prune(orders, bloom, "o_orderkey").map_batches(
        lambda t: pa.table({
            "o_orderkey2": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "o_orderdate_us": t.column("o_orderdate").cast(i64)}),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(
        big.repartition(default_join_partitions()), orders,
        on=("o_orderkey",), right_on=("o_orderkey2",),
        left_schema=[("o_orderkey", i64), ("total_qty", i64)],
        right_schema=[("o_orderkey2", i64), ("o_custkey", i64),
                      ("o_orderdate_us", i64)])
    return joined.sort(["total_qty", "o_orderkey"],
                       descending=[True, False])


LARGE_VOLUME_SQL = """
    SELECT o.o_orderkey, o.o_custkey,
           epoch_us(o.o_orderdate) AS o_orderdate_us,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
    HAVING SUM(l.l_quantity) > {min_qty}
    ORDER BY total_qty DESC, o.o_orderkey ASC
"""


def customer_order_distribution(sf_dir: str,
                                exclude_prefixes: tuple[str, ...] =
                                ("1", "2")) -> pa.Table:
    """TPC-H Q13 shape: the histogram of customers by how many
    qualifying orders they placed — INCLUDING the zero bucket for
    customers with no qualifying order (the sandbox orders table has
    no comment column, so "priority not in the excluded classes"
    stands in for Q13's comment NOT LIKE filter). Exact integers.
    Returns (c_count, custdist) ordered by (custdist DESC,
    c_count DESC).

    Scale shape: the orders scan filters + combines per batch
    (custkey -> count partials), ONE vocabulary-scale groupby yields
    per-customer counts; orphan custkeys are removed by an exact
    keys-only hash join against the customer key column (the only
    part of the dimension that ever shuffles); the ZERO bucket is
    COUNT ARITHMETIC — |customer| minus |customers with >= 1
    qualifying order| — never an anti-join; the final histogram is a
    per-batch value_counts partial + an O(distinct counts) groupby.
    The driver holds only the histogram.
    """
    from ..stages.join import default_join_partitions, hash_join

    i64 = pa.int64()
    ex = tuple(exclude_prefixes)

    def o_partial(t: pa.Table) -> pa.Table:
        prio = t.column("o_orderpriority")
        keep = None
        for p in ex:
            m = pc.starts_with(prio, p)
            keep = m if keep is None else pc.or_(keep, m)
        kept = t.filter(pc.invert(keep)) if keep is not None else t
        if kept.num_rows == 0:
            return pa.table({"o_custkey": pa.array([], i64),
                             "c_count": pa.array([], i64)})
        vc = pc.value_counts(kept.column("o_custkey").combine_chunks())
        return pa.table({"o_custkey": vc.field("values"),
                         "c_count": pc.cast(vc.field("counts"), i64)})

    percust = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderpriority"])
               .map_batches(o_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby("o_custkey").sum("c_count"))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    n_customers = cust.count()

    joined = hash_join(
        percust.repartition(default_join_partitions()), cust,
        on=("o_custkey",), right_on=("c_custkey",),
        left_schema=[("o_custkey", i64), ("sum(c_count)", i64)],
        right_schema=[("c_custkey", i64)])

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c_count": pa.array([], i64),
                             "custdist": pa.array([], i64)})
        vc = pc.value_counts(
            pc.cast(t.column("sum(c_count)"), i64).combine_chunks())
        return pa.table({"c_count": vc.field("values"),
                         "custdist": pc.cast(vc.field("counts"), i64)})

    agg = (joined.map_batches(hist_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("c_count").sum("custdist"))
    t = agg.to_pandas()
    active = (int(t["sum(custdist)"].sum()) if not t.empty else 0)
    counts = (t["c_count"].to_numpy().astype(np.int64)
              if not t.empty else np.array([], np.int64))
    dist = (t["sum(custdist)"].to_numpy().astype(np.int64)
            if not t.empty else np.array([], np.int64))
    zero = n_customers - active
    if zero > 0:
        counts = np.concatenate([counts, [np.int64(0)]])
        dist = np.concatenate([dist, [np.int64(zero)]])
    order = np.lexsort((-counts, -dist))
    return pa.table({"c_count": pa.array(counts[order], i64),
                     "custdist": pa.array(dist[order], i64)})


CUSTOMER_ORDER_DIST_SQL = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON o.o_custkey = c.c_custkey
           AND o.o_orderpriority NOT LIKE '1%'
           AND o.o_orderpriority NOT LIKE '2%'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


_Q12_FROM, _Q12_TO, _Q12_LATE_DAYS = "1997-01-01", "1997-07-01", 90


def late_line_priority_counts(sf_dir: str, date_from: str = _Q12_FROM,
                              date_to: str = _Q12_TO,
                              late_days: int = _Q12_LATE_DAYS
                              ) -> pa.Table:
    """TPC-H Q12 shape: per l_returnflag, how many lineitems shipped
    in [date_from, date_to) AND more than ``late_days`` days after
    their order date split by order urgency — high = priority
    '1-URGENT'/'2-HIGH', low = the rest (shipdate-vs-orderdate
    lateness stands in for Q12's commit/receipt columns, the
    order_priority_counts discipline). Exact integers. Returns
    (l_returnflag, high_line_count, low_line_count) ordered by
    l_returnflag.

    Scale shape: the lineitem scan filters to the ship window FIRST
    (a small fraction of lines); its distinct order keys build a
    mergeable Bloom filter that prunes the ORDERS scan before the
    join (the date window makes the qualifying order set small, so
    the big dimension never shuffles in full); one partitioned hash
    join attaches (orderdate, urgency) per line; per-batch
    conditional partials reduce to O(flags) rows per block and one
    tiny groupby.
    """
    from ..stages.bloom import bloom_prune, build_bloom
    from ..stages.join import default_join_partitions, hash_join

    lo, hi = _ts_us(date_from), _ts_us(date_to)
    late_us = np.int64(late_days) * np.int64(86_400_000_000)
    i64, s = pa.int64(), pa.string()

    def li_side(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(i64)
        keep = pc.and_(pc.greater_equal(ship, pa.scalar(int(lo), i64)),
                       pc.less(ship, pa.scalar(int(hi), i64)))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "l_returnflag": t.column("l_returnflag"),
                         "ship_us": ship}).filter(keep)

    li = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey", "l_returnflag",
                                   "l_shipdate"])
          .map_batches(li_side, batch_format="pyarrow",
                       zero_copy_batch=True).materialize())

    bloom = build_bloom(li.select_columns(["l_orderkey"]),
                        "l_orderkey", n_expected=max(1, li.count()))
    orders = bloom_prune(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"]),
        bloom, "o_orderkey").map_batches(
        lambda t: pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "od_us": t.column("o_orderdate").cast(i64),
            "is_high": pc.cast(pc.or_(
                pc.starts_with(t.column("o_orderpriority"), "1"),
                pc.starts_with(t.column("o_orderpriority"), "2")),
                i64)}),
        batch_format="pyarrow", zero_copy_batch=True)

    joined = hash_join(
        li.repartition(default_join_partitions()), orders,
        on=("l_orderkey",), right_on=("o_orderkey",),
        left_schema=[("l_orderkey", i64), ("l_returnflag", s),
                     ("ship_us", i64)],
        right_schema=[("o_orderkey", i64), ("od_us", i64),
                      ("is_high", i64)])

    def flag_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_returnflag": pa.array([], s),
                             "high_line_count": pa.array([], i64),
                             "low_line_count": pa.array([], i64)})
        late = (t.column("ship_us").to_numpy(zero_copy_only=False)
                > t.column("od_us").to_numpy(zero_copy_only=False)
                + late_us)
        hi_m = t.column("is_high").to_numpy(
            zero_copy_only=False).astype(bool)
        flag = np.asarray(t.column("l_returnflag").to_pylist(),
                          dtype=object)
        df = (pd.DataFrame({"l_returnflag": flag[late],
                            "high_line_count":
                                hi_m[late].astype(np.int64),
                            "low_line_count":
                                (~hi_m[late]).astype(np.int64)})
              .groupby("l_returnflag", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (joined.map_batches(flag_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("l_returnflag")
           .sum(["high_line_count", "low_line_count"]))
    t = agg.to_pandas()
    if t.empty:
        return pa.table({"l_returnflag": pa.array([], s),
                         "high_line_count": pa.array([], i64),
                         "low_line_count": pa.array([], i64)})
    t = t.sort_values("l_returnflag")
    return pa.table({
        "l_returnflag": pa.array(t["l_returnflag"], s),
        "high_line_count": pa.array(
            t["sum(high_line_count)"].to_numpy().astype(np.int64),
            i64),
        "low_line_count": pa.array(
            t["sum(low_line_count)"].to_numpy().astype(np.int64),
            i64)})


LATE_LINE_PRIORITY_SQL = """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority LIKE '1%'
                           OR o.o_orderpriority LIKE '2%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority LIKE '1%'
                           OR o.o_orderpriority LIKE '2%'
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{date_from}'
      AND l.l_shipdate < TIMESTAMP '{date_to}'
      AND l.l_shipdate > o.o_orderdate + INTERVAL {late_days} DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""


def nation_pair_volume(sf_dir: str, nation_a: str = "NATION_10",
                       nation_b: str = "NATION_12",
                       date_from: str = "1996-01-01",
                       date_to: str = "1998-01-01"):
    """TPC-H Q7 shape: shipping volume between a nation PAIR — revenue
    of lineitems shipped in [date_from, date_to) whose supplier sits
    in one nation of the pair and whose ordering customer sits in the
    other, grouped by (supp_nation, cust_nation, ship year). Returns
    (supp_nation, cust_nation, l_year, revenue) — both directions.

    Scale shape (the Q5 join plan with a second nation tag): customer
    pre-filters to the pair's two nations BEFORE joining, so the
    orders exchange carries only pair customers; orders ⋈ customer and
    lineitem ⋈ orders are partitioned hash joins; the supplier
    (suppkey -> nationkey) lookup broadcasts via ray.put (at TPC-H
    scale supplier grows linearly — flip it to a third hash join, same
    note as revenue_by_nation). The lineitem scan date-filters and
    drops non-pair suppliers per batch before any shuffle; revenue
    pre-aggregates per batch so the final groupby sees
    O(2 x years) rows per block.
    """
    from ..stages.join import default_join_partitions, hash_join

    lo, hi = _ts_us(date_from), _ts_us(date_to)
    i64, s = pa.int64(), pa.string()

    nation = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    keys = {row.n_name: int(row.n_nationkey)
            for row in nation.itertuples() if row.n_name in
            (nation_a, nation_b)}
    if len(keys) != 2:
        raise ValueError(f"nations not found: {nation_a}, {nation_b}")
    names = {v: k for k, v in keys.items()}
    pair_keys = pa.array(sorted(names), pa.int32())

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).map_batches(
            lambda t: t.filter(pc.is_valid(pc.index_in(
                t.column("c_nationkey"), value_set=pair_keys))),
            batch_format="pyarrow", zero_copy_batch=True)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    nparts = default_join_partitions()
    j1 = hash_join(orders, cust, on=("o_custkey",),
                   right_on=("c_custkey",),
                   right_schema=[("c_custkey", i64),
                                 ("c_nationkey", pa.int32())]
                   ).repartition(nparts)

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]
                           ).to_pandas()
    supp = supp[supp["s_nationkey"].isin(list(names))]
    sref = ray.put((pa.array(supp["s_suppkey"].to_numpy()),
                    supp["s_nationkey"].to_numpy().astype(np.int64)))

    def li_side(t: pa.Table, *, sref) -> pa.Table:
        skeys, snation = ray.get(sref) if isinstance(
            sref, ray.ObjectRef) else sref
        ship = t.column("l_shipdate")
        sus = ship.cast(i64).to_numpy(zero_copy_only=False)
        keep = (sus >= int(lo)) & (sus < int(hi))
        pos = pc.index_in(t.column("l_suppkey"),
                          value_set=skeys).to_numpy(
                              zero_copy_only=False)
        valid = pos == pos
        keep &= valid
        t2 = t.filter(pa.array(keep))
        if t2.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], i64),
                             "supp_nat": pa.array([], i64),
                             "l_year": pa.array([], i64),
                             "rev": pa.array([], i64)})
        posk = pos[keep].astype(np.int64)
        year = pc.year(t2.column("l_shipdate")).cast(i64)
        # exact 10^-4-dollar units (inputs sit on the 2dp grid) —
        # the float sum straddled a .005 rounding boundary at
        # sf0.001; integer accumulation removes the class
        d_c = np.rint(t2.column("l_discount").to_numpy() * 100.0
                      ).astype(np.int64)
        rev_u = _cents(t2.column("l_extendedprice").to_numpy()) \
            * (100 - d_c)
        return pa.table({
            "l_orderkey": t2.column("l_orderkey"),
            "supp_nat": pa.array(snation[posk]),
            "l_year": year,
            "rev": pa.array(rev_u, i64),
        })

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"]).map_batches(
            li_side, fn_kwargs={"sref": sref},
            batch_format="pyarrow")
    # j1's blocks are join output (left cols + right-minus-key):
    # schema hints keep the padding typed if an empty block leads
    j2 = hash_join(lineitem, j1, on=("l_orderkey",),
                   right_on=("o_orderkey",),
                   left_schema=[("l_orderkey", i64),
                                ("supp_nat", i64), ("l_year", i64),
                                ("rev", i64)],
                   right_schema=[("o_orderkey", i64),
                                 ("o_custkey", i64),
                                 ("c_nationkey", pa.int32())]
                   ).repartition(nparts)

    LIMB = 10 ** 12

    def pair_partial(t: pa.Table) -> pa.Table:
        cols = {"supp_nat": pa.array([], i64),
                "cust_nat": pa.array([], i64),
                "l_year": pa.array([], i64),
                "rev_hi": pa.array([], i64),
                "rev_lo": pa.array([], i64)}
        if t.num_rows == 0:
            return pa.table(cols)
        sn = t.column("supp_nat").to_numpy(zero_copy_only=False)
        cn = t.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = sn != cn  # both already restricted to the pair
        if not keep.any():
            return pa.table(cols)
        df = (pd.DataFrame({
                "supp_nat": sn[keep], "cust_nat": cn[keep],
                "l_year": t.column("l_year").to_numpy(
                    zero_copy_only=False)[keep],
                "rev": t.column("rev").to_numpy()[keep]})
              .groupby(["supp_nat", "cust_nat", "l_year"], sort=False)
              .sum().reset_index())
        v = df["rev"].to_numpy()
        return pa.table({
            "supp_nat": pa.array(df["supp_nat"].to_numpy(), i64),
            "cust_nat": pa.array(df["cust_nat"].to_numpy(), i64),
            "l_year": pa.array(df["l_year"].to_numpy(), i64),
            "rev_hi": pa.array(v // LIMB, i64),
            "rev_lo": pa.array(v % LIMB, i64)})

    agg = (j2.map_batches(pair_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["supp_nat", "cust_nat", "l_year"])
           .sum(["rev_hi", "rev_lo"]))
    t = agg.to_pandas()
    f64 = pa.float64()
    if t.empty:
        return pa.table({"supp_nation": pa.array([], s),
                         "cust_nation": pa.array([], s),
                         "l_year": pa.array([], i64),
                         "revenue": pa.array([], f64)})
    t = t.sort_values(["supp_nat", "cust_nat", "l_year"])
    exact = [int(a) * LIMB + int(b) for a, b in
             zip(t["sum(rev_hi)"], t["sum(rev_lo)"])]
    return pa.table({
        "supp_nation": pa.array([names[k] for k in t["supp_nat"]], s),
        "cust_nation": pa.array([names[k] for k in t["cust_nat"]], s),
        "l_year": pa.array(t["l_year"].to_numpy().astype(np.int64),
                           i64),
        "revenue": pa.array(
            [((x + 50) // 100) / 100.0 for x in exact], f64),
    })


NATION_PAIR_VOLUME_SQL = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ((SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
             + 50) // 100) / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '{date_from}'
      AND l.l_shipdate <  TIMESTAMP '{date_to}'
      AND ((sn.n_name = '{nation_a}' AND cn.n_name = '{nation_b}')
        OR (sn.n_name = '{nation_b}' AND cn.n_name = '{nation_a}'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


_Q19_CLAUSES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#14", 1, 15, 20, 30),
)


def disjunctive_revenue(sf_dir: str, clauses=_Q19_CLAUSES) -> pa.Table:
    """TPC-H Q19 shape: total discounted revenue of lineitems matching
    an OR of (brand, part-size range, lineitem-quantity range) clauses
    (the sandbox part/lineitem tables carry no container/shipmode, so
    the clauses use p_brand, p_size and l_quantity). Returns one row
    (revenue), rounded to 2 decimals.

    Scale shape: the disjunction splits across the join — the part
    side of every clause (brand + size range) filters the PART scan
    down to a small key set that broadcasts via ray.put as a
    (partkey -> clause id) map; the lineitem side (quantity range,
    per clause) is then one vectorized gather + range test per batch.
    The lineitem scan never joins: one broadcast lookup, one boolean
    kernel, a per-batch partial sum — the shuffle carries one scalar
    per block. Clauses with distinct brands are disjoint so a part
    maps to at most one clause id.
    """
    i64, f64 = pa.int64(), pa.float64()
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    pk, cl = [], []
    for ci, (brand, slo, shi, _, _) in enumerate(clauses):
        m = ((part["p_brand"] == brand) & (part["p_size"] >= slo)
             & (part["p_size"] <= shi))
        pk.append(part.loc[m, "p_partkey"].to_numpy())
        cl.append(np.full(int(m.sum()), ci, dtype=np.int64))
    pkeys = np.concatenate(pk) if pk else np.array([], np.int64)
    clid = np.concatenate(cl) if cl else np.array([], np.int64)
    qlo = np.array([c[3] for c in clauses], np.float64)
    qhi = np.array([c[4] for c in clauses], np.float64)
    pref = ray.put((pa.array(pkeys), clid))

    def li_partial(t: pa.Table, *, pref) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rev": pa.array([], f64)})
        keys, cids = ray.get(pref) if isinstance(
            pref, ray.ObjectRef) else pref
        pos = pc.index_in(t.column("l_partkey"),
                          value_set=keys).to_numpy(
                              zero_copy_only=False)
        valid = pos == pos
        if not valid.any():
            return pa.table({"rev": pa.array([], f64)})
        qty = t.column("l_quantity").to_numpy()
        ci = np.full(t.num_rows, -1, dtype=np.int64)
        ci[valid] = cids[pos[valid].astype(np.int64)]
        keep = valid & (qty >= qlo[ci]) & (qty <= qhi[ci])
        if not keep.any():
            return pa.table({"rev": pa.array([], f64)})
        price = t.column("l_extendedprice").to_numpy()[keep]
        disc = t.column("l_discount").to_numpy()[keep]
        return pa.table({"rev": pa.array(
            [float(np.sum(price * (1.0 - disc)))], f64)})

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"]).map_batches(
            li_partial, fn_kwargs={"pref": pref},
            batch_format="pyarrow")
    total = ds.sum("rev") or 0.0
    return pa.table({"revenue": pa.array([round(float(total), 2)],
                                         f64)})


DISJUNCTIVE_REVENUE_SQL = """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
"""


_Q16_SIZES = (1, 4, 9, 16, 25, 36, 49)


def supplier_part_counts(sf_dir: str, excl_brand: str = "Brand#5",
                         excl_type: str = "MEDIUM",
                         sizes=_Q16_SIZES) -> pa.Table:
    """TPC-H Q16 shape: for each (brand, type, size) of parts outside
    an excluded brand/type and within a size list, the number of
    DISTINCT suppliers that ship that part, excluding suppliers on a
    deny list (the sandbox has no partsupp table or supplier
    complaints text, so lineitem's (l_partkey, l_suppkey) pairs stand
    in for partsupp and s_acctbal < 0 stands in for the complaints
    NOT IN). Returns (p_brand, p_type, p_size, supplier_cnt), exact
    integers.

    Scale shape: the filtered part attributes broadcast via ray.put as
    a (partkey -> row) map (the filter keeps a constant fraction; at
    TPC-H scale flip to a partitioned hash join — same note as
    revenue_by_nation); the supplier deny list is genuinely tiny and
    broadcasts as a key set. The lineitem scan filters both per batch
    and emits PER-BATCH-DEDUPED (brand, type, size, suppkey) rows, so
    the distinct shuffle carries at most one row per (part-group,
    supplier) per batch; one groupby dedupes globally and a second
    O(groups) groupby counts.
    """
    i32, i64, s = pa.int32(), pa.int64(), pa.string()
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).to_pandas()
    m = ((part["p_brand"] != excl_brand)
         & (part["p_type"] != excl_type)
         & part["p_size"].isin(list(sizes)))
    part = part[m]
    pref = ray.put((pa.array(part["p_partkey"].to_numpy()),
                    part["p_brand"].to_numpy(),
                    part["p_type"].to_numpy(),
                    part["p_size"].to_numpy().astype(np.int64)))

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_acctbal"]
                           ).to_pandas()
    deny = pa.array(
        supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].to_numpy())

    def li_pairs(t: pa.Table, *, pref) -> pa.Table:
        empty = pa.table({"p_brand": pa.array([], s),
                          "p_type": pa.array([], s),
                          "p_size": pa.array([], i64),
                          "l_suppkey": pa.array([], i64)})
        if t.num_rows == 0:
            return empty
        keys, brand, ptype, size = ray.get(pref) if isinstance(
            pref, ray.ObjectRef) else pref
        pos = pc.index_in(t.column("l_partkey"),
                          value_set=keys).to_numpy(
                              zero_copy_only=False)
        keep = pos == pos
        if len(deny) > 0:
            keep &= ~pc.is_valid(pc.index_in(
                t.column("l_suppkey"),
                value_set=deny)).to_numpy(zero_copy_only=False)
        if not keep.any():
            return empty
        posk = pos[keep].astype(np.int64)
        df = pd.DataFrame({
            "p_brand": brand[posk], "p_type": ptype[posk],
            "p_size": size[posk],
            "l_suppkey": t.column("l_suppkey").to_numpy()[keep]})
        df = df.drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"]).map_batches(
            li_pairs, fn_kwargs={"pref": pref},
            batch_format="pyarrow")
    distinct = pairs.groupby(
        ["p_brand", "p_type", "p_size", "l_suppkey"]).count()
    counts = (distinct.select_columns(["p_brand", "p_type", "p_size"])
              .groupby(["p_brand", "p_type", "p_size"]).count())
    t = counts.to_pandas()
    if t.empty:
        return pa.table({"p_brand": pa.array([], s),
                         "p_type": pa.array([], s),
                         "p_size": pa.array([], i64),
                         "supplier_cnt": pa.array([], i64)})
    t = t.sort_values(["p_brand", "p_type", "p_size"])
    return pa.table({
        "p_brand": pa.array(t["p_brand"], s),
        "p_type": pa.array(t["p_type"], s),
        "p_size": pa.array(t["p_size"].to_numpy().astype(np.int64),
                           i64),
        "supplier_cnt": pa.array(
            t["count()"].to_numpy().astype(np.int64), i64)})


SUPPLIER_PART_COUNTS_SQL = """
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> '{excl_brand}'
      AND p.p_type <> '{excl_type}'
      AND p.p_size IN {sizes}
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


def idle_rich_customers(sf_dir: str,
                        since: str = "2000-06-01") -> pa.Table:
    """TPC-H Q22 shape: per nation, the count and total balance of
    customers whose account balance exceeds the average POSITIVE
    balance and who have placed NO order since ``since`` (the sandbox
    customer table has no phone column, so nationkey stands in for
    Q22's country code, and the recent-order window keeps the
    anti-join non-trivial — every synthetic customer has at least one
    lifetime order). Returns (c_nationkey, numcust, totacctbal),
    exact count + 2dp balance sum.

    Scale shape: pass 1 is a scalar reduction (sum + count of positive
    balances — O(1) driver bytes) whose threshold broadcasts as a
    plain float; pass 2 is the tag-union-groupby ANTI-join (the
    dangling_nodes discipline): threshold-filtered customers tagged 0
    carrying (nationkey, acctbal), per-batch-distinct custkeys of
    date-filtered orders tagged 1 with null attributes, one
    groupby(custkey) keeps sum(flag)=0 groups — no driver-side key
    set, no outer join. The final per-nation rollup shuffles
    O(nations) rows per block.
    """
    i32, i64, f64 = pa.int32(), pa.int64(), pa.float64()
    lo = _ts_us(since)

    cust_cols = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(t: pa.Table) -> pa.Table:
        bal = t.column("c_acctbal").to_numpy()
        pos = bal[bal > 0.0]
        return pa.table({"s": pa.array([float(pos.sum())], f64),
                         "n": pa.array([len(pos)], i64)})

    agg = (cust_cols.map_batches(pos_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
           .aggregate(rd.aggregate.Sum("s"), rd.aggregate.Sum("n")))
    n_pos = agg["sum(n)"] or 0
    thresh = (agg["sum(s)"] / n_pos) if n_pos else np.inf

    def cust_side(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("c_acctbal"), pa.scalar(thresh))
        t2 = t.filter(keep)
        return pa.table({
            "c_custkey": t2.column("c_custkey"),
            "flag": pa.array(np.zeros(t2.num_rows, np.int64)),
            "c_nationkey": t2.column("c_nationkey").cast(i64),
            "c_acctbal": t2.column("c_acctbal"),
        })

    rich = cust_cols.map_batches(cust_side, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def orders_side(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").cast(i64)
        t2 = t.filter(pc.greater_equal(od, pa.scalar(int(lo), i64)))
        u = pc.unique(t2.column("o_custkey").combine_chunks())
        n = len(u)
        return pa.table({
            "c_custkey": u,
            "flag": pa.array(np.ones(n, np.int64)),
            "c_nationkey": pa.array([None] * n, i64),
            "c_acctbal": pa.array([None] * n, f64),
        })

    recent = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"]).map_batches(
            orders_side, batch_format="pyarrow", zero_copy_batch=True)

    merged = (rich.union(recent).groupby("c_custkey")
              .aggregate(rd.aggregate.Sum("flag"),
                         rd.aggregate.Max("c_nationkey"),
                         rd.aggregate.Sum("c_acctbal")))

    def nation_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"c_nationkey": pa.array([], i64),
                          "numcust": pa.array([], i64),
                          "totacctbal": pa.array([], f64)})
        if t.num_rows == 0:
            return empty
        # sum(flag)=0 -> rich AND idle; such groups always contain the
        # one customer row, so nationkey/acctbal are non-null there
        keep = (pc.equal(t.column("sum(flag)"), 0).to_numpy(
            zero_copy_only=False))
        nat = t.column("max(c_nationkey)").to_numpy(
            zero_copy_only=False)[keep]
        bal = t.column("sum(c_acctbal)").to_numpy(
            zero_copy_only=False)[keep]
        if len(nat) == 0:
            return empty
        df = (pd.DataFrame({"c_nationkey": nat.astype(np.int64),
                            "numcust": 1, "totacctbal": bal})
              .groupby("c_nationkey", sort=False)
              .agg(numcust=("numcust", "sum"),
                   totacctbal=("totacctbal", "sum")).reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (merged.map_batches(nation_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("c_nationkey")
           .aggregate(rd.aggregate.Sum("numcust"),
                      rd.aggregate.Sum("totacctbal")))
    t = out.to_pandas()
    if t.empty:
        return pa.table({"c_nationkey": pa.array([], i64),
                         "numcust": pa.array([], i64),
                         "totacctbal": pa.array([], f64)})
    t = t.sort_values("c_nationkey")
    return pa.table({
        "c_nationkey": pa.array(
            t["c_nationkey"].to_numpy().astype(np.int64), i64),
        "numcust": pa.array(
            t["sum(numcust)"].to_numpy().astype(np.int64), i64),
        "totacctbal": pa.array(
            np.round(t["sum(totacctbal)"].to_numpy(), 2), f64)})


IDLE_RICH_CUSTOMERS_SQL = """
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '{since}')
    GROUP BY 1
    ORDER BY 1
"""


def market_share(sf_dir: str, supp_nation: str = "NATION_2",
                 region: str = "ASIA", part_type: str = "PROMO",
                 date_from: str = "1995-01-01",
                 date_to: str = "1997-01-01"):
    """TPC-H Q8 shape: per order year, the revenue supplied by
    ``supp_nation`` vs ALL revenue, over lineitems of ``part_type``
    parts ordered by ``region`` customers in [date_from, date_to).
    Returns (o_year, nation_rev, total_rev) — the exact sufficient
    statistics of the market share; mkt_share = nation_rev/total_rev
    is the caller's one float (the assortativity_stats discipline),
    so the cross-engine value hash stays on the 2dp revenue grid.

    Scale shape (the Q5/Q7 join plan plus a broadcast part filter):
    customer pre-filters to the region's nations BEFORE joining, so
    the orders exchange carries region customers only; orders keep
    (o_orderkey, o_custkey, o_year) past the date filter; lineitem
    drops non-``part_type`` parts per batch via a broadcast partkey
    set and tags each row with its supplier-nation flag via the
    broadcast (suppkey -> nationkey) lookup (both small here; at
    TPC-H scale flip each to a partitioned hash join, same note as
    revenue_by_nation); two partitioned hash joins line up lineitem
    with its order year; per-batch partials reduce the final groupby
    to O(2 x years) rows per block.
    """
    from ..stages.join import default_join_partitions, hash_join

    lo, hi = _ts_us(date_from), _ts_us(date_to)
    i64, f64 = pa.int64(), pa.float64()

    nation = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    regk = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    regk = set(regk.loc[regk["r_name"] == region, "r_regionkey"])
    reg_nat = pa.array(
        nation.loc[nation["n_regionkey"].isin(regk),
                   "n_nationkey"].to_numpy())
    tgt = nation.loc[nation["n_name"] == supp_nation, "n_nationkey"]
    if len(tgt) != 1:
        raise ValueError(f"nation not found: {supp_nation}")
    tgt_key = int(tgt.iloc[0])

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).map_batches(
            lambda t: t.select(["c_custkey"]).filter(pc.is_valid(
                pc.index_in(t.column("c_nationkey"),
                            value_set=reg_nat))),
            batch_format="pyarrow", zero_copy_batch=True)

    def orders_side(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").cast(i64)
        keep = pc.and_(pc.greater_equal(od, pa.scalar(int(lo))),
                       pc.less(od, pa.scalar(int(hi))))
        t2 = t.filter(keep)
        return pa.table({
            "o_orderkey": t2.column("o_orderkey"),
            "o_custkey": t2.column("o_custkey"),
            "o_year": pc.year(t2.column("o_orderdate")).cast(i64)})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow",
                  zero_copy_batch=True)

    nparts = default_join_partitions()
    j1 = hash_join(orders, cust, on=("o_custkey",),
                   right_on=("c_custkey",),
                   right_schema=[("c_custkey", i64)]
                   ).repartition(nparts)

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"]).to_pandas()
    pkeys = pa.array(
        part.loc[part["p_type"] == part_type, "p_partkey"].to_numpy())
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]
                           ).to_pandas()
    bref = ray.put((pkeys,
                    pa.array(supp["s_suppkey"].to_numpy()),
                    supp["s_nationkey"].to_numpy().astype(np.int64)))

    def li_side(t: pa.Table, *, bref) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], i64),
                          "is_tgt": pa.array([], i64),
                          "rev": pa.array([], f64)})
        if t.num_rows == 0:
            return empty
        pk, skeys, snation = ray.get(bref) if isinstance(
            bref, ray.ObjectRef) else bref
        keep = pc.is_valid(pc.index_in(
            t.column("l_partkey"), value_set=pk)).to_numpy(
                zero_copy_only=False)
        if not keep.any():
            return empty
        t2 = t.filter(pa.array(keep))
        pos = pc.index_in(t2.column("l_suppkey"),
                          value_set=skeys).to_numpy(
                              zero_copy_only=False)
        snat = np.full(t2.num_rows, -1, dtype=np.int64)
        valid = pos == pos
        snat[valid] = snation[pos[valid].astype(np.int64)]
        price = t2.column("l_extendedprice").to_numpy()
        disc = t2.column("l_discount").to_numpy()
        return pa.table({
            "l_orderkey": t2.column("l_orderkey"),
            "is_tgt": pa.array((snat == tgt_key).astype(np.int64)),
            "rev": pa.array(price * (1.0 - disc))})

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]).map_batches(
            li_side, fn_kwargs={"bref": bref},
            batch_format="pyarrow")

    j2 = hash_join(lineitem, j1, on=("l_orderkey",),
                   right_on=("o_orderkey",),
                   left_schema=[("l_orderkey", i64), ("is_tgt", i64),
                                ("rev", f64)],
                   right_schema=[("o_orderkey", i64),
                                 ("o_custkey", i64),
                                 ("o_year", i64)]
                   ).repartition(nparts)

    def year_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_year": pa.array([], i64),
                             "nat": pa.array([], f64),
                             "tot": pa.array([], f64)})
        rev = t.column("rev").to_numpy()
        df = (pd.DataFrame({
                "o_year": t.column("o_year").to_numpy(),
                "nat": rev * t.column("is_tgt").to_numpy(),
                "tot": rev})
              .groupby("o_year", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (j2.map_batches(year_partial, batch_format="pyarrow")
           .groupby("o_year").sum(["nat", "tot"]))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_year": pa.array([], i64),
                             "nation_rev": pa.array([], f64),
                             "total_rev": pa.array([], f64)})
        return pa.table({
            "o_year": t.column("o_year"),
            "nation_rev": pa.array(np.round(
                t.column("sum(nat)").to_numpy(), 2)),
            "total_rev": pa.array(np.round(
                t.column("sum(tot)").to_numpy(), 2))})

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


MARKET_SHARE_SQL = """
    SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
           ROUND(SUM(CASE WHEN n2.n_name = '{supp_nation}'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 2) AS nation_rev,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
               AS total_rev
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = '{region}' AND p.p_type = '{part_type}'
      AND o.o_orderdate >= TIMESTAMP '{date_from}'
      AND o.o_orderdate <  TIMESTAMP '{date_to}'
    GROUP BY 1
    ORDER BY 1
"""


def profit_by_nation(sf_dir: str, name_prefix: str = "red"):
    """TPC-H Q9 shape: per (supplier nation, order year), the profit
    on parts whose name starts with ``name_prefix`` — profit =
    l_extendedprice*(1-l_discount) - 0.1*p_retailprice*l_quantity
    (the sandbox has no partsupp, so 10% of p_retailprice stands in
    for ps_supplycost; reference Q9 uses ps_supplycost*l_quantity).
    Returns (n_name, o_year, profit) on the 2dp grid.

    Scale shape: the name-filtered part attributes broadcast via
    ray.put as a (partkey -> retailprice) map and the supplier
    (suppkey -> nationkey) map broadcasts alongside (both small here;
    at TPC-H scale flip each to a partitioned hash join — the
    revenue_by_nation note); the lineitem scan computes per-row
    profit AND the (nation, ...) tag in one vectorized pass, then
    pre-aggregates per batch by (nationkey, orderkey-join pending),
    so the orders join (partitioned, for the year) carries one row
    per (order, nation) per batch instead of one per lineitem.
    """
    from ..stages.join import default_join_partitions, hash_join

    i64, f64, s = pa.int64(), pa.float64(), pa.string()

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    part = part[part["p_name"].str.startswith(name_prefix)]
    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]
                           ).to_pandas()
    nation = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    nat_names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    bref = ray.put((pa.array(part["p_partkey"].to_numpy()),
                    part["p_retailprice"].to_numpy(),
                    pa.array(supp["s_suppkey"].to_numpy()),
                    supp["s_nationkey"].to_numpy().astype(np.int64)))

    def li_side(t: pa.Table, *, bref) -> pa.Table:
        empty = pa.table({"l_orderkey": pa.array([], i64),
                          "nationkey": pa.array([], i64),
                          "profit": pa.array([], f64)})
        if t.num_rows == 0:
            return empty
        pk, retail, skeys, snation = ray.get(bref) if isinstance(
            bref, ray.ObjectRef) else bref
        pos = pc.index_in(t.column("l_partkey"),
                          value_set=pk).to_numpy(
                              zero_copy_only=False)
        keep = pos == pos
        if not keep.any():
            return empty
        t2 = t.filter(pa.array(keep))
        posk = pos[keep].astype(np.int64)
        spos = pc.index_in(t2.column("l_suppkey"),
                           value_set=skeys).to_numpy(
                               zero_copy_only=False)
        snat = np.full(t2.num_rows, -1, dtype=np.int64)
        valid = spos == spos
        snat[valid] = snation[spos[valid].astype(np.int64)]
        price = t2.column("l_extendedprice").to_numpy()
        disc = t2.column("l_discount").to_numpy()
        qty = t2.column("l_quantity").to_numpy()
        profit = price * (1.0 - disc) - 0.1 * retail[posk] * qty
        # per-batch partial by (order, nation): the orders join then
        # carries one row per (order, nation) per batch
        df = (pd.DataFrame({
                "l_orderkey": t2.column("l_orderkey").to_numpy(),
                "nationkey": snat, "profit": profit})
              .groupby(["l_orderkey", "nationkey"], sort=False)
              .sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(li_side, fn_kwargs={"bref": bref},
                  batch_format="pyarrow")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"]).map_batches(
            lambda t: pa.table({
                "o_orderkey": t.column("o_orderkey"),
                "o_year": pc.year(t.column("o_orderdate")).cast(i64)}),
            batch_format="pyarrow", zero_copy_batch=True)

    nparts = default_join_partitions()
    j = hash_join(lineitem, orders, on=("l_orderkey",),
                  right_on=("o_orderkey",),
                  left_schema=[("l_orderkey", i64),
                               ("nationkey", i64), ("profit", f64)],
                  right_schema=[("o_orderkey", i64), ("o_year", i64)]
                  ).repartition(nparts)

    def ny_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"nationkey": pa.array([], i64),
                             "o_year": pa.array([], i64),
                             "profit": pa.array([], f64)})
        df = (pd.DataFrame({
                "nationkey": t.column("nationkey").to_numpy(),
                "o_year": t.column("o_year").to_numpy(),
                "profit": t.column("profit").to_numpy()})
              .groupby(["nationkey", "o_year"], sort=False)
              .sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (j.map_batches(ny_partial, batch_format="pyarrow")
           .groupby(["nationkey", "o_year"]).sum("profit"))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_name": pa.array([], s),
                             "o_year": pa.array([], i64),
                             "profit": pa.array([], f64)})
        keys = t.column("nationkey").to_pylist()
        return pa.table({
            "n_name": pa.array([nat_names[k] for k in keys], s),
            "o_year": t.column("o_year"),
            "profit": pa.array(np.round(
                t.column("sum(profit)").to_numpy(), 2))})

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


PROFIT_BY_NATION_SQL = """
    SELECT n.n_name,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity), 2)
               AS profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '{name_prefix}%'
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def top_supplier_revenue(sf_dir: str, date_from: str = "1996-01-01",
                         date_to: str = "1996-04-01") -> pa.Table:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue from
    lineitems shipped in [date_from, date_to). Returns (s_suppkey,
    s_name, total_revenue); revenue rounds to the 2dp grid BEFORE the
    max, so the max-equality select is grid-exact on both engines.

    Scale shape: the date filter + per-batch (suppkey, rev) partials
    bound the shuffle to O(suppliers) per batch; the per-supplier
    groupby output stays a Dataset — max is a Dataset aggregate and
    the winner filter one vectorized map, so nothing but the ≤
    #winners result lands on the driver; winner names arrive via a
    broadcast key fetch (suppliers ship nothing through the shuffle).
    Revenue accumulates as EXACT int64 10^-4-dollar units (inputs on
    the 2dp grid; bound: $9.2e14 per supplier before overflow) and
    rounds to cents in integer arithmetic, so the max-equality is
    bit-exact on both engines — no float-order sensitivity.
    """
    lo, hi = _ts_us(date_from), _ts_us(date_to)
    i64, f64, s = pa.int64(), pa.float64(), pa.string()

    def li_partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(i64).to_numpy(
            zero_copy_only=False)
        keep = (ship >= int(lo)) & (ship < int(hi))
        if not keep.any():
            return pa.table({"l_suppkey": pa.array([], i64),
                             "rev": pa.array([], f64)})
        d_c = np.rint(t.column("l_discount").to_numpy()[keep]
                      * 100.0).astype(np.int64)
        rev_u = _cents(t.column("l_extendedprice").to_numpy()[keep]) \
            * (100 - d_c)
        df = (pd.DataFrame({
                "l_suppkey": t.column("l_suppkey").to_numpy()[keep],
                "rev": rev_u})
              .groupby("l_suppkey", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    def to_grid(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], i64),
                             "rev": pa.array([], f64)})
        u = t.column("sum(rev)").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_suppkey": t.column("l_suppkey").cast(i64),
            "rev": pa.array(((u + 50) // 100) / 100.0, f64)})

    per_supp = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_suppkey").sum("rev")
        .map_batches(to_grid, batch_format="pyarrow",
                     zero_copy_batch=True)
        ).materialize()

    best = per_supp.max("rev")
    if best is None:
        return pa.table({"s_suppkey": pa.array([], i64),
                         "s_name": pa.array([], s),
                         "total_revenue": pa.array([], f64)})
    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t.column("rev"),
                                    pa.scalar(float(best)))),
        batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()
    # Ray passes EMPTY blocks through map_batches without invoking
    # the UDF, so schema-less empties survive any typing map — drop
    # them before the concat (they carry no rows by definition)
    tabs = [t for t in (ray.get(r) for r in winners) if t.num_rows]
    if not tabs:
        return pa.table({"s_suppkey": pa.array([], i64),
                         "s_name": pa.array([], s),
                         "total_revenue": pa.array([], f64)})
    win = pa.concat_tables(tabs)

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"]
                           ).to_pandas().set_index("s_suppkey")
    keys = win.column("l_suppkey").to_pylist()
    order = np.argsort(np.asarray(keys, dtype=np.int64))
    keys = [keys[i] for i in order]
    return pa.table({
        "s_suppkey": pa.array(keys, i64),
        "s_name": pa.array([supp.loc[k, "s_name"] for k in keys], s),
        "total_revenue": pa.array(
            win.column("rev").to_numpy()[order], f64)})


TOP_SUPPLIER_SQL = """
    WITH rev AS (
        SELECT l_suppkey,
               ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100)
                                   AS BIGINT)))
                 + 50) // 100) / 100.0 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{date_from}'
          AND l_shipdate <  TIMESTAMP '{date_to}'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
"""


def small_quantity_revenue(sf_dir: str,
                           brand: str = "Brand#3") -> pa.Table:
    """TPC-H Q17 shape: yearly-averaged revenue lost to small orders —
    the extended-price sum of ``brand`` lineitems whose quantity is
    below 20% of that part's average lineitem quantity, divided by 7.
    Returns one row (avg_yearly) on the 2dp grid.

    The 0.2*avg comparison is EXACT: quantities are integral, so
    q < s/(5c) <=> 5*q*c < s in int64 (s = per-part quantity sum,
    c = per-part line count) — no float threshold can straddle the
    engines (the kcore/ktruss exact-arithmetic discipline).

    Scale shape (the textbook two-pass Q17 plan): the brand's partkey
    set broadcasts via ray.put (constant fraction of part; flip to a
    hash join at TPC-H scale); pass 1 computes per-part (s, c) with
    per-batch partials restricted to brand parts (the groupby output
    is O(brand parts) and broadcasts); pass 2 re-scans lineitem,
    keeps 5*q*c < s rows via two vectorized gathers, and emits one
    scalar partial per block. Two bounded scans, zero joins.
    """
    i64, f64 = pa.int64(), pa.float64()
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"]).to_pandas()
    pkeys = pa.array(
        part.loc[part["p_brand"] == brand, "p_partkey"].to_numpy())
    pref = ray.put(pkeys)

    def qty_partial(t: pa.Table, *, pref) -> pa.Table:
        keys = ray.get(pref) if isinstance(
            pref, ray.ObjectRef) else pref
        keep = pc.is_valid(pc.index_in(
            t.column("l_partkey"), value_set=keys)).to_numpy(
                zero_copy_only=False)
        if not keep.any():
            return pa.table({"l_partkey": pa.array([], i64),
                             "s": pa.array([], i64),
                             "c": pa.array([], i64)})
        df = pd.DataFrame({
            "l_partkey": t.column("l_partkey").to_numpy()[keep],
            "s": np.round(t.column("l_quantity").to_numpy()[keep]
                          ).astype(np.int64),
            "c": np.ones(int(keep.sum()), dtype=np.int64)})
        df = df.groupby("l_partkey", sort=False).sum().reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=li_cols[:2])
             .map_batches(qty_partial, fn_kwargs={"pref": pref},
                          batch_format="pyarrow")
             .groupby("l_partkey").sum(["s", "c"])).to_pandas()
    if stats.empty:
        # no brand part ever shipped: the empty groupby drops its
        # column names, so short-circuit the second scan entirely
        return pa.table({"avg_yearly": pa.array([0.0], f64)})
    sref = ray.put((
        pa.array(stats["l_partkey"].to_numpy().astype(np.int64)),
        stats["sum(s)"].to_numpy().astype(np.int64),
        stats["sum(c)"].to_numpy().astype(np.int64)))

    def small_partial(t: pa.Table, *, sref) -> pa.Table:
        keys, s_arr, c_arr = ray.get(sref) if isinstance(
            sref, ray.ObjectRef) else sref
        pos = pc.index_in(t.column("l_partkey"),
                          value_set=keys).to_numpy(
                              zero_copy_only=False)
        valid = pos == pos
        if not valid.any():
            return pa.table({"price": pa.array([], f64)})
        posk = pos[valid].astype(np.int64)
        q = np.round(t.column("l_quantity").to_numpy()[valid]
                     ).astype(np.int64)
        keep = 5 * q * c_arr[posk] < s_arr[posk]
        if not keep.any():
            return pa.table({"price": pa.array([], f64)})
        price = t.column("l_extendedprice").to_numpy()[valid][keep]
        return pa.table({"price": pa.array(
            [float(np.sum(price))], f64)})

    total = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=li_cols)
             .map_batches(small_partial, fn_kwargs={"sref": sref},
                          batch_format="pyarrow").sum("price"))
    total = total or 0.0
    return pa.table({"avg_yearly": pa.array(
        [round(float(total) / 7.0, 2)], f64)})


SMALL_QUANTITY_SQL = """
    WITH pp AS (SELECT l_partkey,
                       CAST(SUM(l_quantity) AS BIGINT) AS s,
                       COUNT(*) AS c
                FROM lineitem GROUP BY l_partkey)
    SELECT COALESCE(ROUND(SUM(l.l_extendedprice) / 7, 2), 0.0)
               AS avg_yearly
    FROM lineitem l
    JOIN pp ON pp.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{brand}'
      AND 5 * CAST(l.l_quantity AS BIGINT) * pp.c < pp.s
"""


# ---------------------------------------- Q2 / Q11 / Q20 / Q21 shapes


def _region_suppliers(sf_dir: str, region: str) -> pd.DataFrame:
    """(s_suppkey, s_name, n_name) for suppliers whose nation sits in
    ``region`` — the region/nation/supplier dimension chain is tiny
    at any scale (25 nations, 5 regions; suppliers are the largest
    leg and still broadcastable at TPC-H SF100k). Raises ValueError
    on an unknown region (the market_share discipline)."""
    reg = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    if region not in set(reg["r_name"]):
        raise ValueError(f"unknown region {region!r}")
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    nat = nat[nat["n_regionkey"] == rkey]
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    return supp.merge(nat, left_on="s_nationkey",
                      right_on="n_nationkey")[
                          ["s_suppkey", "s_name", "n_name"]]


def _cents(a: np.ndarray) -> np.ndarray:
    """Exact int64 cents for prices on the 2dp grid (np.rint ==
    DuckDB ROUND here: the inputs are 2dp-exact, so x*100 sits within
    float ulp of an integer and never on a .5 boundary)."""
    return np.rint(a * 100.0).astype(np.int64)


def min_cost_supplier(sf_dir: str, region: str = "ASIA",
                      part_type: str = "STANDARD",
                      max_size: int = 25, k: int = 100) -> pa.Table:
    """TPC-H Q2 shape: for each part of one type and bounded size,
    the minimum-cost supplier within a region — the sandbox has no
    partsupp, so supply cost stands in as MIN over lineitem rows of
    the line price in exact int64 cents (cf. reference Q2's
    MIN(ps_supplycost) correlated subquery). Cost ties break to the
    smallest s_suppkey. Returns top-k rows (p_partkey, cost_cents,
    s_suppkey, s_name, n_name) by (cost_cents ASC, p_partkey ASC) —
    one row per part, so the order is total and the LIMIT exact.

    Scale shape: region/nation/supplier broadcast via ray.put (tiny
    dimension chain); the part filter broadcasts keys the same way
    (flip to a partitioned hash join at TPC-H scale — the
    revenue_by_nation note); the lineitem scan filters both sides
    per batch and the per-part argmin runs through
    ``lexmin_per_key`` (tree combine, no hash shuffle; exact
    shuffle fallback past the one-block bound), so the correlated
    MIN-subquery never materializes a (part, supplier) cost table
    on the driver. Only the ≤ k winners fetch names."""
    from ..graph.walks import lexmin_per_key
    from ..stages.join import default_join_partitions

    i64, s = pa.int64(), pa.string()
    rs = _region_suppliers(sf_dir, region)
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type", "p_size"]).to_pandas()
    part = part[(part["p_type"] == part_type)
                & (part["p_size"] <= max_size)]
    bref = ray.put((pa.array(part["p_partkey"].to_numpy()),
                    pa.array(rs["s_suppkey"].to_numpy())))

    empty = pa.table({"key": pa.array([], i64),
                      "a": pa.array([], i64),
                      "b": pa.array([], i64)})

    def li_rows(t: pa.Table, *, bref) -> pa.Table:
        if t.num_rows == 0:
            return empty
        pk, sk = ray.get(bref) if isinstance(
            bref, ray.ObjectRef) else bref
        keep = (pc.is_valid(pc.index_in(t.column("l_partkey"),
                                        value_set=pk))
                .to_numpy(zero_copy_only=False)
                & pc.is_valid(pc.index_in(t.column("l_suppkey"),
                                          value_set=sk))
                .to_numpy(zero_copy_only=False))
        if not keep.any():
            return empty
        return pa.table({
            "key": pa.array(
                t.column("l_partkey").to_numpy()[keep], i64),
            "a": pa.array(_cents(
                t.column("l_extendedprice").to_numpy()[keep]), i64),
            "b": pa.array(
                t.column("l_suppkey").to_numpy()[keep], i64)})

    rows = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    ).map_batches(li_rows, fn_kwargs={"bref": bref},
                  batch_format="pyarrow")

    # per part: lexmin of (cost_cents, suppkey) — MIN(cost) with the
    # smallest-supplier tie-break, computed shuffle-free
    win = lexmin_per_key(rows, default_join_partitions())
    top = (win.sort(["a", "key"]).limit(k).to_pandas())
    out_cols = {"p_partkey": pa.array([], i64),
                "cost_cents": pa.array([], i64),
                "s_suppkey": pa.array([], i64),
                "s_name": pa.array([], s),
                "n_name": pa.array([], s)}
    if top.empty:
        return pa.table(out_cols)
    names = rs.set_index("s_suppkey")
    supp = top["b"].to_numpy()
    return pa.table({
        "p_partkey": pa.array(top["key"].to_numpy(), i64),
        "cost_cents": pa.array(top["a"].to_numpy(), i64),
        "s_suppkey": pa.array(supp, i64),
        "s_name": pa.array(names.loc[supp, "s_name"].to_numpy(), s),
        "n_name": pa.array(names.loc[supp, "n_name"].to_numpy(), s)})


MIN_COST_SUPPLIER_SQL = """
    WITH rs AS (SELECT s_suppkey, s_name, n_name
                FROM supplier s
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                JOIN region r ON r.r_regionkey = n.n_regionkey
                WHERE r.r_name = '{region}'),
         cost AS (SELECT l.l_partkey, l.l_suppkey,
                         MIN(CAST(ROUND(l.l_extendedprice * 100)
                                  AS BIGINT)) AS cost_cents
                  FROM lineitem l
                  JOIN part p ON p.p_partkey = l.l_partkey
                  JOIN rs ON rs.s_suppkey = l.l_suppkey
                  WHERE p.p_type = '{part_type}'
                    AND p.p_size <= {max_size}
                  GROUP BY 1, 2),
         win AS (SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY l_partkey
                     ORDER BY cost_cents, l_suppkey) AS rn
                 FROM cost)
    SELECT w.l_partkey AS p_partkey, w.cost_cents,
           rs.s_suppkey, rs.s_name, rs.n_name
    FROM win w JOIN rs ON rs.s_suppkey = w.l_suppkey
    WHERE w.rn = 1
    ORDER BY w.cost_cents, p_partkey
    LIMIT {k}
"""


def important_parts(sf_dir: str, region: str = "EUROPE",
                    frac_den: int = 1000):
    """TPC-H Q11 shape: parts whose total line value (exact int64
    cents) from suppliers in one region exceeds 1/frac_den of the
    global total — the 'important stock' HAVING-vs-global-scalar
    pattern (reference Q11's ps_supplycost*ps_availqty stands in as
    the summed line price; the FRACTION comparison runs EXACT:
    value_cents * frac_den > total_cents, all int64). Returns a
    Dataset (l_partkey, value_cents) ordered by
    (value_cents DESC, l_partkey ASC).

    Scale shape: the region supplier key set broadcasts; per-batch
    per-part partials bound the shuffle to one row per (part, batch);
    the global total is ONE Dataset scalar aggregate over the
    O(parts) grouped result; the threshold broadcasts back into a
    vectorized filter map — the value table never lands on the
    driver."""
    i64 = pa.int64()
    rs = _region_suppliers(sf_dir, region)
    skref = ray.put(pa.array(rs["s_suppkey"].to_numpy()))

    def li_partial(t: pa.Table, *, skref) -> pa.Table:
        empty = pa.table({"l_partkey": pa.array([], i64),
                          "v": pa.array([], i64)})
        if t.num_rows == 0:
            return empty
        sk = ray.get(skref) if isinstance(
            skref, ray.ObjectRef) else skref
        keep = pc.is_valid(pc.index_in(
            t.column("l_suppkey"), value_set=sk)).to_numpy(
                zero_copy_only=False)
        if not keep.any():
            return empty
        df = (pd.DataFrame({
                "l_partkey": t.column("l_partkey").to_numpy()[keep],
                "v": _cents(t.column("l_extendedprice")
                            .to_numpy()[keep])})
              .groupby("l_partkey", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    vals = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(li_partial, fn_kwargs={"skref": skref},
                     batch_format="pyarrow")
        .groupby("l_partkey").sum("v").materialize())
    total = vals.sum("sum(v)") or 0

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_partkey": pa.array([], i64),
                             "value_cents": pa.array([], i64)})
        v = t.column("sum(v)").to_numpy(zero_copy_only=False)
        keep = v * frac_den > int(total)
        return pa.table({
            "l_partkey": pa.array(
                t.column("l_partkey").to_numpy(
                    zero_copy_only=False)[keep], i64),
            "value_cents": pa.array(v[keep], i64)})

    return (vals.map_batches(finish, batch_format="pyarrow",
                             zero_copy_batch=True)
            .sort(["value_cents", "l_partkey"],
                  descending=[True, False]))


IMPORTANT_PARTS_SQL = """
    WITH rs AS (SELECT s_suppkey FROM supplier s
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                JOIN region r ON r.r_regionkey = n.n_regionkey
                WHERE r.r_name = '{region}'),
         v AS (SELECT l.l_partkey,
                      SUM(CAST(ROUND(l.l_extendedprice * 100)
                               AS BIGINT)) AS value_cents
               FROM lineitem l
               JOIN rs ON rs.s_suppkey = l.l_suppkey
               GROUP BY 1)
    SELECT l_partkey, value_cents FROM v
    WHERE value_cents * {frac_den} > (SELECT SUM(value_cents) FROM v)
    ORDER BY value_cents DESC, l_partkey
"""


def promotable_suppliers(sf_dir: str, name_prefix: str = "large",
                         region: str = "AMERICA",
                         year: int = 1996) -> pa.Table:
    """TPC-H Q20 shape: suppliers in one region having some
    prefix-named part whose 'available quantity' exceeds half the
    quantity they shipped of it in one year — the nested
    IN-with-correlated-aggregate chain. The sandbox has no
    ps_availqty, so availability stands in as the number of DISTINCT
    orders the (part, supplier) pair appears in (all time); the
    test 2*norders > sum_qty(year) runs EXACT in int64 (quantities
    are integral, the small_quantity_revenue discipline). Returns
    (s_suppkey, s_name) ordered by s_suppkey.

    Scale shape: part keys and region supplier keys broadcast; the
    lineitem scan emits PER-BATCH-DEDUPED (part, supp, order) rows
    carrying the in-window qty partial (the supplier_part_counts
    distinct discipline), so the first groupby dedupes triples
    globally, the second reduces to one row per (part, supp), and
    the qualifying-supplier projection is O(pairs) — no driver
    materialization before the final DISTINCT supplier set (bounded
    by the region's supplier count)."""
    i64, s = pa.int64(), pa.string()
    lo = _ts_us(f"{year}-01-01")
    hi = _ts_us(f"{year + 1}-01-01")
    rs = _region_suppliers(sf_dir, region)
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name"]
                           ).to_pandas()
    part = part[part["p_name"].str.startswith(name_prefix)]
    bref = ray.put((pa.array(part["p_partkey"].to_numpy()),
                    pa.array(rs["s_suppkey"].to_numpy())))

    empty = pa.table({"l_partkey": pa.array([], i64),
                      "l_suppkey": pa.array([], i64),
                      "l_orderkey": pa.array([], i64),
                      "q": pa.array([], i64)})

    def li_triples(t: pa.Table, *, bref) -> pa.Table:
        if t.num_rows == 0:
            return empty
        pk, sk = ray.get(bref) if isinstance(
            bref, ray.ObjectRef) else bref
        keep = (pc.is_valid(pc.index_in(t.column("l_partkey"),
                                        value_set=pk))
                .to_numpy(zero_copy_only=False)
                & pc.is_valid(pc.index_in(t.column("l_suppkey"),
                                          value_set=sk))
                .to_numpy(zero_copy_only=False))
        if not keep.any():
            return empty
        ship = t.column("l_shipdate").cast(i64).to_numpy()[keep]
        qty = np.rint(t.column("l_quantity").to_numpy()[keep]
                      ).astype(np.int64)
        qty[(ship < lo) | (ship >= hi)] = 0
        df = (pd.DataFrame({
                "l_partkey": t.column("l_partkey").to_numpy()[keep],
                "l_suppkey": t.column("l_suppkey").to_numpy()[keep],
                "l_orderkey": t.column("l_orderkey").to_numpy()[keep],
                "q": qty})
              .groupby(["l_partkey", "l_suppkey", "l_orderkey"],
                       sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    triples = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_orderkey",
                 "l_quantity", "l_shipdate"])
        .map_batches(li_triples, fn_kwargs={"bref": bref},
                     batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey", "l_orderkey"]).sum("q"))

    def pair_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], i64),
                             "n": pa.array([], i64),
                             "q": pa.array([], i64)})
        df = (pd.DataFrame({
                "l_partkey": t.column("l_partkey")
                .to_numpy(zero_copy_only=False),
                "l_suppkey": t.column("l_suppkey")
                .to_numpy(zero_copy_only=False),
                "n": 1,
                "q": t.column("sum(q)")
                .to_numpy(zero_copy_only=False)})
              .groupby(["l_partkey", "l_suppkey"], sort=False)
              .sum().reset_index())
        return pa.table({
            "l_partkey": pa.array(df["l_partkey"].to_numpy(), i64),
            "l_suppkey": pa.array(df["l_suppkey"].to_numpy(), i64),
            "n": pa.array(df["n"].to_numpy().astype(np.int64), i64),
            "q": pa.array(df["q"].to_numpy(), i64)})

    pairs = (triples.map_batches(pair_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
             .groupby(["l_partkey", "l_suppkey"])
             .aggregate(rd.aggregate.Sum("n", alias_name="norders"),
                        rd.aggregate.Sum("q", alias_name="sumqty")))

    def qualify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_suppkey": pa.array([], i64)})
        n = t.column("norders").to_numpy(zero_copy_only=False)
        q = t.column("sumqty").to_numpy(zero_copy_only=False)
        keep = 2 * n > q
        return pa.table({"l_suppkey": pa.array(
            t.column("l_suppkey").to_numpy(
                zero_copy_only=False)[keep], i64)})

    winners = (pairs.map_batches(qualify, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .groupby("l_suppkey").count().to_pandas())
    if winners.empty:
        return pa.table({"s_suppkey": pa.array([], i64),
                         "s_name": pa.array([], s)})
    names = rs.set_index("s_suppkey")
    sk = np.sort(winners["l_suppkey"].to_numpy())
    return pa.table({
        "s_suppkey": pa.array(sk, i64),
        "s_name": pa.array(names.loc[sk, "s_name"].to_numpy(), s)})


PROMOTABLE_SUPPLIERS_SQL = """
    WITH rs AS (SELECT s_suppkey, s_name FROM supplier s
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                JOIN region r ON r.r_regionkey = n.n_regionkey
                WHERE r.r_name = '{region}'),
         pf AS (SELECT p_partkey FROM part
                WHERE p_name LIKE '{name_prefix}%'),
         ps AS (SELECT l.l_partkey, l.l_suppkey,
                       COUNT(DISTINCT l.l_orderkey) AS norders,
                       CAST(SUM(CASE WHEN
                                l.l_shipdate >= TIMESTAMP '{lo}'
                                AND l.l_shipdate < TIMESTAMP '{hi}'
                                THEN l.l_quantity ELSE 0 END)
                            AS BIGINT) AS sumqty
                FROM lineitem l
                JOIN pf ON pf.p_partkey = l.l_partkey
                JOIN rs ON rs.s_suppkey = l.l_suppkey
                GROUP BY 1, 2)
    SELECT DISTINCT rs.s_suppkey, rs.s_name
    FROM ps JOIN rs ON rs.s_suppkey = ps.l_suppkey
    WHERE 2 * ps.norders > ps.sumqty
    ORDER BY rs.s_suppkey
"""


def waiting_suppliers(sf_dir: str, region: str = "ASIA",
                      late_days: int = 30, k: int = 25) -> pa.Table:
    """TPC-H Q21 shape: suppliers in one region who were the SOLE
    late shipper on multi-supplier orders — the
    EXISTS(other supplier) AND NOT EXISTS(other late supplier)
    double-correlation, reduced to exact per-order sufficient
    statistics. 'Late' stands in as MAX(l_shipdate) per (order,
    supplier) exceeding o_orderdate + late_days (the
    order_priority_counts stand-in; the sandbox has no
    receipt/commit dates). Returns top-k (s_suppkey, s_name,
    numwait) by (numwait DESC, s_suppkey ASC).

    Scale shape: per-batch (order, supplier) max-shipdate partials
    bound the first shuffle to one row per pair per batch; the
    orders join is partitioned (both sides big); the per-order
    EXISTS/NOT-EXISTS pair collapses into one groupby carrying
    (supplier_cnt, late_cnt, MAX(late ? suppkey : -1)) — the sole
    late supplier is recoverable exactly when late_cnt == 1, so no
    self-join back onto the pair table; the final per-supplier
    count is O(qualifying orders)."""
    from ..stages.join import default_join_partitions, hash_join

    i64, s = pa.int64(), pa.string()
    rs = _region_suppliers(sf_dir, region)
    late_us = np.int64(late_days) * 86_400_000_000

    def ps_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], i64),
                             "l_suppkey": pa.array([], i64),
                             "mx": pa.array([], i64)})
        df = (pd.DataFrame({
                "l_orderkey": t.column("l_orderkey").to_numpy(),
                "l_suppkey": t.column("l_suppkey").to_numpy(),
                "mx": t.column("l_shipdate").cast(i64).to_numpy()})
              .groupby(["l_orderkey", "l_suppkey"], sort=False)
              .max().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    ps = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(ps_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby(["l_orderkey", "l_suppkey"]).max("mx"))

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"]).map_batches(
            lambda t: pa.table({
                "o_orderkey": t.column("o_orderkey"),
                "odate": t.column("o_orderdate").cast(i64)}),
            batch_format="pyarrow", zero_copy_batch=True)

    nparts = default_join_partitions()
    j = hash_join(ps.repartition(nparts), orders,
                  on=("l_orderkey",), right_on=("o_orderkey",),
                  left_schema=[("l_orderkey", i64),
                               ("l_suppkey", i64), ("max(mx)", i64)],
                  right_schema=[("o_orderkey", i64), ("odate", i64)])

    def order_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], i64),
                             "c": pa.array([], i64),
                             "cl": pa.array([], i64),
                             "ls": pa.array([], i64)})
        okey = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        late = (t.column("max(mx)").to_numpy(zero_copy_only=False)
                > t.column("odate").to_numpy(zero_copy_only=False)
                + late_us)
        df = (pd.DataFrame({
                "l_orderkey": okey, "c": 1,
                "cl": late.astype(np.int64),
                "ls": np.where(late, supp, -1)})
              .groupby("l_orderkey", sort=False)
              .agg(c=("c", "sum"), cl=("cl", "sum"), ls=("ls", "max"))
              .reset_index())
        return pa.table({
            "l_orderkey": pa.array(df["l_orderkey"].to_numpy(), i64),
            "c": pa.array(df["c"].to_numpy().astype(np.int64), i64),
            "cl": pa.array(df["cl"].to_numpy().astype(np.int64), i64),
            "ls": pa.array(df["ls"].to_numpy().astype(np.int64), i64)})

    agg = (j.map_batches(order_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
           .groupby("l_orderkey")
           .aggregate(rd.aggregate.Sum("c", alias_name="c"),
                      rd.aggregate.Sum("cl", alias_name="cl"),
                      rd.aggregate.Max("ls", alias_name="ls")))

    skref = ray.put(pa.array(rs["s_suppkey"].to_numpy()))

    def wait_partial(t: pa.Table, *, skref) -> pa.Table:
        empty = pa.table({"s_suppkey": pa.array([], i64),
                          "w": pa.array([], i64)})
        if t.num_rows == 0:
            return empty
        sk = ray.get(skref) if isinstance(
            skref, ray.ObjectRef) else skref
        c = t.column("c").to_numpy(zero_copy_only=False)
        cl = t.column("cl").to_numpy(zero_copy_only=False)
        ls = t.column("ls").to_numpy(zero_copy_only=False)
        keep = (c >= 2) & (cl == 1)
        keep &= pc.is_valid(pc.index_in(
            pa.array(ls, i64), value_set=sk)).to_numpy(
                zero_copy_only=False)
        if not keep.any():
            return empty
        df = (pd.DataFrame({"s_suppkey": ls[keep], "w": 1})
              .groupby("s_suppkey", sort=False).sum().reset_index())
        return pa.table({
            "s_suppkey": pa.array(df["s_suppkey"].to_numpy(), i64),
            "w": pa.array(df["w"].to_numpy().astype(np.int64), i64)})

    top = (agg.map_batches(wait_partial, fn_kwargs={"skref": skref},
                           batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby("s_suppkey").sum("w")
           .sort(["sum(w)", "s_suppkey"], descending=[True, False])
           .limit(k).to_pandas())
    if top.empty:
        return pa.table({"s_suppkey": pa.array([], i64),
                         "s_name": pa.array([], s),
                         "numwait": pa.array([], i64)})
    names = rs.set_index("s_suppkey")
    sk = top["s_suppkey"].to_numpy()
    return pa.table({
        "s_suppkey": pa.array(sk, i64),
        "s_name": pa.array(names.loc[sk, "s_name"].to_numpy(), s),
        "numwait": pa.array(top["sum(w)"].to_numpy(), i64)})


WAITING_SUPPLIERS_SQL = """
    WITH ps AS (SELECT l_orderkey, l_suppkey,
                       MAX(l_shipdate) AS mx
                FROM lineitem GROUP BY 1, 2),
         j AS (SELECT ps.l_orderkey, ps.l_suppkey,
                      CASE WHEN ps.mx > o.o_orderdate
                               + INTERVAL {late_days} DAY
                           THEN 1 ELSE 0 END AS late
               FROM ps JOIN orders o
                 ON o.o_orderkey = ps.l_orderkey),
         agg AS (SELECT l_orderkey, COUNT(*) AS c, SUM(late) AS cl,
                        MAX(CASE WHEN late = 1 THEN l_suppkey END)
                            AS ls
                 FROM j GROUP BY 1),
         rs AS (SELECT s_suppkey, s_name FROM supplier s
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                JOIN region r ON r.r_regionkey = n.n_regionkey
                WHERE r.r_name = '{region}')
    SELECT rs.s_suppkey, rs.s_name, COUNT(*) AS numwait
    FROM agg JOIN rs ON rs.s_suppkey = agg.ls
    WHERE agg.c >= 2 AND agg.cl = 1
    GROUP BY 1, 2
    ORDER BY numwait DESC, rs.s_suppkey
    LIMIT {k}
"""


def revenue_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP-shaped multi-level aggregate: order revenue (exact
    int64 cents) at (year, month), (year) and grand-total levels in
    ONE pass — the warehouse drill-down shape (GROUP BY ROLLUP).
    Aggregated-out levels carry the -1 sentinel (not NULL: integer
    columns stay integer across engines). Returns (o_year, o_month,
    revenue_cents) ordered by (o_year, o_month), sentinels first.

    Scale shape: one orders scan with per-batch (year, month)
    partials; the finest level materializes once as a Dataset and
    the coarser levels DERIVE from it (a groupby over O(months) rows
    and one scalar aggregate) — never a second scan, never a
    per-level shuffle of the fact table."""
    i64 = pa.int64()

    def month_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_year": pa.array([], i64),
                             "o_month": pa.array([], i64),
                             "rev": pa.array([], i64)})
        od = t.column("o_orderdate")
        df = (pd.DataFrame({
                "o_year": pc.year(od).to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "o_month": pc.month(od).to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "rev": _cents(t.column("o_totalprice").to_numpy())})
              .groupby(["o_year", "o_month"], sort=False)
              .sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    months = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderdate", "o_totalprice"])
              .map_batches(month_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["o_year", "o_month"]).sum("rev")
              .materialize())

    years = (months.map_batches(
        lambda t: pa.table({"o_year": t.column("o_year"),
                            "rev": t.column("sum(rev)")}),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_year").sum("rev"))

    mt = months.to_pandas()
    yt = years.to_pandas()
    total = int(mt["sum(rev)"].sum()) if not mt.empty else 0

    rows = [(-1, -1, total)]
    rows += [(int(r.o_year), -1, int(r["sum(rev)"]))
             for _, r in yt.iterrows()]
    rows += [(int(r.o_year), int(r.o_month), int(r["sum(rev)"]))
             for _, r in mt.iterrows()]
    rows.sort()
    return pa.table({
        "o_year": pa.array([r[0] for r in rows], i64),
        "o_month": pa.array([r[1] for r in rows], i64),
        "revenue_cents": pa.array([r[2] for r in rows], i64)})


REVENUE_ROLLUP_SQL = """
    SELECT COALESCE(o_year, -1) AS o_year,
           COALESCE(o_month, -1) AS o_month,
           revenue_cents
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               EXTRACT(month FROM o_orderdate) AS o_month,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS revenue_cents
        FROM orders
        GROUP BY ROLLUP(o_year, o_month))
    ORDER BY 1, 2
"""


def _ntile_buckets(r: np.ndarray, n: int, k: int) -> np.ndarray:
    """NTILE(k) bucket for 1-based ranks ``r`` out of ``n`` rows:
    the first n % k buckets get ceil(n/k) rows, the rest floor(n/k).
    Pure closed form (property-tested against the definition)."""
    q, m = n // k, n % k
    if q == 0:
        return r.astype(np.int64)
    boundary = m * (q + 1)
    return np.where(r <= boundary,
                    (r - 1) // (q + 1) + 1,
                    m + (r - boundary - 1) // q + 1).astype(np.int64)


@ray.remote
def _block_ntile(block: pa.Table, offset: int, n: int,
                 k: int) -> pa.Table:
    """Assign NTILE(k) buckets to one globally-sorted block given its
    global row offset — pure arithmetic on (offset + i), so blocks
    tile independently."""
    i64 = pa.int64()
    if block.num_rows == 0:
        return pa.table({"c_custkey": pa.array([], i64),
                         "revenue_cents": pa.array([], i64),
                         "decile": pa.array([], i64)})
    r = offset + np.arange(block.num_rows, dtype=np.int64) + 1
    return pa.table({"c_custkey": block.column("c_custkey"),
                     "revenue_cents": block.column("revenue_cents"),
                     "decile": pa.array(_ntile_buckets(r, n, k), i64)})


def customer_revenue_deciles(sf_dir: str, k: int = 10):
    """Distributed NTILE(k): every customer's lifetime order revenue
    (exact int64 cents) with its revenue decile under the total order
    (revenue_cents ASC, c_custkey ASC) — the global window-function
    ranking shape. Returns a Dataset (c_custkey, revenue_cents,
    decile).

    Scale shape: per-batch per-customer partials + one groupby build
    the revenue table; ONE Dataset sort range-partitions it globally;
    each block's global rank offset comes from block METADATA (the
    quantiles_per_type discipline), so bucket assignment is
    embarrassingly parallel arithmetic per block — no second shuffle,
    no driver materialization of the ranked table."""
    i64 = pa.int64()

    def cust_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"c_custkey": pa.array([], i64),
                             "rev": pa.array([], i64)})
        df = (pd.DataFrame({
                "c_custkey": t.column("o_custkey").to_numpy(),
                "rev": _cents(t.column("o_totalprice").to_numpy())})
              .groupby("c_custkey", sort=False).sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    rev = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"])
           .map_batches(cust_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("c_custkey").sum("rev")
           .map_batches(lambda t: pa.table({
               "c_custkey": t.column("c_custkey"),
               "revenue_cents": t.column("sum(rev)")}),
               batch_format="pyarrow", zero_copy_batch=True))

    sorted_ds = rev.sort(["revenue_cents", "c_custkey"]).materialize()
    blocks = [(ref, md.num_rows)
              for bundle in sorted_ds.iter_internal_ref_bundles()
              for ref, md in bundle.blocks]
    n = int(sum(nr for _, nr in blocks))
    if n == 0:
        return rd.from_arrow(pa.table({
            "c_custkey": pa.array([], i64),
            "revenue_cents": pa.array([], i64),
            "decile": pa.array([], i64)}))
    offsets = np.concatenate(
        [[0], np.cumsum([nr for _, nr in blocks])]).astype(np.int64)
    out_refs = [_block_ntile.remote(ref, int(offsets[i]), n, k)
                for i, (ref, _) in enumerate(blocks)]
    return rd.from_arrow_refs(out_refs)


CUSTOMER_DECILES_SQL = """
    WITH rev AS (
        SELECT o_custkey AS c_custkey,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS revenue_cents
        FROM orders GROUP BY 1)
    SELECT c_custkey, revenue_cents,
           CAST(NTILE({k}) OVER (
               ORDER BY revenue_cents, c_custkey) AS BIGINT)
               AS decile
    FROM rev
    ORDER BY revenue_cents, c_custkey
"""
