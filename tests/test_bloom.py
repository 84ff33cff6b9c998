"""Bloom-filter join pruning: filter properties + plan equality."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from pagerank_ray.stages.bloom import BloomFilter, bloom_prune, build_bloom

SF = "/root/testdata/sf0.001"


def test_bloom_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(5)
    keys = rng.choice(10_000_000, size=5000, replace=False)
    f = BloomFilter.from_sizing(len(keys), fp_rate=0.01)
    f.add(keys)
    assert f.contains(keys).all()  # never a false negative
    probe = rng.choice(np.setdiff1d(np.arange(20_000_000), keys),
                       size=20_000, replace=False)
    fp = f.contains(probe).mean()
    assert fp < 0.03  # ~1% designed, allow slack


def test_bloom_merge_equals_single():
    rng = np.random.default_rng(6)
    keys = rng.choice(1_000_000, size=4000, replace=False)
    whole = BloomFilter.from_sizing(4000, 0.01)
    whole.add(keys)
    a = BloomFilter.from_sizing(4000, 0.01)
    b = BloomFilter.from_sizing(4000, 0.01)
    a.add(keys[:2000])
    b.add(keys[2000:])
    a.merge(b)
    assert (a.words == whole.words).all()
    # serde round-trip
    back = BloomFilter.from_bytes(whole.to_bytes(), whole.k)
    assert (back.words == whole.words).all() and back.k == whole.k


def test_build_and_prune_dataset():
    keys_t = pa.table({"key": pa.array(range(0, 1000, 7), pa.int64())})
    big_t = pa.table({"key": pa.array(range(1000), pa.int64()),
                      "v": pa.array(range(1000), pa.int64())})
    bloom = build_bloom(rd.from_arrow(keys_t), "key",
                        n_expected=keys_t.num_rows, fp_rate=0.01)
    pruned = bloom_prune(rd.from_arrow(big_t), bloom, "key",
                         concurrency=(1, 2)).to_pandas()
    want = set(range(0, 1000, 7))
    got = set(pruned["key"])
    assert want <= got                       # no false negatives
    assert len(got - want) <= 0.05 * 1000    # few false positives


def test_bloom_actually_prunes_shuffle_input():
    """The pruned big side is ~the selectivity of the small side plus
    the fp sliver — the filter measurably cuts what the shuffle would
    carry (urgent orders are ~20% of all orders)."""
    import pyarrow.parquet as pq
    import ray.data as rd2

    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_orderpriority"])
    urgent = orders.filter(
        pa.compute.equal(orders.column("o_orderpriority"),
                         pa.scalar("1-URGENT")))
    bloom = build_bloom(
        rd2.from_arrow(urgent.select(["o_orderkey"])), "o_orderkey",
        n_expected=urgent.num_rows, fp_rate=0.01)
    li = rd2.read_parquet(f"{SF}/lineitem.parquet",
                          columns=["l_orderkey"])
    total = li.count()
    pruned = bloom_prune(li, bloom, "l_orderkey",
                         concurrency=(1, 2)).count()
    sel = urgent.num_rows / orders.num_rows
    assert pruned < (sel + 0.05) * total  # selectivity + fp slack
    assert pruned > 0


def test_bloom_pruned_join_equals_unpruned_and_sql():
    import duckdb

    from pagerank_ray.pipelines.warehouse import (BLOOM_JOIN_SQL,
                                                  bloom_pruned_order_lines)

    with_bloom = bloom_pruned_order_lines(SF, use_bloom=True).to_pandas()
    without = bloom_pruned_order_lines(SF, use_bloom=False).to_pandas()
    cols = ["orderkey", "n_lines", "sum_qty"]
    w = with_bloom.sort_values(cols).reset_index(drop=True)
    wo = without.sort_values(cols).reset_index(drop=True)
    assert w.equals(wo)  # the filter is pure traffic reduction

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(BLOOM_JOIN_SQL.format(priority="1-URGENT")).df()
    e = exp.sort_values(cols).reset_index(drop=True)[cols]
    assert w.equals(e)
