"""Driver-contract smoke: entry(), queries() shape, oracle_sql() keys."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_entry_smoke():
    out = entry_mod.entry()
    import pyarrow as pa
    assert isinstance(out, pa.Table)
    assert out.num_rows > 0
    assert set(out.column_names) == {"id", "node", "rank"}


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    assert set(sqls) <= set(qs)
    # SQL-expressible coverage should be the majority
    assert len(sqls) >= 15
    assert len(qs) >= 25


def test_sample_queries_run_at_smallest_sf():
    qs = entry_mod.queries()
    edges = qs["edges_from_events"](SF)
    n = edges.count()
    assert n > 0
    topk = qs["filtered_topk_events"](SF)
    rows = topk.take_all()
    assert len(rows) == 10
    vals = [r["value"] for r in rows]
    assert vals == sorted(vals, reverse=True)
