"""Relational/stream-shaped operators at sf0.001 (oracle parity is the
driver contract; these check semantics directly)."""

import numpy as np
import pandas as pd

from pagerank_ray.pipelines.relational import (asof_join_events_orders,
                                               broadcast_join_orders_customer,
                                               windowed_event_agg)

SF = "/root/testdata/sf0.001"


def test_windowed_agg_counts_sum_to_total():
    import pyarrow.parquet as pq

    out = windowed_event_agg(SF, window_minutes=60).take_all()
    total = sum(r["cnt"] for r in out)
    assert total == pq.read_metadata(f"{SF}/events.parquet").num_rows
    # window key is consistent: all rows of one (type, win) merged
    keys = [(r["event_type"], r["win"]) for r in out]
    assert len(keys) == len(set(keys))


def test_asof_join_backward_semantics():
    import pyarrow.parquet as pq

    out = {r["event_id"]: r["o_orderkey"]
           for r in asof_join_events_orders(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts", "user_id"]).to_pylist()
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).to_pylist()
    # brute-force oracle on a sample of events
    for e in ev[:200]:
        cands = [(o["o_orderdate"], o["o_orderkey"]) for o in orders
                 if o["o_custkey"] == e["user_id"]
                 and o["o_orderdate"] <= e["ts"]]
        if not cands:
            assert e["event_id"] not in out
        else:
            assert out[e["event_id"]] == max(cands)[1]


def test_broadcast_join_matches_pandas():
    import pyarrow.parquet as pq

    out = broadcast_join_orders_customer(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    want = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    assert len(out) == len(want)
    got = out.sort_values(["o_orderkey"]).reset_index(drop=True)
    exp = want.sort_values(["o_orderkey"]).reset_index(drop=True)
    assert (got["c_name"].to_numpy() == exp["c_name"].to_numpy()).all()


def test_range_join_events_matches_bruteforce():
    """Self range join (same user, (ts, ts+60min]) vs brute force."""
    import pyarrow.parquet as pq
    from pagerank_ray.pipelines.relational import range_join_events

    sf = "/root/testdata/sf0.001"
    got = sorted((r["event_id"], r["next_event_id"])
                 for r in range_join_events(sf, minutes=60).take_all())
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "ts", "user_id"]).to_pylist()
    span = 3600 * 1_000_000
    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    want = []
    for rows in by_user.values():
        for a in rows:
            for b in rows:
                ta = a["ts"].timestamp() * 1e6
                tb = b["ts"].timestamp() * 1e6
                if ta < tb <= ta + span:
                    want.append((a["event_id"], b["event_id"]))
    assert got == sorted(want)
    assert len(got) > 0


def test_topk_docs_per_lang_matches_bruteforce():
    import pyarrow.parquet as pq
    from pagerank_ray.pipelines.relational import topk_docs_per_lang

    sf = "/root/testdata/sf0.001"
    got = sorted((r["lang"], r["rnk"], r["doc_id"], r["n_tokens"])
                 for r in topk_docs_per_lang(sf, k=3).take_all())
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "lang", "text"]).to_pylist()
    by_lang = {}
    for d in docs:
        by_lang.setdefault(d["lang"], []).append(
            (len(d["text"].split()), d["doc_id"]))
    want = []
    for lang, rows in by_lang.items():
        rows.sort(key=lambda x: (-x[0], x[1]))
        for i, (ntok, did) in enumerate(rows[:3]):
            want.append((lang, i + 1, did, ntok))
    assert got == sorted(want)


def test_quantiles_per_type_exact():
    """Distributed sort+index quantiles == numpy on the raw column,
    with DuckDB quantile_disc index semantics (ceil(q*n)-1)."""
    import math

    import pyarrow.parquet as pq
    from pagerank_ray.pipelines.relational import quantiles_per_type

    sf = "/root/testdata/sf0.001"
    got = {(r["event_type"], r["q"]): r["value"]
           for r in quantiles_per_type(sf, qs=(0.25, 0.5, 0.9))
           .to_pylist()}
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "value"]).to_pylist()
    by_type = {}
    for e in ev:
        by_type.setdefault(e["event_type"], []).append(e["value"])
    for et, vals in by_type.items():
        vals.sort()
        for q in (0.25, 0.5, 0.9):
            idx = min(len(vals) - 1,
                      max(0, math.ceil(q * len(vals)) - 1))
            assert got[(et, q)] == vals[idx]


def test_distinct_users_per_type_exact():
    import pyarrow.parquet as pq
    from pagerank_ray.pipelines.relational import distinct_users_per_type

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r["distinct_users"]
           for r in distinct_users_per_type(sf).take_all()}
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "user_id"]).to_pylist()
    want = {}
    for e in ev:
        want.setdefault(e["event_type"], set()).add(e["user_id"])
    assert got == {k: len(v) for k, v in want.items()}


def test_bucket_count_invariance_asof_and_range():
    """as-of / range join results must not depend on num_buckets (the
    knob only sizes per-group heaps); default derives from row count."""
    from pagerank_ray.pipelines.relational import (_derive_buckets,
                                                   range_join_events)

    a4 = sorted((r["event_id"], r["o_orderkey"])
                for r in asof_join_events_orders(SF, num_buckets=4)
                .take_all())
    a32 = sorted((r["event_id"], r["o_orderkey"])
                 for r in asof_join_events_orders(SF, num_buckets=32)
                 .take_all())
    assert a4 == a32 and len(a4) > 0

    r4 = sorted((r["event_id"], r["next_event_id"])
                for r in range_join_events(SF, minutes=60, num_buckets=4)
                .take_all())
    r32 = sorted((r["event_id"], r["next_event_id"])
                 for r in range_join_events(SF, minutes=60,
                                            num_buckets=32).take_all())
    assert r4 == r32 and len(r4) > 0

    # sizing rule: ~500k rows per bucket, floored at 8
    assert _derive_buckets(100) == 8
    assert _derive_buckets(10_000_000) == 20
    assert _derive_buckets(10_000_001) == 21


def test_sessionize_events_matches_bruteforce():
    """Gap sessionization vs a per-user python oracle; also invariant
    across bucket counts."""
    import pyarrow.parquet as pq
    from pagerank_ray.pipelines.relational import sessionize_events

    got = {r["event_id"]: r["session_id"]
           for r in sessionize_events(SF, gap_minutes=30).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts", "user_id"]).to_pylist()
    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(
            (int(e["ts"].timestamp() * 1e6), e["event_id"]))
    want = {}
    gap = 30 * 60 * 1_000_000
    for rows in by_user.values():
        rows.sort()
        cur = None
        prev_t = None
        for t, eid in rows:
            if prev_t is None or t - prev_t > gap:
                cur = eid
            want[eid] = cur
            prev_t = t
    assert got == want
    assert len(got) == len(ev)
    # more than one session must exist, and multi-event sessions too
    assert len(set(got.values())) < len(got)

    g2 = {r["event_id"]: r["session_id"]
          for r in sessionize_events(SF, gap_minutes=30,
                                     num_buckets=4).take_all()}
    assert g2 == got


def test_modal_event_type_per_user_matches_bruteforce():
    import pyarrow.parquet as pq
    from pagerank_ray.pipelines.relational import modal_event_type_per_user

    got = {r["user_id"]: (r["modal_type"], r["cnt"])
           for r in modal_event_type_per_user(SF).take_all()}
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pylist()
    cnt = {}
    for e in ev:
        k = (e["user_id"], e["event_type"])
        cnt[k] = cnt.get(k, 0) + 1
    want = {}
    for (u, ty), c in cnt.items():
        best = want.get(u)
        if best is None or (-c, ty) < (-best[1], best[0]):
            want[u] = (ty, c)
    assert got == want


def test_sliding_event_agg_overlap_semantics():
    """Each event lands in exactly size/hop windows; per-window counts
    match a brute-force window membership check."""
    import pyarrow.parquet as pq
    from pagerank_ray.pipelines.relational import sliding_event_agg

    out = sliding_event_agg(SF, size_minutes=60,
                            hop_minutes=15).take_all()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pylist()
    hop = 15 * 60 * 1_000_000
    size = 60 * 60 * 1_000_000
    want = {}
    for e in ev:
        t = int(e["ts"].timestamp() * 1e6)
        w_last = t // hop
        for w in range(w_last - 3, w_last + 1):
            assert w * hop <= t < w * hop + size
            key = (e["event_type"], w)
            c, s = want.get(key, (0, 0.0))
            want[key] = (c + 1, s + e["value"])
    got = {(r["event_type"], r["win"]): (r["cnt"],
                                         round(r["val_sum"], 2))
           for r in out}
    assert got.keys() == want.keys()
    for kk in want:
        assert got[kk][0] == want[kk][0]
        assert abs(got[kk][1] - want[kk][1]) < 0.011
    # total mass: every event counted exactly 4x
    assert sum(c for c, _ in got.values()) == 4 * len(ev)


def test_props_key_stats_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.relational import (PROPS_KEY_STATS_SQL,
                                                   props_key_stats)

    sf = "/root/testdata/sf0.001"
    got = props_key_stats(sf).to_pandas().sort_values(
        "event_type").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    exp = con.execute(PROPS_KEY_STATS_SQL).df().sort_values(
        "event_type").reset_index(drop=True)
    cols = ["event_type", "cnt", "k_sum", "k_min", "k_max"]
    assert got[cols].astype({c: "int64" for c in cols[1:]}).equals(
        exp[cols].astype({c: "int64" for c in cols[1:]}))
    assert got["cnt"].sum() > 0


def test_outlier_events_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.relational import (OUTLIER_EVENTS_SQL,
                                                   outlier_events)

    sf = "/root/testdata/sf0.001"
    got = outlier_events(sf, q=0.9).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    exp = con.execute(OUTLIER_EVENTS_SQL.format(q=0.9)).df().sort_values(
        "event_id").reset_index(drop=True)
    cols = ["event_id", "event_type", "value"]
    assert got[cols].equals(exp[cols])
    # ~10% of events survive a p90 filter
    n = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert 0.02 * n < len(got) < 0.2 * n


def test_funnel_counts_matches_duckdb():
    import duckdb
    import pandas as pd

    from pagerank_ray.pipelines.relational import (FUNNEL_SQL,
                                                   funnel_counts)
    sf = "/root/testdata/sf0.001"
    got = funnel_counts(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    exp = con.execute(FUNNEL_SQL.format(
        date_from="2024-01-01", date_to="2024-01-02")).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))
    assert len(got) > 0
    # funnel counts never exceed the window's user population
    n_users = con.execute(
        "SELECT COUNT(DISTINCT user_id) FROM events WHERE "
        "ts >= TIMESTAMP '2024-01-01' AND "
        "ts < TIMESTAMP '2024-01-02'").fetchone()[0]
    assert (got.n_users <= n_users).all()


def test_funnel_counts_empty_window():
    from pagerank_ray.pipelines.relational import funnel_counts
    got = funnel_counts("/root/testdata/sf0.001",
                        date_from="1999-01-01", date_to="1999-01-02")
    assert got.num_rows == 0
    assert got.column_names == ["type_a", "type_b", "n_users"]


def test_retention_cohorts_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.relational import (RETENTION_SQL,
                                                   retention_cohorts)
    sf = "/root/testdata/sf0.001"
    got = retention_cohorts(sf, period_days=7).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    exp = con.execute(RETENTION_SQL.format(
        us=7 * 86_400_000_000)).df()
    for c in ("cohort_week", "week_offset", "n_users"):
        assert got[c].tolist() == exp[c].astype("int64").tolist(), c
    # triangle sanity: offset-0 row of each cohort counts the whole
    # cohort, so it must be the cohort's max
    for coh, grp in got.groupby("cohort_week"):
        base = grp.loc[grp.week_offset == 0, "n_users"]
        assert len(base) == 1 and (grp.n_users <= base.iloc[0]).all()


def test_retention_cohorts_single_period():
    """All events in one period -> exactly one (cohort, 0) row whose
    count is the number of distinct users."""
    from pagerank_ray.pipelines.relational import retention_cohorts
    sf = "/root/testdata/sf0.001"
    got = retention_cohorts(sf, period_days=10_000).to_pandas()
    assert len(got) == 1 and got.week_offset[0] == 0
    import pyarrow.parquet as _pq
    nu = len(set(_pq.read_table(f"{sf}/events.parquet",
                                columns=["user_id"])
                 .column("user_id").to_pylist()))
    assert got.n_users[0] == nu


def test_transition_counts_matches_pandas_and_duckdb():
    import duckdb

    from pagerank_ray.pipelines.events_graph import (TRANSITIONS_SQL,
                                                     transition_counts)
    sf = "/root/testdata/sf0.001"
    got = transition_counts(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    exp = con.execute(TRANSITIONS_SQL).df()
    for c in ("prev_type", "next_type"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert got["cnt"].tolist() == exp["cnt"].astype("int64").tolist()
    # pandas brute force: per-user ordered pairs
    import pandas as _pd
    import pyarrow.parquet as _pq
    ev = _pq.read_table(f"{sf}/events.parquet").to_pandas().sort_values(
        ["user_id", "ts", "event_id"])
    total = sum((ev.groupby("user_id").size() - 1).clip(lower=0))
    assert got["cnt"].sum() == total


def test_audience_overlap_matches_duckdb_and_brute():
    import duckdb

    from pagerank_ray.pipelines.relational import (AUDIENCE_OVERLAP_SQL,
                                                   audience_overlap)
    sf = "/root/testdata/sf0.001"
    got = audience_overlap(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    exp = con.execute(AUDIENCE_OVERLAP_SQL).df()
    for c in got.columns:
        assert got[c].tolist() == (exp[c].astype("int64").tolist()
                                   if got[c].dtype.kind == "i"
                                   else exp[c].tolist()), c
    # python brute force on one pair
    import pyarrow.parquet as _pq
    ev = _pq.read_table(f"{sf}/events.parquet",
                        columns=["user_id", "event_type"]).to_pandas()
    sets = {t: set(g.user_id) for t, g in ev.groupby("event_type")}
    r = got.iloc[0]
    assert r.n_common == len(sets[r.type_a] & sets[r.type_b])
    assert r.n_union == len(sets[r.type_a] | sets[r.type_b])
    assert (got.n_common <= got.n_union).all()


def test_peak_concurrency_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.relational import (PEAK_CONCURRENCY_SQL,
                                                   peak_concurrency)
    got = peak_concurrency(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    exp = con.execute(PEAK_CONCURRENCY_SQL.format(
        window_minutes=30)).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert (got["max_concurrent"].to_numpy()
            == exp["max_concurrent"].to_numpy()).all()
    # a wider window can only raise (or keep) every peak
    wide = peak_concurrency(SF, window_minutes=120).to_pandas()
    assert (wide["max_concurrent"].to_numpy()
            >= got["max_concurrent"].to_numpy()).all()


def test_peak_concurrency_halfopen_boundary(tmp_path):
    # intervals [0, 60) and [60, 120): the first CLOSES exactly when
    # the second opens -> never concurrent (half-open semantics);
    # a third starting at 30 overlaps the first only
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "ev"
    d.mkdir()
    base = pd.Timestamp("2024-01-01")
    pq.write_table(pa.table({
        "ts": [base, base + pd.Timedelta(minutes=60),
               base + pd.Timedelta(minutes=30)],
        "event_type": ["a", "a", "a"],
    }), d / "events.parquet")
    from pagerank_ray.pipelines.relational import peak_concurrency
    got = peak_concurrency(str(d), window_minutes=60).to_pandas()
    assert got["event_type"].tolist() == ["a"]
    assert got["max_concurrent"].tolist() == [2]


def test_peak_concurrency_python_brute():
    # independent brute force: sort boundary events per type
    import pyarrow.parquet as pq

    from pagerank_ray.pipelines.relational import peak_concurrency
    got = peak_concurrency(SF, window_minutes=45).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    w = pd.Timedelta(minutes=45)
    for et, g in ev.groupby("event_type"):
        bounds = sorted([(t, 1) for t in g.ts]
                        + [(t + w, -1) for t in g.ts],
                        key=lambda x: (x[0], x[1]))
        c = peak = 0
        for _, dlt in bounds:
            c += dlt
            peak = max(peak, c)
        assert int(got.loc[got.event_type == et,
                           "max_concurrent"].iloc[0]) == peak


def test_path_counts_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.events_graph import (PATH_COUNTS_SQL,
                                                     path_counts)
    got = path_counts(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    exp = con.execute(PATH_COUNTS_SQL).df()
    assert len(got) == len(exp) and len(got) > 0
    for c in ("t1", "t2", "t3"):
        assert got[c].tolist() == exp[c].tolist()
    assert (got["cnt"].to_numpy()
            == exp["cnt"].to_numpy().astype("int64")).all()
    # trigram mass == bigram mass minus one window per >=2-event user
    assert got["cnt"].sum() > 0


def test_path_counts_tiny_blocks(tmp_path):
    # force near-1-row blocks so every trigram crosses a junction:
    # the two-row carry must still count each window exactly once
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 60
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(
            pd.Timestamp("2024-01-01").value // 1000
            + rng.permutation(n) * 1_000_000,
            pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 4, n), pa.int64()),
        "event_type": pa.array(
            [["a", "b", "c"][i] for i in rng.integers(0, 3, n)],
            pa.string()),
    })
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")

    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 256  # bytes -> tiny sort blocks
        from pagerank_ray.pipelines.events_graph import path_counts
        got = path_counts(str(d)).to_pandas()
    finally:
        ctx.target_max_block_size = old

    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"])
    want = {}
    for _, g in df.groupby("user_id"):
        ts = g["event_type"].tolist()
        for i in range(len(ts) - 2):
            want[(ts[i], ts[i + 1], ts[i + 2])] = want.get(
                (ts[i], ts[i + 1], ts[i + 2]), 0) + 1
    got_map = {(r.t1, r.t2, r.t3): int(r.cnt)
               for r in got.itertuples()}
    assert got_map == want


def test_latest_event_per_user_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.relational import (LATEST_EVENT_SQL,
                                                   latest_event_per_user)
    got = latest_event_per_user(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    exp = con.execute(LATEST_EVENT_SQL).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
    # exactly one row per user, and it IS that user's max ts
    assert got["user_id"].is_unique
    import pyarrow.parquet as pq
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    mx = ev.groupby("user_id")["ts"].max()
    assert (got.set_index("user_id")["ts"] == mx).all()


def test_user_activity_reconciliation_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.relational import (
        RECONCILIATION_SQL, user_activity_reconciliation)
    got = user_activity_reconciliation(SF).to_pandas()
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(RECONCILIATION_SQL).df()
    assert len(got) == len(exp) and len(got) > 0
    for c in got.columns:
        assert (got[c].to_numpy()
                == exp[c].to_numpy().astype("int64")).all(), c
    # totals reconcile with the raw tables
    import pyarrow.parquet as pq
    assert got["n_events"].sum() == \
        pq.read_metadata(f"{SF}/events.parquet").num_rows
    assert got["n_orders"].sum() == \
        pq.read_metadata(f"{SF}/orders.parquet").num_rows


def test_event_type_pivot_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.relational import (event_type_pivot,
                                                   event_type_pivot_sql)
    got = event_type_pivot(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    exp = con.execute(event_type_pivot_sql()).df()
    assert len(got) == len(exp) and len(got) > 0
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert (got[c].to_numpy()
                == exp[c].to_numpy().astype("int64")).all(), c
    # unknown categories land in n_other (closed-list semantics)
    few = event_type_pivot(SF, types=("click",)).to_pandas()
    assert (few["n_click"] + few["n_other"]
            == got.drop(columns="user_id").sum(axis=1)).all()


def test_table_profile_matches_duckdb(tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from pagerank_ray.pipelines.relational import (events_profile_sql,
                                                   table_profile)
    cols = ["event_id", "ts", "user_id", "event_type", "value",
            "props"]
    got = table_profile(
        rd.read_parquet(f"{SF}/events.parquet"), cols).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    exp = con.execute(events_profile_sql(cols)).df()
    assert got["column"].tolist() == exp["column"].tolist()
    for c in ("n_rows", "n_null", "n_distinct"):
        assert (got[c].to_numpy()
                == exp[c].to_numpy().astype("int64")).all(), c

    # nulls + near-equal floats: bit-pattern recode keeps distinct
    # semantics exact (0.1+0.2 != 0.3 is TWO distinct doubles)
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(pa.table({
        "value": pa.array([0.1 + 0.2, 0.3, 0.3, None], pa.float64()),
    }), d / "events.parquet")
    p = table_profile(rd.read_parquet(str(d / "events.parquet")),
                      ["value"]).to_pandas()
    assert p.iloc[0].tolist() == ["value", 4, 1, 2]
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM "
                 f"read_parquet('{d}/events.parquet')")
    e2 = con2.execute(events_profile_sql(["value"])).df()
    assert p.values.tolist() == [
        [e2["column"][0], int(e2.n_rows[0]), int(e2.n_null[0]),
         int(e2.n_distinct[0])]]


def test_session_paths_matches_duckdb():
    import duckdb

    from pagerank_ray.pipelines.relational import (session_paths,
                                                   session_paths_sql)
    got = session_paths(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    exp = con.execute(session_paths_sql(30 * 60_000_000)).df()
    assert len(got) == len(exp) and len(got) > 0
    assert got["path"].tolist() == exp["path"].tolist()
    assert (got["cnt"].to_numpy()
            == exp["cnt"].to_numpy().astype("int64")).all()
    # paths are '>'-joined type sequences of bounded length
    assert all(1 <= len(p.split(">")) <= 5 for p in got["path"])
    # bucket-count invariance (the per-bucket assembly is exact)
    b4 = session_paths(SF, num_buckets=4).to_pandas()
    assert b4.equals(got)


def test_session_paths_null_event_type(tmp_path):
    # a NULL type consumes its path position as '' on BOTH engines
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pagerank_ray.pipelines.relational import (session_paths,
                                                   session_paths_sql)
    d = tmp_path / "ev"
    d.mkdir()
    base = pd.Timestamp("2024-01-01").value // 1000
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([base, base + 1_000_000, base + 2_000_000],
                       pa.timestamp("us")),
        "user_id": pa.array([5, 5, 5], pa.int64()),
        "event_type": pa.array(["a", None, "b"], pa.string()),
    }), d / "events.parquet")
    got = session_paths(str(d), num_buckets=2).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    exp = con.execute(session_paths_sql(30 * 60_000_000)).df()
    assert got["path"].tolist() == exp["path"].tolist() == ["a>>b"]
    assert got["cnt"].tolist() == [1]
