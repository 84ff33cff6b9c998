"""Local simulation of the driver's correctness gate.

Runs every queries() entry at the given sf_dir, and for those with an
oracle_sql() entry compares row-count, schema (sorted column names)
and order-insensitive values against DuckDB. Usage:

    PYTHONPATH=/root/repo python tools/check_contract.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd


def to_pandas(x):
    import pyarrow as pa
    import ray.data
    if isinstance(x, ray.data.Dataset):
        df = x.to_pandas()
        if df.empty and len(df.columns) == 0:
            # Ray drops columns when every block is empty; rebuild
            # the typed empty frame from the Dataset schema
            sch = x.schema()
            df = pd.DataFrame({n: pd.Series(dtype="object")
                               for n in sch.names})
        return df
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, theirs: pd.DataFrame) -> str:
    if sorted(ours.columns) != sorted(theirs.columns):
        return (f"SCHEMA MISMATCH ours={sorted(ours.columns)} "
                f"oracle={sorted(theirs.columns)}")
    if len(ours) != len(theirs):
        return f"ROWCOUNT MISMATCH ours={len(ours)} oracle={len(theirs)}"
    a, b = canon(ours), canon(theirs)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            if not np.allclose(av.astype(np.float64),
                               bv.astype(np.float64),
                               rtol=0, atol=1e-9, equal_nan=True):
                bad = np.flatnonzero(~np.isclose(
                    av.astype(np.float64), bv.astype(np.float64),
                    rtol=0, atol=1e-9))[:3]
                return f"VALUE MISMATCH col={c} rows={bad.tolist()}"
        else:
            if not (av == bv).all():
                bad = np.flatnonzero(av != bv)[:3]
                return (f"VALUE MISMATCH col={c} rows={bad.tolist()} "
                        f"ours={av[bad].tolist()} "
                        f"oracle={bv[bad].tolist()}")
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:32s} RAY-ERROR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.time() - t0
        if name in sqls:
            try:
                theirs = con.execute(sqls[name]).df()
            except Exception as e:
                print(f"{name:32s} SQL-ERROR {e}")
                n_bad += 1
                continue
            verdict = compare(name, ours, theirs)
        else:
            verdict = f"rows-only ({len(ours)} rows)"
        ok = verdict == "OK" or verdict.startswith("rows-only")
        n_ok += ok
        n_bad += (not ok)
        print(f"{name:32s} {verdict}   [{dt:.1f}s, {len(ours)} rows]")
    print(f"\n{n_ok} ok, {n_bad} bad")
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
