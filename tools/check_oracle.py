"""Driver-simulation: run every queries() entry and its oracle_sql() twice
(Ray vs DuckDB) and compare row count, schema (column names), and
order-insensitive values. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result):
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, ray_df, sql_df) -> list:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if np.issubdtype(a[c].dtype, np.floating):
                ok = np.allclose(av.astype(float), bv.astype(float),
                                 rtol=1e-9, atol=1e-12, equal_nan=True)
            else:
                ok = (av == bv).all() if len(av) else True
            if not ok:
                bad = np.where(av != bv)[0][:3] if not np.issubdtype(a[c].dtype, np.floating) else []
                problems.append(f"values differ in column {c} "
                                f"(first idx {list(bad)})")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    only = set(sys.argv[2:])
    unknown = only - set(qs)
    if unknown:
        # a misspelled name would otherwise match nothing, run zero
        # queries and print ALL OK — a green run that checked nothing
        print(f"unknown query name(s): {sorted(unknown)}; "
              f"known: {sorted(qs)}")
        sys.exit(2)
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: sql error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(ray_df)} rows match "
                  f"({time.time()-t0:.1f}s)")
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
