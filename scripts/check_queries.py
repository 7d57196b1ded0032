"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf and compare row count + sorted-column value hash
against oracle_sql() via DuckDB. Usage:

    python scripts/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import logging
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            df[c] = col.round(6)
        elif pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]")
        else:
            try:
                df[c] = col.astype("int64")
            except (ValueError, TypeError):
                df[c] = col.astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()[:16]


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ray_data_logging.yaml"),
    )
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:24s} ERROR {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name in sqls:
            oracle = con.execute(sqls[name]).df()
            ok_rows = len(mine) == len(oracle)
            ok_cols = sorted(mine.columns) == sorted(oracle.columns)
            ok_hash = ok_cols and value_hash(mine) == value_hash(oracle)
            status = "OK  " if (ok_rows and ok_hash) else "FAIL"
            print(f"{name:24s} {status} rows={len(mine)}/{len(oracle)} "
                  f"cols={'=' if ok_cols else sorted(mine.columns)} "
                  f"hash={'=' if ok_hash else 'MISMATCH'}  {dt:.1f}s")
            if status == "FAIL":
                failures.append(name)
        else:
            print(f"{name:24s} rows-only rows={len(mine)}  {dt:.1f}s")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
