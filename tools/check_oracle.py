"""Driver-style correctness harness: run queries() vs oracle_sql() via
DuckDB on the same parquet tables, compare rows/schema/values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        # normalize int widths
        if str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = norm(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"{name}: RAY-ERROR {type(e).__name__}: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only, {len(got)} rows, {el:.1f}s, cols={list(got.columns)}")
            continue
        want = norm(con.sql(oracles[name]).df())
        status = "OK"
        if list(got.columns) != list(want.columns):
            status = f"COLS got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS got={len(got)} want={len(want)}"
        elif any(
            # dtype-strict on non-float columns: int-vs-float (123 vs 123.0,
            # NULL vs NaN) hashes differently at the driver even when values
            # compare equal here (the r02 events_asof lesson).
            got[c].dtype.kind != want[c].dtype.kind
            and not (got[c].dtype.kind == "f" and want[c].dtype.kind == "f")
            for c in got.columns
        ):
            bad = [
                f"{c}: got={got[c].dtype} want={want[c].dtype}"
                for c in got.columns
                if got[c].dtype.kind != want[c].dtype.kind
            ]
            status = "DTYPE " + "; ".join(bad)
        else:
            # effectively-exact: last-bit float noise only. The driver's
            # value-hash precision is unknown, so every oracle query is
            # engineered to be bit-stable (exact int accumulation, same-op-
            # order scalar float expressions) and checked here at 1e-12 —
            # stricter than any plausible driver hash (r01 lesson: a loose
            # local harness reported OK where the driver hashed a mismatch).
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-12, atol=1e-12)
            except AssertionError as e:
                status = "VALUES " + str(e).splitlines()[0]
                for c in got.columns:
                    if got[c].dtype.kind == "f":
                        d = np.nanmax(np.abs(got[c].to_numpy() - want[c].to_numpy()))
                        if d > 0:
                            status += f" [max|Δ {c}|={d:.3g}]"
        print(f"{name}: {status} ({len(got)} rows, {el:.1f}s)")
    ray.shutdown()


if __name__ == "__main__":
    main()
