"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 via Spark AND its
oracle_sql() twin via DuckDB; compares row count + order-insensitive values
(columns sorted by name, rows sorted, floats rounded, timestamps normalized).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

import __spark_entry__ as se
from kgtm.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].where(df[c].notna(), None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main() -> int:
    spark = get_spark(app_name="verify-oracles", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = se.queries(), se.oracle_sql()
    only = set(sys.argv[2:])  # optional: verify just these queries
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            got = normalize(fn(spark, SF_DIR).toPandas())
            if name not in os_:
                print(f"  {name:24s} rows-only: {len(got)} rows")
                continue
            want = normalize(con.execute(os_[name]).fetchdf())
            ok_rows = len(got) == len(want)
            ok_cols = list(got.columns) == list(want.columns)
            ok_vals = False
            if ok_rows and ok_cols:
                g = got.astype(str).reset_index(drop=True)
                w = want.astype(str).reset_index(drop=True)
                ok_vals = g.equals(w)
            status = "OK " if (ok_rows and ok_cols and ok_vals) else "FAIL"
            print(f"  {name:24s} {status} rows={len(got)}/{len(want)} cols={list(got.columns) == list(want.columns)}")
            if status == "FAIL":
                failures += 1
                print("    spark cols:", list(got.columns))
                print("    duck  cols:", list(want.columns))
                if ok_rows and ok_cols:
                    diff = got.astype(str).compare(want.astype(str))
                    print(diff.head(10))
                else:
                    print("    spark head:\n", got.head(5))
                    print("    duck  head:\n", want.head(5))
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"  {name:24s} ERROR {type(e).__name__}: {e}")
    print(f"{'PASS' if failures == 0 else 'FAIL'} ({len(qs) - failures}/{len(qs)})")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
