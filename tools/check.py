#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the
<sf_dir> parquet tables, and compares: row count, column names, and cell
values with columns sorted by name and rows sorted by all columns.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error as e:
            print(f"[warn] view {t} unavailable: {e}", file=sys.stderr)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).df()
            s, d = normalize(spark_df), normalize(duck_df)
            rows_ok = len(s) == len(d)
            cols_ok = list(s.columns) == list(d.columns)
            # The driver's hash is value-repr sensitive: an int64 Spark column
            # vs a float64 oracle column (e.g. DuckDB HUGEINT sum() -> float)
            # hash-mismatches even when numerically equal. Mirror that here.
            if cols_ok:
                for c in s.columns:
                    # lower(): nullable extension dtypes spell it 'Float64'
                    sk = "f" if str(s[c].dtype).lower().startswith("float") else "o"
                    dk = "f" if str(d[c].dtype).lower().startswith("float") else "o"
                    if sk != dk:
                        cols_ok = False
                        print(f"    dtype class mismatch on {c}: "
                              f"spark={s[c].dtype} duck={d[c].dtype}")
            vals_ok = False
            if rows_ok and cols_ok:
                try:
                    pd.testing.assert_frame_equal(s, d, check_dtype=False,
                                                  check_exact=True)
                    vals_ok = True
                except AssertionError as e:
                    vals_ok = False
                    err = str(e).splitlines()[:12]
            status = "OK" if (rows_ok and cols_ok and vals_ok) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(f"[{status}] {name}: rows {len(s)}/{len(d)} cols_ok={cols_ok} vals_ok={vals_ok}")
            if not cols_ok:
                print(f"    spark cols: {list(s.columns)}\n    duck  cols: {list(d.columns)}")
            if rows_ok and cols_ok and not vals_ok:
                print("    " + "\n    ".join(err))
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"[FAIL] {name}: {type(e).__name__}: {e}")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
