"""Local replica of the driver's correctness gate: run every
__spark_entry__ query in Spark AND its oracle SQL in DuckDB at a given
sf dir, compare row count + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [only_substr ...]
(extra args restrict the run to queries whose name contains any of
them — e.g. `python tools/check_oracle.py /root/testdata/sf0.01
media frame` after touching the media corpus)
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from canned_yaml_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith(("int", "Int", "uint", "bool")):
            df[c] = df[c].astype("float64")  # unify int widths/nulls
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: tuple[str, ...] = ()) -> int:
    spark = get_spark("oracle_check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"parquet_scan('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and not any(s in name for s in only):
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows={len(sdf):7d}  (rows-only, no oracle)")
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        a, b = canon(sdf), canon(ddf)
        ok_n = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = ok_n and ok_cols and a.equals(b)
        status = "OK " if ok_vals else "FAIL"
        print(f"{name:24s} rows={len(a):7d} vs {len(b):7d} "
              f"cols={'='.join(['ok' if ok_cols else 'MISMATCH'])} "
              f"values={'ok' if ok_vals else 'MISMATCH'}  {status}")
        if not ok_vals:
            failures += 1
            if ok_cols and ok_n:
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print("  first diffs (spark vs duckdb):")
                print(pd.concat([a[bad].head(3), b[bad].head(3)],
                                keys=["spark", "duck"]).to_string())
            else:
                print("  spark cols:", list(a.columns))
                print("  duck  cols:", list(b.columns))
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1
                  else "/root/testdata/sf0.01",
                  tuple(sys.argv[2:])))
