"""Targeted oracle check: run the NAMED queries() entries under a
VANILLA SparkSession and compare against their DuckDB twins at
sf0.01 (the full_oracle_sweep.py comparison, without the other ~270
entries) — the optimization round's per-change correctness gate.

Usage: python scripts/oracle_check.py <query> [<query> ...]
"""
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as m  # noqa: E402

SF = "/root/testdata/sf0.01"


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6f}"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s[:-6] if s.endswith("+00:00") else s
    return str(v)


def main() -> int:
    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, osql = m.queries(), m.oracle_sql()
    rc = 0
    for name in sys.argv[1:]:
        t0 = time.time()
        sdf = qs[name](spark, SF)
        cols = sorted(sdf.columns)
        srows = sorted(
            tuple(canon(r[c]) for c in cols) for r in sdf.collect())
        if name not in osql:
            print(f"{name} ROWS-ONLY {len(srows)} rows "
                  f"{time.time()-t0:.1f}s", flush=True)
            continue
        tbl = con.execute(osql[name]).fetch_arrow_table()
        drows = sorted(
            tuple(canon(r[c]) for c in sorted(tbl.column_names))
            for r in tbl.to_pylist())
        ok = "MATCH" if srows == drows else "MISMATCH"
        if ok != "MATCH":
            rc = 1
        print(f"{name} {ok} {len(srows)} {time.time()-t0:.1f}s",
              flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
