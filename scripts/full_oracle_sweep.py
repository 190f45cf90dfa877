"""Full-registry driver rehearsal: run EVERY oracle-twinned queries()
entry under a VANILLA SparkSession and compare against its DuckDB twin
at sf0.01 — the complete version of the verify skill's recipe.

Resumable: appends one line per query to the log (default
/tmp/full_drive.log) and skips queries already decided there, so an
interrupted sweep continues where it stopped. Delete the log to
restart from scratch.

Usage: python scripts/full_oracle_sweep.py [logfile]
"""
import duckdb, math, sys, time
from pyspark.sql import SparkSession
sys.path.insert(0, "/root/repo")
LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_drive.log"
import __spark_entry__ as m
spark = SparkSession.builder.master("local[16]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float): return "NaN" if math.isnan(v) else f"{v:.6f}"
    if hasattr(v, "isoformat"):
        s = v.isoformat(); return s[:-6] if s.endswith("+00:00") else s
    return str(v)
qs, osql = m.queries(), m.oracle_sql()
done = set()
try:
    for line in open(LOG):
        parts = line.split()
        if len(parts) >= 2 and parts[1] in ("MATCH", "MISMATCH"):
            done.add(parts[0])
except FileNotFoundError:
    pass
out = open(LOG, "a")
for name in sorted(osql):
    if name in done:
        continue
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF)
        cols = sorted(sdf.columns)
        srows = sorted(tuple(canon(r[c]) for c in cols) for r in sdf.collect())
        tbl = con.execute(osql[name]).fetch_arrow_table()
        drows = sorted(tuple(canon(r[c]) for c in sorted(tbl.column_names)) for r in tbl.to_pylist())
        ok = "MATCH" if srows == drows else "MISMATCH"
        print(f"{name} {ok} {len(srows)} {time.time()-t0:.1f}s", file=out, flush=True)
    except Exception as e:
        print(f"{name} ERROR {type(e).__name__}: {str(e)[:200]}", file=out, flush=True)
print("SWEEP-DONE", file=out, flush=True)
