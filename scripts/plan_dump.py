"""Dump `.explain("formatted")` for named queries() entries to
plans/<tag>/<name>_<suffix>.txt — the optimization round's plan
evidence (guide §1: capture the plan shape before and after every
change; the judge checks plan claims against these files).

Usage:
    python scripts/plan_dump.py --suffix before ext-dedup-semantic ...
    python scripts/plan_dump.py --suffix after --tag r16 <names...>

Streaming entries (stream-*) EXECUTE inside queries()[name] and
return a plain parquet read of their output — their interesting plans
are per-micro-batch and not reachable from here, so this script
refuses them (pass --allow-stream to override for the final read).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awskinesisconsumer_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--allow-stream", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in args.names:
        if name.startswith("stream-") and not args.allow_stream:
            print(f"SKIP {name}: streaming entry (executes at build "
                  "time; per-batch plans not reachable)", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"plan-dump: {name}")
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") \
            + plan.count("FlatMapGroupsInPandas") + plan.count("MapInArrow")
        n_scan = plan.count("Scan parquet")
        print(f"{name}: Exchange={n_exch} PythonNodes={n_py} "
              f"ParquetScans={n_scan} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
