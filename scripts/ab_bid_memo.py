"""Same-session interleaved A/B for the `_bid` probe memo (VERDICT
item 6): memo ON (committed behavior) vs memo OFF (`_state_fingerprint`
monkeypatched to None, forcing the full per-batch agg probe) across
representative sum-merged streaming entries.

Usage: python scripts/ab_bid_memo.py [rounds] [entry ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awskinesisconsumer_spark.session import get_spark  # noqa: E402
from awskinesisconsumer_spark.streaming import pipeline as P  # noqa: E402

import __spark_entry__ as m  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_real_fp = P._state_fingerprint


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    entries = sys.argv[2:] or [
        "stream-eval-ece", "stream-heavy-hitters",
        "stream-histogram-quantile",
    ]
    spark = get_spark("ab-bid-memo")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    qs["query-point-lookup"](spark, SF_DIR).count()

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format(
            "noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def gc() -> None:
        spark._jvm.System.gc()  # noqa: SLF001
        time.sleep(0.2)

    for name in entries:
        timed(name)  # warm rep outside the clock
        legs: dict[str, list[float]] = {"memo": [], "probe": []}
        for i in range(rounds):
            order = ("memo", "probe") if i % 2 == 0 else ("probe", "memo")
            for leg in order:
                P._state_fingerprint = (
                    _real_fp if leg == "memo" else lambda s, p: None)
                gc()
                spark.sparkContext.setJobDescription(f"ab {name} {leg}")
                legs[leg].append(timed(name))
        P._state_fingerprint = _real_fp
        print(f"{name}: memo {statistics.median(legs['memo']):.3f}s "
              f"vs probe {statistics.median(legs['probe']):.3f}s  "
              f"(memo reps: "
              + ", ".join(f"{x:.2f}" for x in legs["memo"])
              + " | probe reps: "
              + ", ".join(f"{x:.2f}" for x in legs["probe"]) + ")",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
