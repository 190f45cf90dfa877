"""Same-session interleaved A/B for the r16 ext-dedup-span-removal
flag (VERDICT r17 item 2): outer explode (committed, dedup.py
_span_occurrences) vs the pre-r16 non-outer explode, timed
alternately in ONE session so ambient host noise hits both legs.
Also times ext-bm25-rank (untouched code) as the noise control.

Usage: python scripts/ab_span_removal.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from awskinesisconsumer_spark.operators import dedup  # noqa: E402
from awskinesisconsumer_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_outer_impl = dedup._span_occurrences


def _span_occurrences_nonouter(base, *, id_col, span_len, stride,
                               hash_fn, anchored):
    """The pre-r16 form: plain explode, no null guard."""
    if anchored:
        starts = F.filter(
            F.sequence(
                F.lit(0), (F.size(F.col("_ws")) - span_len).cast("int")
            ),
            lambda p: F.pmod(
                hash_fn(F.element_at(F.col("_ws"), p + 1)), F.lit(stride)
            ) == 0,
        )
    else:
        starts = F.transform(
            F.sequence(
                F.lit(0),
                F.floor(
                    (F.size(F.col("_ws")) - span_len) / stride
                ).cast("int"),
            ),
            lambda i: i * stride,
        )
    return base.select(
        id_col, F.explode(starts).alias("_start"), "_ws",
    ).select(
        id_col, "_start",
        hash_fn(
            F.concat_ws(
                " ", F.slice(F.col("_ws"), F.col("_start") + 1, span_len)
            )
        ).alias("_h"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-span-removal")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["query-point-lookup"](spark, SF_DIR).count()  # warm

    def timed(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    legs: dict[str, list[float]] = {
        "outer": [], "nonouter": [], "bm25": []}
    # one throwaway warm rep per leg so codegen/JIT lands outside
    timed("ext-dedup-span-removal")
    dedup._span_occurrences = _span_occurrences_nonouter
    timed("ext-dedup-span-removal")
    dedup._span_occurrences = _outer_impl
    def gc() -> None:
        spark._jvm.System.gc()  # noqa: SLF001
        time.sleep(0.2)  # let the hinted GC land outside the clock

    for i in range(rounds):
        # alternate leg ORDER per round so position-in-round effects
        # (JIT, page cache, the GC hint) cancel
        first_outer = i % 2 == 0
        for leg in (("outer", "nonouter") if first_outer
                    else ("nonouter", "outer")):
            gc()
            dedup._span_occurrences = (
                _outer_impl if leg == "outer"
                else _span_occurrences_nonouter)
            spark.sparkContext.setJobDescription(f"ab: span {leg}")
            legs[leg].append(timed("ext-dedup-span-removal"))
        dedup._span_occurrences = _outer_impl
        gc()
        spark.sparkContext.setJobDescription("ab: bm25 control")
        legs["bm25"].append(timed("ext-bm25-rank"))
    for name, xs in legs.items():
        print(f"{name}: median {statistics.median(xs):.3f}s  reps "
              + ", ".join(f"{x:.3f}" for x in xs), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
