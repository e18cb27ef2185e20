"""Scale-growth experiment: replicate the documents corpus K times (ids
offset, text salted so replicas are not trivial exact dups) and measure
how the near-dup candidate pipelines grow. Linear-ish wall-clock growth
and bounded candidate counts are the evidence that the banded/capped
designs hold under scale-up. Usage:

    python tools/scalecheck.py [K ...]      # default 1 2 4 10

Prints one line per (K, query): docs, seconds, output rows.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from music_database_spark.session import get_spark  # noqa: E402
from music_database_spark.sources.loader import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(docs: DataFrame, k: int) -> DataFrame:
    """K shifted copies: ids offset per replica; replica r>0 gets a salt
    token appended so copies are near-dups (high Jaccard), not exact dups
    — the worst realistic case for candidate generation."""
    n = docs.count()
    out = docs
    for r in range(1, k):
        out = out.unionByName(
            docs.select(
                (F.col("doc_id") + r * n).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{r}")).alias("text"),
                "lang",
                "source",
                "n_chars",
            ).select(docs.columns)
        )
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--tpch"]
    ks = [int(a) for a in args] or [1, 2, 4, 10]
    if "--tpch" in sys.argv[1:]:
        tpch_growth(ks)
        return 0
    spark = get_spark("scalecheck")
    base = load_table(spark, SF_DIR, "documents")

    from music_database_spark.corpus import CorpusPipeline

    print(f"{'K':>3} {'docs':>7} {'query':<22} {'sec':>7} {'rows':>8}")
    for k in ks:
        docs = replicate(base, k).persist()
        n = docs.count()
        for name, frame in [
            ("exact_dedup", lambda d: CorpusPipeline(d).exact_dedup()),
            ("near_dup_pairs", lambda d: CorpusPipeline(d).near_dup_pairs(0.6)),
            ("quality_flags", lambda d: CorpusPipeline(d).with_quality_flags()),
        ]:
            t0 = time.time()
            rows = frame(docs).count()
            dt = time.time() - t0
            print(f"{k:>3} {n:>7} {name:<22} {dt:>7.2f} {rows:>8}")
        docs.unpersist()
        spark.catalog.clearCache()
    return 0



def tpch_growth(ks: list[int]) -> None:
    """Relational-side growth: replicate lineitem/orders K times (keys
    offset so join fan-out per key is unchanged) and time the
    scan-agg (TPC-H Q1 shape) and large-join-agg shapes."""
    spark = get_spark("scalecheck_tpch")
    li0 = load_table(spark, SF_DIR, "lineitem")
    o0 = load_table(spark, SF_DIR, "orders")
    max_ok = o0.agg(F.max("o_orderkey")).collect()[0][0] + 1

    def rep(df: DataFrame, key_cols: list[str], k: int) -> DataFrame:
        out = df
        for r in range(1, k):
            shifted = df
            for c in key_cols:
                shifted = shifted.withColumn(c, F.col(c) + r * max_ok)
            out = out.unionByName(shifted)
        return out

    print(f"{'K':>3} {'rows':>9} {'query':<18} {'sec':>7}")
    for k in ks:
        li = rep(li0, ["l_orderkey"], k).persist()
        o = rep(o0, ["o_orderkey"], k).persist()
        n = li.count()
        o.count()
        for name, build in [
            (
                "q1_scan_agg",
                lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
                    F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"),
                    F.count(F.lit(1)).alias("n"),
                ),
            ),
            (
                "join_agg",
                lambda: li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("n")),
            ),
        ]:
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            print(f"{k:>3} {n:>9} {name:<18} {dt:>7.2f}")
        li.unpersist()
        o.unpersist()
        spark.catalog.clearCache()

if __name__ == "__main__":
    sys.exit(main())
