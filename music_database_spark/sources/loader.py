"""Parquet sources (operator S5) and view registration (S1/S2 analog).

The reference loads fixtures through `mysql < music_db.sql`
(music_db.sql:1-113); here tables live columnar-at-rest as Parquet and
are exposed as temp views, so every query plan starts from a columnar
scan with predicate pushdown and column pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DRIVER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table. Filters/projections applied downstream
    are pushed into this scan by Catalyst (verify via .explain: PushedFilters,
    ReadSchema).

    The events table stores ts as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. We read it under the
    ``nanosAsLong`` legacy conf (ts arrives as raw nanos since epoch) and
    derive a proper TimestampType column via integer-division to micros —
    lossless here (the generator emits whole microseconds; verified the
    sub-microsecond part is zero at every sf) and identical to what DuckDB
    surfaces for the same file, so oracle comparisons line up.
    """
    if name == "events":
        # Runtime SQL conf; only affects NANOS-annotated INT64 columns, so
        # the millisecond timestamps in orders/lineitem are untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # `div`, not `/`: epoch-nanos exceed double's 53-bit mantissa, so
        # float division would round the microsecond off by one.
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select("event_id", "ts", "user_id", "event_type", "value", "props")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so both the DataFrame API and
    spark.sql can address them (reference entry point 1, SURVEY.md §3.1)."""
    for name in tables or DRIVER_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in DRIVER_TABLES}
