"""Window-function operators (SURVEY.md §2.5 O3-O5, all EXT).

The reference's "top songs per genre / rating trend over time" analyses
(README.md:8) need ranking and analytic windows; these are their
driver-table forms. Window partitions here are per-entity (customer,
brand) — at 100 TB the partition key is high-cardinality so the single
shuffle per window is well-distributed; no window is unpartitioned
(an ORDER BY over the whole table would serialize on one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from .relational import _t, dsum


@register(
    "x_rank_per_group",
    tags=("EXT", "O3"),
    oracle="""
        WITH rev AS (
            SELECT p_brand, p_partkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM part JOIN lineitem ON p_partkey = l_partkey
            GROUP BY p_brand, p_partkey
        )
        SELECT p_brand AS brand, p_partkey AS partkey, revenue, rnk
        FROM (SELECT p_brand, p_partkey, revenue,
                     rank() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS rnk
              FROM rev) t
        WHERE rnk <= 3
        ORDER BY brand, rnk, partkey
    """,
)
def x_rank_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ties-aware top-3 parts by revenue within each brand ('top songs per
    genre'). rank() over a deterministic (revenue, partkey) order."""
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem")
    rev = (
        F.broadcast(part)
        .join(lineitem, part.p_partkey == lineitem.l_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(dsum("l_extendedprice").alias("revenue"))
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        rev.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").alias("partkey"),
            "revenue",
            "rnk",
        )
        .orderBy("brand", "rnk", "partkey")
    )


@register(
    "x_running_sum",
    tags=("EXT", "O4"),
    oracle="""
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_total
        FROM orders ORDER BY custkey, orderkey
    """,
)
def x_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend in order-date order ('rating trend
    over time per user'). Exact decimal accumulation keeps the running
    values engine-identical."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias("running_total"),
    ).orderBy("custkey", "orderkey")


@register(
    "x_lag_delta",
    tags=("EXT", "O4"),
    oracle="""
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               o_totalprice - lag(o_totalprice)
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta
        FROM orders ORDER BY custkey, orderkey
    """,
)
def x_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): change in order value vs the customer's previous order.
    A single double subtraction of identical inputs is bit-deterministic."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta"),
    ).orderBy("custkey", "orderkey")


@register(
    "x_window_family",
    tags=("EXT", "O3", "O4", "O5"),
    oracle="""
        SELECT o_custkey AS custkey, o_orderkey AS orderkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY custkey, orderkey
    """,
)
def x_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window family in one pass: first/last
    value, ntile quartiles, percent_rank, cume_dist per customer order
    history. last_value needs the full-frame spec (the default frame
    stops at CURRENT ROW on both engines). All outputs are exact
    rationals of row counts -> bit-identical doubles."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    ).orderBy("custkey", "orderkey")


@register(
    "x_moving_avg",
    tags=("EXT", "O5"),
    oracle="""
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS mavg
        FROM events ORDER BY user_id, event_id
    """,
)
def x_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame spec (ROWS BETWEEN 6 PRECEDING AND CURRENT ROW): 7-event moving
    average of event value per user, time-ordered."""
    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, W.currentRow)
    return events.select(
        "user_id",
        "event_id",
        (
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mavg"),
    ).orderBy("user_id", "event_id")


@register(
    "x_asof_join",
    tags=("EXT", "J8", "O4"),
    oracle="""
        SELECT p.event_id,
               strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_error_ts,
               (epoch_us(p.ts) - epoch_us(b.ts)) // 1000000 AS gap_s
        FROM events p
        ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') b
          ON p.user_id = b.user_id AND b.ts <= p.ts
        ORDER BY p.event_id
    """,
)
def x_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J8 family): each event matched to the most recent 'error'
    event at-or-before it for the same user ("time since last error").

    Spark has no ASOF JOIN operator, so this is authored as the
    scale-correct union-free form: a RANGE frame window over the event
    stream itself (max error-ts <= current ts per user). One shuffle on
    the high-cardinality user key, no join — the naive formulation
    (theta self-join on ts <= ts, then argmax) is a per-user cross
    product that dies at 100 TB. The RANGE frame (not ROWS) makes the
    semantics exactly "max build ts <= probe ts" under timestamp ties,
    matching DuckDB's native ASOF LEFT JOIN used as the oracle.
    """
    events = _t(spark, sf_dir, "events")
    e = events.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") == "error", F.unix_micros("ts")).alias("err_us"),
    )
    w = W.partitionBy("user_id").orderBy("ts_us").rangeBetween(W.unboundedPreceding, 0)
    return (
        e.withColumn("last_err_us", F.max("err_us").over(w))
        .select(
            "event_id",
            F.date_format(
                F.timestamp_micros(F.col("last_err_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("last_error_ts"),
            F.expr("(ts_us - last_err_us) div 1000000").alias("gap_s"),
        )
        .orderBy("event_id")
    )


@register(
    "x_time_range_frame",
    tags=("EXT", "O5", "O4"),
    oracle="""
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS trailing_1h_sum,
               CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS trailing_1h_n
        FROM events ORDER BY user_id, event_id
    """,
)
def x_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame (O5 beyond row frames): each event's
    trailing one-hour value sum and event count per user — frame
    membership decided by the TIMESTAMP delta, not a row count, so
    bursts widen the frame and quiet periods shrink it. Expressed
    through the SQL front door because the DataFrame rangeBetween only
    takes numeric offsets; semantically identical to ordering by
    unix_micros with a 3.6e9 range, which is how x_asof_join's frame is
    authored. Decimal-exact sums; ties impossible (ts is unique per
    user in the driver data, verified by the tumbling/session suite)."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("events_trf")
    return spark.sql("""
        SELECT user_id, event_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS trailing_1h_sum,
               CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS trailing_1h_n
        FROM events_trf ORDER BY user_id, event_id
    """)
