"""Set operations (SURVEY.md §2.6). U1 INTERSECT lives with Q4 in
relational.py; here are UNION (the reference's implicit 'all releases'
timeline over its two date columns, music_db.sql:37,68) and EXCEPT."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .relational import _t


@register(
    "x_union_releases",
    tags=("EXT", "U2", "F1"),
    oracle="""
        SELECT yr, kind, COUNT(*) AS n FROM (
            SELECT year(o_orderdate) AS yr, 'finished' AS kind
            FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT year(o_orderdate) AS yr, 'open' AS kind
            FROM orders WHERE o_orderstatus = 'O'
        ) t GROUP BY yr, kind ORDER BY yr, kind
    """,
)
def x_union_releases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered projections then re-aggregate — the
    'albums ∪ singles release timeline' shape."""
    orders = _t(spark, sf_dir, "orders")
    fin = orders.filter(F.col("o_orderstatus") == "F").select(
        F.year("o_orderdate").alias("yr"), F.lit("finished").alias("kind")
    )
    opn = orders.filter(F.col("o_orderstatus") == "O").select(
        F.year("o_orderdate").alias("yr"), F.lit("open").alias("kind")
    )
    return (
        fin.unionByName(opn)
        .groupBy("yr", "kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("yr", "kind")
    )


@register(
    "x_except",
    tags=("EXT", "U3"),
    oracle="""
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        ORDER BY custkey
    """,
)
def x_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): customers who ordered but never finished
    an order. DataFrame subtract == EXCEPT DISTINCT."""
    orders = _t(spark, sf_dir, "orders")
    all_keys = orders.select(F.col("o_custkey").alias("custkey"))
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return all_keys.subtract(f_keys).orderBy("custkey")


@register(
    "x_rollup",
    tags=("EXT", "A8"),
    oracle="""
        SELECT year(o_orderdate) AS yr, o_orderpriority AS priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
               COUNT(*) AS n
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
        ORDER BY yr NULLS FIRST, priority NULLS FIRST
    """,
)
def x_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (year, priority) — the multi-level 'genre/artist/year report'
    shape: detail rows + per-year subtotals + grand total in one pass."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
        .rollup("yr", "priority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.col("yr").asc_nulls_first(), F.col("priority").asc_nulls_first())
    )


@register(
    "x_pivot",
    tags=("EXT", "A8"),
    oracle="""
        SELECT year(o_orderdate) AS yr,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        FROM orders GROUP BY yr ORDER BY yr
    """,
)
def x_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order counts per year with one column per
    status. The value list is given explicitly so Spark skips the extra
    distinct-values pass — mandatory at scale, where the implicit pass is
    a full extra job over the fact table."""
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.select(F.year("o_orderdate").alias("yr"), "o_orderstatus")
        .groupBy("yr")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .orderBy("yr")
    )
    # pivot-count yields NULL for empty cells; the wide report wants 0
    return out.select(
        "yr",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in ["F", "O", "P"]],
    )


@register(
    "x_unpivot",
    tags=("EXT", "A8"),
    oracle="""
        SELECT yr, status, n FROM (
            SELECT year(o_orderdate) AS yr, 'F' AS status,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n
            FROM orders GROUP BY 1
            UNION ALL
            SELECT year(o_orderdate), 'O',
                   CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders GROUP BY 1
            UNION ALL
            SELECT year(o_orderdate), 'P',
                   CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders GROUP BY 1
        ) t ORDER BY yr, status
    """,
)
def x_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long, the melt/stack shape): the pivoted
    year-by-status counts back to (yr, status, n) rows via DataFrame
    unpivot — the inverse of x_pivot, one narrow pass over the wide frame."""
    orders = _t(spark, sf_dir, "orders")
    wide = (
        orders.select(F.year("o_orderdate").alias("yr"), "o_orderstatus")
        .groupBy("yr")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    wide = wide.select(
        "yr", *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in ["F", "O", "P"]]
    )
    return (
        wide.unpivot("yr", ["F", "O", "P"], "status", "n")
        .orderBy("yr", "status")
    )


@register(
    "x_cube",
    tags=("EXT", "A8"),
    oracle="""
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY returnflag NULLS FIRST, linestatus NULLS FIRST
    """,
)
def x_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all 2^2 grouping sets."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            "l_quantity",
        )
        .cube("returnflag", "linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(F.col("returnflag").asc_nulls_first(), F.col("linestatus").asc_nulls_first())
    )


@register(
    "x_except_all",
    tags=("EXT", "U3", "A1"),
    oracle="""
        WITH d AS (
            SELECT custkey FROM (
                SELECT o_custkey AS custkey FROM orders
                EXCEPT ALL
                SELECT o_custkey AS custkey FROM orders
                WHERE o_orderstatus = 'F'
            ) t
        )
        SELECT custkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM d GROUP BY custkey ORDER BY custkey
    """,
)
def x_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference, SQL:1999 multiset semantics): each
    customer's key survives max(n_total - n_finished, 0) times — the
    multiplicity-preserving form x_except's DISTINCT variant discards.
    Summarized as (custkey, multiplicity) so the oracle hash pins the
    bag, not just the support set.

    100 TB design: Spark plans exceptAll as a counted aggregation
    (sum of +1/-1 tags per key, generate surviving rows) — one shuffle
    on the key, no join; identical shape to the groupBy both sides
    would need anyway. Reference parity: no set-op keywords in the
    reference (SURVEY.md §2.6 U3 EXT)."""
    orders = _t(spark, sf_dir, "orders")
    all_keys = orders.select(F.col("o_custkey").alias("custkey"))
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        all_keys.exceptAll(f_keys)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("multiplicity"))
        .orderBy("custkey")
    )


@register(
    "x_intersect_all",
    tags=("EXT", "U1", "A1"),
    oracle="""
        WITH d AS (
            SELECT custkey FROM (
                SELECT o_custkey AS custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
                INTERSECT ALL
                SELECT o_custkey AS custkey FROM orders
                WHERE o_orderstatus = 'F'
            ) t
        )
        SELECT custkey, CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM d GROUP BY custkey ORDER BY custkey
    """,
)
def x_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection): each key appears
    min(n_urgent, n_finished) times. Same counted-aggregation plan
    shape as x_except_all; summarized to (custkey, multiplicity) for
    the hash check. Reference parity: Q4's INTERSECT is the DISTINCT
    form (Queries:22-27); the multiset form completes SURVEY.md §2.6
    U1."""
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        urgent.intersectAll(finished)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("multiplicity"))
        .orderBy("custkey")
    )


@register(
    "x_union_by_name",
    tags=("EXT", "U2", "F7"),
    oracle="""
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN qty IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_qty,
               CAST(SUM(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null_price
        FROM (
            SELECT 'li' AS source, l_orderkey AS okey,
                   CAST(l_quantity AS DOUBLE) AS qty, NULL AS price
            FROM lineitem WHERE l_linenumber = 1
            UNION ALL BY NAME
            SELECT 'ord' AS source, o_orderkey AS okey,
                   o_totalprice AS price
            FROM orders
        ) u
        GROUP BY source ORDER BY source
    """,
)
def x_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-flexible union (`unionByName(allowMissingColumns=True)` /
    SQL UNION ALL BY NAME): two feeds with overlapping-but-different
    columns stack by COLUMN NAME, absent columns null-filled — the
    union a multi-source ingest actually needs, where positional UNION
    would silently misalign or reject. Rolled up per source with
    null-fill counts so the oracle pins exactly which columns were
    missing where.

    100 TB design: pure map-side projection + one partial-agg groupBy;
    union is plan concatenation, not an operator with a shuffle.
    Reference parity: no set-op keywords in the reference (SURVEY.md
    §2.6 U2 EXT)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select(
            F.lit("li").alias("source"),
            F.col("l_orderkey").alias("okey"),
            F.col("l_quantity").cast("double").alias("qty"),
        )
    )
    ords = _t(spark, sf_dir, "orders").select(
        F.lit("ord").alias("source"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
    )
    u = li.unionByName(ords, allowMissingColumns=True)
    return (
        u.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("qty").isNull().cast("bigint")).cast("bigint").alias("n_null_qty"),
            F.sum(F.col("price").isNull().cast("bigint")).cast("bigint").alias("n_null_price"),
        )
        .orderBy("source")
    )
