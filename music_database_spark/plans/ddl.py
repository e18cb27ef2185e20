"""DDL/fixture-load surface (SURVEY.md §2.1 S1-S3) as a driver-checkable
query: declare explicit StructType schemas, load the reference's 13
literal fixture rows (music_db.sql:14-110), register idempotent temp
views (drop/re-create semantics of music_db.sql:5,19,...), and read the
catalog back through spark.sql. The oracle is the constant row-count
table any correct load must produce — checked by value like everything
else."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.fixtures import load_reference_fixture
from ..sources.loader import register_views

# One ANSI text, two engines: this exact string is both the Spark SQL
# submitted through the engine's SQL front door and the DuckDB oracle.
# (Dialect-portable subset: TIMESTAMP literals, year(), COUNT(col).)
_FRONTDOOR_SQL = """
    SELECT c_mktsegment AS segment,
           year(o_orderdate) AS yr,
           COUNT(o_orderkey) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_mktsegment, year(o_orderdate)
    ORDER BY segment, yr
"""


# EXISTS / NOT EXISTS (the correlated-subquery spelling of Q4's
# semi/anti semantics, Queries:33-38) — again one verbatim ANSI text for
# both engines; Catalyst rewrites to left-semi + left-anti joins.
_EXISTS_SQL = """
    SELECT c_name AS name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    ORDER BY name
"""


@register("x_exists_frontdoor", tags=("REF", "J3", "J4", "S5"), oracle=_EXISTS_SQL)
def x_exists_frontdoor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS/NOT EXISTS through the SQL front door: customers
    with finished orders and no open ones. Same string on both engines;
    .explain shows the decorrelation into semi/anti hash joins."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_EXISTS_SQL)


@register("x_sql_frontdoor", tags=("REF", "S5", "P1", "J1", "A1"), oracle=_FRONTDOOR_SQL)
def x_sql_frontdoor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point (reference entry point 2, SURVEY §3.2):
    tables registered as views, the query submitted as SQL text and parsed/
    optimized by Catalyst. The oracle is the VERBATIM same string — the
    strongest possible dialect-parity statement for this query class."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_FRONTDOOR_SQL)


@register(
    "ddl_roundtrip",
    tags=("REF", "S1", "S2", "S3"),
    oracle="""
        SELECT table_name, n_rows FROM (
            VALUES ('album', 1), ('artist', 2), ('genre', 2), ('rating', 2),
                   ('song', 2), ('song_genre', 2), ('user', 2)
        ) AS t(table_name, n_rows)
        ORDER BY table_name
    """,
)
def ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE (explicit schema) -> INSERT literal rows -> re-CREATE
    (idempotency) -> scan via SQL. Row counts must equal the reference's
    checked-in fixture exactly (music_db.sql:14-16,27-29,46-47,57-59,
    76-78,91-93,108-110 -> 1+2+2+2+2+2+2 rows)."""
    # Load twice: createOrReplaceTempView must be idempotent (S2).
    load_reference_fixture(spark, register=True)
    tables = load_reference_fixture(spark, register=True)
    out: DataFrame | None = None
    for name in sorted(tables):
        row = spark.sql(f"SELECT COUNT(*) AS n FROM `{name}`").select(
            F.lit(name).alias("table_name"), F.col("n").cast("int").alias("n_rows")
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out.orderBy("table_name")
