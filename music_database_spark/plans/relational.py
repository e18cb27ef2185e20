"""REF-query analogs over the driver's TPC-H-ish tables (SURVEY.md §7.1).

Role mapping (fixed in SURVEY.md §2 "Driver instantiation"): artist/user ->
customer, song/rating -> orders/lineitem, genre -> nation, the reference's
single-vs-album-track partition (album_id NULL, music_db.sql:67-68) ->
o_orderstatus partition, rating-date year window (Queries:8,46,55) ->
o_orderdate/l_shipdate year window.

Every query here is REF or REF-impl — the shape is cited to the reference
query that exercises it. All are authored sargable (§4.3): date windows as
half-open range predicates that push into the Parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.loader import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def ts_range(col: str, y1: int, y2: int):
    """Sargable equivalent of YEAR(col) BETWEEN y1 AND y2 over a timestamp."""
    return (F.col(col) >= F.lit(f"{y1}-01-01").cast("timestamp")) & (
        F.col(col) < F.lit(f"{y2 + 1}-01-01").cast("timestamp")
    )


def dsum(col, precision: int = 18, scale: int = 4):
    """Deterministic double sum: exact decimal arithmetic, then back to
    double — immune to partitioning-dependent float addition order."""
    return F.sum(F.col(col).cast(f"decimal({precision},{scale})")).cast("double")


def disc_price_dec():
    """l_extendedprice * (1 - l_discount) in EXACT decimal arithmetic —
    cast the clean 2-dp inputs to decimal FIRST, multiply in decimal.
    The former double-product-then-cast-decimal(22,8) form hit engine
    ulp divergence: Spark's double->decimal goes through the shortest
    string repr (BigDecimal.valueOf) while DuckDB rounds the exact
    binary expansion, and a product's long binary tail can land on a
    half-way digit — invisible at sf0.01, one double ulp apart summed
    over 215k rows at sf0.1 (round-8 finding). Inputs themselves are
    safe: 2-dp values cast to 4-dp scale leave ~1e-13 vs 5e-5 margin.

    Callers must ALSO cast the SUM to decimal(27,4) before the double
    cast: the product is exactly a 4-dp value, but summing at the
    multiply's natural scale 8 makes the scaled integer exceed 2^53
    around 1e9 totals, where DuckDB's decimal->double DOUBLE-ROUNDS
    (int128->double, then /10^8) while Spark/Python round once — one
    ulp apart on the identical decimal. At scale 4 the scaled integer
    stays exact to ~9e11 totals (sf100-ish); past that, emit cents as
    BIGINT instead of any double."""
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)")
    )


@register(
    "q1_singles_by_artist",
    tags=("REF", "P2", "P3", "P5", "J1", "A1", "A2", "O1", "F2"),
    oracle="""
        SELECT c_name AS name, COUNT(o_orderkey) AS num_singles
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY c_custkey, c_name
        ORDER BY num_singles DESC, name ASC
    """,
)
def q1_singles_by_artist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 analog (Queries:3-10): boolean-flag filter + NULL-partition filter +
    year range + dim⋈fact join + grouped count + 2-key ordered output.
    is_group=0 -> c_mktsegment='BUILDING'; album_id IS NULL -> status 'O'."""
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "O") & ts_range("o_orderdate", 1996, 1998)
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("num_singles"))
        .select(F.col("c_name").alias("name"), "num_singles")
        .orderBy(F.desc("num_singles"), F.asc("name"))
    )


@register(
    "q2_last_in_year",
    tags=("REF", "A3", "A4", "F1"),
    oracle="""
        SELECT name FROM (
            SELECT c_custkey, c_name AS name, MAX(year(o_orderdate)) AS last_year
            FROM customer JOIN orders ON c_custkey = o_custkey
            WHERE o_orderstatus = 'O'
            GROUP BY c_custkey, c_name
        ) t WHERE last_year = 1998
    """,
)
def q2_last_in_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog (Queries:14-19): HAVING MAX(YEAR(d)) = y — customers whose
    latest open order was placed in 1998."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.max(F.year("o_orderdate")).alias("last_year"))
        .filter(F.col("last_year") == 1998)
        .select(F.col("c_name").alias("name"))
    )


@register(
    "q3_genre_counts",
    tags=("REF", "J1", "A1", "A2", "O1"),
    oracle="""
        SELECT n_name AS nation, COUNT(c_custkey) AS num_customers
        FROM nation JOIN customer ON n_nationkey = c_nationkey
        GROUP BY n_nationkey, n_name
        ORDER BY num_customers DESC, nation ASC
    """,
)
def q3_genre_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 analog (Queries:23-27): bridge-table counting — customers per
    nation, count desc with name tie-break. nation is tiny -> broadcast."""
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    return (
        F.broadcast(nation)
        .join(customer, nation.n_nationkey == customer.c_nationkey)
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("c_custkey").alias("num_customers"))
        .select(F.col("n_name").alias("nation"), "num_customers")
        .orderBy(F.desc("num_customers"), F.asc("nation"))
    )


@register(
    "q4_both_kinds",
    tags=("REF", "J3", "P6", "U1"),
    oracle="""
        SELECT c_name AS name FROM customer
        WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
          AND c_custkey IN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def q4_both_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 analog (Queries:31-38): intersection of two key sets via two
    left-semi joins — customers with both finished and open orders."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        customer.join(f_keys, customer.c_custkey == f_keys.o_custkey, "left_semi")
        .join(o_keys, customer.c_custkey == o_keys.o_custkey, "left_semi")
        .select(F.col("c_name").alias("name"))
    )


@register(
    "q4_intersect",
    tags=("REF", "U1"),
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q4_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 re-expressed with set-op INTERSECT (SURVEY.md §2.6 U1)."""
    orders = _t(spark, sf_dir, "orders")
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f_keys.intersect(o_keys)


@register(
    "q4b_only_albums",
    tags=("REF-impl", "J4"),
    oracle="""
        SELECT c_name AS name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
          AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def q4b_only_albums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complement of Q4 (anti-join, SURVEY.md J4): customers with open orders
    and no finished orders. o_custkey is non-null so NOT IN == left_anti."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    o_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        customer.join(o_keys, customer.c_custkey == o_keys.o_custkey, "left_semi")
        .join(f_keys, customer.c_custkey == f_keys.o_custkey, "left_anti")
        .select(F.col("c_name").alias("name"))
    )


@register(
    "q5_top_rated",
    tags=("REF", "J2", "A1", "A2", "O1"),
    oracle="""
        SELECT o_orderkey AS orderkey, c_name AS customer, COUNT(l_quantity) AS num_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, c_name
        ORDER BY num_items DESC, orderkey ASC
    """,
)
def q5_top_rated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 analog (Queries:42-48): 3-way join chain fact⋈dim⋈dim with year
    window + grouped count. Catalyst broadcast-joins the customer dim."""
    lineitem = _t(spark, sf_dir, "lineitem").filter(ts_range("l_shipdate", 1996, 1997))
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey", "c_name")
        .agg(F.count("l_quantity").alias("num_items"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("c_name").alias("customer"),
            "num_items",
        )
        .orderBy(F.desc("num_items"), F.asc("orderkey"))
    )


@register(
    "q6_active_users",
    tags=("REF", "J1", "A1", "O1", "P5"),
    oracle="""
        SELECT c_name AS username, COUNT(o_orderkey) AS num_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY c_custkey, c_name
        ORDER BY num_orders DESC, username ASC
    """,
)
def q6_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 analog (Queries:52-57) — the flagship: customers who placed the
    most orders in 1996-1998, count desc then name asc."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(ts_range("o_orderdate", 1996, 1998))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("num_orders"))
        .select(F.col("c_name").alias("username"), "num_orders")
        .orderBy(F.desc("num_orders"), F.asc("username"))
    )


@register(
    "q7_users_with_counts",
    tags=("REF-impl", "J7", "A1"),
    oracle="""
        SELECT c_name AS name, COUNT(o_orderkey) AS num_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY num_orders DESC, name ASC
    """,
)
def q7_users_with_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (music_db.pdf p.5: users can exist without ratings):
    COUNT(col) ignores the NULLs the outer join introduces -> true zeros."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("num_orders"))
        .select(F.col("c_name").alias("name"), "num_orders")
        .orderBy(F.desc("num_orders"), F.asc("name"))
    )


@register(
    "q8_avg_rating",
    tags=("REF-impl", "A5", "A7"),
    oracle="""
        SELECT l_partkey AS partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_partkey
        HAVING COUNT(*) >= 5
        ORDER BY avg_qty DESC, partkey ASC
    """,
)
def q8_avg_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG with support filter (README.md:8 'highest-rated songs' analog):
    mean quantity per part among parts with >= 5 lineitems. AVG computed as
    exact decimal SUM / COUNT for cross-engine determinism."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_partkey")
        .agg(dsum("l_quantity").alias("_sum"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("_sum") / F.col("n")).alias("avg_qty"),
            "n",
        )
        .orderBy(F.desc("avg_qty"), F.asc("partkey"))
    )


@register(
    "q9_distinct_counts",
    tags=("REF-impl", "A6"),
    oracle="""
        SELECT o_custkey AS custkey, COUNT(DISTINCT o_orderpriority) AS num_priorities
        FROM orders GROUP BY o_custkey ORDER BY custkey
    """,
)
def q9_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) (README.md:8 'most active listeners' analog)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.countDistinct("o_orderpriority").alias("num_priorities"))
        .orderBy("custkey")
    )


@register("q9b_approx_distinct", tags=("EXT", "A6"), oracle=None)
def q9b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog) — the 100 TB-scale form of A6:
    one map-side sketch per partition, a tiny merge per group, no
    distinct shuffle. Sketch values are engine-specific so this is a
    rows-only check; tests pin the estimate within HLL error of q9-style
    exact counts.

    Two plan hazards this query deliberately avoids (each measured ~3-5x
    slower at sf0.1): mixing countDistinct into the same agg() plans the
    distinct-rewrite, which drags the HLL buffer through a
    per-(priority, custkey) partial aggregate and TWO exchanges; and
    rsd=0.02 widens the sketch to 4096 registers = 410 long columns per
    row in the exchange (default rsd 0.05 is 512 registers)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.approx_count_distinct("o_custkey").alias("approx_custkeys"))
        .orderBy("priority")
    )


@register(
    "q10_topk",
    tags=("REF-impl", "O2"),
    oracle="""
        SELECT c_name AS name, COUNT(o_orderkey) AS num_orders
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY num_orders DESC, name ASC
        LIMIT 10
    """,
)
def q10_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (README.md:8 'most active'): orderBy().limit() compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort. The name
    tie-break makes the cut deterministic (SURVEY.md §7.4.2)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("num_orders"))
        .select(F.col("c_name").alias("name"), "num_orders")
        .orderBy(F.desc("num_orders"), F.asc("name"))
        .limit(10)
    )


@register(
    "q11_effective_date",
    tags=("REF-impl", "F7", "F1"),
    oracle="""
        SELECT year(COALESCE(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderdate END,
                             TIMESTAMP '1999-06-30')) AS eff_year,
               COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY eff_year
    """,
)
def q11_effective_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE derived column — the release-date inheritance rule
    (music_db.pdf p.4: a track's effective date falls back to its album's):
    open orders have no 'effective' date and fall back to a fixed one."""
    orders = _t(spark, sf_dir, "orders")
    eff = F.coalesce(
        F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(F.col("o_orderdate")),
        F.lit("1999-06-30").cast("timestamp"),
    )
    return (
        orders.select(F.year(eff).alias("eff_year"))
        .groupBy("eff_year")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("eff_year")
    )


@register(
    "j_large_large",
    tags=("EXT", "J6"),
    oracle="""
        SELECT l_returnflag AS returnflag, o_orderstatus AS orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def j_large_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large⋈large fact join with no broadcastable side — exercises the
    sort-merge/shuffled-hash path that dominates at 100 TB. At cluster scale
    both sides would be bucketed by orderkey to skip the shuffle entirely."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("o_orderstatus").alias("orderstatus"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("sum_price"))
        .orderBy("returnflag", "orderstatus")
    )


@register(
    "j_event_window",
    tags=("EXT", "J8", "T1"),
    oracle="""
        WITH wins AS (
            SELECT DISTINCT date_trunc('day', ts) AS bucket_day,
                   date_trunc('day', ts) + INTERVAL 6 HOUR AS w_start,
                   date_trunc('day', ts) + INTERVAL 18 HOUR AS w_end
            FROM events
        )
        SELECT strftime(w.bucket_day, '%Y-%m-%d') AS day,
               COUNT(*) AS n_in_window
        FROM events e
        JOIN wins w ON date_trunc('day', e.ts) = w.bucket_day
                   AND e.ts >= w.w_start AND e.ts < w.w_end
        GROUP BY w.bucket_day ORDER BY day
    """,
)
def j_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (J8): events matched to per-day [06:00, 18:00)
    windows. Authored as equi-join on the day bucket + residual range
    predicate — the scale-correct interval-join shape (a bare ts-range
    theta join would be a nested-loop; bucketing turns it into a hash
    join whose residual runs per bucket)."""
    events = _t(spark, sf_dir, "events")
    # Window table from a 1-row min/max agg + generated day calendar
    # instead of DISTINCT over the full event scan: the output is
    # identical (days without in-window events vanish under the inner
    # join either way) but the build side costs a scalar aggregate, not
    # a 100k-row distinct exchange (round-5 fix for the ratchet drift).
    wins = (
        events.agg(
            F.date_trunc("day", F.min("ts")).alias("d0"),
            F.date_trunc("day", F.max("ts")).alias("d1"),
        )
        .select(
            F.explode(F.expr("sequence(d0, d1, INTERVAL 1 DAY)")).alias("bucket_day")
        )
        .select(
            "bucket_day",
            (F.col("bucket_day") + F.expr("INTERVAL 6 HOURS")).alias("w_start"),
            (F.col("bucket_day") + F.expr("INTERVAL 18 HOURS")).alias("w_end"),
        )
    )
    e = events.select("ts", F.date_trunc("day", "ts").alias("e_day"))
    return (
        e.join(
            F.broadcast(wins),
            (e.e_day == wins.bucket_day) & (e.ts >= wins.w_start) & (e.ts < wins.w_end),
        )
        .groupBy("bucket_day")
        .agg(F.count(F.lit(1)).alias("n_in_window"))
        .select(F.date_format("bucket_day", "yyyy-MM-dd").alias("day"), "n_in_window")
        .orderBy("day")
    )


@register(
    "x_null_partition",
    tags=("REF", "P4", "F7"),
    oracle="""
        SELECT l_linestatus AS linestatus,
               COUNT(*) AS n_total,
               COUNT(CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END)
                   AS n_returned,
               CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null
        FROM lineitem
        GROUP BY l_linestatus ORDER BY linestatus
    """,
)
def x_null_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL predicate over a derived nullable column (P4 — the
    reference's album_id IS NULL partition, Queries:7,17,37): NULLIF turns
    the 'not returned' flag into NULL, COUNT(col) skips those NULLs
    (the COUNT(col)-vs-COUNT(*) semantics SURVEY §7.4.4 pins)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    nullable_flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return (
        lineitem.select(F.col("l_linestatus").alias("linestatus"), nullable_flag.alias("flag"))
        .groupBy("linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("flag").alias("n_returned"),
            F.sum(F.when(F.col("flag").isNull(), 1).otherwise(0)).alias("n_null"),
        )
        .orderBy("linestatus")
    )


@register(
    "x_lateral_topk",
    tags=("EXT", "J3", "J9", "O2"),
    oracle="""
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM orders o,
             LATERAL (SELECT l_linenumber, l_extendedprice
                      FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                      ORDER BY l_extendedprice DESC, l_linenumber
                      LIMIT 2) t
        WHERE o.o_orderpriority = '1-URGENT'
        ORDER BY o.o_orderkey, t.l_extendedprice DESC, t.l_linenumber
    """,
)
def x_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table,
    Spark 4 front door): the two highest-value lineitems per urgent
    order, written as `FROM orders, LATERAL (... WHERE correlated ORDER
    BY ... LIMIT 2)`. Spark's DecorrelateInnerQuery rewrites the
    correlated limit into the same ranked-window join a hand-written
    top-k-per-group would use — the front door is syntax, not a new
    execution strategy, which is exactly why it's safe at scale.
    Deterministic: the LIMIT's ORDER BY carries the unique
    l_linenumber tie-break.

    100 TB design: decorrelation turns the per-row subquery into one
    equi-join on l_orderkey plus a partition-ranked filter — no
    nested-loop re-execution per outer row; the urgent-priority filter
    prunes the outer side at the scan. Reference parity: subqueries in
    the reference are Q4's uncorrelated INs (Queries:22-27); the
    correlated form extends SURVEY.md §2.3 J3."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    orders.filter(F.col("o_orderpriority") == "1-URGENT").createOrReplaceTempView(
        "lat_orders"
    )
    li.createOrReplaceTempView("lat_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM lat_orders o,
             LATERAL (SELECT l_linenumber, l_extendedprice
                      FROM lat_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                      ORDER BY l_extendedprice DESC, l_linenumber
                      LIMIT 2) t
        ORDER BY o.o_orderkey, t.l_extendedprice DESC, t.l_linenumber
        """
    )


@register(
    "x_pipe_syntax",
    tags=("EXT", "P1", "P2", "A1", "O1"),
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def x_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.1 `|>` operators, public SPIP) with
    NAMED PARAMETER binding (`:year` via spark.sql args) — the same
    pricing rollup q12 writes as nested SQL, restated as a linear
    dataflow: FROM |> WHERE |> AGGREGATE ... GROUP BY |> ORDER BY.
    Pipe stages desugar to the identical logical plan (same scan
    pushdown, same partial aggregation — this is syntax, not a new
    executor), so the plain-SQL DuckDB oracle applies unchanged, and
    the parameter binds server-side without string interpolation.

    100 TB design: identical plan to the classic form — sargable
    half-open date range reaches the parquet scan, decimal-exact SUM.
    Reference parity: front-door variety for the reference's Queries
    surface (SURVEY.md §3.2); the reference has a single SQL dialect.
    """
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("pipe_lineitem")
    return spark.sql(
        """
        FROM pipe_lineitem
        |> WHERE l_shipdate >= make_timestamp(:year, 1, 1, 0, 0, 0)
                 AND l_shipdate < make_timestamp(:year + 1, 1, 1, 0, 0, 0)
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                         AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, sum_qty
        |> ORDER BY l_returnflag, l_linestatus
        """,
        args={"year": 1997},
    )


@register(
    "x_sql_table_udf",
    tags=("EXT", "D3", "F4", "A1"),
    oracle="""
        WITH bins AS (
            SELECT i AS bin,
                   CAST(i AS DOUBLE) * 10000.0 AS lo,
                   CAST(i + 1 AS DOUBLE) * 10000.0 AS hi
            FROM (SELECT unnest(generate_series(0, 11)) AS i) g
        )
        SELECT b.bin, b.lo, b.hi,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        FROM bins b LEFT JOIN orders o
             ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.bin, b.lo, b.hi
        ORDER BY b.bin
    """,
)
def x_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table-valued function (Spark 4 `CREATE FUNCTION ... RETURNS
    TABLE`): a catalog-declared bin generator drives an order-value
    histogram — the declarative cousin of the Python UDTF
    (x_python_udtf), inlined at analysis time like the scalar SQL UDF.
    The bin table LEFT-joins orders on a half-open range so empty bins
    survive with zero counts; bin edges are exact integer-derived
    doubles, so the oracle's generate_series bins match bitwise.

    100 TB design: the function body is a constant 12-row relation —
    broadcast side of a range join against the orders scan, one
    partial-aggregable rollup; the histogram never shuffles the fact
    table. Reference parity: no function-catalog surface in the
    reference (SURVEY.md §2.9 D3 mandate)."""
    from .udf_surface import _create_sql_function_once

    _create_sql_function_once(
        spark,
        "tf_price_bins",
        "CREATE TEMPORARY FUNCTION tf_price_bins(n INT) "
        "RETURNS TABLE(bin INT, lo DOUBLE, hi DOUBLE) RETURN "
        "SELECT i AS bin, CAST(i AS DOUBLE) * 10000.0 AS lo, "
        "CAST(i + 1 AS DOUBLE) * 10000.0 AS hi "
        "FROM (SELECT explode(sequence(0, n - 1)) AS i)",
    )
    _t(spark, sf_dir, "orders").createOrReplaceTempView("tudf_orders")
    return spark.sql(
        """
        SELECT b.bin, b.lo, b.hi,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM tf_price_bins(12) b LEFT JOIN tudf_orders o
             ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.bin, b.lo, b.hi
        ORDER BY b.bin
        """
    )


@register(
    "x_null_safe_join",
    tags=("EXT", "J1", "P4", "F7"),
    oracle="""
        WITH keyed AS (
            SELECT o_orderkey,
                   NULLIF(o_orderstatus, 'F') AS k
            FROM orders
        ),
        dim AS (SELECT DISTINCT k FROM keyed),
        plain AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n
            FROM keyed a JOIN dim d ON a.k = d.k
        ),
        nullsafe AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n
            FROM keyed a JOIN dim d ON a.k IS NOT DISTINCT FROM d.k
        )
        SELECT (SELECT n FROM plain) AS n_plain_eq,
               (SELECT n FROM nullsafe) AS n_null_safe,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM keyed WHERE k IS NULL)
                   AS n_null_keys
    """,
)
def x_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / SQL IS NOT DISTINCT FROM): the
    same equi-join run with plain `=` (null keys silently drop — the
    classic missing-rows bug) and with null-safe equality (null matches
    null), plus the null-key count that exactly explains the gap:
    n_null_safe = n_plain_eq + n_null_keys. The nullable key is
    NULLIF(status, 'F'), so finished orders carry NULL.

    100 TB design: `<=>` stays a hash-joinable equality (Spark plans
    EqualNullSafe as a regular join key — no fallback to nested-loop),
    so the fix for dropped null rows costs nothing in plan shape; all
    three counts partial-aggregate. Reference parity: the reference's
    joins are all non-null PK/FK equalities (music_db.sql FK columns);
    the null-semantics corner extends SURVEY.md §2.3 J1 / §2.2 P4."""
    orders = _t(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        F.expr("NULLIF(o_orderstatus, 'F')").alias("k"),
    )
    dim = keyed.select("k").distinct()
    plain = keyed.alias("a").join(
        dim.alias("d"), F.col("a.k") == F.col("d.k")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_plain_eq"))
    nullsafe = keyed.alias("a").join(
        dim.alias("d"), F.col("a.k").eqNullSafe(F.col("d.k"))
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_null_safe"))
    nullkeys = keyed.filter(F.col("k").isNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_null_keys")
    )
    return plain.crossJoin(nullsafe).crossJoin(nullkeys)


@register(
    "x_sql_variables",
    tags=("EXT", "P1", "F7", "A1"),
    oracle="""
        SELECT c_custkey AS custkey, c_name AS name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
        FROM customer JOIN orders ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY c_custkey, c_name
        HAVING SUM(CAST(o_totalprice AS DECIMAL(18,4))) >= 500000.0
        ORDER BY total_spend DESC, custkey
    """,
)
def x_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables + EXECUTE IMMEDIATE (Spark 4 front-door
    surface the named-parameter binding of x_pipe_syntax doesn't cover):
    DECLARE typed session variables, SET VAR them, and run the query
    text through EXECUTE IMMEDIATE with the variables referenced
    directly — the scripting shape BI layers and stored-procedure
    migrations use, with values bound server-side (no string
    interpolation of user input). The variable indirection is resolved
    at analysis time, so the plan — segment filter pushed to the
    customer scan, decimal-exact spend sum, HAVING on the aggregate —
    is identical to the literal query the DuckDB oracle runs.

    100 TB design: zero plan difference vs literals; this is a
    front-door/compatibility exhibit (SURVEY.md §3.2), not a new
    operator shape."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("var_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("var_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE var_seg STRING DEFAULT 'BUILDING'")
    spark.sql("DECLARE OR REPLACE VARIABLE var_floor DECIMAL(18,4) DEFAULT 0.0")
    spark.sql("SET VAR var_seg = 'BUILDING'")
    spark.sql("SET VAR var_floor = 500000.0")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
        'SELECT c_custkey AS custkey, c_name AS name,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
         FROM var_customer JOIN var_orders ON o_custkey = c_custkey
         WHERE c_mktsegment = var_seg
         GROUP BY c_custkey, c_name
         HAVING SUM(CAST(o_totalprice AS DECIMAL(18,4))) >= var_floor
         ORDER BY total_spend DESC, custkey'
        """
    )


SPATIAL_SPAN = 1_000_000  # synthetic plane edge length (integer units)
SPATIAL_R = 20_000  # radius for the within-distance join
SPATIAL_TOP = 25  # closest pairs reported


def _spatial_md5(prefix: str, key: str) -> str:
    """Engine-portable coordinate: md5-derived integer in [0, SPAN)."""
    return (
        f"CAST(('0x' || substr(md5('{prefix}' || CAST({key} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {SPATIAL_SPAN}"
    )


@register(
    "x_spatial_join",
    tags=("EXT", "J8", "J9", "F4"),
    oracle=f"""
        WITH c AS (
            SELECT c_custkey,
                   {_spatial_md5('cx:', 'c_custkey')} AS x,
                   {_spatial_md5('cy:', 'c_custkey')} AS y
            FROM customer
        ),
        s AS (
            SELECT s_suppkey,
                   {_spatial_md5('sx:', 's_suppkey')} AS x,
                   {_spatial_md5('sy:', 's_suppkey')} AS y
            FROM supplier
        )
        SELECT c.c_custkey AS custkey, s.s_suppkey AS suppkey,
               CAST((c.x - s.x) * (c.x - s.x)
                    + (c.y - s.y) * (c.y - s.y) AS BIGINT) AS d2
        FROM c CROSS JOIN s
        WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)
              <= {SPATIAL_R} * {SPATIAL_R}
        ORDER BY d2, custkey, suppkey LIMIT {SPATIAL_TOP}
    """,
)
def x_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial within-radius join on a synthetic integer plane — the 2D
    instance of the banded-range-join discipline (J8's as-of/interval
    joins are its 1D siblings): each point lands in an R-sized grid
    cell, one side explodes to its 3x3 cell neighborhood, candidates
    join on the cell key, and the EXACT integer squared-distance
    predicate filters — every true pair is within one cell of its
    partner's neighborhood by the triangle inequality, so grid+filter
    finds exactly what the oracle's brute-force cross join finds (the
    oracle IS the completeness proof). Coordinates are md5-derived
    integers (engine-portable hash family), so the whole query is
    integer-exact.

    100 TB design: the cross join never happens on the Spark side —
    candidates are an equi-join on (cellx, celly) with a constant 9x
    explode on the smaller side; uniform cells keep bucket sizes
    bounded (real skewed geodata adds the hot-cell cap / quadtree
    split, the MAX_BAND_FREQ discipline of dedup.py). Top-k is a
    TakeOrdered, no global sort.

    Reference parity: no spatial surface in the reference
    (music_db.sql:6-106); SURVEY.md §2 EXT join family."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey")

    def pt(df, key, px, py):
        h = lambda p: (  # noqa: E731
            F.conv(
                F.substring(F.md5(F.concat(F.lit(p), F.col(key).cast("string"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % SPATIAL_SPAN
        )
        return df.select(key, h(px).alias("x"), h(py).alias("y"))

    c = pt(customer, "c_custkey", "cx:", "cy:")
    s = pt(supplier, "s_suppkey", "sx:", "sy:")
    offsets = spark.range(-1, 2).crossJoin(
        spark.range(-1, 2).withColumnRenamed("id", "id2")
    )
    c_cells = (
        c.crossJoin(F.broadcast(offsets))
        .select(
            "c_custkey",
            "x",
            "y",
            (F.expr(f"x div {SPATIAL_R}") + F.col("id")).alias("cellx"),
            (F.expr(f"y div {SPATIAL_R}") + F.col("id2")).alias("celly"),
        )
    )
    s_cells = s.select(
        "s_suppkey",
        F.col("x").alias("sx"),
        F.col("y").alias("sy"),
        F.expr(f"x div {SPATIAL_R}").alias("cellx"),
        F.expr(f"y div {SPATIAL_R}").alias("celly"),
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    return (
        c_cells.join(s_cells, ["cellx", "celly"])
        .filter(d2 <= SPATIAL_R * SPATIAL_R)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("s_suppkey").alias("suppkey"),
            d2.cast("bigint").alias("d2"),
        )
        .orderBy("d2", "custkey", "suppkey")
        .limit(SPATIAL_TOP)
    )
