"""Scalar-function surface (SURVEY.md §2.7 F3-F6): string, math, array and
JSON functions over the driver's documents/embeddings/events tables. All
expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; no Python UDFs on these paths."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vector import as_double_array
from ..registry import register
from .relational import _t


@register(
    "x_vec_norm",
    tags=("EXT", "F4", "F5"),
    oracle="""
        SELECT label,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(sqrt(list_aggregate(
                        list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                        'sum')), 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm
        FROM embeddings GROUP BY label ORDER BY label
    """,
)
def x_vec_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math (F.transform/aggregate): mean L2 norm of embeddings per
    label. Norms are rounded to 6dp then decimal-summed so the per-group
    mean is bit-identical across engines and partitionings."""
    emb = _t(spark, sf_dir, "embeddings")
    sumsq = F.aggregate(as_double_array("embedding"), F.lit(0.0), lambda a, x: a + x * x)
    norm = F.round(F.sqrt(sumsq), 6)
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("norm").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias(
                "avg_norm"
            ),
        )
        .select("label", "n", "avg_norm")
        .orderBy("label")
    )


@register(
    "x_json_props",
    tags=("EXT", "F6"),
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
               COUNT(*) AS n
        FROM events WHERE props IS NOT NULL
        GROUP BY k_bucket ORDER BY k_bucket
    """,
)
def x_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (F6): events bucketed by props.k % 10. Oracle kept
    to single-key string extraction where Spark and DuckDB agree
    (SURVEY.md §7.4.6)."""
    events = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select((k % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_bucket")
    )


@register(
    "x_string_funcs",
    tags=("EXT", "F3"),
    oracle="""
        SELECT upper(substr(source, 1, 3)) AS src_prefix,
               lang,
               COUNT(*) AS n,
               CAST(SUM(length(text)) AS BIGINT) AS total_len,
               MIN(concat(lang, ':', source)) AS min_tag
        FROM documents
        WHERE source LIKE 'src%' AND regexp_matches(lang, '^(en|de|fr)$')
        GROUP BY src_prefix, lang ORDER BY src_prefix, lang
    """,
)
def x_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (upper/substr/length/concat/LIKE/regexp) over
    documents — all codegen'd, the LIKE prefix pushes down to the scan."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source").like("src%") & F.col("lang").rlike("^(en|de|fr)$"))
        .groupBy(
            F.upper(F.substring("source", 1, 3)).alias("src_prefix"),
            "lang",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).cast("bigint").alias("total_len"),
            F.min(F.concat_ws(":", "lang", "source")).alias("min_tag"),
        )
        .orderBy("src_prefix", "lang")
    )


@register(
    "x_try_funcs",
    tags=("EXT", "F7", "F6"),
    oracle="""
        WITH raw AS (
            SELECT event_type,
                   CASE WHEN event_id % 7 = 0
                        THEN 'x' || json_extract_string(props, '$.k')
                        ELSE json_extract_string(props, '$.k') END AS k_str,
                   value
            FROM events WHERE props IS NOT NULL
        ), c AS (
            SELECT event_type,
                   TRY_CAST(k_str AS BIGINT) AS k_num,
                   CASE WHEN value = 0 THEN NULL ELSE CAST(100 AS DOUBLE) / value END
                       AS inv
            FROM raw
        )
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN k_num IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unparseable,
               CAST(SUM(COALESCE(k_num, 0)) AS BIGINT) AS sum_k,
               CAST(SUM(CASE WHEN inv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div0
        FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def x_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant expression surface (the ANSI-mode escape hatches):
    try_cast over deliberately corrupted numeric strings and try_divide
    on zero denominators, aggregated as parse-failure accounting. At
    100 TB ingest this is how a pipeline quarantines malformed rows in
    one pass instead of failing the job; everything stays in codegen
    (inputs are restricted to integral-or-garbage strings — DuckDB's
    TRY_CAST rounds fractional strings where Spark truncates, so
    fractional inputs are excluded from the contract)."""
    events = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k_str = F.when(
        F.col("event_id") % 7 == 0,
        F.concat(F.lit("x"), F.get_json_object("props", "$.k")),
    ).otherwise(F.get_json_object("props", "$.k"))
    c = events.select(
        "event_type",
        k_str.try_cast("bigint").alias("k_num"),
        F.try_divide(F.lit(100).cast("double"), F.col("value")).alias("inv"),
    )
    return (
        c.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k_num").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unparseable"),
            F.sum(F.coalesce("k_num", F.lit(0))).cast("bigint").alias("sum_k"),
            F.sum(F.when(F.col("inv").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_div0"),
        )
        .orderBy("event_type")
    )


@register(
    "x_recursive_cte",
    tags=("EXT", "F1", "U2", "S5"),
    oracle="""
        WITH RECURSIVE cal(day) AS (
            SELECT date_trunc('day', MIN(ts)) FROM events
            UNION ALL
            SELECT day + INTERVAL 1 DAY FROM cal
            WHERE day < (SELECT date_trunc('day', MAX(ts)) FROM events)
        )
        SELECT strftime(cal.day, '%Y-%m-%d') AS day,
               COALESCE(e.n, 0) AS n_events
        FROM cal LEFT JOIN (
            SELECT date_trunc('day', ts) AS d, COUNT(*) AS n FROM events GROUP BY d
        ) e ON e.d = cal.day
        ORDER BY day
    """,
)
def x_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (SQL:1999 WITH RECURSIVE, Spark 4 front door):
    a generated calendar spine left-joined to daily event counts so
    silent zero-activity days appear as explicit 0 rows — the gap-fill
    every monitoring rollup needs. Runs as verbatim SQL text through
    spark.sql to exercise the recursive front door; the DataFrame-native
    equivalent (sequence(min, max, interval 1 day) + explode, one pass,
    no iteration) is what a 100 TB pipeline would prefer and what the
    calendar spine compiles down to at day grain (tiny either way).

    The recursion is BATCHED: 7 anchor days, each stepping +7 days —
    the standard deep-recursion move (each fixpoint iteration costs a
    driver round-trip, so recursing per-week over 7 seed rows cuts the
    iteration count 7x while producing the identical day set)."""
    from .relational import _t as _load

    _load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql("""
        WITH RECURSIVE cal(day) AS (
            SELECT explode(sequence(lo, least(lo + INTERVAL 6 DAY, hi),
                                    INTERVAL 1 DAY))
            FROM (SELECT date_trunc('DAY', MIN(ts)) AS lo,
                         date_trunc('DAY', MAX(ts)) AS hi FROM events)
            UNION ALL
            SELECT day + INTERVAL 7 DAY FROM cal
            WHERE day + INTERVAL 7 DAY
                  <= (SELECT date_trunc('DAY', MAX(ts)) FROM events)
        )
        SELECT date_format(cal.day, 'yyyy-MM-dd') AS day,
               COALESCE(e.n, 0) AS n_events
        FROM cal LEFT JOIN (
            SELECT date_trunc('DAY', ts) AS d, COUNT(*) AS n FROM events GROUP BY d
        ) e ON e.d = cal.day
        ORDER BY day
    """)


@register(
    "x_variant_json",
    tags=("EXT", "F6", "D3"),
    oracle="""
        SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        FROM events WHERE props IS NOT NULL
        GROUP BY k_bucket ORDER BY k_bucket
    """,
)
def x_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns through the VARIANT type (Spark 4):
    parse_json once into a binary variant column, then typed
    variant_get extraction — the schema-on-read path that replaces
    per-access string re-parsing (get_json_object) with a decoded
    columnar encoding. At 100 TB the parse cost is paid once per row
    instead of once per extracted field per query."""
    events = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    v = events.select(F.parse_json("props").alias("pv"))
    k = F.expr("variant_get(pv, '$.k', 'int')")
    return (
        v.select(k.alias("k_val"))
        .groupBy((F.col("k_val") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k_val").cast("bigint").alias("sum_k"),
        )
        .orderBy("k_bucket")
    )


@register(
    "x_calendar_gapfill",
    tags=("EXT", "F1", "F5", "O4"),
    oracle="""
        WITH RECURSIVE cal(day) AS (
            SELECT date_trunc('day', MIN(ts)) FROM events
            UNION ALL
            SELECT day + INTERVAL 1 DAY FROM cal
            WHERE day < (SELECT date_trunc('day', MAX(ts)) FROM events)
        )
        SELECT strftime(cal.day, '%Y-%m-%d') AS day,
               COALESCE(e.n, 0) AS n_events
        FROM cal LEFT JOIN (
            SELECT date_trunc('day', ts) AS d, COUNT(*) AS n FROM events GROUP BY d
        ) e ON e.d = cal.day
        ORDER BY day
    """,
)
def x_calendar_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-native twin of x_recursive_cte: the calendar spine built
    declaratively with sequence(min_day, max_day, interval 1 day) +
    explode — ONE aggregate and one generate, no iterative fixpoint, no
    per-step driver round-trip. Same oracle, ~10x faster than the
    recursive front door at any scale; this is the form a production
    pipeline ships."""
    events = _t(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("DAY", F.min("ts")).alias("lo"),
        F.date_trunc("DAY", F.max("ts")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    daily = events.groupBy(F.date_trunc("DAY", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        cal.join(daily, cal.day == daily.d, "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("day")
    )


@register(
    "x_map_funcs",
    tags=("EXT", "F5", "A1"),
    oracle="""
        WITH per AS (
            SELECT user_id, event_type, COUNT(*) AS n FROM events
            GROUP BY user_id, event_type
        )
        SELECT user_id,
               COUNT(*) AS n_types,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT)
                   AS n_clicks,
               CAST(MAX(n) AS BIGINT) AS max_type_count
        FROM per GROUP BY user_id ORDER BY user_id
    """,
)
def x_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (F5): per-user event-type histogram materialized as
    a map column (map_from_entries over collected (type, count) structs),
    then consumed with map scalar functions — size(), element_at(),
    array_max(map_values()). The map is built from an aggregated frame
    (distinct types per user ≤ 5), not from raw events, so the collect
    is bounded. The oracle checks the same semantics with plain
    conditional aggregation — the map is the Spark-side representation
    under test."""
    events = _t(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    mapped = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("hist")
    )
    return (
        mapped.select(
            "user_id",
            F.size("hist").alias("n_types"),
            F.coalesce(F.element_at("hist", F.lit("click")), F.lit(0))
            .cast("bigint")
            .alias("n_clicks"),
            F.array_max(F.map_values("hist")).cast("bigint").alias("max_type_count"),
        )
        .orderBy("user_id")
    )


@register(
    "x_array_agg_ordered",
    tags=("EXT", "F5", "O4", "A1"),
    oracle="""
        SELECT user_id,
               string_agg(event_id, ',' ORDER BY ts, event_id)
                   FILTER (WHERE rn <= 5) AS first5
        FROM (SELECT user_id, event_id, ts,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events) t
        GROUP BY user_id ORDER BY user_id
    """,
)
def x_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered array aggregation — the trap this query
    documents: Spark's collect_list order is partition-dependent, so a
    bare array_agg is NOT reproducible. The fix: collect (sort-key,
    value) structs and array_sort the result (struct comparison is
    field-order lexicographic), making the aggregation order-insensitive
    and therefore stable under any partitioning — then emit as a joined
    string. A WindowGroupLimit caps each user at their first 5 events
    before the collect, bounding per-group state."""
    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    first5 = events.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return (
        first5.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id"))),
                    lambda s: s["event_id"].cast("string"),
                ),
                ",",
            ).alias("first5")
        )
        .orderBy("user_id")
    )


@register(
    "x_arg_extremes",
    tags=("EXT", "A4", "A7", "F4"),
    oracle="""
        WITH k AS (
            SELECT event_type, event_id, value,
                   CAST(round(value * 100) AS BIGINT) * 10000000 + event_id AS ord_key
            FROM events
        )
        SELECT event_type,
               max_by(event_id, ord_key) AS top_event,
               min_by(event_id, ord_key) AS bottom_event,
               round(max(value), 2) AS max_value,
               round(min(value), 2) AS min_value
        FROM k GROUP BY event_type ORDER BY event_type
    """,
)
def x_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin aggregates (max_by/min_by): the event carrying each
    type's extreme value, in one aggregation pass — no self-join back to
    the max, no window. Determinism contract: max_by ties are
    engine-arbitrary, so the ordering key is uniquified as
    round(value*100)*1e7 + event_id (values are 2-dp; the composite is
    collision-free and identical in both engines) — the same trick a
    100 TB pipeline needs, because at that scale value ties are
    guaranteed, not lucky."""
    events = _t(spark, sf_dir, "events")
    k = events.select(
        "event_type",
        "event_id",
        "value",
        (
            F.round(F.col("value") * 100).cast("bigint") * 10000000 + F.col("event_id")
        ).alias("ord_key"),
    )
    return (
        k.groupBy("event_type")
        .agg(
            F.expr("max_by(event_id, ord_key)").alias("top_event"),
            F.expr("min_by(event_id, ord_key)").alias("bottom_event"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.min("value"), 2).alias("min_value"),
        )
        .orderBy("event_type")
    )
