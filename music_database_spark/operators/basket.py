"""Market-basket / co-occurrence mining (EXT): frequent item pairs and
association rules over order baskets — the "users who bought A bought B"
co-engagement primitive (on a training corpus the same plan over
(document, entity) pairs mines entity co-occurrence for knowledge-graph
construction; over (session, doc) pairs it powers related-content
retrieval).

Scale invariant (the a-priori property): an item pair can reach the
support floor only if BOTH items do, so items below MIN_SUPP are pruned
BEFORE the pair-generating self-join — the candidate space is bounded
by frequent items only, the same frequency-cap discipline as the dedup
band joins (operators/dedup.py:8). The self-join key is the basket id,
so pair expansion is sum-of-squares of basket sizes — bounded by the
natural basket-size cap (an order has few distinct parts), never |items|².

Reference parity: the reference (shreyasb27/Music-Database,
music_db.sql:6-106) has no mining surface; SURVEY.md §2 EXT mandate,
analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..plans.relational import _t
from ..sources.loader import scan_wide

MIN_SUPP = 2  # minimum basket count for items AND pairs (a-priori floor)
ASSOC_TOP = 20  # report the top-N rules by lift
PPM = 1_000_000  # metrics in exact integer parts-per-million


@register(
    "x_assoc_rules",
    tags=("EXT", "A1", "J1", "O2"),
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
            FROM lineitem
        ),
        nb AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_baskets FROM items),
        cnt AS (
            SELECT pk, CAST(COUNT(*) AS BIGINT) AS c
            FROM items GROUP BY pk
        ),
        freq AS (
            SELECT i.okey, i.pk FROM items i
            JOIN cnt ON i.pk = cnt.pk
            WHERE cnt.c >= {MIN_SUPP}
        ),
        pairs AS (
            SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM freq a JOIN freq b ON a.okey = b.okey AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= {MIN_SUPP}
        )
        SELECT p.pa AS part_a, p.pb AS part_b, p.n_ab,
               ca.c AS n_a, cb.c AS n_b,
               CAST(p.n_ab * {PPM} // nb.n_baskets AS BIGINT) AS supp_ppm,
               CAST(p.n_ab * {PPM} // ca.c AS BIGINT) AS conf_ab_ppm,
               CAST(p.n_ab * nb.n_baskets * {PPM} // (ca.c * cb.c) AS BIGINT)
                   AS lift_ppm
        FROM pairs p
        JOIN cnt ca ON p.pa = ca.pk
        JOIN cnt cb ON p.pb = cb.pk
        CROSS JOIN nb
        ORDER BY lift_ppm DESC, part_a, part_b
        LIMIT {ASSOC_TOP}
    """,
)
def x_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (Agrawal & Srikant, VLDB'94 a-priori
    shape) over order baskets: frequent part pairs with exact integer
    support/confidence/lift in parts-per-million (the integer-scaled
    metrics clear every division, so the ranked rule list hash-matches
    bit for bit; lift > 1e6 ppm = bought together more than chance).

    100 TB design: items below the support floor are pruned BEFORE the
    pair self-join (a-priori: a frequent pair needs two frequent items)
    via a broadcastable frequent-item list; the self-join shuffles on
    basket id where group sizes are bounded by basket width, so pair
    expansion is Σ|basket|² — linear in baskets, never |items|². Item
    counts partial-aggregate; the final rule join touches only
    above-floor pairs against the (small) frequent-item count table,
    broadcast. Top-N is a TakeOrdered, no global sort materialized."""
    li = scan_wide(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    ).distinct()
    nb = items.agg(F.countDistinct("okey").cast("bigint").alias("n_baskets"))
    cnt = items.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    freq_pk = cnt.filter(F.col("c") >= MIN_SUPP).select("pk", "c")
    freq = items.join(F.broadcast(freq_pk.select("pk")), "pk").select("okey", "pk")
    a = freq.alias("a")
    b = freq.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_SUPP)
    )
    ca = freq_pk.select(F.col("pk").alias("pa"), F.col("c").alias("n_a"))
    cb = freq_pk.select(F.col("pk").alias("pb"), F.col("c").alias("n_b"))
    out = (
        pairs.join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "n_ab",
            "n_a",
            "n_b",
            F.expr(f"CAST(n_ab * {PPM} div n_baskets AS BIGINT)").alias("supp_ppm"),
            F.expr(f"CAST(n_ab * {PPM} div n_a AS BIGINT)").alias("conf_ab_ppm"),
            F.expr(
                f"CAST(n_ab * n_baskets * {PPM} div (n_a * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return out.orderBy(F.col("lift_ppm").desc(), "part_a", "part_b").limit(ASSOC_TOP)
