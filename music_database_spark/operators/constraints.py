"""Constraint validation (SURVEY.md §2.1 S4, §5.3) — Spark enforces no
PK/FK/UNIQUE/CHECK, so every constraint the reference declared in DDL
(music_db.sql:10-11,40-43,70-73,85-88,102-105) becomes an explicit
validation job: PK uniqueness = groupBy(pk).count()>1 must be empty,
FK closure = child anti-join parent must be empty. The reference's
`SET FOREIGN_KEY_CHECKS = 0/1` bulk-load bracket (music_db.sql:2,113)
maps to running this suite once after load instead of per-row checks —
exactly the right trade at 100 TB, where per-row FK enforcement is a
non-starter and a post-load anti-join is one broadcast-or-shuffle pass.

Driver-table instantiation: the TPC-H-ish FK graph
(lineitem->orders/part/supplier, orders->customer, customer->nation,
supplier->nation, nation->region).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.relational import _t
from ..registry import register

# (child table, child key, parent table, parent key)
FK_GRAPH: list[tuple[str, str, str, str]] = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

# (table, [pk columns]) — lineitem's PK is composite.
PK_MAP: list[tuple[str, list[str]]] = [
    ("region", ["r_regionkey"]),
    ("nation", ["n_nationkey"]),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
]


def fk_violation_count(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """Orphan rows: child keys with no matching parent (left anti join).
    Parent key set is projected + distinct before the join, so only keys
    cross the wire; small parents broadcast automatically."""
    orphans = child.select(child_key).join(
        parent.select(parent_key).distinct(),
        child[child_key] == parent[parent_key],
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("violations"))


def pk_duplicate_count(df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Duplicate-key groups: groupBy(pk) having count > 1."""
    return (
        df.groupBy(*pk_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("violations"))
    )


@register(
    "fk_violations",
    tags=("REF", "S4", "J4"),
    oracle="""
        SELECT constraint_name, violations FROM (
            SELECT 'orders->customer' AS constraint_name,
                   (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_custkey IS NULL) AS violations
            UNION ALL
            SELECT 'lineitem->orders',
                   (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
                    WHERE o.o_orderkey IS NULL)
            UNION ALL
            SELECT 'lineitem->part',
                   (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
                    WHERE p.p_partkey IS NULL)
            UNION ALL
            SELECT 'lineitem->supplier',
                   (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    WHERE s.s_suppkey IS NULL)
            UNION ALL
            SELECT 'customer->nation',
                   (SELECT COUNT(*) FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
                    WHERE n.n_nationkey IS NULL)
            UNION ALL
            SELECT 'supplier->nation',
                   (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
                    WHERE n.n_nationkey IS NULL)
            UNION ALL
            SELECT 'nation->region',
                   (SELECT COUNT(*) FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
                    WHERE r.r_regionkey IS NULL)
        ) t ORDER BY constraint_name
    """,
)
def fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK validation report over the whole driver FK graph — the reference's
    FOREIGN KEY declarations re-established as anti-join assertions
    (music_db.sql:42-43,72-73,87-88,104-105 -> post-load validation).
    Every row should read (constraint, 0) on the driver's data."""
    out: DataFrame | None = None
    for child_t, child_k, parent_t, parent_k in FK_GRAPH:
        child = _t(spark, sf_dir, child_t)
        parent = _t(spark, sf_dir, parent_t)
        row = fk_violation_count(child, child_k, parent, parent_k).select(
            F.lit(f"{child_t}->{parent_t}").alias("constraint_name"),
            F.col("violations"),
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out.orderBy("constraint_name")


@register(
    "pk_uniqueness",
    tags=("REF", "S4"),
    oracle="""
        SELECT table_name, violations FROM (
            SELECT 'region' AS table_name,
                   (SELECT COUNT(*) FROM (SELECT r_regionkey FROM region GROUP BY 1 HAVING COUNT(*) > 1)) AS violations
            UNION ALL SELECT 'nation',
                   (SELECT COUNT(*) FROM (SELECT n_nationkey FROM nation GROUP BY 1 HAVING COUNT(*) > 1))
            UNION ALL SELECT 'customer',
                   (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer GROUP BY 1 HAVING COUNT(*) > 1))
            UNION ALL SELECT 'supplier',
                   (SELECT COUNT(*) FROM (SELECT s_suppkey FROM supplier GROUP BY 1 HAVING COUNT(*) > 1))
            UNION ALL SELECT 'part',
                   (SELECT COUNT(*) FROM (SELECT p_partkey FROM part GROUP BY 1 HAVING COUNT(*) > 1))
            UNION ALL SELECT 'orders',
                   (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1))
            UNION ALL SELECT 'lineitem',
                   (SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1))
        ) t ORDER BY table_name
    """,
)
def pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-uniqueness report — the reference's PRIMARY KEY declarations
    (music_db.sql:10,23,39,54,69,85,102) as duplicate-group counts; the
    composite lineitem PK mirrors the reference's composite Rating PK."""
    out: DataFrame | None = None
    for table, pk_cols in PK_MAP:
        df = _t(spark, sf_dir, table)
        row = pk_duplicate_count(df, pk_cols).select(
            F.lit(table).alias("table_name"), F.col("violations")
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out.orderBy("table_name")


def validate_music_constraints(tables: dict[str, DataFrame]) -> dict[str, int]:
    """Full §5.3 suite on music-schema DataFrames (unit-tested on the
    reference fixtures): PK/UNIQUE uniqueness, FK closure, rating range
    (music_db.sql:101, pdf p.6), single/track disjunction
    (music_db.sql:67-68). Returns {check_name: violation_count}."""
    res: dict[str, int] = {}
    pk = {
        "artist": ["artist_id"],
        "genre": ["genre_id"],
        "album": ["album_id"],
        "user": ["username"],
        "song": ["song_id"],
        "song_genre": ["song_id", "genre_id"],
        "rating": ["username", "song_id", "rating_date"],
    }
    for t, cols in pk.items():
        res[f"pk_{t}"] = (
            tables[t].groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1).count()
        )
    uniques = {
        "artist_name": ("artist", ["name"]),
        "genre_name": ("genre", ["name"]),
        "album_artist_title": ("album", ["artist_id", "title"]),
        "song_artist_title": ("song", ["artist_id", "title"]),
    }
    for name, (t, cols) in uniques.items():
        res[f"unique_{name}"] = (
            tables[t].groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1).count()
        )
    fks = [
        ("album", "artist_id", "artist", "artist_id"),
        ("album", "genre_id", "genre", "genre_id"),
        ("song", "artist_id", "artist", "artist_id"),
        ("song_genre", "song_id", "song", "song_id"),
        ("song_genre", "genre_id", "genre", "genre_id"),
        ("rating", "username", "user", "username"),
        ("rating", "song_id", "song", "song_id"),
    ]
    for child_t, ck, parent_t, pk_col in fks:
        child = tables[child_t].filter(F.col(ck).isNotNull())  # nullable FK (song.album_id style)
        res[f"fk_{child_t}_{ck}"] = (
            child.select(ck)
            .join(tables[parent_t].select(pk_col).distinct(), child[ck] == tables[parent_t][pk_col], "left_anti")
            .count()
        )
    # song.album_id FK is nullable by design (singles) — check non-null rows only.
    res["fk_song_album_id"] = (
        tables["song"]
        .filter(F.col("album_id").isNotNull())
        .select("album_id")
        .join(tables["album"].select("album_id").distinct(), "album_id", "left_anti")
        .count()
    )
    res["rating_range"] = tables["rating"].filter(~F.col("rating").between(1, 5)).count()
    # Exactly one of (album_id, single_release_date) is set per song.
    res["single_track_disjunction"] = (
        tables["song"]
        .filter(
            ~(
                (F.col("album_id").isNull() & F.col("single_release_date").isNotNull())
                | (F.col("album_id").isNotNull() & F.col("single_release_date").isNull())
            )
        )
        .count()
    )
    return res
