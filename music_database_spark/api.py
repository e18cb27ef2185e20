"""User-facing facade: what a user of the reference (MySQL schema +
Queries file, music_db.sql / Queries) uses after switching to this
engine. One object wraps session, schema load and the reference's six
analyses plus the README-promised ones (README.md:8 — "highest-rated
songs", "most active listeners").

    from music_database_spark.api import MusicDatabase

    db = MusicDatabase.with_sample_data(spark)        # music_db.sql fixtures
    db = MusicDatabase.with_synthetic_corpus(spark)   # 500 songs / 100 users
    db = MusicDatabase.from_tables(spark, dataframes) # user-provided data

    db.top_single_artists(2015, 2020).show()          # Queries:3-10
    db.sql("SELECT ... FROM song ...").show()         # ad-hoc SQL front door
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.constraints import validate_music_constraints
from .plans import music
from .sources.fixtures import generate_music_dataset, load_reference_fixture


class MusicDatabase:
    """The reference's application layer ("required Python functions",
    music_db.pdf p.8), realized as a Spark-backed API."""

    REQUIRED_TABLES = ("artist", "genre", "album", "user", "song", "song_genre", "rating")

    def __init__(self, spark: SparkSession, tables: dict[str, DataFrame]):
        missing = [t for t in self.REQUIRED_TABLES if t not in tables]
        if missing:
            raise ValueError(
                f"MusicDatabase needs tables {list(self.REQUIRED_TABLES)}; missing: {missing}"
            )
        self.spark = spark
        self.tables = tables
        for name, df in tables.items():
            df.createOrReplaceTempView(name)

    # --- constructors -----------------------------------------------------
    @classmethod
    def with_sample_data(cls, spark: SparkSession) -> "MusicDatabase":
        """The reference's own 13 fixture rows (music_db.sql:14-110)."""
        return cls(spark, load_reference_fixture(spark, register=False))

    @classmethod
    def with_synthetic_corpus(cls, spark: SparkSession, seed: int = 42) -> "MusicDatabase":
        """The 500-song / 100-user corpus the reference claims to analyze
        (README.md:5) — generated deterministically."""
        return cls(spark, generate_music_dataset(spark, seed=seed, register=False))

    @classmethod
    def from_tables(cls, spark: SparkSession, tables: dict[str, DataFrame]) -> "MusicDatabase":
        return cls(spark, dict(tables))

    # --- the reference's six queries (Queries:1-57) -----------------------
    def top_single_artists(self, y1: int = 2015, y2: int = 2020) -> DataFrame:
        return music.q1_top_single_artists(self.tables["artist"], self.tables["song"], y1, y2)

    def artists_with_last_single_in(self, year: int = 2020) -> DataFrame:
        return music.q2_last_single_in(self.tables["artist"], self.tables["song"], year)

    def genre_song_counts(self) -> DataFrame:
        return music.q3_genre_counts(self.tables["genre"], self.tables["song_genre"])

    def artists_with_albums_and_singles(self) -> DataFrame:
        return music.q4_album_and_single_artists(
            self.tables["artist"], self.tables["album"], self.tables["song"]
        )

    def most_rated_songs(self, y1: int = 2020, y2: int = 2021) -> DataFrame:
        return music.q5_most_rated_songs(
            self.tables["rating"], self.tables["song"], self.tables["artist"], y1, y2
        )

    def most_active_users(self, y1: int = 2020, y2: int = 2021) -> DataFrame:
        return music.q6_most_active_users(self.tables["user"], self.tables["rating"], y1, y2)

    # --- README-promised analyses (README.md:8) ---------------------------
    def highest_rated_songs(self, min_ratings: int = 2) -> DataFrame:
        """Average rating per song with a support floor, rating desc."""
        r = self.tables["rating"]
        s = self.tables["song"]
        return (
            r.groupBy("song_id")
            .agg(F.count("rating").alias("n_ratings"), F.round(F.avg("rating"), 4).alias("avg_rating"))
            .filter(F.col("n_ratings") >= min_ratings)
            .join(s.select("song_id", "title"), "song_id")
            .select("title", "avg_rating", "n_ratings")
            .orderBy(F.desc("avg_rating"), F.asc("title"))
        )

    def most_active_listeners(self) -> DataFrame:
        """Users by distinct songs rated (robust to re-rating)."""
        return (
            self.tables["rating"]
            .groupBy("username")
            .agg(F.countDistinct("song_id").alias("distinct_songs"))
            .orderBy(F.desc("distinct_songs"), F.asc("username"))
        )

    # --- utilities --------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Ad-hoc SQL over the registered music views."""
        return self.spark.sql(query)

    def validate(self) -> dict[str, int]:
        """Run the full constraint suite (replaces InnoDB enforcement);
        returns {check_name: violation_count} — all zero on valid data."""
        return validate_music_constraints(self.tables)
