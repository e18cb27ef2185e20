"""The reference's six analytical queries (Queries:1-57), Spark-first.

Each takes the music-schema DataFrames and returns the query result with
the reference's exact output columns and semantics. Two deliberate
deviations from a literal translation (SURVEY.md §2 row A2, §4.3):

* MySQL implicit grouping — the reference groups by a key and selects a
  functionally-dependent column (e.g. GROUP BY a.artist_id, SELECT
  a.name — Queries:3,9). ANSI/Spark reject that, so the dependent column
  joins the grouping key (safe: artist_id -> name is unique,
  music_db.sql:10-11).
* Sargable dates — `YEAR(d) BETWEEN y1 AND y2` (Queries:8,46,55) wraps
  the column and defeats Parquet min/max skipping and partition pruning;
  we write the equivalent half-open date range `d >= 'y1-01-01' AND
  d < '(y2+1)-01-01'`, which pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def year_range(col: str, y1: int, y2: int):
    """Pushdown-friendly equivalent of YEAR(col) BETWEEN y1 AND y2."""
    return (F.col(col) >= F.lit(f"{y1}-01-01").cast("date")) & (
        F.col(col) < F.lit(f"{y2 + 1}-01-01").cast("date")
    )


def q1_top_single_artists(artist: DataFrame, song: DataFrame, y1: int = 2015, y2: int = 2020) -> DataFrame:
    """Q1 (Queries:3-10): individual artists who released the most singles
    in [y1, y2], count desc then name asc."""
    singles = song.filter(F.col("album_id").isNull() & year_range("single_release_date", y1, y2))
    return (
        artist.filter(F.col("is_group") == F.lit(False))
        .join(singles, "artist_id")
        .groupBy("artist_id", "name")
        .agg(F.count("song_id").alias("num_singles"))
        .select("name", "num_singles")
        .orderBy(F.desc("num_singles"), F.asc("name"))
    )


def q2_last_single_in(artist: DataFrame, song: DataFrame, year: int = 2020) -> DataFrame:
    """Q2 (Queries:14-19): artists whose most recent single came out in `year`
    (HAVING MAX(YEAR(date)) = year)."""
    return (
        artist.join(song.filter(F.col("album_id").isNull()), "artist_id")
        .groupBy("artist_id", "name")
        .agg(F.max(F.year("single_release_date")).alias("last_year"))
        .filter(F.col("last_year") == year)
        .select("name")
    )


def q3_genre_counts(genre: DataFrame, song_genre: DataFrame) -> DataFrame:
    """Q3 (Queries:23-27): genres by number of songs, count desc, name asc."""
    return (
        genre.join(song_genre, "genre_id")
        .groupBy("genre_id", "name")
        .agg(F.count("song_id").alias("num_songs"))
        .select(F.col("name").alias("genre"), "num_songs")
        .orderBy(F.desc("num_songs"), F.asc("genre"))
    )


def q4_album_and_single_artists(artist: DataFrame, album: DataFrame, song: DataFrame) -> DataFrame:
    """Q4 (Queries:31-38): artists with BOTH albums and singles. The
    reference's two uncorrelated IN-subqueries become two left-semi joins
    (Catalyst does the same rewrite for IN)."""
    album_artists = album.select("artist_id")
    single_artists = song.filter(F.col("album_id").isNull()).select("artist_id")
    return (
        artist.join(album_artists, "artist_id", "left_semi")
        .join(single_artists, "artist_id", "left_semi")
        .select("name")
    )


def q5_most_rated_songs(
    rating: DataFrame, song: DataFrame, artist: DataFrame, y1: int = 2020, y2: int = 2021
) -> DataFrame:
    """Q5 (Queries:42-48): songs with the most ratings in [y1, y2]; 3-way
    join Rating⋈Song⋈Artist, count desc then title asc."""
    return (
        rating.filter(year_range("rating_date", y1, y2))
        .join(song, "song_id")
        .join(artist.withColumnRenamed("name", "artist"), "artist_id")
        .groupBy("song_id", "title", "artist")
        .agg(F.count("rating").alias("num_ratings"))
        .select("title", "artist", "num_ratings")
        .orderBy(F.desc("num_ratings"), F.asc("title"))
    )


def q6_most_active_users(user: DataFrame, rating: DataFrame, y1: int = 2020, y2: int = 2021) -> DataFrame:
    """Q6 (Queries:52-57): users who rated the most songs in [y1, y2]."""
    return (
        user.join(rating.filter(year_range("rating_date", y1, y2)), "username")
        .groupBy("username")
        .agg(F.count("song_id").alias("num_ratings"))
        .orderBy(F.desc("num_ratings"), F.asc("username"))
    )


# SQL twins of Q1-Q6 in ANSI form (run by both spark.sql and DuckDB in the
# unit tests — differential fidelity check on the music fixtures).
MUSIC_ORACLES: dict[str, str] = {
    "q1": """
        SELECT a.name, COUNT(s.song_id) AS num_singles
        FROM artist a JOIN song s ON a.artist_id = s.artist_id
        WHERE a.is_group = false AND s.album_id IS NULL
          AND s.single_release_date >= DATE '2015-01-01'
          AND s.single_release_date <  DATE '2021-01-01'
        GROUP BY a.artist_id, a.name
        ORDER BY num_singles DESC, a.name ASC
    """,
    "q2": """
        SELECT name FROM (
            SELECT a.artist_id, a.name, MAX(year(s.single_release_date)) AS last_year
            FROM artist a JOIN song s ON a.artist_id = s.artist_id
            WHERE s.album_id IS NULL
            GROUP BY a.artist_id, a.name
        ) t WHERE last_year = 2020
    """,
    "q3": """
        SELECT g.name AS genre, COUNT(sg.song_id) AS num_songs
        FROM genre g JOIN song_genre sg ON g.genre_id = sg.genre_id
        GROUP BY g.genre_id, g.name
        ORDER BY num_songs DESC, genre ASC
    """,
    "q4": """
        SELECT a.name FROM artist a
        WHERE a.artist_id IN (SELECT DISTINCT artist_id FROM album)
          AND a.artist_id IN (SELECT DISTINCT artist_id FROM song WHERE album_id IS NULL)
    """,
    "q5": """
        SELECT s.title, ar.name AS artist, COUNT(r.rating) AS num_ratings
        FROM rating r
        JOIN song s ON r.song_id = s.song_id
        JOIN artist ar ON s.artist_id = ar.artist_id
        WHERE r.rating_date >= DATE '2020-01-01' AND r.rating_date < DATE '2022-01-01'
        GROUP BY s.song_id, s.title, ar.name
        ORDER BY num_ratings DESC, s.title ASC
    """,
    "q6": """
        SELECT u.username, COUNT(r.song_id) AS num_ratings
        FROM user u JOIN rating r ON u.username = r.username
        WHERE r.rating_date >= DATE '2020-01-01' AND r.rating_date < DATE '2022-01-01'
        GROUP BY u.username
        ORDER BY num_ratings DESC, u.username ASC
    """,
}
