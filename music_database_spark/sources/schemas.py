"""Explicit StructType schemas (operator S1 in SURVEY.md §2.1).

Music schema mapped from the reference DDL (music_db.sql:6-106) per the
type mapping in SURVEY.md §1.2: int->IntegerType, smallint->ShortType,
tinyint->ByteType, tinyint(1)->BooleanType, varchar->StringType,
date->DateType, datetime->TimestampType. Spark enforces no PK/FK/UNIQUE
constraints — those become validation jobs (operators/constraints.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Music schema (reference: music_db.sql) ---------------------------------

ARTIST = T.StructType(
    [
        # music_db.sql:7-9 (artist_id PK :10, name UNIQUE :11)
        T.StructField("artist_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("is_group", T.BooleanType(), False),
    ]
)

GENRE = T.StructType(
    [
        # music_db.sql:21-22 (genre_id PK :23, name UNIQUE :24)
        T.StructField("genre_id", T.ShortType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

ALBUM = T.StructType(
    [
        # music_db.sql:35-38 (PK :39, (artist_id,title) UNIQUE :40, FKs :42-43)
        T.StructField("album_id", T.IntegerType(), False),
        T.StructField("artist_id", T.IntegerType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("release_date", T.DateType(), False),
        T.StructField("genre_id", T.ShortType(), False),
    ]
)

USER = T.StructType(
    [
        # music_db.sql:52-53 (username natural PK :54)
        T.StructField("username", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

SONG = T.StructType(
    [
        # music_db.sql:65-68 (PK :69, (artist_id,title) UNIQUE :70, FKs :72-73).
        # Invariant (music_db.sql:67-68; music_db.pdf p.4): exactly one of
        # (album_id, single_release_date) is NULL — NULL album_id <=> single.
        T.StructField("song_id", T.IntegerType(), False),
        T.StructField("artist_id", T.IntegerType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("album_id", T.IntegerType(), True),
        T.StructField("single_release_date", T.DateType(), True),
    ]
)

SONG_GENRE = T.StructType(
    [
        # music_db.sql:83-84 (composite PK :85, FKs :87-88)
        T.StructField("song_id", T.IntegerType(), False),
        T.StructField("genre_id", T.ShortType(), False),
    ]
)

RATING = T.StructType(
    [
        # music_db.sql:98-101 (composite PK (username,song_id,rating_date) :102;
        # rating documented in [1,5], music_db.pdf p.6)
        T.StructField("username", T.StringType(), False),
        T.StructField("song_id", T.IntegerType(), False),
        T.StructField("rating_date", T.DateType(), False),
        T.StructField("rating", T.ByteType(), False),
    ]
)

MUSIC_SCHEMAS: dict[str, T.StructType] = {
    "artist": ARTIST,
    "genre": GENRE,
    "album": ALBUM,
    "user": USER,
    "song": SONG,
    "song_genre": SONG_GENRE,
    "rating": RATING,
}

# Music-schema constraint metadata consumed by operators/constraints.py.
MUSIC_PRIMARY_KEYS: dict[str, list[str]] = {
    "artist": ["artist_id"],
    "genre": ["genre_id"],
    "album": ["album_id"],
    "user": ["username"],
    "song": ["song_id"],
    "song_genre": ["song_id", "genre_id"],
    "rating": ["username", "song_id", "rating_date"],
}

# (child, child_cols, parent, parent_cols) — music_db.sql:42-43,72-73,87-88,104-105
MUSIC_FOREIGN_KEYS: list[tuple[str, list[str], str, list[str]]] = [
    ("album", ["artist_id"], "artist", ["artist_id"]),
    ("album", ["genre_id"], "genre", ["genre_id"]),
    ("song", ["artist_id"], "artist", ["artist_id"]),
    ("song", ["album_id"], "album", ["album_id"]),
    ("song_genre", ["song_id"], "song", ["song_id"]),
    ("song_genre", ["genre_id"], "genre", ["genre_id"]),
    ("rating", ["username"], "user", ["username"]),
    ("rating", ["song_id"], "song", ["song_id"]),
]

MUSIC_UNIQUE_KEYS: dict[str, list[list[str]]] = {
    "artist": [["name"]],  # music_db.sql:11
    "genre": [["name"]],  # music_db.sql:24
    "album": [["artist_id", "title"]],  # music_db.sql:40
    "song": [["artist_id", "title"]],  # music_db.sql:70
}
