"""Fixture loaders (operator S3 — INSERT INTO ... VALUES).

`load_reference_fixture` recreates the reference's exact 13 sample rows
(music_db.sql:14-16,27-29,46-47,57-59,76-78,91-93,108-110) with explicit
schemas; unit tests pin each reference query's hand-computable output
against these rows (SURVEY.md §5.2.2).

`generate_music_dataset` builds the scaled synthetic corpus matching the
reference's claimed 500-song / 100-user analysis dataset (README.md:5),
deterministic under seed, satisfying every schema invariant
(FIXTURES.md §1b) including the edge rows the queries need: an artist
with both albums and singles (Q4), an artist whose last single year is
the target year (Q2), count ties to exercise name tie-breaks (Q1/Q5),
users with zero ratings (J7 left join).
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from .schemas import MUSIC_SCHEMAS

D = dt.date
TS = dt.datetime


def load_reference_fixture(spark: SparkSession, register: bool = True) -> dict[str, DataFrame]:
    rows = {
        # music_db.sql:14-16
        "artist": [(1, "A1", False), (2, "Band1", True)],
        # music_db.sql:27-29
        "genre": [(1, "Pop"), (2, "Rock")],
        # music_db.sql:46-47
        "album": [(1, 2, "Album1", D(2020, 1, 1), 1)],
        # music_db.sql:57-59
        "user": [
            ("user1", TS(2025, 11, 23, 20, 55, 24)),
            ("user2", TS(2025, 11, 23, 20, 55, 24)),
        ],
        # music_db.sql:76-78 — Song1/Song2 are singles (album_id NULL)
        "song": [
            (1, 1, "Song1", None, D(2021, 1, 1)),
            (2, 2, "Song2", None, D(2020, 6, 15)),
        ],
        # music_db.sql:91-93
        "song_genre": [(1, 1), (2, 2)],
        # music_db.sql:108-110
        "rating": [
            ("user1", 1, D(2021, 5, 1), 5),
            ("user2", 2, D(2020, 7, 1), 4),
        ],
    }
    out = {}
    for name, data in rows.items():
        df = spark.createDataFrame(data, MUSIC_SCHEMAS[name])
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def generate_music_dataset(
    spark: SparkSession,
    seed: int = 42,
    n_artists: int = 60,
    n_genres: int = 10,
    n_albums: int = 80,
    n_songs: int = 500,
    n_users: int = 100,
    n_ratings: int = 3000,
    register: bool = True,
) -> dict[str, DataFrame]:
    rng = random.Random(seed)

    artists = [(i, f"artist_{i:03d}", rng.random() < 0.3) for i in range(1, n_artists + 1)]
    genres = [(g, f"genre_{g:02d}") for g in range(1, n_genres + 1)]

    albums = []
    for a in range(1, n_albums + 1):
        albums.append(
            (
                a,
                rng.randrange(1, n_artists + 1),
                f"album_{a:03d}",
                D(rng.randrange(2010, 2025), rng.randrange(1, 13), rng.randrange(1, 29)),
                rng.randrange(1, n_genres + 1),
            )
        )
    album_genre = {a[0]: a[4] for a in albums}

    songs = []
    for s in range(1, n_songs + 1):
        artist = rng.randrange(1, n_artists + 1)
        if rng.random() < 0.4:  # single: album NULL, date set (music_db.sql:67-68 rule)
            year = rng.choice([2010, 2012, 2015, 2016, 2017, 2018, 2019, 2020, 2020, 2021, 2023])
            if artist == 2:
                # artist 2's singles are pinned below (its LAST single year
                # must stay 2020 for the Q2 edge) — divert random singles.
                artist = 3
            songs.append((s, artist, f"song_{s:04d}", None, D(year, rng.randrange(1, 13), rng.randrange(1, 29))))
        else:  # album track: date NULL
            songs.append((s, artist, f"song_{s:04d}", rng.randrange(1, n_albums + 1), None))
    # guarantee Q4 non-empty: album 1's artist also gets a single -> owns both kinds
    songs[0] = (1, albums[0][1], "song_0001", None, D(2017, 3, 3))
    # guarantee Q2 non-empty: artist 2's latest single year is 2020
    # (the loop above never gives artist 2 another single)
    songs[1] = (2, 2, "song_0002", None, D(2020, 4, 4))

    song_genres = set()
    for s in songs:
        if s[3] is not None:
            song_genres.add((s[0], album_genre[s[3]]))  # album tracks share album genre (music_db.pdf p.5)
        else:
            song_genres.add((s[0], rng.randrange(1, n_genres + 1)))
        if rng.random() < 0.5:
            song_genres.add((s[0], rng.randrange(1, n_genres + 1)))

    users = [
        (f"user_{u:03d}", TS(rng.randrange(2019, 2026), rng.randrange(1, 13), rng.randrange(1, 29), rng.randrange(24)))
        for u in range(1, n_users + 1)
    ]

    ratings = set()
    while len(ratings) < n_ratings:
        u = rng.randrange(1, n_users)  # user_100 never rates (J7 left-join edge)
        s = rng.randrange(2, n_songs + 1)  # song 1 never rated
        year = rng.choice([2019, 2020, 2020, 2021, 2021, 2022])
        ratings.add((f"user_{u:03d}", s, D(year, rng.randrange(1, 13), rng.randrange(1, 29)), rng.randrange(1, 6)))
    # a (user, song) pair re-rated on two dates (allowed: PK includes date, music_db.sql:102)
    ratings.add(("user_001", 2, D(2020, 1, 10), 2))
    ratings.add(("user_001", 2, D(2021, 1, 10), 4))

    data = {
        "artist": artists,
        "genre": genres,
        "album": albums,
        "user": users,
        "song": songs,
        "song_genre": sorted(song_genres),
        "rating": sorted(ratings),
    }
    out = {}
    for name, rows in data.items():
        df = spark.createDataFrame(rows, MUSIC_SCHEMAS[name])
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
