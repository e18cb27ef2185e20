"""SURVEY.md §5.2.2 — pin the reference's six queries (Queries:1-57)
against its own 13 checked-in fixture rows (music_db.sql:14-110), each
answer hand-computed from those rows. This is the fidelity test for the
MySQL-semantics decisions: the A2 implicit-grouping rewrite, sargable
date ranges (§4.3), COUNT(col) null-skipping, and O1 tie-breaks."""

from __future__ import annotations

from music_database_spark.plans import music


def test_q1_reference_fixture_is_empty(reference_tables):
    # Only artist A1 (is_group=false) has singles, but Song1's date
    # 2021-01-01 (music_db.sql:77) is OUTSIDE 2015-2020 -> empty result.
    out = music.q1_top_single_artists(
        reference_tables["artist"], reference_tables["song"]
    ).collect()
    assert out == []


def test_q1_in_range_when_window_extended(reference_tables):
    # Widen the window to include 2021: A1's one single appears; Band1 is
    # a group (is_group=true, music_db.sql:15) and stays excluded.
    out = music.q1_top_single_artists(
        reference_tables["artist"], reference_tables["song"], 2015, 2021
    ).collect()
    assert [(r["name"], r["num_singles"]) for r in out] == [("A1", 1)]


def test_q2_band1_last_single_2020(reference_tables):
    # Band1's single Song2 is dated 2020-06-15 (music_db.sql:78) -> its
    # latest single year is exactly 2020. A1's latest is 2021 -> excluded.
    out = music.q2_last_single_in(
        reference_tables["artist"], reference_tables["song"], 2020
    ).collect()
    assert [r["name"] for r in out] == ["Band1"]


def test_q3_genre_counts(reference_tables):
    # song_genre: Song1->Pop, Song2->Rock (music_db.sql:91-93); one song
    # each -> tie broken by genre name ASC (Queries:27).
    out = music.q3_genre_counts(
        reference_tables["genre"], reference_tables["song_genre"]
    ).collect()
    assert [(r["genre"], r["num_songs"]) for r in out] == [("Pop", 1), ("Rock", 1)]


def test_q4_band1_has_both(reference_tables):
    # Album1 belongs to Band1 (music_db.sql:46-47) and Band1 also has the
    # single Song2 -> Band1 is the only artist with both kinds.
    out = music.q4_album_and_single_artists(
        reference_tables["artist"], reference_tables["album"], reference_tables["song"]
    ).collect()
    assert [r["name"] for r in out] == ["Band1"]


def test_q5_both_songs_one_rating(reference_tables):
    # Ratings: user1->Song1@2021, user2->Song2@2020 (music_db.sql:108-110),
    # both in [2020, 2021]; counts tie -> title ASC (Queries:48).
    out = music.q5_most_rated_songs(
        reference_tables["rating"], reference_tables["song"], reference_tables["artist"]
    ).collect()
    assert [(r["title"], r["artist"], r["num_ratings"]) for r in out] == [
        ("Song1", "A1", 1),
        ("Song2", "Band1", 1),
    ]


def test_q6_both_users_tie(reference_tables):
    # One rating each in-window; tie -> username ASC (Queries:57).
    out = music.q6_most_active_users(
        reference_tables["user"], reference_tables["rating"]
    ).collect()
    assert [(r["username"], r["num_ratings"]) for r in out] == [
        ("user1", 1),
        ("user2", 1),
    ]


def test_music_oracles_match_dataframes(spark, reference_tables):
    """Differential fidelity: the ANSI twins (MUSIC_ORACLES) run through
    spark.sql over the same temp views must equal the DataFrame plans."""
    builders = {
        "q1": lambda: music.q1_top_single_artists(
            reference_tables["artist"], reference_tables["song"]
        ),
        "q2": lambda: music.q2_last_single_in(
            reference_tables["artist"], reference_tables["song"], 2020
        ),
        "q3": lambda: music.q3_genre_counts(
            reference_tables["genre"], reference_tables["song_genre"]
        ),
        "q4": lambda: music.q4_album_and_single_artists(
            reference_tables["artist"], reference_tables["album"], reference_tables["song"]
        ),
        "q5": lambda: music.q5_most_rated_songs(
            reference_tables["rating"], reference_tables["song"], reference_tables["artist"]
        ),
        "q6": lambda: music.q6_most_active_users(
            reference_tables["user"], reference_tables["rating"]
        ),
    }
    for name, sql in music.MUSIC_ORACLES.items():
        df_rows = sorted(map(tuple, builders[name]().collect()))
        sql_rows = sorted(map(tuple, spark.sql(sql).collect()))
        assert df_rows == sql_rows, f"{name}: DataFrame vs SQL mismatch"
