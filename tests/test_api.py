"""The switch-path facade: a reference user's workflows through
MusicDatabase must reproduce the fixture-pinned answers."""

from __future__ import annotations

from music_database_spark.api import MusicDatabase


def test_sample_data_reproduces_reference_answers(spark):
    db = MusicDatabase.with_sample_data(spark)
    assert db.top_single_artists().collect() == []
    assert [r["name"] for r in db.artists_with_last_single_in(2020).collect()] == ["Band1"]
    assert [r["name"] for r in db.artists_with_albums_and_singles().collect()] == ["Band1"]
    assert db.validate() == {k: 0 for k in db.validate()}


def test_missing_tables_raise_clear_error(spark):
    import pytest

    with pytest.raises(ValueError, match="missing: \\['rating'\\]"):
        db = MusicDatabase.with_sample_data(spark)
        tables = {k: v for k, v in db.tables.items() if k != "rating"}
        MusicDatabase.from_tables(spark, tables)


def test_music_schema_at_scale(spark):
    """The music workload at 40x the reference's claimed corpus: 20k
    songs, 2k users, 120k ratings. Every reference query must run,
    return deterministic non-empty results, and keep its invariants."""
    from music_database_spark.sources.fixtures import generate_music_dataset

    db = MusicDatabase.from_tables(
        spark,
        generate_music_dataset(
            spark,
            n_artists=400,
            n_albums=2000,
            n_songs=20_000,
            n_users=2000,
            n_ratings=120_000,
            register=False,
        ),
    )
    top = db.top_single_artists().collect()
    assert len(top) > 0
    counts = [r["num_singles"] for r in top]
    assert counts == sorted(counts, reverse=True)
    rated = db.most_rated_songs().collect()
    assert len(rated) > 0
    active = db.most_active_users().collect()
    assert len(active) > 0
    assert db.validate() == {k: 0 for k in db.validate()}


def test_synthetic_corpus_analyses(spark):
    db = MusicDatabase.with_synthetic_corpus(spark)
    top = db.highest_rated_songs(min_ratings=2).collect()
    assert len(top) > 0
    assert all(1.0 <= r["avg_rating"] <= 5.0 for r in top)
    listeners = db.most_active_listeners().collect()
    assert listeners[0]["distinct_songs"] >= listeners[-1]["distinct_songs"]
    # ad-hoc SQL front door over the registered views
    n_songs = db.sql("SELECT COUNT(*) AS n FROM song").collect()[0]["n"]
    assert n_songs == 500


def test_lang_id_sql_matches_mapinpandas(spark):
    """The pure-Catalyst language ID must agree row-for-row with the
    mapInPandas heuristic it re-expresses — this is the oracle for the
    rows-only x_lang_id driver query."""
    from music_database_spark.registry import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    sql_rows = {tuple(r) for r in reg["x_lang_id_sql"].build(spark, sf).collect()}
    udf_rows = {tuple(r) for r in reg["x_lang_id"].build(spark, sf).collect()}
    assert sql_rows == udf_rows
