"""SURVEY.md §5.3 — constraint validation replaces InnoDB enforcement.
The reference fixture and the generated 500-song corpus must both pass
every PK/FK/UNIQUE/range/disjunction check with zero violations."""

from __future__ import annotations

import pytest

from music_database_spark.operators.constraints import validate_music_constraints
from music_database_spark.sources.fixtures import generate_music_dataset


def _assert_all_zero(results: dict[str, int]):
    nonzero = {k: v for k, v in results.items() if v != 0}
    assert nonzero == {}, f"constraint violations: {nonzero}"


def test_reference_fixture_satisfies_all_constraints(reference_tables):
    _assert_all_zero(validate_music_constraints(reference_tables))


@pytest.fixture(scope="module")
def generated(spark):
    return generate_music_dataset(spark, register=False)


def test_generated_dataset_satisfies_all_constraints(generated):
    _assert_all_zero(validate_music_constraints(generated))


def test_generated_dataset_edge_rows(spark, generated):
    """The deterministic edge rows the queries rely on (fixtures.py):
    Q2 needs artist 2's latest single year to be exactly 2020; Q4 needs
    album 1's artist to own both an album and a single; user_100 never
    rates (J7); song 1 is never rated."""
    from pyspark.sql import functions as F

    song = generated["song"]
    last_y = (
        song.filter(F.col("artist_id") == 2)
        .filter(F.col("album_id").isNull())
        .agg(F.max(F.year("single_release_date")).alias("y"))
        .collect()[0]["y"]
    )
    assert last_y == 2020

    album1_artist = generated["album"].filter(F.col("album_id") == 1).collect()[0]["artist_id"]
    has_single = (
        song.filter((F.col("artist_id") == album1_artist) & F.col("album_id").isNull()).count() > 0
    )
    assert has_single

    assert generated["rating"].filter(F.col("username") == "user_100").count() == 0
    assert generated["rating"].filter(F.col("song_id") == 1).count() == 0


def test_driver_constraint_queries_report_zero(spark):
    from pyspark.sql import functions as F

    from music_database_spark.registry import load_all
    from music_database_spark.sources.loader import load_table

    reg = load_all()
    fk = reg["fk_violations"].build(spark, "/root/testdata/sf0.001").collect()
    assert len(fk) == 7 and all(r["violations"] == 0 for r in fk)
    # The driver's synthetic lineitem does NOT have a unique
    # (l_orderkey, l_linenumber) pair — the validator must REPORT that,
    # not hide it. Pin the report against an independent computation.
    expected_li_dups = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    pk = {r["table_name"]: r["violations"] for r in reg["pk_uniqueness"].build(spark, "/root/testdata/sf0.001").collect()}
    assert pk.pop("lineitem") == expected_li_dups
    assert pk == {t: 0 for t in ["region", "nation", "customer", "supplier", "part", "orders"]}
