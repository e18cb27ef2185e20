"""Driver-contract invariants: the registry loads, every query has the
required shape, and __spark_entry__ serves it faithfully."""

from __future__ import annotations

import importlib.util
import os

from music_database_spark.registry import load_all

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(REPO_ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_loads_without_error():
    reg = load_all()
    assert len(reg) >= 52


def test_every_spec_is_well_formed():
    for name, spec in load_all().items():
        assert spec.name == name
        assert callable(spec.build)
        if spec.oracle is not None:
            assert isinstance(spec.oracle, str) and spec.oracle.strip().upper().startswith(
                ("SELECT", "WITH")
            ), name


def test_entry_module_serves_registry():
    mod = _entry_module()
    reg = load_all()
    q = mod.queries()
    assert set(q) == set(reg)
    o = mod.oracle_sql()
    assert set(o) == {n for n, s in reg.items() if s.oracle}
    assert all(isinstance(s, str) for s in o.values())


def test_flagship_runs_and_returns_rows(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() > 0


def test_first_50_registrations_cover_every_survey_family():
    """The driver's correctness pass samples the first 50 queries()
    entries; the curated DRIVER_PRIORITY order must keep at least one
    representative of every SURVEY.md §2 operator row inside that
    window (round 2 shipped zero driver-verified rows for X1-X5 and all
    streaming because registration order front-loaded one family)."""
    reg = load_all()
    seen: set[str] = set()
    for name in list(reg)[:50]:
        seen.update(reg[name].tags)
    need = {
        f"{fam}{i}"
        for fam, k in [
            ("S", 6), ("P", 6), ("J", 9), ("A", 9), ("O", 5),
            ("U", 3), ("F", 7), ("T", 6), ("D", 3), ("X", 5),
        ]
        for i in range(1, k + 1)
    }
    assert need - seen == set(), f"families outside driver window: {sorted(need - seen)}"


def test_approx_distinct_tracks_exact(spark):
    """q9b's HLL estimate must sit within the sketch's error envelope of
    the exact per-priority distinct count (rsd 0.05 default -> allow 15%)."""
    from pyspark.sql import functions as F

    from music_database_spark.sources.loader import load_table

    sf_dir = "/root/testdata/sf0.001"
    approx = {
        r["priority"]: r["approx_custkeys"]
        for r in load_all()["q9b_approx_distinct"].build(spark, sf_dir).collect()
    }
    exact = {
        r["priority"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for p, n in exact.items():
        assert abs(approx[p] - n) <= max(3, 0.15 * n), (p, approx[p], n)
