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


def test_driver_window_follows_reverification_policy():
    """Rotation contract since round 8 (the never-verified pool drained
    in r07): the driver's 50-query window (first 50 of load_all() order)
    must be exactly what `tools/verified_rounds.propose_window` emits —
    never-verified names first (new additions), then the stalest
    last-verified names, oldest driver round first — computed against the
    ledger state the window was designed from.

    Round-5/6 lesson: computing the expected window from ALL
    CORRECTNESS_r*.json files makes the test self-expire the moment the
    driver stamps the current round's file. So the ledger is rebuilt with
    max_round=WINDOW_DESIGNED_AFTER_ROUND — the state the window was
    rotated against — keeping the test green both before and after the
    driver does its job."""
    import sys

    sys.path.insert(0, REPO_ROOT)
    from tools.verified_rounds import collect, propose_window

    from music_database_spark.registry import WINDOW_DESIGNED_AFTER_ROUND

    reg = load_all()
    window = list(reg)[:50]
    expected = propose_window(collect(max_round=WINDOW_DESIGNED_AFTER_ROUND))
    assert window == expected
    # Every curated priority name must actually exist in the registry —
    # a typo would silently shrink the window.
    from music_database_spark.registry import DRIVER_PRIORITY

    missing = [n for n in DRIVER_PRIORITY if n not in reg]
    assert missing == [], missing


def test_verified_ledger_is_fresh():
    """VERIFIED.json must have been regenerated after the current window
    was designed: its rounds_seen must include every driver round up to
    WINDOW_DESIGNED_AFTER_ROUND (the r07 lesson — the ledger was stamped
    before the driver run and drifted). Later rounds are allowed (the
    driver stamps CORRECTNESS_r{N} after our final commit); the
    round-start ritual bumps the constant and regenerates."""
    import glob
    import json
    import re

    from music_database_spark.registry import WINDOW_DESIGNED_AFTER_ROUND

    with open(os.path.join(REPO_ROOT, "VERIFIED.json")) as f:
        ledger = json.load(f)
    on_disk = set()
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m and int(m.group(1)) <= WINDOW_DESIGNED_AFTER_ROUND:
            on_disk.add(int(m.group(1)))
    missing = sorted(on_disk - set(ledger["rounds_seen"]))
    assert missing == [], f"VERIFIED.json stale: missing rounds {missing}"


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
