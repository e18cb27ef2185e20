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
