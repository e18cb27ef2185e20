"""GUIDE.md quotes measured operating-point numbers from the registered
harnesses. Docs drift silently; these tests re-derive every quoted
figure from the same harnesses at the scale the GUIDE measured
(sf0.01, the driver-correctness corpus) and then assert the GUIDE
still carries the derived figure VERBATIM — so a harness change (or a
doc edit) that breaks the correspondence fails CI instead of shipping
folklore (round-8 verdict ask #7).

Wall-clock note: everything here is one k-means fit + a few candidate
joins over the 500-doc/500-vector sf0.01 corpus — seconds, not the
sf0.1 bench path.
"""

from __future__ import annotations

import os

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_GUIDE = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def guide_text() -> str:
    with open(os.path.join(REPO_ROOT, "GUIDE.md")) as f:
        return f.read()


@pytest.fixture(scope="module")
def reg():
    from music_database_spark.registry import load_all

    return load_all()


def test_guide_minhash_operating_point_numbers_regenerate(spark, reg, guide_text):
    """Tier-4 row: 'capture 1.00 at J ≥ 0.8 (x_lsh_curve_empirical);
    P/R both 1.00 at the J ≥ 0.6 operating point (x_dedup_recall)'."""
    curve = reg["x_lsh_curve_empirical"].build(spark, SF_GUIDE).collect()
    hi = [r for r in curve if r["bucket"] >= 8]  # J >= 0.8 buckets
    assert hi and all(r["capture_rate"] == 1.0 for r in hi), [
        (r["bucket"], r["capture_rate"]) for r in curve
    ]
    assert "capture 1.00 at J ≥ 0.8" in guide_text

    point = reg["x_dedup_recall"].build(spark, SF_GUIDE).collect()[0]
    assert point["cand_precision"] == 1.0 and point["cand_recall"] == 1.0, dict(
        point.asDict()
    )
    assert "P/R both 1.00 at the J ≥ 0.6 operating point" in guide_text


def test_guide_ivf_probe_curve_numbers_regenerate(spark, reg, guide_text):
    """ANN table IVF row: recalls and candidate counts at nprobe 1/2/4,
    including the brute-force denominator (N_PROBES probes x (corpus-1)
    neighbors). The quoted string is BUILT from the measurement, so the
    doc can only contain numbers the harness actually produces."""
    from music_database_spark.operators.knn import N_PROBES

    rows = {
        r["nprobe"]: r
        for r in reg["x_ivf_probe_curve"].build(spark, SF_GUIDE).collect()
    }
    n_corpus = spark.read.parquet(f"{SF_GUIDE}/embeddings.parquet").count()
    brute = N_PROBES * (n_corpus - 1)
    quoted = (
        f"{rows[1]['recall_at_k']:.2f} @ nprobe=1 → "
        f"{rows[2]['recall_at_k']:.2f} @ 2 → "
        f"{rows[4]['recall_at_k']:.2f} @ 4 "
        f"(candidates {rows[1]['n_candidates']:,} → {rows[4]['n_candidates']:,} "
        f"of the {brute:,} brute-force pairs)"
    )
    assert quoted in guide_text, f"GUIDE drifted from the harness: need '{quoted}'"


def test_guide_lsh_and_pq_mean_recalls_regenerate(spark, reg, guide_text):
    """ANN table LSH/PQ rows: '~0.33 mean (x_ann_recall)' and '~0.07
    mean (x_pq_recall)' on the isotropic-noise corpus. '~' quotes are
    pinned at 2 decimal places of the measured mean."""
    for name, expect in (("x_ann_recall", "~0.33 mean"), ("x_pq_recall", "~0.07 mean")):
        rows = reg[name].build(spark, SF_GUIDE).collect()
        mean = sum(r["recall_at_k"] for r in rows) / len(rows)
        assert f"~{mean:.2f} mean" == expect, f"{name} measured {mean:.4f}"
        assert expect in guide_text
