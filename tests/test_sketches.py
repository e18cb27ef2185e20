"""Sketch/spectral family (plans/sketches.py): KMV error envelope,
rolling z-score semantics pinned against a pandas recomputation, and
the PCA pair pinned against full-precision numpy."""

from __future__ import annotations

import numpy as np

from music_database_spark.registry import load_all
from music_database_spark.plans.sketches import (
    K_KMV,
    PCA_ORACLE_DIMS,
    Z_MIN_HISTORY,
    Z_THRESHOLD,
)

SF = "/root/testdata/sf0.001"


def test_kmv_estimate_within_error_envelope(spark):
    rows = load_all()["x_distinct_kmv"].build(spark, SF).collect()
    assert rows, "no groups returned"
    for r in rows:
        # KMV standard error is ~1/sqrt(K-2) (~9% at K=128); allow 4 sigma.
        assert r["rel_err_pct"] <= 400.0 / (K_KMV - 2) ** 0.5, dict(r.asDict())
        # Sub-sketch groups must be answered exactly.
        if r["exact_distinct"] < K_KMV:
            assert r["kmv_estimate"] == float(r["exact_distinct"])


def test_kmv_exact_column_is_truly_exact(spark):
    from pyspark.sql import functions as F

    from music_database_spark.sources.loader import load_table

    got = {
        r["returnflag"]: r["exact_distinct"]
        for r in load_all()["x_distinct_kmv"].build(spark, SF).collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == want


def test_anomaly_zscore_matches_pandas_recomputation(spark):
    from music_database_spark.sources.loader import load_table

    flagged = load_all()["x_anomaly_zscore"].build(spark, SF).toPandas()
    assert len(flagged) > 0
    assert (flagged["z_score"].abs() > Z_THRESHOLD).all()

    ev = load_table(spark, SF, "events").toPandas()
    ev["day"] = ev["ts"].dt.date
    daily = (
        ev.groupby(["event_type", "day"])["value"].sum().reset_index(name="daily_total")
    )
    expect = []
    for etype, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        for i in range(len(g)):
            hist = g["daily_total"].iloc[max(0, i - 7) : i]
            if len(hist) < Z_MIN_HISTORY:
                continue
            mean, var = hist.mean(), (hist**2).mean() - hist.mean() ** 2
            z = (g["daily_total"].iloc[i] - mean) / max(var, 1e-300) ** 0.5
            if abs(z) > Z_THRESHOLD:
                expect.append((etype, str(g["day"].iloc[i]), round(z, 4)))
    got = [
        (r.event_type, r.day, round(r.z_score, 4)) for r in flagged.itertuples()
    ]
    assert sorted(got) == sorted(expect)


def test_pca_gram_matches_numpy_covariance(spark):
    cov_rows = load_all()["x_pca_gram"].build(spark, SF).collect()
    d = PCA_ORACLE_DIMS
    assert len(cov_rows) == d * (d + 1) // 2

    from music_database_spark.sources.loader import load_table

    X = np.vstack(
        load_table(spark, SF, "embeddings").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)[:, :d]
    ref = np.cov(X, rowvar=False, bias=True)
    for r in cov_rows:
        assert abs(r["cov"] - ref[r["i"] - 1, r["j"] - 1]) < 1e-5, (r["i"], r["j"])


def test_pca_project_matches_numpy_eigh(spark):
    from music_database_spark.sources.loader import load_table

    out = load_all()["x_pca_project"].build(spark, SF).toPandas()
    pdf = load_table(spark, SF, "embeddings").toPandas()
    assert len(out) == len(pdf)

    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    got = out.sort_values("vec_id")[["pc1", "pc2"]].to_numpy()
    for k in (1, 2):
        v = vecs[:, -k]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        proj = X @ v
        np.testing.assert_allclose(
            got[:, k - 1], proj[np.argsort(pdf["vec_id"].to_numpy())], atol=1e-4
        )
    # top component captures at least as much variance as the runner-up
    assert got[:, 0].var() >= got[:, 1].var() - 1e-9


def test_quantile_sample_tracks_exact(spark):
    """Sampled p50/p95 must sit near the exact full-data quantiles, and
    the exact side must agree with numpy's linear interpolation."""
    rows = load_all()["x_quantile_sample"].build(spark, SF).collect()
    assert rows
    from music_database_spark.sources.loader import load_table

    li = load_table(spark, SF, "lineitem").toPandas()
    for r in rows:
        vals = li.loc[li["l_returnflag"] == r["returnflag"], "l_extendedprice"]
        assert abs(r["q50_exact"] - np.quantile(vals, 0.5)) < 1e-4
        assert abs(r["q95_exact"] - np.quantile(vals, 0.95)) < 1e-4
        assert r["n_sample"] < r["n_total"]
        # 10% sample of ~2000 rows: generous 15% relative tolerance
        for tag in ("q50", "q95"):
            assert abs(r[f"{tag}_sample"] - r[f"{tag}_exact"]) <= 0.15 * r[f"{tag}_exact"], r


def test_dedup_recall_counts_are_consistent(spark):
    r = load_all()["x_dedup_recall"].build(spark, SF).collect()[0]
    assert r["n_hit"] <= min(r["n_truth"], r["n_cand"])
    assert r["n_truth"] > 0 and r["n_cand"] > 0
    if r["n_cand"]:
        assert abs(r["cand_precision"] - r["n_hit"] / r["n_cand"]) < 1e-6
    if r["n_truth"]:
        assert abs(r["cand_recall"] - r["n_hit"] / r["n_truth"]) < 1e-6
    # the banded index is tuned for J >= ~0.6 -> recall should be high
    assert r["cand_recall"] >= 0.8, dict(r.asDict())


def test_anomaly_mad_matches_pandas_recomputation(spark):
    """Pin the robust screen against a straight pandas/numpy median-MAD
    recomputation (numpy median == the registered interpolation at q=0.5)."""
    from music_database_spark.plans.sketches import MAD_CONST, MAD_THRESHOLD
    from music_database_spark.sources.loader import load_table

    flagged = load_all()["x_anomaly_mad"].build(spark, SF).toPandas()
    assert len(flagged) > 0
    assert (flagged["robust_z"].abs() > MAD_THRESHOLD).all()

    ev = load_table(spark, SF, "events").toPandas()
    ev["day"] = ev["ts"].dt.date
    daily = ev.groupby(["event_type", "day"])["value"].sum().reset_index(name="v")
    expect = []
    for etype, g in daily.groupby("event_type"):
        med = np.median(g["v"])
        mad = np.median(np.abs(g["v"] - med))
        for _, row in g.iterrows():
            z = MAD_CONST * (row["v"] - med) / max(mad, 1e-300)
            if abs(z) > MAD_THRESHOLD:
                expect.append((etype, str(row["day"]), round(z, 4)))
    got = [(r.event_type, r.day, round(r.robust_z, 4)) for r in flagged.itertuples()]
    assert sorted(got) == sorted(expect)


def test_collocations_match_python_pmi(spark):
    """Top-PMI bigrams pinned against a dict-based recomputation."""
    import math
    from collections import Counter

    from music_database_spark.operators.textops import MIN_COLLOC, TOP_COLLOC
    from music_database_spark.sources.loader import load_table

    got = load_all()["x_collocations"].build(spark, SF).collect()
    assert len(got) == TOP_COLLOC

    texts = load_table(spark, SF, "documents").toPandas()["text"]
    uni, big = Counter(), Counter()
    for t in texts:
        ts = [w for w in t.split(" ") if w]
        uni.update(ts)
        big.update(zip(ts, ts[1:]))
    nu, nb = sum(uni.values()), sum(big.values())
    pmi = {
        (w1, w2): math.log((c / nb) / ((uni[w1] / nu) * (uni[w2] / nu)))
        for (w1, w2), c in big.items()
        if c >= MIN_COLLOC
    }
    want = sorted(pmi.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:TOP_COLLOC]
    assert [(r["w1"], r["w2"], round(r["pmi"], 5)) for r in got] == [
        (w1, w2, round(p, 5)) for (w1, w2), p in want
    ]


def test_ks_drift_matches_python_recomputation(spark):
    """KS statistic pinned against a pure-Python two-sample CDF sweep
    over the same md5-bucket split."""
    import hashlib

    from music_database_spark.sources.loader import load_table

    r = load_all()["x_ks_drift"].build(spark, SF).collect()[0]
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    a, b = [], []
    for row in docs:
        bucket = int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:4], 16) % 100
        if bucket < 80:
            a.append(row["n_chars"])
        elif bucket < 90:
            b.append(row["n_chars"])
    assert (r["na"], r["nb"]) == (len(a), len(b))
    best, best_v = -1.0, None
    for v in sorted(set(a) | set(b)):
        d = abs(
            sum(x <= v for x in a) / len(a) - sum(x <= v for x in b) / len(b)
        )
        if d > best + 1e-15:
            best, best_v = d, v
    assert abs(r["ks_stat"] - best) < 1e-6
    assert r["ks_at"] == best_v
    # null-hypothesis sanity: a correct hash split should not show large drift
    assert r["ks_stat"] < 3.0 * ((len(a) + len(b)) / (len(a) * len(b))) ** 0.5


def test_cms_one_sided_error_and_hash_family(spark):
    # CMS contract: estimate is NEVER below the exact count (min over
    # rows of sums that each include the key's own occurrences), and the
    # column mapping is pinned to public md5 semantics.
    import hashlib

    from music_database_spark.plans.sketches import CMS_W
    from music_database_spark.registry import load_all

    rows = (
        load_all()["x_cms_heavy_hitters"].build(spark, "/root/testdata/sf0.001").collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r["cms_est"] >= r["exact_n"]
    assert (
        int(hashlib.md5(b"cms2:7").hexdigest()[:8], 16) % CMS_W
        == int("0x" + hashlib.md5(b"cms2:7").hexdigest()[:8], 16) % CMS_W
    )


def test_kmv_setops_estimates_bracket_exact(spark):
    # Sketch-algebra sanity: estimates are within the KMV error envelope
    # (~1/sqrt(k-2) ~ 9% rel. stddev; assert a generous 4-sigma band),
    # union >= max side, intersection <= min side, and
    # inclusion-exclusion holds approximately.
    from music_database_spark.registry import load_all

    r = (
        load_all()["x_kmv_setops"].build(spark, "/root/testdata/sf0.001").collect()[0]
    )
    for est, exact in [
        (r["est_a"], r["exact_a"]),
        (r["est_b"], r["exact_b"]),
        (r["est_union"], r["exact_union"]),
    ]:
        assert abs(est - exact) / exact < 0.36, (est, exact)
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) * 0.99
    assert r["est_inter"] <= min(r["est_a"], r["est_b"]) * 1.01
    assert r["exact_union"] == r["exact_a"] + r["exact_b"] - r["exact_inter"]
    # intersection estimate within a loose band of truth (theta-cut
    # estimators have higher variance than plain KMV)
    assert abs(r["est_inter"] - r["exact_inter"]) / r["exact_inter"] < 0.5
