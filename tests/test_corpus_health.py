"""Round-7 corpus-health operators (operators/corpus_health.py):
semantic pins against independent Python recomputations at sf0.001."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pandas as pd

from music_database_spark.operators.corpus_health import (
    FANO_BURSTY,
    NOVELTY_NGRAM,
    SPLIT_TOK_EDGES,
    SPLIT_TRAIN,
    SPLIT_VAL,
    TOX_LEXICON,
    ZIPF_MIN_FREQ,
)
from music_database_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _docs_pd():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_char_entropy_matches_python_reference(spark):
    """avg_entropy per lang equals a Counter-based recomputation with the
    same 6-dp term rounding (order-free by construction)."""
    docs = _docs_pd()
    ent = {}
    for _, row in docs.iterrows():
        n = len(row["text"])
        h = sum(
            round(-(k / n) * math.log2(k / n), 6)
            for k in Counter(row["text"]).values()
        )
        ent.setdefault(row["lang"], []).append(round(h, 6))
    out = {
        r["lang"]: r
        for r in load_all()["x_char_entropy"].build(spark, SF).collect()
    }
    assert set(out) == set(ent)
    for lang, hs in ent.items():
        assert out[lang]["n_docs"] == len(hs)
        assert abs(out[lang]["avg_entropy"] - sum(hs) / len(hs)) < 1e-6, lang


def test_zipf_fit_matches_least_squares_reference(spark):
    """slope/r2 equal the closed-form least squares over the same
    (ln rank, ln freq) points, built from an independent token count."""
    docs = _docs_pd()
    cnt = Counter(t for text in docs["text"] for t in text.split(" ") if t)
    vocab = sorted(
        ((c, t) for t, c in cnt.items() if c >= ZIPF_MIN_FREQ),
        key=lambda x: (-x[0], x[1]),
    )
    pts = [
        (round(math.log(r), 6), round(math.log(c), 6))
        for r, (c, _) in enumerate(vocab, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(round(x * y, 6) for x, y in pts)
    sxx = sum(round(x * x, 6) for x, _ in pts)
    syy = sum(round(y * y, 6) for _, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    row = load_all()["x_zipf_fit"].build(spark, SF).collect()[0]
    assert row["n_points"] == n
    assert abs(row["slope"] - slope) < 1e-5
    assert abs(row["r2"] - r2) < 1e-5
    assert 0.0 <= row["r2"] <= 1.0


def test_toxicity_total_score_is_exact_weighted_count(spark):
    docs = _docs_pd()
    cnt = Counter(t for text in docs["text"] for t in text.split(" "))
    expected = sum(w * cnt.get(t, 0) for t, w in TOX_LEXICON)
    rows = load_all()["x_toxicity_lexicon"].build(spark, SF).collect()
    assert sum(r["total_score"] for r in rows) == expected
    assert sum(r["n_docs"] for r in rows) == len(docs)
    # 'leak' is deliberately not in the corpus vocabulary
    assert cnt.get("leak", 0) == 0


def test_ngram_novelty_declines_and_covers_all_docs(spark):
    docs = _docs_pd()
    rows = load_all()["x_ngram_novelty"].build(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    by_decile = {r["decile"]: r["avg_novelty"] for r in rows}
    # saturation: the first decile mints far more first-occurrences
    assert by_decile[min(by_decile)] > by_decile[max(by_decile)]
    # decile 0 contains doc_id 0, whose ngrams are all novel by definition
    assert 0 < by_decile[min(by_decile)] <= 1.0


def test_ngram_novelty_first_decile_matches_reference(spark):
    """n_novel/n_ngrams for the lowest doc_ids recomputed directly."""
    docs = _docs_pd().sort_values("doc_id")
    first_seen: dict[str, int] = {}
    per_doc = {}
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        if len(toks) >= NOVELTY_NGRAM:
            grams = {
                " ".join(toks[i : i + NOVELTY_NGRAM])
                for i in range(len(toks) - NOVELTY_NGRAM + 1)
            }
        else:
            grams = {" ".join(toks)}  # GREATEST(.,1) arm: one short shingle
        novel = sum(1 for g in grams if g not in first_seen)
        for g in grams:
            first_seen.setdefault(g, row["doc_id"])
        per_doc[row["doc_id"]] = round(novel / len(grams), 6)
    max_doc = docs["doc_id"].max()
    n_deciles = 10
    expected = {}
    for d, frac in per_doc.items():
        dec = (n_deciles * d) // (max_doc + 1)
        expected.setdefault(dec, []).append(frac)
    out = {
        r["decile"]: r for r in load_all()["x_ngram_novelty"].build(spark, SF).collect()
    }
    for dec, fr in expected.items():
        assert out[dec]["n_docs"] == len(fr)
        assert abs(out[dec]["avg_novelty"] - sum(fr) / len(fr)) < 1e-6, dec


def test_burstiness_matches_pandas_fano(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ts = pd.to_datetime(ev["ts"])
    ev = ev.assign(minute=ts.dt.floor("min"))
    rows = {
        r["event_type"]: r for r in load_all()["x_burstiness"].build(spark, SF).collect()
    }
    for etype, grp in ev.groupby("event_type"):
        c = grp.groupby("minute").size()
        mean = c.sum() / len(c)
        fano = ((c * c).sum() / len(c) - mean * mean) / mean
        r = rows[etype]
        assert r["n_buckets"] == len(c)
        assert r["n_events"] == int(c.sum())
        assert abs(r["fano"] - fano) < 1e-5, etype
        assert r["is_bursty"] == (fano > FANO_BURSTY)


def test_stratified_split_quotas_exact(spark):
    rows = load_all()["x_stratified_split"].build(spark, SF).collect()
    strata: dict[tuple, dict] = {}
    for r in rows:
        strata.setdefault((r["lang"], r["bucket"]), {})[r["split"]] = r["n_docs"]
    docs = _docs_pd()
    assert sum(r["n_docs"] for r in rows) == len(docs)
    for key, by_split in strata.items():
        n = sum(by_split.values())
        assert by_split.get("train", 0) == math.floor(SPLIT_TRAIN * n), key
        assert by_split.get("train", 0) + by_split.get("val", 0) == math.floor(
            SPLIT_VAL * n
        ), key
    # stratum definition matches the Python tokenizer
    n_tok = docs["text"].map(lambda t: sum(1 for x in t.split(" ") if x))
    edges = SPLIT_TOK_EDGES
    labels = n_tok.map(
        lambda n: "tok_000"
        if n < edges[0]
        else f"tok_{edges[0]:03d}"
        if n < edges[1]
        else f"tok_{edges[1]:03d}"
        if n < edges[2]
        else f"tok_{edges[2]:03d}"
    )
    expected = Counter(zip(docs["lang"], labels))
    got = Counter({k: sum(v.values()) for k, v in strata.items()})
    assert got == Counter(
        {(lang, b): n for (lang, b), n in expected.items()}
    )


def test_dedup_keep_best_keeps_longest_variant(spark):
    docs = _docs_pd()
    canon = docs["text"].map(
        lambda t: re.sub(" +", " ", re.sub(r"[^a-z0-9 ]", "", t.lower())).strip()
    )
    h = canon.map(lambda c: hashlib.md5(c.encode()).hexdigest())
    df = docs.assign(h=h, raw_len=docs["text"].str.len())
    kept = df.sort_values(["raw_len", "doc_id"], ascending=[False, True]).groupby("h").head(1)
    rows = {r["lang"]: r for r in load_all()["x_dedup_keep_best"].build(spark, SF).collect()}
    for lang, grp in df.groupby("lang"):
        k = kept[kept["doc_id"].isin(grp["doc_id"])]
        assert rows[lang]["n_docs"] == len(grp)
        assert rows[lang]["n_kept"] == len(k)
        assert rows[lang]["kept_id_sum"] == int(k["doc_id"].sum()), lang


def test_corpus_pipeline_facade_matches_registered_queries(spark):
    """The fluent API methods ride the same shared expression builders
    as the registered queries — pin agreement on the driver corpus."""
    from pyspark.sql import functions as F

    from music_database_spark.corpus import CorpusPipeline
    from music_database_spark.operators.corpus_health import ENTROPY_LOW

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pipe = CorpusPipeline(docs)

    # keep_best_dedup keeps exactly the registered query's kept set
    kept = pipe.keep_best_dedup()
    reg = {
        r["lang"]: r for r in load_all()["x_dedup_keep_best"].build(spark, SF).collect()
    }
    got = {
        r["lang"]: r
        for r in kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .collect()
    }
    for lang, r in reg.items():
        assert got[lang]["n"] == r["n_kept"], lang
        assert got[lang]["id_sum"] == r["kept_id_sum"], lang

    # stratified_split quotas per caller-defined stratum are exact
    sp = pipe.stratified_split(["lang"]).groupBy("lang", "split").count().collect()
    by = {}
    for r in sp:
        by.setdefault(r["lang"], {})[r["split"]] = r["count"]
    for lang, d in by.items():
        n = sum(d.values())
        assert d.get("train", 0) == int(0.8 * n) or d.get("train", 0) == math.floor(0.8 * n), lang

    # char_entropy column agrees with the registered per-lang average
    ent = pipe.char_entropy().groupBy("lang").agg(
        F.round(
            F.sum(F.col("char_entropy").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_h")
    )
    reg_ent = {
        r["lang"]: r["avg_entropy"]
        for r in load_all()["x_char_entropy"].build(spark, SF).collect()
    }
    for r in ent.collect():
        assert abs(r["avg_h"] - reg_ent[r["lang"]]) < 1e-6, r["lang"]
    assert ENTROPY_LOW > 0

    # ngram_novelty returns one row per doc, novel <= total
    nov = pipe.ngram_novelty().collect()
    assert len(nov) == docs.count()
    assert all(0 <= r["n_novel"] <= r["n_ngrams"] for r in nov)

    # lexicon_score total equals the registered total_score sum
    tox_total = pipe.lexicon_score().agg(F.sum("lexicon_score")).collect()[0][0]
    reg_tox = sum(
        r["total_score"]
        for r in load_all()["x_toxicity_lexicon"].build(spark, SF).collect()
    )
    assert tox_total == reg_tox


def test_jl_projection_distortion_is_controlled(spark):
    """E[ratio] = 1 for ±1 JL; with m=16 the ratio std is ~sqrt(2/16),
    so the mean sits near 1 and most pairs stay in the [0.5, 2] band.
    Also pins the sign planes against an independent md5 recomputation."""
    import hashlib

    from music_database_spark.operators.knn import (
        JL_DIM,
        _jl_sign_strings,
    )

    planes = _jl_sign_strings()
    assert len(planes) == JL_DIM and all(len(p) == 64 for p in planes)
    # spot-pin two cells against the documented formula
    assert planes[0][0] == (
        "+" if int(hashlib.md5(b"jl:0:0").hexdigest()[0], 16) % 2 == 0 else "-"
    )
    assert planes[7][33] == (
        "+" if int(hashlib.md5(b"jl:7:33").hexdigest()[0], 16) % 2 == 0 else "-"
    )
    # signs are balanced enough to be a real projection (not all +)
    assert any("-" in p for p in planes) and any("+" in p for p in planes)

    row = load_all()["x_jl_projection"].build(spark, SF).collect()[0]
    assert row["n_pairs"] > 0
    assert 0.6 < row["avg_ratio"] < 1.6, row
    assert row["min_ratio"] > 0
    assert row["n_within"] >= 0.5 * row["n_pairs"], row


def test_prefix_join_is_lossless_vs_brute_force(spark):
    """The AllPairs guarantee: prefix filtering finds EVERY pair with
    true shingle-Jaccard >= 1/2 — pinned against an exhaustive Python
    recomputation (all O(n²) pairs at sf0.001), values included."""
    from music_database_spark.operators.dedup import SHINGLE_LEN

    docs = _docs_pd()
    sets = {}
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        sets[row["doc_id"]] = {
            "\x1f".join(toks[i : i + SHINGLE_LEN])
            for i in range(len(toks) - SHINGLE_LEN + 1)
        }
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if 3 * inter >= len(sets[a]) + len(sets[b]):
                expected[(a, b)] = (inter, round(inter / union, 6))
    rows = load_all()["x_prefix_join"].build(spark, SF).collect()
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["jaccard"]) for r in rows}
    assert got == expected
    assert expected, "testdata has no qualifying pairs — the pin is vacuous"
