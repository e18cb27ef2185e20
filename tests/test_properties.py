"""Property-based checks (SURVEY.md §5.2.3) over the text-operator
primitives with hypothesis-generated corpora: dedup keeps exactly one
row per distinct text, shingling agrees with a reference implementation,
Jaccard pairs are symmetric-free and bounded."""

from __future__ import annotations

import pytest
from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)


def _ref_shingles(text: str, n: int = 5) -> set[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return set()
    return {"\x1f".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=10, deadline=None)
@given(st.lists(texts, min_size=1, max_size=20))
def test_exact_dedup_keeps_one_per_distinct_text(spark, docs):
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    assert kept.count() == len(set(docs))
    # keep-lowest-id rule
    expected_ids = {min(i for i, t in enumerate(docs) if t == u) for u in set(docs)}
    assert {r["doc_id"] for r in kept.collect()} == expected_ids


@settings(max_examples=10, deadline=None)
@given(st.lists(texts, min_size=1, max_size=10))
def test_shingles_match_reference_implementation(spark, docs):
    from music_database_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: set(r["sh"])
        for r in df.select("doc_id", shingles(F.col("text")).alias("sh")).collect()
    }
    for i, t in enumerate(docs):
        assert got[i] == _ref_shingles(t), f"doc {i}: {t!r}"


@settings(max_examples=5, deadline=None)
@given(st.lists(texts, min_size=2, max_size=12))
def test_minhash_pairs_are_canonical_and_bounded(spark, docs):
    """Every reported near-dup pair has id_a < id_b and jaccard in (0, 1]."""
    from music_database_spark.operators.dedup import (
        minhash_signature,
        shingle_frame,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    sh = shingle_frame(df, "doc_id", "text")
    bands = minhash_signature(sh)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
        .collect()
    )
    for r in cand:
        assert r["id_a"] < r["id_b"]
    # identical texts must always band-collide (same signature)
    dup_pairs = {
        (i, j)
        for i in range(len(docs))
        for j in range(i + 1, len(docs))
        if docs[i] == docs[j] and len(docs[i].split(" ")) >= 5
    }
    got_pairs = {(r["id_a"], r["id_b"]) for r in cand}
    assert dup_pairs <= got_pairs


@settings(max_examples=8, deadline=None)
@given(st.lists(texts, min_size=1, max_size=10))
def test_hashed_bow_partitions_token_mass(spark, docs):
    """Feature hashing is a partition of the token multiset: every vector
    entry is a non-negative count and the entries sum to the token count
    (split on ' ' — empty-string tokens from consecutive spaces count,
    matching the split semantics both forms use)."""
    from music_database_spark.functions.vector import hashed_bow

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
        hashed_bow(F.col("text"), 16).alias("vec"),
    ).collect()
    for r in out:
        assert all(v >= 0 for v in r["vec"])
        assert sum(r["vec"]) == r["n_tok"]


def _winnow_py(tokens: list[str]) -> set[int]:
    """Pure-Python mirror of the winnowing expression pipeline
    (tests/test_pipeline.py pins the Spark operator to this exact
    function at sf0.001, so properties proven here transfer)."""
    import hashlib

    from music_database_spark.operators.textops import WINNOW_K, WINNOW_W

    n_kg = len(tokens) - WINNOW_K + 1
    if len(tokens) < WINNOW_K + WINNOW_W - 1:
        return set()
    hs = [
        int(hashlib.md5(" ".join(tokens[i : i + WINNOW_K]).encode()).hexdigest()[:12], 16)
        for i in range(n_kg)
    ]
    return {min(hs[i : i + WINNOW_W]) for i in range(n_kg - WINNOW_W + 1)}


words = st.text(alphabet="ab", min_size=1, max_size=2)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(words, min_size=0, max_size=20),
    st.lists(words, min_size=0, max_size=20),
    st.lists(words, min_size=6, max_size=12),  # >= WINNOW_K + WINNOW_W - 1
)
def test_winnowing_guarantees_shared_run_detection(prefix_a, prefix_b, shared):
    """The MOSS recall guarantee: two docs sharing a run of
    >= w+k-1 tokens ALWAYS share at least one fingerprint (the shared
    run contains a full winnow window, whose minimum is selected in
    both docs), and the fingerprint set is never larger than the
    window count (density bound)."""
    from music_database_spark.operators.textops import WINNOW_K, WINNOW_W

    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    doc_a = prefix_a + shared
    doc_b = prefix_b + shared
    fa, fb = _winnow_py(doc_a), _winnow_py(doc_b)
    assert fa & fb, (doc_a, doc_b)
    for toks, fps in [(doc_a, fa), (doc_b, fb)]:
        n_windows = len(toks) - WINNOW_K - WINNOW_W + 2
        assert 1 <= len(fps) <= n_windows


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([0.0, 0.25, 0.5, 0.9, 0.95, 1.0]),
)
def test_order_statistic_interpolation_matches_numpy(values, q):
    """x_quantile_sample's two-order-statistic interpolation (v_lo +
    frac*(v_hi - v_lo), frac = q(n-1) - floor(q(n-1))) is exactly
    numpy's default 'linear' quantile — for any value multiset and any
    quantile. Pure-Python recomputation of the registered formula."""
    import math

    import numpy as np

    v = sorted(values)
    n = len(v)
    pos = q * (n - 1)
    lo = 1 + int(math.floor(pos))
    hi = min(lo + 1, n)
    frac = pos - math.floor(pos)
    est = v[lo - 1] + frac * (v[hi - 1] - v[lo - 1])
    ref = float(np.quantile(np.array(v), q))
    assert math.isclose(est, ref, rel_tol=1e-12, abs_tol=1e-9), (est, ref, q, n)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=300), st.data())
def test_kmv_estimate_is_slice_invariant_and_exact_below_k(hashes, data):
    """KMV over any hash multiset: the (nk, hk) sketch state from the
    canonical definition equals folding kmv_merge over ANY partition of
    the input, and when fewer than k distinct hashes exist the estimate
    is exact by construction."""
    from music_database_spark.streaming.stateful import K_STREAM_KMV, kmv_merge

    distinct = sorted(set(hashes))
    want = distinct[:K_STREAM_KMV]
    # fold over a random-ish (hypothesis-chosen) 3-way slicing
    i = data.draw(st.integers(min_value=0, max_value=len(hashes)))
    j = data.draw(st.integers(min_value=i, max_value=len(hashes)))
    state = kmv_merge([], hashes[:i])
    state = kmv_merge(state, hashes[i:j])
    state = kmv_merge(state, hashes[j:])
    assert state == want
    if len(distinct) < K_STREAM_KMV:
        assert len(state) == len(distinct)  # estimate = nk = exact count


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=40,
    )
)
def test_components_match_union_find_on_random_graphs(spark, raw_edges):
    """Both distributed component algorithms must agree with a plain
    union-find reference on arbitrary hypothesis-generated graphs —
    chains (the dedicated test) are not the only topology."""
    from music_database_spark.operators.dedup import (
        label_propagation_components,
        star_components,
    )

    pairs = sorted({(min(a, b), max(a, b)) for a, b in raw_edges})
    df = spark.createDataFrame(pairs, "id_a long, id_b long")

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    star, _ = star_components(df)
    assert {r["node"]: r["label"] for r in star.collect()} == want
    prop, _ = label_propagation_components(df)
    assert {r["node"]: r["label"] for r in prop.collect()} == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 12), st.integers(0, 12), st.integers(1, 50)
        ).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=30,
    )
)
def test_sssp_matches_bellman_ford_on_random_weighted_graphs(spark, raw_edges):
    """The distributed bounded-round SSSP must agree with a plain
    Bellman-Ford reference (run to convergence, round-capped the same
    way) on arbitrary hypothesis-generated weighted digraphs —
    including unreachable nodes and parallel edges (min weight wins)."""
    from music_database_spark.operators.graph import sssp_rounds

    # parallel edges: keep the minimum weight, like a groupBy-min build
    best: dict[tuple[int, int], int] = {}
    for a, b, w in raw_edges:
        best[(a, b)] = min(w, best.get((a, b), 10**9))
    edges = [(a, b, w) for (a, b), w in sorted(best.items())]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    rounds = 13  # >= |V| - 1, so bounded == converged on every input

    dist = {0: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b, w in edges:
            if a in dist and dist[a] + w < nxt.get(b, 10**18):
                nxt[b] = dist[a] + w
        if nxt == dist:
            break
        dist = nxt

    got = {r["n"]: r["d"] for r in sssp_rounds(df, 0, rounds).collect()}
    assert got == dist


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(10**6), max_value=10**6), min_size=10, max_size=60
    ),
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=10**9, max_value=10**10),
)
@example(ys=[0] * 17, pos=8, spike=10**9)  # spike on the x-centroid: OLS moves 0
def test_theilsen_median_slope_shrugs_off_a_single_outlier(ys, pos, spike):
    """The 29.3%-breakdown claim stamped on x_theilsen_slope, property-
    tested on the registered formula: corrupting ONE observation of an
    n>=10 series moves the pairwise-slope median by at most the gap to
    the next distinct order statistic (it can only shift rank by n-1 of
    the n(n-1)/2 slopes), while the OLS slope moves unboundedly with
    the spike size. Pure-Python recomputation of both estimators."""
    import math

    n = len(ys)
    pos = pos % n

    def pair_slopes(seq):
        return sorted(
            (seq[j] - seq[i]) / (j - i)
            for i in range(len(seq))
            for j in range(i + 1, len(seq))
        )

    def median(sl):
        return sl[math.ceil(len(sl) * 0.5) - 1]

    def ols(seq):
        m = len(seq)
        sx = m * (m + 1) / 2
        sxx = m * (m + 1) * (2 * m + 1) / 6
        sy = sum(seq)
        sxy = sum((i + 1) * v for i, v in enumerate(seq))
        return (m * sxy - sx * sy) / (m * sxx - sx * sx)

    clean = ys[:]
    dirty = ys[:]
    dirty[pos] += spike
    sl_clean = pair_slopes(clean)
    med_clean, med_dirty = median(sl_clean), median(pair_slopes(dirty))
    # corrupting one point perturbs n-1 of the N=n(n-1)/2 slopes, so the
    # median's RANK moves at most n-1 — bound the value by that window
    k = math.ceil(len(sl_clean) * 0.5) - 1
    lo = sl_clean[max(0, k - (n - 1))]
    hi = sl_clean[min(len(sl_clean) - 1, k + (n - 1))]
    assert lo - 1e-9 <= med_dirty <= hi + 1e-9
    # while OLS follows the spike linearly in the lever arm m*(pos+1)-sum(x):
    # d_ols = spike*|lever|/(m*sxx-sx^2). When the spike lands exactly on the
    # x-centroid (lever == 0, e.g. the pinned 17-zeros/pos=8 example) the OLS
    # slope moves exactly 0 while the median may still shift inside its rank
    # window — so the dominance comparison only applies off-centroid.
    lever = n * (pos + 1) - n * (n + 1) // 2
    if lever == 0:
        assert ols(dirty) == ols(clean)
    else:
        assert abs(ols(dirty) - ols(clean)) >= abs(med_dirty - med_clean)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=80,
             unique=True),
    st.lists(st.integers(min_value=10**6 + 1, max_value=2 * 10**6), max_size=20,
             unique=True),
)
def test_group_sample_membership_is_stable_under_corpus_growth(ids, new_ids):
    """x_group_sample's growth-stability claim on the registered hash:
    adding documents to a stratum can only DISPLACE existing picks with
    smaller-hash newcomers — it never reorders or newly admits an old
    doc that wasn't already ranked higher. The k-sample after growth is
    exactly the k smallest of (old picks ∪ newcomers)."""
    import hashlib

    from music_database_spark.operators.pipeline import GROUP_SAMPLE_K as K

    def hv(d):
        return (int(hashlib.md5(f"gsamp:{d}".encode()).hexdigest()[:8], 16), d)

    before = sorted((hv(d) for d in ids))[:K]
    after = sorted((hv(d) for d in ids + new_ids))[:K]
    merged = sorted(before + [hv(d) for d in new_ids])[:K]
    assert after == merged
    # and survivors keep their relative order
    surv = [x for x in after if x in before]
    assert surv == [x for x in before if x in after]


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**16 - 1),
    st.integers(min_value=0, max_value=15),
    st.integers(min_value=1, max_value=9),
)
def test_luhn_detects_every_single_digit_error(card_int, pos, delta):
    """The error-detection guarantee the Luhn checksum was designed for,
    property-tested on x_pii_scan's registered 16-term formula: altering
    any ONE digit of a card always flips the checksum residue — so a
    checksum-valid card can never become valid again under a single-digit
    corruption (the property that separates card numbers from arbitrary
    16-digit ids)."""

    def luhn_residue(card: str) -> int:
        total = 0
        for i, ch in enumerate(card):
            d = int(ch)
            if (16 - 1 - i) % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10

    card = str(card_int).zfill(16)
    digits = list(card)
    digits[pos] = str((int(digits[pos]) + delta) % 10)
    corrupted = "".join(digits)
    if corrupted != card:
        assert luhn_residue(corrupted) != luhn_residue(card)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60),
)
def test_ks_statistic_bounds_and_identity(xs, ys):
    """x_ks_test's registered ECDF-gap formula: D is in [0, 1], D == 0
    iff the two samples have identical ECDFs, and D == 1 when supports
    are disjoint and ordered. Pure-Python recomputation of the
    collapsed-grid cumulative form the engines evaluate."""

    def ks(a, b):
        grid = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        d = 0.0
        ca = cb = 0
        for v in grid:
            ca += a.count(v)
            cb += b.count(v)
            d = max(d, abs(ca / na - cb / nb))
        return d

    d = ks(xs, ys)
    assert 0.0 <= d <= 1.0
    assert ks(xs, xs) == 0.0
    shifted = [y + 51 for y in ys]  # disjoint, strictly above
    assert ks(xs, shifted) == 1.0
    assert d == ks(ys, xs)  # symmetry


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=2)),
        min_size=2,
        max_size=200,
    )
)
def test_t_closeness_emd_bounds_and_global_zero(rows):
    """x_t_closeness's ordered-EMD: 0 <= EMD <= 1 for every group, and a
    'group' that IS the global population has EMD exactly 0. Recomputed
    with the same n_seg*n_all-scaled integer cumulative fold."""
    k = 4
    n_all = len(rows)
    bucket_tot = [sum(1 for b, _ in rows if b == j) for j in range(k)]
    for seg in {s for _, s in rows}:
        grp = [b for b, s in rows if s == seg]
        n_seg = len(grp)
        cum = 0
        total = 0
        for j in range(k):
            n_j = sum(1 for b in grp if b == j)
            cum += n_j * n_all - n_seg * bucket_tot[j]
            total += abs(cum)
        emd = total / (k - 1) / n_all / n_seg
        assert 0.0 <= emd <= 1.0 + 1e-12
    # the global population against itself: every cumulative term is 0
    cum = 0
    total = 0
    for j in range(k):
        cum += bucket_tot[j] * n_all - n_all * bucket_tot[j]
        total += abs(cum)
    assert total == 0


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=18))
def test_lsh_s_curves_are_monotone_and_ordered_by_rows(i):
    """x_minhash_band_tuning's candidate-probability curves: every
    config's P(candidate|s) = 1-(1-s^r)^b is nondecreasing in s, and at
    any fixed s more rows-per-band (sharper bands) means LOWER candidate
    probability among equal-budget configs — the FP/FN trade the tuner
    prices."""
    configs = [(32, 2), (16, 4), (8, 8), (4, 16)]
    s0, s1 = i * 5 / 100.0, (i + 1) * 5 / 100.0

    def p(s, b, r):
        return 1.0 - (1.0 - s**r) ** b

    probs0 = [p(s0, b, r) for b, r in configs]
    for (b, r), p0 in zip(configs, probs0):
        assert p(s1, b, r) >= p0  # monotone in s
    # at fixed s, candidate probability decreases as r grows (b shrinks)
    assert probs0 == sorted(probs0, reverse=True)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=30,
    ),
    st.booleans(),
)
def test_bfs_levels_match_python_bfs_on_random_graphs(spark, raw_edges, symmetrize):
    """x_bfs's shared bfs_levels loop (adjacency layout + saturation
    early-stop) must agree with a plain-Python BFS on arbitrary
    hypothesis-generated digraphs — including unreachable nodes, sink
    nodes (no out-edges), parallel edges, and the symmetrized case where
    the saturation witness is active."""
    from collections import deque

    from music_database_spark.operators.graph import bfs_levels

    edges = sorted(set(raw_edges))
    if symmetrize:
        edges = sorted(set(edges) | {(b, a) for a, b in edges})
    df = spark.createDataFrame(edges, "src long, dst long")

    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    want = {0: 0}
    q = deque([0])
    while q:
        u = q.popleft()
        for v in adj.get(u, []):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)

    got = {
        r["n"]: r["dist"]
        for r in bfs_levels(df, 0, rounds=13, symmetric=symmetrize).collect()
    }
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-8, max_value=8), min_size=3, max_size=3),
        min_size=2,
        max_size=12,
    )
)
def test_pairwise_cosine_identity_on_arbitrary_vectors(vecs):
    """The x_embed_coherence identity sum_{i<>j}<u_i,u_j> =
    ||sum u||^2 - sum ||u||^2 against a brute-force O(n^2) recompute on
    hypothesis-generated integer vectors (zero vectors map to zero, the
    engine's nrm=0 guard) — pins the math with no engine in the loop."""
    import numpy as np

    m = np.array(vecs, dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    u = np.where(norms[:, None] > 0, m / np.where(norms[:, None] == 0, 1, norms[:, None]), 0.0)
    n = u.shape[0]
    gram = u @ u.T
    brute = gram.sum() - np.trace(gram)
    s = u.sum(axis=0)
    identity = (s * s).sum() - (u * u).sum()
    assert identity == pytest.approx(brute, abs=1e-9)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_stratified_assign_quotas_and_order_invariance(spark, rows):
    """x_stratified_split's assignment helper on ARBITRARY frames: every
    stratum gets exactly floor(0.8n) train and floor(0.9n) train+val,
    and the assignment depends only on ids — row order can't move it."""
    from music_database_spark.operators.corpus_health import stratified_assign

    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = stratified_assign(df, ["stratum"]).collect()
    by: dict[str, dict[str, int]] = {}
    assign: dict[int, str] = {}
    for r in out:
        by.setdefault(r["stratum"], {}).setdefault(r["split"], 0)
        by[r["stratum"]][r["split"]] += 1
        assign[r["doc_id"]] = r["split"]
    for s, d in by.items():
        n = sum(d.values())
        assert d.get("train", 0) == 4 * n // 5, (s, d)
        assert d.get("train", 0) + d.get("val", 0) == 9 * n // 10, (s, d)
    # permutation invariance: reversed input, same per-id assignment
    out2 = stratified_assign(
        spark.createDataFrame(list(reversed(rows)), "doc_id long, stratum string"),
        ["stratum"],
    ).collect()
    assert {r["doc_id"]: r["split"] for r in out2} == assign


def test_stratified_assign_quota_is_exact_not_float_floor(spark):
    """Caller-supplied fractions must cut at the exact rational quota:
    train=0.7 over n=90 is exactly 63, but floor(0.7*90) in binary
    floating point is floor(62.99999999999999) = 62 — the advisor-flagged
    divergence (DuckDB's DECIMAL evaluation of the same literal gives
    63). Pins the integer-div implementation in stratified_assign."""
    from music_database_spark.operators.corpus_health import (
        split_quota_ratio,
        stratified_assign,
    )

    assert split_quota_ratio(0.7) == (7, 10)
    df = spark.createDataFrame([(i, "s") for i in range(90)], "doc_id long, stratum string")
    out = stratified_assign(df, ["stratum"], train=0.7, val=0.9).collect()
    counts: dict[str, int] = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert counts["train"] == 63, counts  # float floor would give 62
    assert counts["train"] + counts["val"] == 81, counts


# --- round-8 consolidation cores -----------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 4)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from(["semijoin", "window"]),
)
def test_candidate_pairs_matches_bruteforce(spark, rows, cap_style):
    """candidate_pairs (the shared banded-join core) on ARBITRARY
    (id, bucket) frames must equal brute-force pair enumeration under
    the same frequency cap, for BOTH historical cap styles."""
    from music_database_spark.operators.dedup import candidate_pairs

    cap = 3
    df = spark.createDataFrame(rows, "id long, bucket int")
    got = {
        (r["id_a"], r["id_b"])
        for r in candidate_pairs(df, ["bucket"], "id", cap=cap, cap_style=cap_style).collect()
    }
    from collections import defaultdict

    by_bucket: dict[int, list[int]] = defaultdict(list)
    for i, b in rows:
        by_bucket[b].append(i)
    want = {
        (a, b)
        for ids in by_bucket.values()
        if len(ids) <= cap
        for a in ids
        for b in ids
        if a < b
    }
    assert got == want


def test_packed_argmin_assign_matches_python_reference(spark):
    """packed_argmin_assign (the shared Lloyd/IVF/ingest argmin) must
    reproduce a plain-Python nearest-centroid with the (dist, cid)
    lexicographic tie-break — including an exact tie."""
    from music_database_spark.operators.knn import packed_argmin_assign

    vecs = [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.5, 0.5]), (3, [2.0, -1.0])]
    cents = [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [9.0, 9.0])]
    rows = spark.createDataFrame(vecs, "vec_id long, emb array<double>")
    cdf = spark.createDataFrame(cents, "cluster_id int, cent array<double>")
    got = {
        r["vec_id"]: (r["cluster_id"], r["dist"])
        for r in packed_argmin_assign(rows, cdf).collect()
    }

    def ref(v):
        best = min(
            (sum((x - y) * (x - y) for x, y in zip(v, c)), cid) for cid, c in cents
        )
        return (best[1], best[0])

    for vid, v in vecs:
        assert got[vid] == ref(v), (vid, got[vid], ref(v))
    # vec 2 is exactly equidistant from centroids 0 and 1: tie goes to
    # the LOWER cluster_id by the (dist, cid) struct order.
    assert got[2][0] == 0


def test_decimal_mean_centroids_matches_numpy(spark):
    """decimal_mean_centroids must equal the per-key numpy mean (the
    decimal accumulator is exact for these values, so equality is
    exact, not approximate)."""
    import numpy as np

    from music_database_spark.operators.knn import decimal_mean_centroids

    data = [
        ("a", [1.0, 2.0, 3.0]),
        ("a", [2.0, 4.0, 6.0]),
        ("a", [0.0, 0.0, 3.0]),
        ("b", [10.0, -2.0, 0.5]),
    ]
    df = spark.createDataFrame(data, "k string, emb array<double>")
    got = {r["k"]: r["cent"] for r in decimal_mean_centroids(df, "k").collect()}
    for k in ("a", "b"):
        want = np.mean([e for kk, e in data if kk == k], axis=0)
        assert got[k] == list(want), (k, got[k], want)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=80),
    st.sampled_from([2, 3, 7, 10]),
)
def test_equidepth_span_derivation_matches_rank_formula(cents_list, n_buckets):
    """The round-8 x_histogram_equidepth rewrite, pinned in pure Python:
    deriving per-bucket (count, lo, hi, ndv) from per-VALUE rank spans
    intersected with the integer bucket ranges must equal bucketing every
    individual rank with (rn*B + n - 1) div n — for any value multiset,
    including all-equal values and n < B."""
    from collections import Counter, defaultdict

    B, n = n_buckets, len(cents_list)
    v = sorted(cents_list)
    # reference: per-rank bucketing (what the unchanged oracle computes)
    ref: dict[int, list[int]] = defaultdict(list)
    for rn, x in enumerate(v, start=1):
        ref[(rn * B + n - 1) // n].append(x)
    want = {
        b: (len(xs), min(xs), max(xs), len(set(xs))) for b, xs in ref.items()
    }
    # span derivation (the rewritten plan's arithmetic)
    got: dict[int, list] = defaultdict(lambda: [0, None, None, 0])
    cum = 0
    for val, c in sorted(Counter(v).items()):
        b0 = ((cum + 1) * B + n - 1) // n
        b1 = ((cum + c) * B + n - 1) // n
        for b in range(b0, b1 + 1):
            overlap = min(cum + c, (b * n) // B) - max(cum, ((b - 1) * n) // B)
            if overlap < 1:
                # B > n can leave a bucket's rank range empty inside a
                # multi-rank value's span; the plan filters these out
                # (k >= 1) — hypothesis found this edge
                continue
            g = got[b]
            g[0] += overlap
            g[1] = val if g[1] is None else min(g[1], val)
            g[2] = val if g[2] is None else max(g[2], val)
            g[3] += 1
        cum += c
    assert {b: tuple(g) for b, g in got.items()} == want


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),  # (price, date), small domains force ties
        min_size=1,
        max_size=40,
    )
)
def test_skyline_per_date_champion_pruning_is_lossless(rows):
    """The round-8 x_skyline rewrite, pinned in pure Python: computing
    the sort-filter skyline over only each date's champion (max price,
    then min key) must return exactly the frontier the full scan
    returns — for any (price, date) multiset including heavy ties."""
    pts = [(k, p, d) for k, (p, d) in enumerate(rows)]

    def frontier(candidates):
        out, best_prior = [], None
        for k, p, d in sorted(candidates, key=lambda t: (-t[1], t[0])):
            if best_prior is None or d > best_prior:
                out.append((k, p, d))
            best_prior = d if best_prior is None else max(best_prior, d)
        return sorted(out)

    full = frontier(pts)
    champs = {}
    for k, p, d in pts:
        if d not in champs or (p, -k) > (champs[d][1], -champs[d][0]):
            champs[d] = (k, p, d)
    assert frontier(champs.values()) == full


# --- Round-9 guard-equivalence properties (HOF-in-Filter lint fixes) ---
# The lint fixes replaced computed-array guards with cheap input-side
# predicates; these properties pin the claimed equivalences over
# arbitrary space-structured strings, not just the synthetic corpus.

guard_texts = st.text(alphabet=" abz\t", min_size=0, max_size=40)


@settings(max_examples=300, deadline=None)
@given(guard_texts)
@example("")
@example("a")
@example("a b")
@example("a  b")
@example(" a ")
@example("a\tb")
@example("\t \t")
def test_has2_regex_equals_nonempty_token_count(s):
    """`[^ ] +[^ ]` matches exactly when single-space split yields >= 2
    nonempty tokens — the x_collocations / x_ngram_lm_score /
    x_bpe_train / CorpusPipeline guard rewrite."""
    import re

    by_split = len([t for t in s.split(" ") if t]) >= 2
    by_regex = re.search("[^ ] +[^ ]", s) is not None
    assert by_regex == by_split


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=" ab", max_size=40))
@example("")
@example("    ")
@example("a  b c d")
@example(" a b c d ")
def test_shingle_guard_token_count_equals_nonempty_shingles(s):
    """size(split(text)) >= SHINGLE_LEN iff the shingle set is nonempty
    — the shingle_frame guard rewrite. Uses the reference shingler so
    the property is independent of the Spark expression. The strategy
    is raw ' ab' text (not joined nonempty words) so split-on-space
    EMPTY tokens, leading/trailing spaces, and multi-space runs — the
    cases where split() keeps empties on both sides — are exercised."""
    from music_database_spark.operators.dedup import SHINGLE_LEN

    toks = s.split(" ")
    assert (len(toks) >= SHINGLE_LEN) == bool(_ref_shingles(s, SHINGLE_LEN))
