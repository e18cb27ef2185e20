"""Query registry — the single source of truth consumed by __spark_entry__.py.

Each registered query is a (build, oracle) pair: `build(spark, sf_dir)`
declares the plan with the DataFrame API (Catalyst optimizes it), and
`oracle` is the equivalent ANSI SQL DuckDB runs on the same parquet for
the driver's differential correctness check. Column names are aliased
identically on both sides (driver hashes values under sorted column
names). Queries with no SQL-expressible oracle register oracle=None and
get a rows-only check.

Determinism conventions for oracle-checked float outputs (SURVEY.md §7.4.5):
double sums are order-dependent across partitionings, so any SUM/AVG over
a double column is computed as SUM(CAST(x AS DECIMAL(18,p))) — exact,
associative, identical on both engines — then cast back to double.

Oracle TYPE rule (round-6, the x_seq_packing lesson): every oracle OUTPUT
column must be an explicitly-cast BIGINT/DOUBLE/VARCHAR/DATE/BOOLEAN.
DuckDB silently widens — a windowed or product SUM over BIGINT is
HUGEINT, a bare decimal literal (1.0) is DECIMAL — and both reach pandas
as float64/object, hashing differently from Spark's bigint/double even
when values are equal. tools/diffcheck.py DESCRIBEs every oracle and
FAILS on HUGEINT/UHUGEINT/DECIMAL outputs; run it before registering.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

BuildFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: BuildFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""
    bench: bool = True


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = True,
) -> Callable[[BuildFn], BuildFn]:
    def deco(fn: BuildFn) -> BuildFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "", bench=bench
        )
        return fn

    return deco


# The round this DRIVER_PRIORITY window was designed against: every name
# in the window had NO row in CORRECTNESS_r02..r{WINDOW_DESIGNED_AFTER_ROUND}
# when the window was rotated. Tests must compute "already verified"
# against rounds <= this constant only, so they stay green after the
# driver stamps the next CORRECTNESS file (the r05/r06 self-expiring-test
# lesson). Re-verification policy: once the never-verified pool is empty
# (round 7 drains it), subsequent windows rotate the OLDEST-verified
# names first — freshness debt, oldest round wins; new additions take
# window slots ahead of re-verifications, capped at the window size.
WINDOW_DESIGNED_AFTER_ROUND = 8

# Round-9 window — second rotation under the re-verification policy.
# Emitted verbatim by `python tools/verified_rounds.py --propose-window`
# against the r02–r08 ledger: no never-verified names remain (the r08
# window closed the union — all 286 registered queries have a driver
# anchor), so the whole window is freshness debt: the 50 stalest
# last-verified names, all anchored in round 3 — the round-3 oracle
# upgrades (x_udaf_norm, x_grouped_map), the round-3 dedup/ANN/streaming
# additions (x_dedup_minhash_md5, x_knn_pq, x_stream_* family), and the
# music q6–q9 block. After round 9, no query's newest driver anchor
# predates round 3's remainder (next rotation drains the rest of r03).
DRIVER_PRIORITY: tuple[str, ...] = (
    "q6_active_users",
    "q7_users_with_counts",
    "q8_avg_rating",
    "q9_distinct_counts",
    "x_asof_join",
    "x_bm25_search",
    "x_corpus_prep_e2e",
    "x_dedup_exact",
    "x_dedup_minhash_md5",
    "x_dedup_ngram_jaccard",
    "x_dedup_simhash_det",
    "x_doc_join",
    "x_dynamic_partition_pruning",
    "x_except",
    "x_format_roundtrip",
    "x_grouped_map",
    "x_grouping_sets",
    "x_knn",
    "x_knn_pq",
    "x_multimodal_features",
    "x_null_partition",
    "x_pagerank",
    "x_pandas_udf",
    "x_runtime_bloom_filter",
    "x_sliding",
    "x_sql_frontdoor",
    "x_stream_dedup",
    "x_stream_session",
    "x_stream_stream_join",
    "x_string_funcs",
    "x_tfidf",
    "x_tumbling",
    "x_udaf_norm",
    "x_union_releases",
    "x_variant_json",
    "x_vec_norm",
    "x_window_family",
    "x_ann_index_ingest",
    "x_ann_index_persist",
    "x_anomaly_mad",
    "x_anomaly_zscore",
    "x_approx_top_k",
    "x_aqe_skew_join",
    "x_bloom_decontaminate",
    "x_bpe_train",
    "x_cdc_apply",
    "x_cluster_kmeans",
    "x_clustering_coef",
    "x_collocations",
    "x_corr_matrix",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry
    reordered so DRIVER_PRIORITY comes first (driver correctness window),
    followed by the rest in registration order."""
    from .plans import analytics, ddl, relational, scalar, scale, setops, sketches, udf_surface, windows  # noqa: F401
    from .operators import basket, constraints, corpus_health, dedup, dedup_eval, graph, knn, knn_eval, linkage, multimodal, pipeline, quality, spans, textops  # noqa: F401
    from .sources import formats, pydatasource  # noqa: F401
    from .streaming import batch_windows, stateful  # noqa: F401

    ordered = {name: REGISTRY[name] for name in DRIVER_PRIORITY if name in REGISTRY}
    # Remainder: oracle-backed queries before rows-only ones (stable
    # within each group) — if a future driver widens its sampling window
    # past 50, the extra slots verify hash-checkable queries first.
    rest = [n for n in REGISTRY if n not in ordered]
    for name in sorted(rest, key=lambda n: (REGISTRY[n].oracle is None, rest.index(n))):
        ordered[name] = REGISTRY[name]
    return ordered
