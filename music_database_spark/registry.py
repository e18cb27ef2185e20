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


# The driver's correctness pass samples the FIRST 50 entries of queries()
# in dict order (CORRECTNESS_r02 was exactly the first 50 registrations, so
# round 2 left every operators/ and streaming/ family unverified by the
# driver). This curated order puts at least one representative of every
# SURVEY.md §2 row — S1-S6, P1-P6, J1-J9, A1-A9, O1-O5, U1-U3, F1-F7,
# T1-T6, D1-D3, X1-X5 — inside that window, preferring oracle-backed
# queries. Everything else follows in registration order.
DRIVER_PRIORITY: tuple[str, ...] = (
    "q1_singles_by_artist",   # P2,P3,P5,J1,A1,A2,O1,F2
    "q2_last_in_year",        # A3,A4,F1
    "q4_both_kinds",          # J3,P6
    "q4_intersect",           # U1
    "q4b_only_albums",        # J4
    "q5_top_rated",           # J2
    "q6_active_users",        # J1 (flagship)
    "q7_users_with_counts",   # J7
    "q8_avg_rating",          # A5,A7
    "q9_distinct_counts",     # A6
    "q10_topk",               # O2
    "q11_effective_date",     # F7
    "ddl_roundtrip",          # S1,S2,S3
    "fk_violations",          # S4
    "x_pagerank",             # EXT graph: integer-exact iterative PageRank
    "x_sql_frontdoor",        # P1,S5
    "x_null_partition",       # P4
    "j_large_large",          # J6
    "j_event_window",         # J8,T1
    "q14_local_volume",       # J5
    "x_knn",                  # X3,J9,O3
    "x_grouping_sets",        # A8
    "x_udaf_norm",            # A9
    "x_window_family",        # O3,O4,O5
    "x_asof_join",            # J8
    "x_union_releases",       # U2
    "x_except",               # U3
    "x_string_funcs",         # F3
    "x_vec_norm",             # F4,F5
    "x_variant_json",         # F6,D3
    "x_pandas_udf",           # D1
    "x_grouped_map",          # D2
    "x_runtime_bloom_filter", # J5/scale: runtime semi-join filter exhibit
    "x_dedup_exact",          # X1
    "x_dedup_minhash_md5",    # X2
    "x_dedup_ngram_jaccard",  # X2
    "x_knn_pq",               # X3: product-quantization ADC search
    "x_dedup_simhash_det",    # X2 (engine-portable SimHash)
    "x_doc_join",             # X5
    "x_multimodal_features",  # X5,D1
    "x_bm25_search",          # X4: BM25 ranked retrieval
    "x_tfidf",                # X4
    "x_corpus_prep_e2e",      # X1,X4,S6
    "x_format_roundtrip",     # S5,S6
    "x_dynamic_partition_pruning",  # S5,P5,J5
    "x_tumbling",             # T1
    "x_sliding",              # T2
    "x_stream_session",       # T3,T4 as a TRUE stream (batch twin x_session follows)
    "x_stream_stream_join",   # T6,T4
    "x_stream_dedup",         # T5,T4,X1 — stateful dedup, fully oracle-backed
)


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry
    reordered so DRIVER_PRIORITY comes first (driver correctness window),
    followed by the rest in registration order."""
    from .plans import analytics, ddl, relational, scalar, scale, setops, udf_surface, windows  # noqa: F401
    from .operators import constraints, dedup, graph, knn, linkage, multimodal, pipeline, quality, textops  # noqa: F401
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
