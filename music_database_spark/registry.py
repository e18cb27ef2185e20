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
    # Non-None declares the query's OUTPUT legitimately depends on the
    # physical layout of its input (a layout probe, or an order-sensitive
    # sketch estimator) — the string is the documented WHY. Consumed by
    # tools/layoutcheck.py: exempt queries must still run on the
    # scrambled copy but are not compared across layouts. Declared here,
    # on the registration, so a new order-sensitive query cannot be
    # exempted by editing tool code or prose (round-9 verdict ask #7);
    # tests pin the exempt set.
    layout_exempt: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = True,
    layout_exempt: str | None = None,
) -> Callable[[BuildFn], BuildFn]:
    def deco(fn: BuildFn) -> BuildFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            build=fn,
            oracle=oracle,
            tags=tags,
            doc=fn.__doc__ or "",
            bench=bench,
            layout_exempt=layout_exempt,
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
WINDOW_DESIGNED_AFTER_ROUND = 9

# Round-10 window — third rotation under the re-verification policy.
# Emitted verbatim by `python tools/verified_rounds.py --propose-window`
# against the r02-r09 ledger: no never-verified names remain, so the
# whole window is freshness debt — the 50 stalest last-verified names.
# The first 37 are the remainder of the round-4 cohort (CSV/layout
# sources, the dedup-cluster/recall family, the IVF/PQ kNN variants,
# sampling and drift, the x_stream_* v1 stateful block, winnowing); the
# last 13 drain the oldest round-5 names (x_abtest_lift ...
# x_event_transitions). After round 10, no query's newest driver anchor
# predates round 5.
DRIVER_PRIORITY: tuple[str, ...] = (
    "x_csv_malformed",
    "x_dataset_shard",
    "x_dedup_clusters",
    "x_dedup_clusters_star",
    "x_dedup_containment",
    "x_dedup_corpus",
    "x_dedup_recall",
    "x_distinct_kmv",
    "x_embedding_drift",
    "x_hash_split",
    "x_incremental_agg",
    "x_ivf_recall",
    "x_knn_ivf",
    "x_knn_ivf_trained",
    "x_knn_ivfpq",
    "x_ks_drift",
    "x_lang_id",
    "x_media_phash_dedup",
    "x_nested_schema_pruning",
    "x_null_safe_join",
    "x_partitioned_scan",
    "x_pca_gram",
    "x_pq_recall",
    "x_quality_score",
    "x_quantile_sample",
    "x_salted_join",
    "x_snapshot_diff",
    "x_sql_variables",
    "x_stratified_sample",
    "x_stream_kmv",
    "x_stream_sliding",
    "x_stream_stateful",
    "x_stream_static_join",
    "x_stream_tumbling",
    "x_weighted_sample",
    "x_winnow_candidates",
    "x_winnow_fingerprint",
    "x_abtest_lift",
    "x_arg_extremes",
    "x_array_agg_ordered",
    "x_asof_nearest",
    "x_bucketed_join",
    "x_chunking",
    "x_cogroup_conversions",
    "x_cube",
    "x_decontaminate",
    "x_dedup_lines",
    "x_domain_cap",
    "x_editdist_join",
    "x_event_transitions",
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
