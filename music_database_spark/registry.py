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
WINDOW_DESIGNED_AFTER_ROUND = 7

# Round-8 window — the first rotation under the re-verification policy
# (the never-verified pool drained in r07). Emitted verbatim by
# `python tools/verified_rounds.py --propose-window` against the
# r02–r07 ledger: (a) the 9 round-7 additions, which predate the r07
# window and so have no driver row yet; then (b) the stalest
# last-verified names, oldest driver round first — the r02-anchored
# q12–q17/q3 family, the three r02 rows-only sketch internals
# (q9b/x_approx_percentiles/x_rolling_distinct_hll, never re-smoked
# under the hardened harness), and the rest of the r02 cohort up to the
# 50-slot cap. After round 8, no query's newest driver anchor predates
# round 3.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- 9 round-7 additions, never driver-verified ---
    "x_char_entropy",
    "x_zipf_fit",
    "x_toxicity_lexicon",
    "x_ngram_novelty",
    "x_burstiness",
    "x_stratified_split",
    "x_dedup_keep_best",
    "x_jl_projection",
    "x_prefix_join",
    # --- 41 stalest re-verifications, all last anchored in r02 ---
    "q12_pricing_summary",
    "q13_shipping_priority",
    "q15_small_quantity_revenue",
    "q16_large_orders",
    "q17_idle_customers",
    "q3_genre_counts",
    "q9b_approx_distinct",
    "x_approx_percentiles",
    "x_calendar_gapfill",
    "x_exists_frontdoor",
    "x_funnel",
    "x_incremental_rollup",
    "x_join_hints",
    "x_json_props",
    "x_merge_upsert",
    "x_observe_metrics",
    "x_percent_change",
    "x_percentiles",
    "x_quantile_binning",
    "x_recursive_cte",
    "x_regression",
    "x_retention_cohorts",
    "x_rolling_distinct_exact",
    "x_rolling_distinct_hll",
    "x_sessionize_lag",
    "x_skew_profile",
    "x_stats_agg",
    "x_try_funcs",
    "ddl_roundtrip",
    "fk_violations",
    "j_event_window",
    "j_large_large",
    "q10_topk",
    "q11_effective_date",
    "q14_local_volume",
    "q1_singles_by_artist",
    "q2_last_in_year",
    "q4_both_kinds",
    "q4_intersect",
    "q4b_only_albums",
    "q5_top_rated",
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
