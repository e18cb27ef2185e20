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
WINDOW_DESIGNED_AFTER_ROUND = 6

# The driver's correctness pass samples the FIRST 50 entries of queries()
# in dict order. After r02–r06 (50 each, all green), 227 distinct queries
# carry a driver CORRECTNESS row; exactly 50 never got one. This round-7
# window IS that pool — the 43 never-verified oracle-backed queries
# (hash-checked) followed by the 7 rows-only ones (rows-only checked;
# each has an oracle-checked twin on the same plan) — so after round 7
# every one of the 277 registered queries has a driver anchor and the
# verification debt is zero.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- 43 oracle-backed, never driver-verified ---
    # round-6 additions (13)
    "x_dsir_weights",
    "x_pii_scan",
    "x_t_closeness",
    "x_embed_coherence",
    "x_padding_waste",
    "x_contamination_overlap",
    "x_gopher_rules",
    "x_minhash_band_tuning",
    "x_length_mixture",
    "x_tokenizer_fertility",
    "x_ks_test",
    "x_runs_streaks",
    "x_sessionized_bounce",
    # set-ops / frame-spec holdovers
    "x_stream_foreach_batch",
    "x_union_by_name",
    "x_except_all",
    "x_intersect_all",
    "x_moving_avg",
    "x_lag_delta",
    "x_time_range_frame",
    # dedup / ANN holdovers
    "x_dedup_hash_groups",
    "x_dedup_incremental",
    "x_dedup_incremental_band",
    "x_vec_quantize",
    "x_semantic_dedup",
    "x_lsh_curve",
    # text holdovers
    "x_bpe_tokens",
    "x_token_count",
    "x_lang_id_sql",
    "x_fingerprint",
    # stats / time-series holdovers
    "x_winsorize",
    "x_histogram",
    "x_ewma_smooth",
    "x_rolling_slope",
    "x_crosscorr",
    "x_seasonal_dow",
    "x_lorenz_curve",
    "x_wilson_bounds",
    "x_prf_eval",
    "x_cms_join_size",
    "x_drop_manifest",
    "x_assortativity",
    "x_simpson_diversity",
    # --- 7 rows-only, never driver-verified (each has an oracle-checked
    # twin on the same plan shape: x_dedup_minhash_md5, x_dedup_simhash_det,
    # x_dedup_embedding_det, x_knn_lsh_det, x_zorder_layout, ...) ---
    "x_pca_project",
    "x_dedup_minhash",
    "x_dedup_embedding",
    "x_dedup_simhash",
    "x_knn_lsh",
    "x_compaction",
    "x_sorted_layout",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry
    reordered so DRIVER_PRIORITY comes first (driver correctness window),
    followed by the rest in registration order."""
    from .plans import analytics, ddl, relational, scalar, scale, setops, sketches, udf_surface, windows  # noqa: F401
    from .operators import basket, constraints, corpus_health, dedup, graph, knn, linkage, multimodal, pipeline, quality, textops  # noqa: F401
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
