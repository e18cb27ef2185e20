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


# The driver's correctness pass samples the FIRST 50 entries of queries()
# in dict order. After r02–r05 (50 each, r05 fully disjoint), 178
# distinct queries carry a driver CORRECTNESS row; 86 never got one
# (79 oracle-backed + 7 rows-only). This round-6 window is:
#   slot 1      x_seq_packing — r05's one red row; its ORACLE carried a
#               DuckDB HUGEINT `bin` (float64 in pandas vs Spark bigint).
#               Fixed with CAST(... AS BIGINT); kept in the window so the
#               fix is externally verified (round-5 verdict ask #1).
#   slots 2–50  49 of the 79 never-verified oracle-backed queries,
#               leading with the round-5 headline set the verdict named
#               (ask #4), then the riskiest determinism recipes (stream
#               twins, order-dependent float folds, graph fixpoints,
#               privacy/eval stats).
# The 30 oracle-backed queries deferred to round 7 sit immediately after
# the window (so a wider driver window verifies them first); each has a
# driver-green cousin exercising the same plan shape (noted inline).
# Round-7 rotation pool entering next round: those 30 + 7 rows-only +
# the 13 round-6 additions (incl. x_dsir_weights, x_padding_waste,
# x_embed_coherence) = 50 — exactly one 50-slot window drains it.
DRIVER_PRIORITY: tuple[str, ...] = (
    # r05 red row — oracle type bug fixed this round, re-verify
    "x_seq_packing",
    # round-5 verdict headline set (ask #4)
    "x_dedup_embedding_det",
    "x_substring_dedup",
    "x_span_mask",
    "x_kcore",
    "x_bfs",
    "x_sssp_weighted",
    "x_cms_heavy_hitters",
    "x_kmv_setops",
    "x_expectations",
    "x_stream_recovery",
    "x_dataset_card",
    "x_knn_lsh_det",
    "x_ann_recall",
    "pk_uniqueness",
    # streaming twins (slicing-invariant state folds)
    "x_stream_cms",
    "x_stream_ewma",
    "x_stream_group_sample",
    # privacy family (x_dp_noisy_counts oracle also type-hardened this round)
    "x_kanonymity",
    "x_l_diversity",
    "x_dp_noisy_counts",
    # classifier/ranking eval (order-dependent float folds)
    "x_ndcg",
    "x_kappa",
    "x_auc_roc",
    "x_calibration",
    # graph analytics beyond the headline trio
    "x_modularity",
    "x_link_prediction",
    # time-series statistics (n-scaled ratio / cumulative-fold recipes)
    "x_theilsen_slope",
    "x_acf",
    "x_twap",
    "x_forecast_snaive",
    "x_cusum_changepoint",
    "x_segmented_regression",
    "x_poisson_bootstrap",
    # hypothesis tests / distribution audits
    "x_mann_whitney",
    "x_chi2_independence",
    "x_benford",
    "x_histogram_equidepth",
    # sessionization / funnel / segmentation over events
    "x_rfm_segmentation",
    "x_path_mining",
    "x_conversion_time",
    "x_spatial_join",
    # corpus pipeline + ANN tuning exhibits
    "x_normalize_dedup",
    "x_media_frame_dedup",
    "x_assoc_rules",
    "x_ivf_probe_curve",
    "x_lsh_curve_empirical",
    "x_temperature_sample",
    "x_token_budget",
    "x_group_sample",
    # --- driver window ends at 50 entries. The 30 never-verified
    # oracle-backed queries deferred to round 7, each with a driver-green
    # cousin on the same plan shape: x_stream_foreach_batch (streams
    # family pass-D4/D5), x_union_by_name (x_union_releases), x_except_all
    # (x_except), x_intersect_all (q4_intersect), x_moving_avg /
    # x_lag_delta / x_time_range_frame (x_anomaly_zscore + r05 frame
    # family), x_dedup_hash_groups (x_dedup_exact), x_dedup_incremental
    # (_band) (x_dedup family), x_vec_quantize / x_semantic_dedup (ANN
    # recall harness), x_bpe_tokens (x_bpe_train), x_token_count
    # (x_text_stats), x_lang_id_sql (x_lang_id), x_fingerprint
    # (x_winnow_fingerprint), x_lsh_curve (x_lsh_curve_empirical, in
    # window), x_winsorize (x_quantile_binning), x_histogram
    # (x_histogram_equidepth, in window), x_ewma_smooth (x_stream_ewma
    # twin, in window), x_rolling_slope / x_crosscorr (x_theilsen_slope /
    # x_acf recipes, in window), x_seasonal_dow (x_forecast_snaive
    # composes it, in window), x_lorenz_curve (x_gini_concentration
    # pass-D5), x_wilson_bounds (x_abtest_lift pass-D5), x_prf_eval
    # (x_auc_roc/x_calibration, in window), x_cms_join_size
    # (x_cms_heavy_hitters, in window), x_drop_manifest (x_snapshot_diff
    # pass-D), x_assortativity (x_modularity, in window),
    # x_simpson_diversity (x_gini_concentration pass-D5).
    "x_stream_foreach_batch",
    "x_union_by_name",
    "x_except_all",
    "x_intersect_all",
    "x_moving_avg",
    "x_lag_delta",
    "x_time_range_frame",
    "x_dedup_hash_groups",
    "x_dedup_incremental",
    "x_dedup_incremental_band",
    "x_vec_quantize",
    "x_semantic_dedup",
    "x_bpe_tokens",
    "x_token_count",
    "x_lang_id_sql",
    "x_fingerprint",
    "x_lsh_curve",
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
)


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry
    reordered so DRIVER_PRIORITY comes first (driver correctness window),
    followed by the rest in registration order."""
    from .plans import analytics, ddl, relational, scalar, scale, setops, sketches, udf_surface, windows  # noqa: F401
    from .operators import basket, constraints, dedup, graph, knn, linkage, multimodal, pipeline, quality, textops  # noqa: F401
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
