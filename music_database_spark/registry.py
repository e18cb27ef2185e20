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
# in dict order. Rounds 1-4 verified 128 distinct queries (r02+r03+r04,
# 50 each, r04 fully disjoint); 76 registry entries had never received a
# driver CORRECTNESS row at round-5 start. This round-5 window is 50 of
# the then-69 never-verified ORACLE-BACKED queries (VERDICT round-4 ask
# #1); the 60 round-5 additions land past position 50, so after this
# window is recorded the round-6 rotation pool is 87 never-verified
# (registry minus r02∪r03∪r04∪r05),
# spanning window frames, grouping sets, pivot/unpivot, the SQL-UDF +
# UDTF surface, SCD2/interval/interpolation time-series, the dedup/
# pipeline/text backlog, layout/source exhibits, and the two remaining
# true streams. The 19 oracle-backed queries deferred to round 6 are the
# ones most redundantly covered by pass-D cousins (noted inline below);
# every window entry is green in this round's full differential runs, so
# the rotation trades no risk for coverage.
DRIVER_PRIORITY: tuple[str, ...] = (
    # SQL front-door + window/analytic surface (P1, O3-O5, A8)
    "x_pipe_syntax",
    "x_window_ignore_nulls",
    "x_rank_per_group",
    "x_running_sum",
    "x_lateral_topk",
    "x_skyline",
    "x_arg_extremes",
    "x_array_agg_ordered",
    "x_rollup",
    "x_cube",
    "x_pivot",
    "x_unpivot",
    "x_map_funcs",
    # UDF/UDTF surface (D1-D3, U-family)
    "x_sql_udf",
    "x_sql_table_udf",
    "x_python_udtf",
    "x_cogroup_conversions",
    "x_posexplode",
    # time-series: as-of, OHLC, intervals, SCD2, interpolation (J8, O4, O5)
    "x_resample_ohlc",
    "x_asof_nearest",
    "x_scd2_history",
    "x_interval_overlap",
    "x_interpolate",
    "x_event_transitions",
    "x_abtest_lift",
    "x_session",
    # joins & graph (J-family)
    "x_bucketed_join",
    "x_editdist_join",
    "x_triangle_count",
    # dedup / corpus pipeline backlog (X1, X2)
    "x_dedup_lines",
    "x_decontaminate",
    "x_mixture_sample",
    "x_domain_cap",
    "x_seq_packing",
    "x_redact",
    "x_repetition_filter",
    # text analysis backlog (X4)
    "x_text_stats",
    "x_vocab_coverage",
    "x_ngram_lm_score",
    "x_gini_concentration",
    "x_token_entropy",
    "x_chunking",
    "x_profile",
    "x_outliers",
    # multimodal (X5)
    "x_multimodal_transform",
    # sources / layout (S5, S6)
    "x_partition_overwrite",
    "x_schema_evolution",
    "x_zorder_layout",
    "x_python_datasource",
    # true streams (T-family) — incl. the drain-crash regression query
    "x_stream_python_source",
    # --- driver window ends at 50 entries; the rest stay curated so a
    # wider future window verifies oracle-backed queries first. The 19
    # never-verified oracle-backed queries deferred to round 6, each with
    # a driver-verified cousin: x_stream_foreach_batch (streams family
    # pass-D4), pk_uniqueness (fk_violations), x_union_by_name
    # (x_union_releases), x_except_all (x_except), x_intersect_all
    # (q4_intersect), x_moving_avg / x_lag_delta / x_time_range_frame
    # (x_anomaly_zscore frames), x_dedup_hash_groups (x_dedup_exact),
    # x_dedup_incremental(_band) (x_dedup family), x_knn_lsh_det /
    # x_ann_recall / x_vec_quantize / x_semantic_dedup (ANN recall
    # harness), x_bpe_tokens (x_bpe_train), x_token_count (x_text_stats
    # in this window), x_lang_id_sql (x_lang_id), x_fingerprint
    # (x_winnow_fingerprint).
    "x_stream_foreach_batch",
    "pk_uniqueness",
    "x_union_by_name",
    "x_except_all",
    "x_intersect_all",
    "x_moving_avg",
    "x_lag_delta",
    "x_time_range_frame",
    "x_dedup_hash_groups",
    "x_dedup_incremental",
    "x_dedup_incremental_band",
    "x_knn_lsh_det",
    "x_ann_recall",
    "x_vec_quantize",
    "x_semantic_dedup",
    "x_bpe_tokens",
    "x_token_count",
    "x_lang_id_sql",
    "x_fingerprint",
    # round-5 additions (never driver-verified; round-6 window candidates)
    "x_dedup_embedding_det",
    "x_substring_dedup",
    "x_cms_heavy_hitters",
    "x_kcore",
    "x_stream_cms",
    "x_kmv_setops",
    "x_bfs",
    "x_kanonymity",
    "x_expectations",
    "x_span_mask",
    "x_ndcg",
    "x_kappa",
    "x_media_frame_dedup",
    "x_stream_recovery",
    "x_dataset_card",
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
