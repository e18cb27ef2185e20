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
WINDOW_DESIGNED_AFTER_ROUND = 10

# Round-11 window — fourth rotation under the re-verification policy.
# Emitted verbatim by `python tools/verified_rounds.py --propose-window`
# against the r02-r10 ledger: no never-verified names remain, so the
# whole window is freshness debt — the 50 stalest last-verified names.
# The first 36 drain the rest of the round-5 cohort (the window/rank
# family, pivot/rollup, the SQL-UDF surface, the python datasource and
# UDTF registrations, text/corpus stats, layout probes); the last 14
# start on the round-6 names (pk_uniqueness, the recall harnesses, the
# stats battery from x_acf to x_dedup_embedding_det). After round 11,
# no query's newest driver anchor predates round 6.
DRIVER_PRIORITY: tuple[str, ...] = (
    "x_gini_concentration",
    "x_interpolate",
    "x_interval_overlap",
    "x_lateral_topk",
    "x_map_funcs",
    "x_mixture_sample",
    "x_multimodal_transform",
    "x_ngram_lm_score",
    "x_outliers",
    "x_partition_overwrite",
    "x_pipe_syntax",
    "x_pivot",
    "x_posexplode",
    "x_profile",
    "x_python_datasource",
    "x_python_udtf",
    "x_rank_per_group",
    "x_redact",
    "x_repetition_filter",
    "x_resample_ohlc",
    "x_rollup",
    "x_running_sum",
    "x_scd2_history",
    "x_schema_evolution",
    "x_session",
    "x_skyline",
    "x_sql_table_udf",
    "x_sql_udf",
    "x_stream_python_source",
    "x_text_stats",
    "x_token_entropy",
    "x_triangle_count",
    "x_unpivot",
    "x_vocab_coverage",
    "x_window_ignore_nulls",
    "x_zorder_layout",
    "pk_uniqueness",
    "x_acf",
    "x_ann_recall",
    "x_assoc_rules",
    "x_auc_roc",
    "x_benford",
    "x_bfs",
    "x_calibration",
    "x_chi2_independence",
    "x_cms_heavy_hitters",
    "x_conversion_time",
    "x_cusum_changepoint",
    "x_dataset_card",
    "x_dedup_embedding_det",
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
