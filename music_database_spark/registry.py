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


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry."""
    from .plans import analytics, ddl, relational, scalar, scale, setops, udf_surface, windows  # noqa: F401
    from .operators import constraints, dedup, knn, multimodal, pipeline, textops  # noqa: F401
    from .sources import formats  # noqa: F401
    from .streaming import batch_windows, stateful  # noqa: F401

    return REGISTRY
