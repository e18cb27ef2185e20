"""Custom stateful streaming operator (SURVEY.md §2.8 / north-star
"applyInPandasWithState for custom stateful operators").

Per-user running aggregate maintained in explicit state across
microbatches: the state-store shape Structured Streaming gives custom
operators. Each key's state is one tiny tuple (count, value sum, last
seen ts) — at 100 TB keys shuffle-partition across executors and the
state store holds O(distinct users) rows, not O(events).
Spark 4's successor API (transformWithStateInPandas, StatefulProcessor +
ValueState/RocksDB) was probed and is unavailable in this container: its
streaming Python runner needs google.protobuf, whose install here is
broken (round 2: ImportError cannot import name 'descriptor'; re-probed
2026-08-13 round 3: `import google.protobuf` now fails outright with
ModuleNotFoundError: No module named 'google'; re-probed 2026-08-13
round 4: still ModuleNotFoundError — no google namespace package on
sys.path at all), and installs are off-limits. The v1 applyInPandasWithState operator below covers the
custom-stateful surface; the TWS port is mechanical when the runtime
allows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from .batch_windows import _events_stream, _run_available_now

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def _track_user(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this microbatch's rows for one user into the persisted state,
    emit the updated running aggregate."""
    if state.exists:
        n, value_sum = state.get
    else:
        n, value_sum = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        value_sum += float(pdf["value"].sum())
    state.update((n, value_sum))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "value_sum": [value_sum]})


def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the custom stateful operator over the event stream to
    completion; returns one row per user with running (count, value sum)."""
    stream = _events_stream(spark, sf_dir).select("user_id", "value")
    tracked = stream.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_available_now(tracked, "stateful", output_mode="update")


@register(
    "x_stream_stateful",
    tags=("EXT", "T5", "D2"),
    bench=False,
    oracle="""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def x_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible run of the applyInPandasWithState operator, fully
    oracle-checked: the projected column is each user's FINAL running
    count — an integer independent of microbatch boundaries (every
    batching folds the same rows into the same total), so the drained
    stream equals the batch COUNT(*) per user exactly. value_sum stays
    internal: its float accumulation order DOES depend on batch
    boundaries, the textbook reason sums-of-doubles aren't part of the
    cross-engine contract (registry docstring §determinism).
    Batch-equivalence is additionally asserted in
    tests/test_streaming.py."""
    from pyspark.sql import functions as F

    out = stream_stateful_user_stats(spark, sf_dir)
    # update-mode memory sink may hold one row per (key, microbatch):
    # keep each user's final (largest-n) row.
    return (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n", "value_sum")).alias("s"))
        .select("user_id", F.col("s.n").cast("bigint").alias("n"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct sketch (T5 + the x_distinct_kmv family)
# ---------------------------------------------------------------------------

K_STREAM_KMV = 64  # sketch size per key (smaller than batch K: state row stays tiny)
_KMV_SPAN = 4294967296.0  # 2^32, matches plans/sketches.py

KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.LongType()), T.StructField("hashes", T.ArrayType(T.LongType()))]
)

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("seen", T.LongType()),
        T.StructField("nk", T.LongType()),
        T.StructField("hk", T.LongType()),
    ]
)


def kmv_merge(state_hashes: list[int], new_hashes: list[int], k: int = K_STREAM_KMV) -> list[int]:
    """Merge new hashes into a k-minimum-values state: union, dedup,
    keep the k smallest. Associative and commutative — the final state
    is the k smallest DISTINCT hashes of everything ever folded,
    independent of how microbatches sliced the input (the property the
    batch-equivalence oracle relies on)."""
    return sorted(set(state_hashes) | set(new_hashes))[:k]


def _track_kmv(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen, hashes = state.get if state.exists else (0, [])
    hashes = list(hashes)
    for pdf in pdfs:
        seen += len(pdf)
        hashes = kmv_merge(hashes, [int(h) for h in pdf["h"]])
    state.update((seen, hashes))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "seen": [seen],
            "nk": [len(hashes)],
            "hk": [int(hashes[-1])],
        }
    )


def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful KMV operator over the event stream to completion:
    per event_type, state = (rows folded, k smallest distinct md5 hashes
    of user_id). The hash is computed JVM-side BEFORE the stateful op —
    Python only merges small sorted integer lists."""
    from pyspark.sql import functions as F

    stream = _events_stream(spark, sf_dir).select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    tracked = stream.groupBy("event_type").applyInPandasWithState(
        _track_kmv,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_available_now(tracked, "kmv", output_mode="update")


@register(
    "x_stream_kmv",
    tags=("EXT", "T5", "A6", "D2"),
    bench=False,
    oracle=f"""
        WITH hs AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
            FROM events
        ),
        rn AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM hs
        ),
        kth AS (
            SELECT event_type, max(h) AS hk, COUNT(*) AS nk
            FROM rn WHERE rn <= {K_STREAM_KMV} GROUP BY event_type
        )
        SELECT event_type, nk AS n_tracked,
               round(CASE WHEN nk < {K_STREAM_KMV} THEN CAST(nk AS DOUBLE)
                          ELSE {float(K_STREAM_KMV - 1)} * 4294967296.0 / hk END, 6)
                   AS kmv_estimate
        FROM kth ORDER BY event_type
    """,
)
def x_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING cardinality sketch, fully oracle-checked: the custom
    stateful operator maintains a KMV (k-minimum-values) state per
    event_type — the k smallest distinct md5 hashes of user_id — across
    microbatches, and the drained stream's final estimate hash-matches
    the batch KMV the DuckDB oracle computes over the same rows. The
    k-min set of a union is independent of how batches sliced the input
    (kmv_merge is associative+commutative), so unlike a float sum the
    SKETCH ITSELF is batch-boundary-invariant — that is what makes a
    streaming sketch value-checkable at all, and it is the same
    mergeability that lets per-shard sketches union at 100 TB
    (x_distinct_kmv's WindowGroupLimit shape is the batch twin).

    State per key is <= 8(k+1) bytes + overhead, bounded regardless of
    stream length — the sketch answers "distinct users per type so far"
    continuously where an exact COUNT(DISTINCT) would hold every id in
    state forever."""
    from pyspark.sql import functions as F

    out = stream_kmv_distinct(spark, sf_dir)
    # update-mode memory sink holds one row per (key, microbatch); the
    # final state row is the one with the most rows folded ('seen' is
    # strictly increasing for any batch that touches the key).
    final = (
        out.groupBy("event_type")
        .agg(F.max(F.struct("seen", "nk", "hk")).alias("s"))
        .select("event_type", F.col("s.nk").alias("nk"), F.col("s.hk").alias("hk"))
    )
    est = F.when(F.col("nk") < K_STREAM_KMV, F.col("nk").cast("double")).otherwise(
        F.lit(float(K_STREAM_KMV - 1)) * F.lit(_KMV_SPAN) / F.col("hk")
    )
    return final.select(
        "event_type",
        F.col("nk").alias("n_tracked"),
        F.round(est, 6).alias("kmv_estimate"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Streaming count-min sketch (T5 + the x_cms_heavy_hitters family)
# ---------------------------------------------------------------------------

CMS_STREAM_D = 4  # depth, matches the batch CMS hash family ('cms{r}:' seeds)
CMS_STREAM_W = 64  # narrower than batch: the whole grid is ONE state row

CMS_STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.LongType()), T.StructField("grid", T.ArrayType(T.LongType()))]
)

CMS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("seen", T.LongType()),
        T.StructField("r", T.IntegerType()),
        T.StructField("col", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def _track_cms(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold (r, col) cell hits into the persisted D*W grid; emit every
    nonzero cell of the cumulative grid (update-mode sink keeps the
    latest emission per cell via the monotone `seen` counter)."""
    import numpy as np

    seen, grid = state.get if state.exists else (0, [0] * (CMS_STREAM_D * CMS_STREAM_W))
    grid = np.asarray(grid, dtype=np.int64)
    for pdf in pdfs:
        seen += len(pdf)
        np.add.at(grid, pdf["r"].to_numpy() * CMS_STREAM_W + pdf["col"].to_numpy(), 1)
    state.update((seen, [int(x) for x in grid]))
    nz = np.nonzero(grid)[0]
    yield pd.DataFrame(
        {
            "event_type": key[0],
            "seen": seen,
            "r": (nz // CMS_STREAM_W).astype("int32"),
            "col": (nz % CMS_STREAM_W).astype("int32"),
            "cnt": grid[nz],
        }
    )


@register(
    "x_stream_cms",
    tags=("EXT", "T5", "A6", "D2"),
    bench=False,
    oracle=f"""
        SELECT event_type, r.r,
               CAST(CAST('0x' || substr(md5('cms' || r.r || ':' || CAST(user_id AS VARCHAR)),
                                        1, 8) AS BIGINT) % {CMS_STREAM_W} AS INTEGER) AS col,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events CROSS JOIN (SELECT unnest(range(0, {CMS_STREAM_D})) AS r) r
        GROUP BY event_type, r.r, col
        ORDER BY event_type, r.r, col
    """,
)
def x_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING count-min sketch, cell-for-cell hash-checked: the
    stateful operator maintains a D×W CMS grid per event_type across
    microbatches (one bounded array state row per key) and the drained
    stream emits the ENTIRE final grid, which must equal — every cell —
    the grid DuckDB builds from scratch over the same rows. CMS is a
    LINEAR sketch (cell-wise integer sums), so the final grid is
    independent of microbatch slicing; that invariance is exactly what
    lets 1000 executors build per-shard grids and merge them by
    addition, and it is what makes the streaming sketch value-checkable
    at all (same argument as x_stream_kmv's k-min invariance; batch
    twin: x_cms_heavy_hitters).

    The (r, col) cell coordinates are computed JVM-side (md5 family
    shared with the batch CMS) BEFORE the stateful op — Python only
    does vectorized bincount-style adds on a 256-long int array."""
    from pyspark.sql import functions as F

    stream = _events_stream(spark, sf_dir).select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"cms{r}:"), F.col("user_id").cast("string")
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint"),
                            F.lit(CMS_STREAM_W),
                        )
                        .cast("int")
                        .alias("col"),
                    )
                    for r in range(CMS_STREAM_D)
                ]
            )
        ).alias("c"),
    ).select("event_type", "c.r", "c.col")
    tracked = stream.groupBy("event_type").applyInPandasWithState(
        _track_cms,
        outputStructType=CMS_OUTPUT_SCHEMA,
        stateStructType=CMS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_available_now(tracked, "cms", output_mode="update")
    final = (
        out.groupBy("event_type", "r", "col")
        .agg(F.max(F.struct("seen", "cnt")).alias("s"))
        .select("event_type", "r", "col", F.col("s.cnt").alias("cnt"))
    )
    return final.orderBy("event_type", "r", "col")
