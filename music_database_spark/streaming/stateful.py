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
