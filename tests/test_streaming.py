"""SURVEY.md §5.2.5 — streaming smoke: the Structured-Streaming
execution of the windowed plans (readStream + watermark + availableNow)
must be batch-equivalent, stream dedup must keep one row per event_id,
and the stream-static join must match its batch twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_database_spark.sources.loader import load_table
from music_database_spark.streaming.batch_windows import (
    stream_dedup_counts,
    stream_session_counts,
    stream_static_join_counts,
    stream_tumbling_counts,
    x_session,
    x_tumbling,
)

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_equals_batch(spark):
    streamed = sorted(
        (r["hour_start"], r["n"]) for r in stream_tumbling_counts(spark, SF).collect()
    )
    batch = sorted(
        (r["hour_start"], r["n"]) for r in x_tumbling(spark, SF).select("hour_start", "n").collect()
    )
    assert streamed == batch


def test_stream_session_equals_batch(spark):
    streamed = sorted(
        (r["user_id"], r["session_start"], r["n_events"])
        for r in stream_session_counts(spark, SF).collect()
    )
    batch = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in x_session(spark, SF).collect()
    )
    assert streamed == batch


def test_stream_dedup_keeps_distinct_event_ids(spark):
    # event_id is unique in the fixture, so dedup-by-id must be lossless.
    streamed = {r["event_type"]: r["n"] for r in stream_dedup_counts(spark, SF).collect()}
    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streamed == batch


def test_stateful_operator_equals_batch(spark):
    """applyInPandasWithState running (count, value-sum) per user must
    equal the batch aggregate once the stream drains."""
    from music_database_spark.streaming.stateful import stream_stateful_user_stats

    out = stream_stateful_user_stats(spark, SF)
    # keep each user's final update (largest n)
    final = {
        r["user_id"]: (r["n"], round(r["value_sum"], 6))
        for r in out.orderBy("user_id", "n").collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["value_sum"], 6))
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .collect()
    }
    assert set(final) == set(batch)
    assert all(final[u][0] == batch[u][0] for u in batch)


def test_stream_static_join_equals_batch(spark):
    streamed = {r["c_nationkey"]: r["n"] for r in stream_static_join_counts(spark, SF).collect()}
    events = load_table(spark, SF, "events")
    customer = load_table(spark, SF, "customer").select("c_custkey", "c_nationkey")
    batch = {
        r["c_nationkey"]: r["n"]
        for r in events.join(customer, events.user_id == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streamed == batch


def test_stream_stream_join_equals_batch(spark):
    from music_database_spark.streaming.batch_windows import stream_stream_join_counts

    streamed = stream_stream_join_counts(spark, SF).count()
    events = load_table(spark, SF, "events")
    v = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    batch = v.join(
        p,
        F.expr("v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"),
    ).count()
    assert streamed == batch > 0


def test_foreach_batch_totals_equal_batch_counts(spark):
    from music_database_spark.registry import load_all

    streamed = {
        r["event_type"]: r["n"]
        for r in load_all()["x_stream_foreach_batch"].build(spark, SF).collect()
    }
    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streamed == batch


def test_foreach_batch_result_survives_a_second_build(spark):
    """The returned frame must be materialized, not a lazy read over the
    fb_ target: a second build sweeps every earlier run's result dirs,
    which previously deleted the first result's backing files before the
    caller collected it (round-10 advisor, latent)."""
    from music_database_spark.registry import load_all

    spec = load_all()["x_stream_foreach_batch"]
    first = spec.build(spark, SF)
    second = spec.build(spark, SF)  # sweeps fb_* from the first run
    rows1 = {(r["event_type"], r["n"]) for r in first.collect()}
    rows2 = {(r["event_type"], r["n"]) for r in second.collect()}
    assert rows1 == rows2 and rows1


def test_stream_sliding_equals_batch(spark):
    from music_database_spark.registry import load_all
    from music_database_spark.streaming.batch_windows import stream_sliding_counts

    streamed = {
        (r["win_start"], r["n"]) for r in stream_sliding_counts(spark, SF).collect()
    }
    batch = {
        (r["win_start"], r["n"])
        for r in load_all()["x_sliding"].build(spark, SF).collect()
    }
    assert streamed == batch


def test_stream_dedup_removes_injected_replays(spark):
    """x_stream_dedup injects every 10th event twice; the watermarked
    dedup must remove exactly the replays, making its count equal the
    batch count — and without dedup the counts must run high."""
    from music_database_spark.registry import load_all

    reg = load_all()
    streamed = {r["event_type"]: r["n"] for r in reg["x_stream_dedup"].build(spark, SF).collect()}
    events = load_table(spark, SF, "events")
    batch = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert streamed == batch
    n_injected = events.filter(F.col("event_id") % 10 == 0).count()
    assert n_injected > 0  # the replay injection is non-empty
    assert sum(streamed.values()) == events.count()  # replays all removed


def test_kmv_merge_batch_boundary_invariance():
    """The streaming sketch's defining property: folding the same hashes
    under ANY batch slicing yields the same final k-min state."""
    from music_database_spark.streaming.stateful import K_STREAM_KMV, kmv_merge

    hashes = [(h * 2654435761) % (2**32) for h in range(500)]  # deterministic spread
    whole = kmv_merge([], hashes)
    for cut1, cut2 in [(1, 2), (100, 400), (250, 250), (0, 499)]:
        state = kmv_merge([], hashes[:cut1])
        state = kmv_merge(state, hashes[cut1:cut2] + hashes[:50])  # replays too
        state = kmv_merge(state, hashes[cut2:])
        assert state == whole
    assert len(whole) == K_STREAM_KMV
    assert whole == sorted(set(hashes))[:K_STREAM_KMV]


def test_stream_kmv_matches_batch_sketch(spark):
    """The drained streaming KMV must equal the batch KMV computed with
    the same hash family over the same rows (Spark-side recomputation;
    the DuckDB oracle re-checks the same identity cross-engine)."""
    from music_database_spark.registry import load_all
    from music_database_spark.streaming.stateful import K_STREAM_KMV

    streamed = {
        r["event_type"]: (r["n_tracked"], r["kmv_estimate"])
        for r in load_all()["x_stream_kmv"].build(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    from pyspark.sql import Window as W

    hs = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("u:"), F.col("user_id").cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    ).distinct()
    rn = hs.withColumn("rn", F.row_number().over(W.partitionBy("event_type").orderBy("h")))
    batch = {}
    for r in (
        rn.filter(F.col("rn") <= K_STREAM_KMV)
        .groupBy("event_type")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("nk"))
        .collect()
    ):
        est = (
            float(r["nk"])
            if r["nk"] < K_STREAM_KMV
            else (K_STREAM_KMV - 1) * 4294967296.0 / r["hk"]
        )
        batch[r["event_type"]] = (r["nk"], round(est, 6))
    assert streamed == batch


def test_python_stream_source_drains_cleanly(spark):
    # Regression: post-drain latestOffset ticks used to crash with
    # PYTHON_STREAMING_DATA_SOURCE_RUNTIME_ERROR because read() returned a
    # plain list for the empty (end==start) batch and PySpark's
    # add_result_to_cache calls next(it) on exactly that case. The drained
    # branch now returns an empty iterator; the stream must survive several
    # idle ticks past the drain point with no exception recorded.
    import time
    import uuid

    from music_database_spark.sources.pydatasource import (
        MIX_ADD,
        MIX_MOD,
        MIX_MUL,
        STREAM_ROWS,
        register_sensorstream,
    )

    register_sensorstream(spark)
    stream = spark.readStream.format("sensorstream").load()
    agg = stream.groupBy("sensor_id").agg(F.sum("raw").cast("bigint").alias("s"))
    table = f"py_stream_drain_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        drained_at = None
        while time.time() < deadline:
            n = spark.sql(
                f"SELECT COUNT(*) AS c FROM {table}"
            ).collect()[0]["c"]
            if n > 0:
                total = spark.sql(
                    f"SELECT SUM(s) AS t FROM {table}"
                ).collect()[0]["t"]
                expected = sum(
                    (i * MIX_MUL + MIX_ADD) % MIX_MOD for i in range(STREAM_ROWS)
                )
                if total == expected:
                    drained_at = time.time()
                    break
            time.sleep(0.2)
        assert drained_at is not None, "stream never drained"
        # Let the runner tick latestOffset against the drained source a few
        # times — this is the window where the old code crashed.
        time.sleep(2.0)
        assert q.exception() is None
        assert q.isActive
    finally:
        q.stop()


def test_stream_cms_grid_equals_batch_grid(spark):
    # Linear-sketch invariance: the drained stream's cumulative grid must
    # equal, cell for cell, a batch grid built from the same rows with
    # the same hash family — independent of microbatch slicing.
    from music_database_spark.registry import load_all
    from music_database_spark.streaming.stateful import CMS_STREAM_D, CMS_STREAM_W

    SF = "/root/testdata/sf0.001"
    streamed = {
        (r["event_type"], r["r"], r["col"]): r["cnt"]
        for r in load_all()["x_stream_cms"].build(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    cells = ev.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(F.lit(f"cms{r}:"), F.col("user_id").cast("string"))
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint"),
                            F.lit(CMS_STREAM_W),
                        ).alias("col"),
                    )
                    for r in range(CMS_STREAM_D)
                ]
            )
        ).alias("c"),
    )
    batch = {
        (r["event_type"], r["r"], r["col"]): r["cnt"]
        for r in cells.groupBy("event_type", "c.r", "c.col")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert streamed == batch


def test_stream_recovery_is_exactly_once(spark):
    # The registered query returns per-sensor totals after a mid-stream
    # kill + checkpoint restart; totals must equal the full generator sums
    # (loss shows as undercount, replay-duplication as overcount).
    from music_database_spark.registry import load_all
    from music_database_spark.sources.pydatasource import (
        MIX_ADD,
        MIX_MOD,
        MIX_MUL,
        N_SENSORS,
        STREAM_ROWS,
    )

    got = {
        r["sensor_id"]: (r["n"], r["sum_raw"])
        for r in load_all()["x_stream_recovery"].build(spark, SF).collect()
    }
    expected = {}
    for i in range(STREAM_ROWS):
        s = i % N_SENSORS
        n, t = expected.get(s, (0, 0))
        expected[s] = (n + 1, t + (i * MIX_MUL + MIX_ADD) % MIX_MOD)
    assert got == expected


class _FakeState:
    """Minimal GroupState stand-in for driving a stateful tracker
    function directly (no stream machinery)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_stream_ewma_tracker_is_slicing_and_order_invariant():
    import pandas as pd

    from music_database_spark.streaming.stateful import _track_ewma

    rows = [(d, m) for d in range(12) for m in [(d + 1) * 1_000_000, 500_000]]

    def run(batches):
        state = _FakeState()
        last = None
        for b in batches:
            pdf = pd.DataFrame(b, columns=["day_idx", "micros"])
            last = next(_track_ewma(("click",), iter([pdf]), state))
        return last.to_dict("records")

    whole = run([rows])
    sliced = run([rows[:5], rows[5:17], rows[17:]])
    reversed_rows = run([list(reversed(rows))])
    assert whole == sliced == reversed_rows
    assert len(whole) == 12


def test_stream_ewma_final_rows_equal_batch_formula(spark):
    import pandas as pd

    from music_database_spark.plans.windows import EWMA_LAGS, EWMA_W
    from music_database_spark.registry import load_all
    from music_database_spark.sources.loader import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").toPandas()
    ev = ev[ev["value"].notna()]
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    ev["micros"] = (ev["value"].round(6) * 1_000_000).round().astype("int64")
    daily = ev.groupby(["event_type", "day"])["micros"].sum().sort_index()
    expected = {}
    for etype in daily.index.get_level_values(0).unique():
        series = daily.loc[etype]
        vals = series.to_numpy()
        for i, day in enumerate(series.index):
            num = den = 0
            for j in range(min(i + 1, EWMA_LAGS)):
                num += int(vals[i - j]) * EWMA_W[j]
                den += EWMA_W[j]
            expected[(etype, str(day))] = round(num / den / 1_000_000.0, 6)
    got = {
        (r["event_type"], r["day"]): r["ewma"]
        for r in load_all()["x_stream_ewma"].build(spark, sf).collect()
    }
    assert got == expected


def test_stream_sample_tracker_is_slicing_and_order_invariant():
    import hashlib

    import pandas as pd

    from music_database_spark.streaming.stateful import (
        K_STREAM_SAMPLE,
        _track_sample,
        sample_merge,
    )

    ids = list(range(1, 40))
    rows = [
        (int(hashlib.md5(f"e:{i}".encode()).hexdigest()[:8], 16), i) for i in ids
    ]

    def run(batches):
        state = _FakeState()
        last = None
        for b in batches:
            pdf = pd.DataFrame(b, columns=["h", "event_id"])
            last = next(_track_sample(("click",), iter([pdf]), state))
        return last.to_dict("records")

    whole = run([rows])
    sliced = run([rows[:7], rows[7:23], rows[23:]])
    reversed_rows = run([list(reversed(rows))])
    assert whole == sliced == reversed_rows
    want = sorted(rows)[:K_STREAM_SAMPLE]
    assert whole[0]["ids"] == [i for _, i in want]
    assert whole[0]["hs"] == [h for h, _ in want]
    assert whole[0]["seen"] == len(rows)
    # merge is idempotent on replays too
    assert sample_merge(want, want) == want
