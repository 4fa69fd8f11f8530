"""Streaming replay tests: the REAL Structured-Streaming engine must
agree with the batch twins the driver verifies against DuckDB.

Replays the events table through a file-source stream in micro-batches
(2 files ⇒ at least 2 triggers ⇒ state crosses a batch boundary, which
is what distinguishes a real streaming run from a one-shot batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs_pipeline_spark.streaming import jobs
from cs_pipeline_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_stream"))
    events = load(spark, "events", SF_DIR)
    # two files ⇒ two micro-batches with maxFilesPerTrigger=1
    events.repartition(2).write.mode("overwrite").parquet(out)
    return out


def _run_stream(spark, stream_df, name, mode="complete"):
    q = (
        jobs.to_memory_sink(stream_df, name, output_mode=mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_matches_batch(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _run_stream(spark, jobs.tumbling_job(stream), "t_tumbling")
    want = jobs.W.tumbling_counts(load(spark, "events", SF_DIR))
    cols = ["win_start", "win_end", "event_type", "n_events", "sum_value"]
    assert _canon(got, cols) == _canon(want, cols)


def test_session_stream_matches_batch(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _run_stream(spark, jobs.session_job(stream), "t_session")
    want = jobs.W.session_stats(load(spark, "events", SF_DIR))
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _canon(got, cols) == _canon(want, cols)


def test_watermark_dedup_stream(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    q = (
        jobs.to_memory_sink(jobs.dedup_job(stream), "t_dedup", "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup")
    n_batch = load(spark, "events", SF_DIR).select("event_id").distinct().count()
    assert got.count() == n_batch
    assert got.select("event_id").distinct().count() == n_batch


def test_stream_is_incremental(spark, events_stream_dir):
    """maxFilesPerTrigger=1 over 2 files must produce ≥2 micro-batches."""
    stream = jobs.read_events_stream(spark, events_stream_dir)
    q = (
        jobs.to_memory_sink(jobs.tumbling_job(stream), "t_incr")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2


def test_stateful_threshold_alerts_matches_batch(spark, tmp_path):
    """applyInPandasWithState replay: per-user state (running quantized
    sum) must survive micro-batch boundaries and reproduce the batch
    twin exactly. Files are written as time-ordered halves with
    increasing mtimes so the file source replays in event order (as a
    log source would deliver)."""
    import os
    import time as _time

    from cs_pipeline_spark.streaming import stateful
    from cs_pipeline_spark.streaming.batch_twins import (
        stream_threshold_alerts,
    )

    src = str(tmp_path / "ordered_events")
    os.makedirs(src)
    ev = load(spark, "events", SF_DIR).orderBy("ts", "event_id")
    rows = ev.count()
    first = ev.limit(rows // 2)
    second = ev.subtract(first)
    first.coalesce(1).write.mode("overwrite").parquet(src + "/b0")
    second.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    # file source orders by modification time: force b0 < b1
    now = _time.time()
    for i, d in enumerate(("b0", "b1")):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(jobs.EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )
    q = (
        stateful.threshold_alerts_stateful(stream)
        .writeStream.format("memory")
        .queryName("t_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_alerts")
    want = stream_threshold_alerts(spark, SF_DIR)
    cols = ["user_id", "event_id", "ts", "cum_value", "level"]
    assert len(q.recentProgress) >= 2  # state crossed a batch boundary
    assert _canon(got, cols) == _canon(want, cols)


def test_stream_static_join_matches_batch(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    customers = load(spark, "customer", SF_DIR)
    got = _run_stream(
        spark, jobs.enrich_job(stream, customers), "t_enrich", mode="append"
    )
    want = jobs.W.enrich_with_customers(
        load(spark, "events", SF_DIR), customers
    )
    cols = ["event_id", "user_id", "event_type", "mktsegment", "value"]
    assert _canon(got, cols) == _canon(want, cols)


def test_watermark_drops_late_rows(spark, tmp_path_factory):
    """A row arriving AFTER the watermark passed its window must be
    dropped by the real engine (the semantics stream_late_data_drop
    pins as a batch twin). File order forces the arrival order:
    batch 1 advances the watermark far past the late row's window,
    batch 2 delivers the late row."""
    import datetime as dt
    import os

    from pyspark.sql import Row

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    out = str(tmp_path_factory.mktemp("late_stream"))

    def _rows(ts_offsets_min, start_id):
        return [
            Row(
                event_id=start_id + i,
                ts=base + dt.timedelta(minutes=m),
                user_id=1,
                event_type="view",
                value=1.0,
                props="{}",
            )
            for i, m in enumerate(ts_offsets_min)
        ]

    # Watermark semantics under test: a late row is GUARANTEED to be
    # dropped only once its window's state was already evicted+emitted
    # (append's emit-once contract); while the state is live a late
    # row may still merge. So: batch 1 advances the watermark past
    # window A, batch 2 triggers A's eviction/emission, batch 3
    # delivers the too-late row for A.
    spark.createDataFrame(_rows([0, 120], 0)).coalesce(1).write.parquet(
        os.path.join(out, "f=1")
    )  # window A gets 1 event; watermark → t+90 after this batch
    spark.createDataFrame(_rows([121], 10)).coalesce(1).write.parquet(
        os.path.join(out, "f=2")
    )  # A (end t+10 ≤ watermark t+90) evicts and EMITS with n=1
    spark.createDataFrame(_rows([5, 125], 20)).coalesce(1).write.parquet(
        os.path.join(out, "f=3")
    )  # t+5 targets the evicted A → must be dropped, never re-emitted
    # the file source orders micro-batches by modification time —
    # pin it so the files replay in order
    import time as _time

    now = _time.time()
    for i, sub in enumerate(("f=1", "f=2", "f=3")):
        d = os.path.join(out, sub)
        mtime = now - 3600 + i * 60
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (mtime, mtime))

    from cs_pipeline_spark.streaming import jobs

    stream = (
        spark.readStream.schema(
            spark.read.parquet(os.path.join(out, "f=1")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(out + "/f=*")
    )
    q = (
        jobs.to_memory_sink(jobs.tumbling_job(stream), "t_late", "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_late").collect()
    win_a = [r for r in rows if r["win_start"] == base]
    # window A emitted exactly once, with ONLY its on-time event —
    # the too-late batch-3 row neither re-emitted nor re-counted it
    assert [r["n_events"] for r in win_a] == [1]


def test_checkpoint_resume_no_reprocessing(spark, tmp_path_factory):
    """Restarting from a checkpoint must process ONLY files that
    arrived after the first run — the offsets log is the exactly-once
    backbone every production sink relies on."""
    import os

    from pyspark.sql import functions as F

    from cs_pipeline_spark.streaming import jobs
    from cs_pipeline_spark.tables import load

    data = str(tmp_path_factory.mktemp("ckpt_data"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_state"))
    sink = str(tmp_path_factory.mktemp("ckpt_sink"))
    events = load(spark, "events", SF_DIR).limit(100).cache()
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.parquet(os.path.join(data, "f=1"))

    schema = events.schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data + "/f=*")
        )
        q = (
            stream.select("event_id", "user_id")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(sink).count() == first.count()

    second.coalesce(1).write.parquet(os.path.join(data, "f=2"))
    run_once()
    # restart resumed from the offsets log: f=1 was NOT re-read, so
    # the sink holds every row exactly once
    got = spark.read.parquet(sink)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()


def test_stateful_record_highs_matches_batch(spark, tmp_path):
    """Custom stateful op #2 replay: the running-max state must
    survive micro-batch boundaries and reproduce the batch twin."""
    import os
    import time as _time

    from cs_pipeline_spark.streaming import stateful
    from cs_pipeline_spark.streaming.batch_twins import stream_record_highs

    src = str(tmp_path / "ordered_events_rh")
    os.makedirs(src)
    ev = load(spark, "events", SF_DIR).orderBy("ts", "event_id")
    rows = ev.count()
    first = ev.limit(rows // 2)
    second = ev.subtract(first)
    first.coalesce(1).write.mode("overwrite").parquet(src + "/b0")
    second.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    now = _time.time()
    for i, d in enumerate(("b0", "b1")):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(jobs.EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )
    q = (
        stateful.record_highs_stateful(stream)
        .writeStream.format("memory")
        .queryName("t_records")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_records")
    want = stream_record_highs(spark, SF_DIR)
    cols = ["user_id", "event_id", "ts", "value"]
    assert len(q.recentProgress) >= 2  # state crossed a batch boundary
    assert _canon(got, cols) == _canon(want, cols)


def test_interval_join_stream_matches_batch(spark, events_stream_dir):
    """The REAL stream-stream band join (watermarks on both sides,
    state crossing micro-batch boundaries) must emit exactly the batch
    pairs."""
    stream = jobs.read_events_stream(spark, events_stream_dir)
    q = (
        jobs.to_memory_sink(
            jobs.interval_join_job(stream), "t_ivjoin", "append"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_ivjoin")
    ev = load(spark, "events", SF_DIR)
    want = jobs.W.error_click_attribution(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "click"),
    )
    cols = ["user_id", "err_id", "err_ts", "click_id", "click_ts"]
    assert want.count() > 0
    assert _canon(got, cols) == _canon(want, cols)


def test_trending_topk_stream_composition(spark, events_stream_dir):
    """The production shape of stream_topk_trending: tumbling counts
    run as a real stream, then the per-window rank applied to the
    emitted (finalized) windows — must equal the batch twin."""
    from pyspark.sql import Window as Win
    from pyspark.sql import functions as F

    stream = jobs.read_events_stream(spark, events_stream_dir)
    counts = _run_stream(spark, jobs.tumbling_job(stream), "t_trend_counts")
    # foreachBatch-side rank over the finalized windows
    per_type = (
        counts.groupBy("win_start", "event_type")
        .agg(F.sum("n_events").alias("n_events"))
    )
    rk = Win.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    got = (
        per_type.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= jobs.W.TREND_K)
    )
    want = jobs.W.trending_topk(load(spark, "events", SF_DIR))
    cols = ["win_start", "rk", "event_type", "n_events"]
    assert _canon(got, cols) == _canon(want, cols)


def test_transform_with_state_profile_matches_batch(spark, tmp_path):
    """Spark-4 transformWithStateInPandas replay: the typed ValueState
    must survive micro-batch boundaries; the LAST Update row per user
    equals the batch twin."""
    import os
    import time as _time

    import pytest

    from cs_pipeline_spark.streaming.stateful_v2 import HAS_TWS

    if not HAS_TWS:
        pytest.skip(
            "transformWithState needs google.protobuf — permanently "
            "absent in this offline container (closed contract, "
            "SURVEY §2.0); this replay runs on any protobuf-equipped "
            "cluster"
        )

    from pyspark.sql import functions as F

    from cs_pipeline_spark.streaming import stateful_v2
    from cs_pipeline_spark.streaming.batch_twins import stream_user_profile

    src = str(tmp_path / "ordered_events_twp")
    os.makedirs(src)
    ev = load(spark, "events", SF_DIR).orderBy("ts", "event_id")
    rows = ev.count()
    first = ev.limit(rows // 2)
    second = ev.subtract(first)
    first.coalesce(1).write.mode("overwrite").parquet(src + "/b0")
    second.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    now = _time.time()
    for i, d in enumerate(("b0", "b1")):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(jobs.EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )
    q = (
        stateful_v2.user_profile_stateful(stream)
        .writeStream.format("memory")
        .queryName("t_profile")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2  # state crossed a batch boundary
    # last emission per user = end state
    emitted = spark.table("t_profile")
    w_last = emitted.groupBy("user_id").agg(
        F.max_by("n_events", "n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
        F.max_by("max_value", "n_events").alias("max_value"),
    )
    want = stream_user_profile(spark, SF_DIR)
    cols = ["user_id", "n_events", "sum_value", "max_value"]
    assert _canon(w_last, cols) == _canon(want, cols)


def test_user_profile_processor_logic():
    """Direct unit drive of the StatefulProcessor: two batches per key,
    state carried between calls, quantized-sum exactness."""
    import math

    import pandas as pd

    from cs_pipeline_spark.streaming.stateful_v2 import UserProfileProcessor

    class _FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class _FakeHandle:
        def __init__(self):
            self.state = _FakeState()

        def getValueState(self, name, schema):
            return self.state

    proc = UserProfileProcessor()
    h = _FakeHandle()
    proc.init(h)
    b1 = pd.DataFrame({"value": [1.5, 2.25, None]})
    out1 = list(proc.handleInputRows((7,), iter([b1]), None))[0]
    assert out1["n_events"].iloc[0] == 3
    assert out1["sum_value"].iloc[0] == 3.75
    assert out1["max_value"].iloc[0] == 2.25
    b2 = pd.DataFrame({"value": [10.0]})
    out2 = list(proc.handleInputRows((7,), iter([b2]), None))[0]
    assert out2["n_events"].iloc[0] == 4
    assert out2["sum_value"].iloc[0] == 13.75
    assert out2["max_value"].iloc[0] == 10.0
    assert h.state.get() == (4, math.floor(13.75 * 1e6 + 0.5), 10_000_000)


def test_foreach_batch_upsert_matches_cdc_apply(spark, tmp_path):
    """foreachBatch upsert loop: per micro-batch, merge the batch's
    last-op-per-key into an accumulating parquet table (delete on
    tombstone). After full replay the table equals the one-shot batch
    CDC apply — the streaming execution of stream_cdc_apply."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from cs_pipeline_spark.streaming.batch_twins import stream_cdc_apply

    src = str(tmp_path / "ordered_events_fb")
    os.makedirs(src)
    ev = load(spark, "events", SF_DIR).orderBy("ts", "event_id")
    rows = ev.count()
    first = ev.limit(rows // 2)
    second = ev.subtract(first)
    first.coalesce(1).write.mode("overwrite").parquet(src + "/b0")
    second.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    now = _time.time()
    for i, d in enumerate(("b0", "b1")):
        for f in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, f), (now + i * 10, now + i * 10))

    table = str(tmp_path / "cdc_state")

    def upsert(batch_df, batch_id):
        # last op per key within the batch
        w = batch_df.withColumn(
            "op",
            F.when(F.col("event_type") == "error", F.lit("D")).otherwise(
                F.lit("U")
            ),
        )
        last = (
            w.withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("user_id")
                    .orderBy(F.col("ts").desc(), F.col("event_id").desc())
                ),
            )
            .filter(F.col("rn") == 1)
            .select("user_id", "value", "ts", "op")
        )
        if os.path.exists(table):
            cur = spark.read.parquet(table)
        else:
            cur = spark.createDataFrame(
                [], "user_id long, final_value double, last_ts timestamp"
            )
        merged = (
            cur.join(last, "user_id", "left_anti")
            .unionByName(
                last.filter(F.col("op") != "D").select(
                    "user_id",
                    F.col("value").alias("final_value"),
                    F.col("ts").alias("last_ts"),
                )
            )
        )
        merged.persist().count()  # materialize before overwrite
        merged.write.mode("overwrite").parquet(table + "_next")
        # atomic-ish swap (test scale)
        import shutil

        if os.path.exists(table):
            shutil.rmtree(table)
        os.rename(table + "_next", table)
        merged.unpersist()

    stream = (
        spark.readStream.schema(jobs.EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(table)
    want = stream_cdc_apply(spark, SF_DIR).drop("n_ops")
    cols = ["user_id", "final_value", "last_ts"]
    assert _canon(got, cols) == _canon(want, cols)


def test_interval_join_stream_matches_batch(spark, events_stream_dir):
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _run_stream(
        spark, jobs.interval_join_job(stream), "t_ivj", mode="append"
    )
    want = jobs.W.error_click_attribution(
        load(spark, "events", SF_DIR).filter(F.col("event_type") == "error"),
        load(spark, "events", SF_DIR).filter(F.col("event_type") == "click"),
    )
    cols = ["user_id", "err_id", "err_ts", "click_id", "click_ts"]
    assert _canon(got, cols) == _canon(want, cols)


def test_interval_join_left_stream_closed_region(spark, events_stream_dir):
    """The outer join's null-padded rows exist ONLY for errors whose
    join band the watermark has closed; inside that closed region the
    stream must match the batch twin exactly."""
    import datetime as dt

    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _run_stream(
        spark, jobs.interval_join_left_job(stream), "t_ivj_left", mode="append"
    )
    ev = load(spark, "events", SF_DIR)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    # closed region: bands that can no longer receive matches under
    # watermark semantics (lookback + watermark delay before max ts)
    horizon = max_ts - dt.timedelta(hours=6) - jobs.W.WATERMARK_DELTA
    want = jobs.W.error_click_attribution_outer(
        ev.filter(F.col("event_type") == "error"),
        ev.filter(F.col("event_type") == "click"),
    ).filter(F.col("err_ts") < F.lit(horizon))
    got_closed = got.filter(F.col("err_ts") < F.lit(horizon))
    cols = ["user_id", "err_id", "err_ts", "click_id", "click_ts"]
    assert _canon(got_closed, cols) == _canon(want, cols)


def test_python_datasource_stream_matches_batch(spark, tmp_path_factory):
    """The custom Python DataSource's STREAMING side must deliver, in
    bounded micro-batches, exactly the rows its batch reader serves —
    and resume from a checkpoint without re-emitting."""
    import time

    from cs_pipeline_spark.sources import pydatasource as P

    try:
        spark.dataSource.register(P.StationObsDataSource)
    except Exception:
        pass
    ckpt = str(tmp_path_factory.mktemp("pyds_ckpt"))
    out = str(tmp_path_factory.mktemp("pyds_out"))
    stream = spark.readStream.format("station_obs").load()
    # continuous micro-batches (1000 rows per read()) until the
    # bounded archive is drained — REAL multi-batch incremental reads
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= P.STREAM_TOTAL:
                    break
            except Exception:
                pass  # first batch not committed yet
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(60)
    got = spark.read.parquet(out)
    assert got.count() == P.STREAM_TOTAL
    want = spark.read.format("station_obs").load()
    cols = ["station_id", "obs_idx", "temp_centi", "rh_centi"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )
    # restart from the same checkpoint: offsets drained → no new rows
    q2 = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == P.STREAM_TOTAL


def test_active_users_stream_matches_batch(spark, events_stream_dir):
    """Chained stateful ops (windowed dedup → count) through the real
    streaming engine must agree with the batch twin."""
    stream = jobs.read_events_stream(spark, events_stream_dir)
    got = _run_stream(
        spark, jobs.active_users_job(stream), "t_active", mode="append"
    )
    want = jobs.W.active_users(load(spark, "events", SF_DIR))
    cols = ["win_start", "win_end", "active_users"]
    # append mode emits only watermark-finalized windows; every emitted
    # window must match the batch result exactly, and with availableNow
    # over bounded input all-but-the-last windows finalize
    got_rows = _canon(got, cols)
    want_rows = _canon(want, cols)
    assert got_rows, "no finalized windows emitted"
    assert set(got_rows) <= set(want_rows)
    assert len(got_rows) >= len(want_rows) - 2


def test_foreachbatch_idempotent_replay(spark, events_stream_dir, tmp_path):
    """Exactly-once from at-least-once: replaying a micro-batch with
    the same batch_id must leave the sink byte-identical."""
    from cs_pipeline_spark.streaming.sinks import (
        idempotent_parquet_writer,
        start_idempotent_stream,
    )

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = jobs.read_events_stream(spark, events_stream_dir)
    q = start_idempotent_stream(stream, out, ckpt)
    q.awaitTermination(120)

    first = spark.read.parquet(out)
    n_first = first.count()
    n_events = load(spark, "events", SF_DIR).count()
    assert n_first == n_events  # every event landed exactly once

    # simulate failure-recovery: re-deliver batch 0's data with the
    # same batch_id — the dynamic overwrite must keep counts stable
    src = spark.read.parquet(out).filter("_batch_id = 0").drop("_batch_id")
    batch0 = spark.createDataFrame(src.collect(), src.schema)  # materialize
    idempotent_parquet_writer(out)(batch0, 0)
    assert spark.read.parquet(out).count() == n_first

    # and a NEW batch id appends without touching the others
    idempotent_parquet_writer(out)(batch0.limit(5), 99)
    assert spark.read.parquet(out).count() == n_first + 5
