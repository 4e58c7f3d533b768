"""Streaming incremental validation + multimodal kernels + report."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from advanced_data_profile_spark.operators import constraints as C
from advanced_data_profile_spark.operators.multimodal import (
    audio_features,
    image_features,
    resize_images,
    video_frame_sample,
)
from advanced_data_profile_spark.sources.images import ground_truth, read_images
from advanced_data_profile_spark.streaming.incremental import run_incremental_demo

N_PARTS, ROWS = 4, 250


def test_streaming_violation_counts(spark, images_path):
    checks = [
        C.not_null("caption_not_null", "caption"),
        C.domain("w_domain", (F.col("w") > 0) & (F.col("w") <= 8192), "w"),
    ]
    out = run_incremental_demo(spark, images_path, checks).collect()
    gt = ground_truth(N_PARTS, ROWS)
    by = {r.part_id: r for r in out}
    assert len(by) == N_PARTS
    for p in range(N_PARTS):
        assert by[p].n_rows == ROWS
        assert by[p].caption_not_null == gt[p]["caption_violations"]
        assert by[p].w_domain == gt[p]["w_domain_violations"]


def test_foreach_batch_writes_constraint_results_idempotently(
    spark, images_path, tmp_path
):
    """foreachBatch as the exactly-once sink seam, exercised end to
    end: a multi-batch stream writes per-batch counts, finalize merges
    them into the SAME constraint_results layout the batch pipeline
    writes, the merged rows equal one batch evaluate() pass over the
    same files, and a REPLAYED micro-batch (same batch_id — Structured
    Streaming's crash-recovery contract) changes nothing."""
    from advanced_data_profile_spark.operators.constraints import evaluate
    from advanced_data_profile_spark.streaming.incremental import (
        finalize_stream_results,
        foreach_batch_writer,
        run_stream_to_results,
    )

    checks = [
        C.not_null("caption_not_null", "caption"),
        C.domain("w_domain", (F.col("w") > 0) & (F.col("w") <= 8192), "w"),
    ]
    out = str(tmp_path / "stream_out")
    run_stream_to_results(spark, images_path, checks, out, max_files=2)
    batches = spark.read.parquet(f"{out}/constraint_batches")
    assert batches.select("batch_id").distinct().count() >= 2  # multi-batch

    def key(rows):
        return {
            (r.part_id, r.constraint, r.kind, r.n_rows, r.n_violations, r.passed)
            for r in rows
        }

    merged = key(finalize_stream_results(spark, out, checks).collect())
    batch_results, _ = evaluate(
        read_images(spark, images_path), checks, part_col="part_id"
    )
    assert merged == key(batch_results.collect())

    # batch replay: re-run ONE committed batch's write with the same
    # batch_id and the same input slice — the sink must be a no-op
    first_batch = batches.where(F.col("batch_id") == 0)
    replay_parts = [r.part_id for r in first_batch.select("part_id").collect()]
    writer = foreach_batch_writer(out, checks)
    replay_df = read_images(spark, images_path).where(
        F.col("part_id").isin(replay_parts)
    )
    writer(replay_df, 0)
    assert key(finalize_stream_results(spark, out, checks).collect()) == merged


def test_streaming_rejects_non_rowwise(spark, images_path):
    from advanced_data_profile_spark.streaming.incremental import (
        stream_images,
        streaming_violation_counts,
    )
    stream = stream_images(spark, images_path)
    with pytest.raises(ValueError):
        streaming_violation_counts(stream, [C.unique("u", "image_id")])


def test_image_features(spark, images_path):
    images = read_images(spark, images_path).where(F.col("part_id") == 0)
    feats = image_features(images)
    rows = feats.collect()
    assert len(rows) == ROWS
    ok = [r for r in rows if r.ok]
    gt = ground_truth(N_PARTS, ROWS)[0]
    expected_fails = (gt["corrupt_payloads"] + gt["fmt_violations"]
                      + gt["w_domain_violations"] + gt["dim_mismatch"])
    assert len(rows) - len(ok) == expected_fails
    # random uint8 pixels: channel means near 127.5, brightness ~0.5
    assert all(100 < r.mean_r < 155 for r in ok)
    assert all(0.4 < r.brightness < 0.6 for r in ok)


def test_resize_images(spark, images_path):
    images = read_images(spark, images_path).where(F.col("part_id") == 1).limit(50)
    out = resize_images(images, target=8).collect()
    ok = [r for r in out if r.ok]
    assert all(r.w == 8 and r.h == 8 and len(r.bytes) == 8 * 8 * 3 for r in ok)


def test_audio_features_wav(spark):
    """audio_features is a REAL RIFF/WAVE PCM parser now: proper WAV
    decodes; headerless raw PCM and nulls are rejected as ok=False."""
    from advanced_data_profile_spark.functions.audiocodec import encode_wav

    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.2, 16000).clip(-1, 1)
    raw_pcm = (x * 32767).astype(np.int16).tobytes()
    pdf = pd.DataFrame({
        "clip_id": ["a", "b", "c"],
        "bytes": [encode_wav(x, 16000), None, raw_pcm],
    })
    out = {r.clip_id: r for r in audio_features(spark.createDataFrame(pdf)).collect()}
    assert out["a"].ok and out["a"].duration_sec == pytest.approx(1.0)
    assert 0.1 < out["a"].rms < 0.3
    assert not out["b"].ok
    assert not out["c"].ok  # headerless PCM is not a WAV


def test_video_frame_sample_y4m(spark):
    """Real Y4M frame sampling: every Nth frame decodes to RGB with
    correct dims; neutral-chroma (gray) frames round-trip exactly;
    non-video payloads are ok=False rows."""
    from advanced_data_profile_spark.functions.videocodec import encode_y4m
    from advanced_data_profile_spark.operators.multimodal import video_frame_sample

    frames = [np.full((16, 32, 3), 10 * i, dtype=np.uint8) for i in range(10)]
    payload = encode_y4m(frames, fps=(30, 1))
    pdf = pd.DataFrame({
        "video_id": ["v1", "junk"],
        "bytes": [payload, b"not a video"],
    })
    out = video_frame_sample(spark.createDataFrame(pdf), every_n=3).collect()
    good = sorted((r.frame_idx for r in out if r.video_id == "v1"))
    assert good == [0, 3, 6, 9]
    by_idx = {r.frame_idx: r for r in out if r.video_id == "v1"}
    assert all(r.w == 32 and r.h == 16 and r.ok for r in by_idx.values())
    # gray frames: YUV420 round-trip is exact (U=V=128 -> R=G=B=Y)
    px = np.frombuffer(by_idx[6].bytes, np.uint8).reshape(16, 32, 3)
    assert (px == 60).all()
    junk = [r for r in out if r.video_id == "junk"]
    assert len(junk) == 1 and junk[0].ok is False


def test_video_sample_rejects_image_payloads(spark, images_path):
    images = read_images(spark, images_path).limit(20)
    out = video_frame_sample(
        images.withColumnRenamed("image_id", "video_id")
    ).collect()
    assert out and all(r.ok is False for r in out)  # BMP/raw are not Y4M


def test_streaming_windowed_violations_with_watermark(spark, tmp_path):
    """Event-time windows + watermark over the events stream must match
    the equivalent batch windowed aggregation, and the plan must carry
    the watermark (bounded state / late-data eviction)."""
    from advanced_data_profile_spark.streaming.incremental import (
        streaming_windowed_violations,
    )

    import os
    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    batch = spark.read.parquet(src)
    # FileStreamSource needs a directory of files
    stream_dir = str(tmp_path / "events_dir")
    os.makedirs(stream_dir, exist_ok=True)
    shutil.copy(src, f"{stream_dir}/part-0.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    checks = [C.domain("value_domain", F.col("value") >= 0, "value")]
    agg = streaming_windowed_violations(
        stream, checks, ts_col="ts", window="1 day", watermark="2 days"
    )
    assert "eventTimeWatermark" in agg._jdf.queryExecution().logical().toString() \
        or "EventTimeWatermark" in agg._jdf.queryExecution().logical().toString()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("win_v").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.window_start), str(r.window_end)): (r.n_rows, r.value_domain)
            for r in spark.sql("SELECT * FROM win_v").collect()
        }
    finally:
        q.stop()
    want = {
        (str(r["window"]["start"]), str(r["window"]["end"])): (
            r["n_rows"], r["v"]
        )
        for r in batch.groupBy(F.window("ts", "1 day").alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~(F.col("value") >= 0)).cast("long")).alias("v"),
        )
        .collect()
    }
    assert got == want and len(got) > 3


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: a session closes exactly
    once, in the micro-batch whose events exceed the gap; open sessions
    stay in state."""
    import time as _time

    from advanced_data_profile_spark.streaming.sessionize import streaming_sessionize

    src = str(tmp_path / "events_stream")
    schema = "user_id bigint, ts_sec double, value double"
    batch1 = pd.DataFrame({
        "user_id": [1, 1, 2],
        "ts_sec": [0.0, 100.0, 50.0],
        "value": [1.0, 2.0, 5.0],
    })
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_sessionize(stream, gap_sec=1800.0)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        # nothing closed yet — both sessions still open in state
        assert spark.sql("SELECT * FROM sessions").count() == 0

        _time.sleep(1.1)  # distinct mtime so the new file is a new batch
        batch2 = pd.DataFrame({
            "user_id": [1, 2],
            "ts_sec": [5000.0, 60.0],   # user 1: gap > 1800 closes session
            "value": [9.0, 1.0],
        })
        spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        rows = {r.user_id: r for r in spark.sql("SELECT * FROM sessions").collect()}
        assert 1 in rows and 2 not in rows  # user 2's gap was small
        s = rows[1]
        assert (s.session_start, s.session_end) == (0.0, 100.0)
        assert s.n_events == 2 and s.session_value == 3.0
    finally:
        q.stop()


def test_report_assembly(spark, images_path, tmp_path):
    from advanced_data_profile_spark.plans.pipeline import run_pipeline
    from advanced_data_profile_spark.plans.report import (
        assemble_report,
        read_report,
        write_report,
    )

    out = str(tmp_path / "out")
    run_pipeline(spark, images_path, out)
    report = assemble_report(spark, out)
    assert report["n_partitions"] == N_PARTS
    assert report["total_rows"] == N_PARTS * ROWS
    assert report["overall_passed"] is False  # planted violations
    p0 = report["partitions"]["0"]
    assert p0["constraints"]["caption_not_null"]["n_violations"] == \
        ground_truth(N_PARTS, ROWS)[0]["caption_violations"]
    assert "caption" in p0["columns"]
    path = write_report(report, str(tmp_path / "report.json"))
    assert read_report(path)["n_partitions"] == N_PARTS


class _FakeGroupState:
    """Driver-side stand-in for pyspark's GroupState — lets the
    sessionize kernel's state-machine edges (late events, idle timeout)
    be tested without standing up a streaming query."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def _run_fn(fn, state, ts_vals):
    pdf = pd.DataFrame({
        "ts_sec": [float(t) for t in ts_vals],
        "value": [1.0] * len(ts_vals),
    })
    return pd.concat(list(fn((7,), iter([pdf]), state)), ignore_index=True)


def test_sessionize_late_event_never_moves_session_end_backwards(spark):
    from advanced_data_profile_spark.streaming.sessionize import _sessionize_fn

    fn = _sessionize_fn(gap_sec=30.0)
    state = _FakeGroupState(value=(100.0, 200.0, 2, 5.0))
    out = _run_fn(fn, state, [150.0])  # cross-batch LATE event
    assert len(out) == 0  # merged into the open session, nothing closed
    start, last, n, val = state.get
    assert last == 200.0      # end NOT dragged backwards
    assert start == 100.0
    assert n == 3 and val == 6.0
    # next in-order event within gap of the TRUE end must not split
    out = _run_fn(fn, state, [225.0])
    assert len(out) == 0
    assert state.get[1] == 225.0


def test_sessionize_idle_timeout_emits_open_session(spark):
    from advanced_data_profile_spark.streaming.sessionize import _sessionize_fn

    fn = _sessionize_fn(gap_sec=30.0, idle_timeout_sec=60.0)
    # timeout fired: the open session is closed, emitted once, state dropped
    state = _FakeGroupState(value=(100.0, 200.0, 2, 5.0), timed_out=True)
    out = _run_fn(fn, state, [])
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.session_start, r.session_end, r.n_events) == (100.0, 200.0, 2)
    assert not state.exists
    # normal batch with timeout configured registers the event-time timeout
    state2 = _FakeGroupState()
    _run_fn(fn, state2, [10.0, 20.0])
    assert state2.timeout_ts == int((20.0 + 60.0) * 1000)


def test_streaming_sessionize_timeout_conf_wiring(spark):
    """idle_timeout_sec=None -> NoTimeout (batch-parity); set ->
    EventTimeTimeout. Verified on the logical builder (the plan builds;
    EventTimeTimeout additionally needs a watermark at query start)."""
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

    from advanced_data_profile_spark.streaming.sessionize import (
        streaming_sessionize,
    )

    events = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr(
            "value AS user_id",
            "CAST(value AS DOUBLE) AS ts_sec",
            "CAST(1.0 AS DOUBLE) AS value",
        )
    )
    assert streaming_sessionize(events, gap_sec=10.0).isStreaming
    assert streaming_sessionize(events, gap_sec=10.0, idle_timeout_sec=5.0).isStreaming


def test_streaming_quality_keep_rate_matches_batch(spark, tmp_path):
    """Live corpus-quality monitor: the Gopher/C4 rules aggregated per
    event-time window over a document stream must equal the batch
    keep_rate computed per window, and the plan must carry the
    watermark."""
    import os

    from advanced_data_profile_spark.operators.quality import keep_rate
    from advanced_data_profile_spark.streaming.incremental import (
        streaming_quality_keep_rate,
    )

    good = ("the quick brown fox jumps over the lazy dog and then it "
            "runs back home across the wide green field")
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(
            ["2024-01-01 00:05", "2024-01-01 00:20", "2024-01-01 01:05",
             "2024-01-01 01:10", "2024-01-02 03:00", "2024-01-02 03:30"]
        ),
        "text": [good, "too short", good, good, "junk", good],
    })
    stream_dir = str(tmp_path / "docs_stream")
    os.makedirs(stream_dir, exist_ok=True)
    batch = spark.createDataFrame(pdf)
    batch.coalesce(1).write.mode("overwrite").parquet(stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    agg = streaming_quality_keep_rate(
        stream, "text", ts_col="ts", window="1 hour", watermark="1 day"
    )
    assert "ventTimeWatermark" in agg._jdf.queryExecution().logical().toString()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("q_keep").start()
    )
    try:
        q.processAllAvailable()
        got = {
            str(r.window_start): (r.n_docs, r.n_kept, r.keep_rate)
            for r in spark.sql("SELECT * FROM q_keep").collect()
        }
    finally:
        q.stop()
    want = {
        str(r["window"]["start"]): (r.n_docs, r.n_kept, r.keep_rate)
        for r in keep_rate(
            batch.withColumn("window", F.window("ts", "1 hour")),
            "text", group_by="window",
        ).collect()
    }
    assert got == want
    assert len(got) == 3
    assert got[min(got)] == (2, 1, 0.5)  # first hour: good + too-short


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Ingestion-time exact dedup: duplicate keys arriving within the
    watermark are dropped (first sighting wins); distinct keys pass
    through; state is watermark-bounded (plan carries the watermark)."""
    import os

    from advanced_data_profile_spark.streaming.incremental import streaming_dedup

    pdf = pd.DataFrame({
        "image_id": ["a", "a", "b", "c", "c", "c", "d"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:10",  # dup within watermark
            "2024-01-01 00:20",
            "2024-01-01 01:00", "2024-01-01 01:05", "2024-01-01 01:06",
            "2024-01-01 02:00",
        ]),
        "payload": list(range(7)),
    })
    stream_dir = str(tmp_path / "dedup_stream")
    os.makedirs(stream_dir, exist_ok=True)
    batch = spark.createDataFrame(pdf)
    batch.coalesce(1).write.mode("overwrite").parquet(stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    out = streaming_dedup(stream, ["image_id"], ts_col="ts", watermark="1 hour")
    assert "ventTimeWatermark" in out._jdf.queryExecution().logical().toString()
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("dedup_q").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_q").collect()
    finally:
        q.stop()
    got = sorted((r.image_id, r.payload) for r in rows)
    # first sighting per key survives (all dups here fall within 1h)
    assert got == [("a", 0), ("b", 2), ("c", 3), ("d", 6)]


def test_streaming_sketch_state_merges_with_batch_consumers(
    spark, images_path, tmp_path
):
    """Streamed sketch state is the SAME mergeable state the batch
    pipeline persists: after finalize, (a) the stored-state rollup
    gives distinct estimates within HLL error of exact, and (b)
    sketch drift between a batch pipeline run and the streamed state
    over the IDENTICAL files scores ~zero on every column — the
    cross-path consistency that makes stream- and batch-built
    snapshots comparable."""
    from advanced_data_profile_spark.operators.sketches import (
        rollup_stored_profile_sketches,
    )
    from advanced_data_profile_spark.plans.pipeline import (
        run_pipeline,
        sketch_drift_between_runs,
    )
    from advanced_data_profile_spark.streaming.incremental import (
        finalize_stream_sketches,
        run_stream_sketches,
    )

    stream_out = str(tmp_path / "stream_sk")
    run_stream_sketches(spark, images_path, stream_out, max_files=2)
    batches = spark.read.parquet(f"{stream_out}/profile_sketch_batches")
    assert batches.select("batch_id").distinct().count() >= 2  # multi-batch
    merged = finalize_stream_sketches(spark, stream_out)
    assert set(merged.columns) == {"part_id", "column", "kll", "hll"}

    # (a) rollup over streamed state: distinct estimate ~ exact
    roll = {
        r.column: r
        for r in rollup_stored_profile_sketches(
            spark, f"{stream_out}/profile_sketches"
        ).collect()
    }
    imgs = read_images(spark, images_path)
    exact = imgs.agg(
        F.count_distinct("image_id").alias("ids"),
        F.count_distinct("w").alias("ws"),
    ).collect()[0]
    assert abs(roll["image_id"].n_distinct_est - exact.ids) / exact.ids < 0.05
    assert roll["w"].n_distinct_est == exact.ws  # tiny cardinality: exact
    assert roll["w"].p50 is not None  # numeric column carries KLL state

    # (b) batch-pipeline state vs streamed state over the same files:
    # no drift on any column
    batch_out = str(tmp_path / "batch_sk")
    run_pipeline(spark, images_path, batch_out)
    dv, scores = sketch_drift_between_runs(spark, batch_out, stream_out)
    rows = scores.collect()
    scores.unpersist()
    assert len(rows) >= 3  # w, h, phash at least
    for r in rows:
        assert r.ks <= 0.02 and abs(r.psi) <= 0.01, r


def test_streaming_category_counts_equal_batch(spark, images_path, tmp_path):
    """Stream-built category counts finalize to EXACTLY the batch
    categorical_counts relation over the same files, and score with
    categorical_psi_chi2 identically."""
    from advanced_data_profile_spark.operators.drift import (
        categorical_counts,
        categorical_psi_chi2,
    )
    from advanced_data_profile_spark.streaming.incremental import (
        finalize_stream_categories,
        run_stream_categories,
    )

    out = str(tmp_path / "stream_cat")
    run_stream_categories(spark, images_path, out, columns=["fmt"])
    batches = spark.read.parquet(f"{out}/category_count_batches")
    assert batches.select("batch_id").distinct().count() >= 2
    merged = finalize_stream_categories(spark, out)

    batch = categorical_counts(read_images(spark, images_path), ["fmt"], "part_id")
    key = lambda rows: {  # noqa: E731
        (str(r.grp), r.column, r.category, r.cnt) for r in rows
    }
    assert key(merged.collect()) == key(batch.collect())
    s1 = {(r.grp, r.column): (r.psi, r.chi2)
          for r in categorical_psi_chi2(merged, "0").collect()}
    s2 = {(str(r.grp), r.column): (r.psi, r.chi2)
          for r in categorical_psi_chi2(
              batch.withColumn("grp", F.col("grp").cast("string")), "0"
          ).collect()}
    assert s1 == s2


def test_neardup_batch_writer_incremental_and_replay(spark, tmp_path):
    """Streaming near-dup over the incremental LSH index: batch 1 must
    match only against batch 0's stored state, a crash-REPLAY of batch
    1 must produce identical matches (no self-matches from its first
    attempt's appended rows) and leave the index without duplicated
    batch-1 state — the batch_id-partitioned dynamic-overwrite
    idempotency contract."""
    from advanced_data_profile_spark.streaming.incremental import (
        neardup_batch_writer,
    )

    idx = str(tmp_path / "stream_lsh")
    matches_dir = str(tmp_path / "matches")
    w = neardup_batch_writer(idx, matches_dir, threshold=0.5)

    b0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight again"),
            (2, "distributed query engines shuffle data between executors"),
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight again"),
            (11, "some wholly original text about gardening in winter"),
        ],
        "doc_id long, text string",
    )
    w(b0, 0)  # first batch: nothing prior -> empty matches partition
    w(b1, 1)

    def matches_of(bid):
        return {
            (r.id_new, r.id_indexed, r.est_jaccard)
            for r in spark.read.parquet(matches_dir)
            .where(F.col("batch_id") == bid).collect()
        }

    first = matches_of(1)
    assert first == {(10, 1, 1.0)}

    # crash replay of batch 1: identical output, no self-matches, no
    # duplicated index state
    w(b1, 1)
    assert matches_of(1) == first
    sig = spark.read.parquet(f"{idx}/signatures")
    assert sig.where(F.col("batch_id") == 1).count() == 2  # not 4
    assert sig.count() == 4

    # batch 2 sees BOTH prior batches' state
    b2 = spark.createDataFrame(
        [(20, "some wholly original text about gardening in winter")],
        "doc_id long, text string",
    )
    w(b2, 2)
    assert matches_of(2) == {(20, 11, 1.0)}


def test_streaming_curation_writer_replay_idempotent(spark, tmp_path):
    """Streaming curation over batch_id-partitioned state: batch 2's
    near-dup of a batch-1 survivor is dropped via the stored index, a
    near-copy of a batch-1 quality-reject passes (only survivors are
    indexed), and a crash replay of batch 1 neither double-appends
    survivors nor matches its own first attempt."""
    import pandas as pd

    from advanced_data_profile_spark.streaming.incremental import (
        curation_batch_writer,
    )

    varied = " ".join(
        f"the word{i} and item{i * 7 % 97} of part{i % 13}" for i in range(40)
    )
    state = str(tmp_path / "cur_state")
    wb = curation_batch_writer(state)
    b1 = spark.createDataFrame(
        pd.DataFrame(
            [(1, varied), (2, "x y")], columns=["doc_id", "text"]
        )
    )
    wb(b1, 0)
    wb(b1, 0)  # crash replay, same batch_id
    sigs = spark.read.parquet(f"{state}/index/signatures")
    assert sigs.count() == 1  # survivor of batch 1, once
    b2 = spark.createDataFrame(
        pd.DataFrame(
            [(10, varied + " extra"), (11, "x y z w fresh words appear"),
             (12, "x y")],
            columns=["doc_id", "text"],
        )
    )
    wb(b2, 1)
    from pyspark.sql import functions as F

    v = spark.read.parquet(f"{state}/verdicts")
    out2 = {r.id: r for r in v.where(F.col("batch_id") == 1).collect()}
    assert out2[10].keep_dedup is False        # stored-survivor near-dup
    assert out2[12].keep_quality is False      # quality reject again
    assert out2[12].keep_dedup is True         # reject 2 never indexed
    out1 = {r.id: r for r in v.where(F.col("batch_id") == 0).collect()}
    assert out1[1].keep_final is True and len(out1) == 2
