"""Structured Streaming tests: incremental results must converge to the
batch answers, watermarks must drop late data, session windows must merge.

File-source streams feed from temp dirs of parquet written by Spark
(micro-batch per file via maxFilesPerTrigger=1)."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.sources.catalog import load_table
from week5_datingnlp_big_data_spark.streaming import counts as sc


def _wait(query, timeout=60):
    query.processAllAvailable()
    return query


def _drop_file(df, tmp_path, in_dir, name):
    """The file stream source lists plain files — stage the dataframe as
    one parquet part and copy it into the watched dir under ``name``."""
    stage = tmp_path / "_stage" / name
    df.coalesce(1).write.parquet(str(stage))
    (tmp_path / in_dir).mkdir(parents=True, exist_ok=True)
    part = glob.glob(str(stage / "part-*.parquet"))[0]
    shutil.copy(part, str(tmp_path / in_dir / name))


def test_streaming_word_counts_converge_to_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    # Two micro-batch files
    _drop_file(docs.filter(F.col("doc_id") < 250), tmp_path, "in", "b1.parquet")
    _drop_file(docs.filter(F.col("doc_id") >= 250), tmp_path, "in", "b2.parquet")

    stream = sc.stream_documents(spark, str(tmp_path / "in"))
    assert stream.isStreaming
    q = sc.run_stream_to_memory(
        sc.streaming_word_counts(stream), "wc_stream", "complete"
    )
    try:
        _wait(q)
        got = {
            r["word"]: r["cnt"] for r in spark.table("wc_stream").collect()
        }
    finally:
        q.stop()

    batch = {
        r["word"]: r["cnt"]
        for r in sc.streaming_word_counts(docs).collect()  # same expr, batch df
    }
    assert got == batch and len(got) > 0


def test_streaming_window_counts_and_late_data(spark, tmp_path):
    rows1 = [
        (1, "2024-01-01 10:05:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:50:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 11:10:00", 2, "view", 2.0, "{}"),
        (4, "2024-01-01 15:00:00", 2, "view", 2.0, "{}"),  # advances watermark far
    ]
    # Batch 2 arrives later: one row just-late (within 2h watermark of max
    # 15:00 → cutoff 13:00) and one very-late row before the cutoff.
    rows2 = [
        (5, "2024-01-01 14:30:00", 1, "click", 1.0, "{}"),  # accepted
        (6, "2024-01-01 10:20:00", 1, "click", 1.0, "{}"),  # dropped (< 13:00)
    ]

    def write(rows, name):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
        ).withColumn("ts", F.to_timestamp("ts"))
        _drop_file(df, tmp_path, "ev", name)

    write(rows1, "b1.parquet")
    stream = sc.stream_events(spark, str(tmp_path / "ev"))
    agg = sc.streaming_event_window_counts(stream, "1 hour", watermark="2 hours")
    q = sc.run_stream_to_memory(agg, "win_stream", "update")
    try:
        _wait(q)
        write(rows2, "b2.parquet")
        _wait(q)
        out = spark.table("win_stream").collect()
    finally:
        q.stop()

    by_key = {}
    for r in out:  # update mode re-emits; keep the last emission per key
        by_key[(str(r["window_start"]), r["event_type"])] = r["n_events"]
    # 10:00 window: rows 1+2 counted; late row 6 (10:20 in batch 2) dropped.
    assert by_key[("2024-01-01 10:00:00", "click")] == 2
    # 14:00 window: just-late row 5 accepted.
    assert by_key[("2024-01-01 14:00:00", "click")] == 1


def test_streaming_exact_dedup(spark, tmp_path):
    rows1 = [(1, "same content"), (2, "same content"), (3, "unique one")]
    rows2 = [(4, "same content"), (5, "another unique")]

    def drop(rows, name):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stage = tmp_path / "_dd" / name
        df.coalesce(1).write.parquet(str(stage))
        (tmp_path / "dd").mkdir(parents=True, exist_ok=True)
        import glob as g, shutil
        shutil.copy(g.glob(str(stage / "part-*.parquet"))[0], str(tmp_path / "dd" / name))

    drop(rows1, "b1.parquet")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "dd"))
    )
    q = sc.run_stream_to_memory(
        sc.streaming_exact_dedup(stream), "dedup_stream", "append"
    )
    try:
        _wait(q)
        drop(rows2, "b2.parquet")
        _wait(q)
        out = spark.table("dedup_stream").collect()
    finally:
        q.stop()
    texts = sorted(r["text"] for r in out)
    # duplicate content emitted once — including the cross-batch dup (4)
    assert texts == ["another unique", "same content", "unique one"]


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    _drop_file(docs.filter(F.col("doc_id") < 100), tmp_path, "fb", "b1.parquet")
    _drop_file(docs.filter(F.col("doc_id").between(100, 199)), tmp_path, "fb", "b2.parquet")

    stream = sc.stream_documents(spark, str(tmp_path / "fb"))
    q = sc.run_stream_to_parquet(
        stream.select("doc_id", "lang"),
        str(tmp_path / "fb_out"),
        str(tmp_path / "fb_ckpt"),
    )
    try:
        _wait(q)
    finally:
        q.stop()
    out = spark.read.parquet(str(tmp_path / "fb_out"))
    assert out.count() == 200
    assert out.select("_batch_id").distinct().count() == 2


def test_streaming_sliding_windows(spark, tmp_path):
    rows = [
        (1, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:40:00", 1, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    _drop_file(df, tmp_path, "sl", "b1.parquet")
    stream = sc.stream_events(spark, str(tmp_path / "sl"))
    agg = sc.streaming_event_window_counts(
        stream, "1 hour", slide_duration="30 minutes", watermark="2 hours"
    )
    q = sc.run_stream_to_memory(agg, "slide_stream", "update")
    try:
        _wait(q)
        out = spark.table("slide_stream").collect()
    finally:
        q.stop()
    # Sliding 1h/30m: event at 10:10 falls in [9:30,10:30) and [10:00,11:00);
    # event at 10:40 falls in [10:00,11:00) and [10:30,11:30).
    counts = {str(r["window_start"]): r["n_events"] for r in out}
    assert counts["2024-01-01 09:30:00"] == 1
    assert counts["2024-01-01 10:00:00"] == 2
    assert counts["2024-01-01 10:30:00"] == 1


def test_streaming_restart_from_checkpoint(spark, sf_dir, tmp_path):
    # foreachBatch + checkpoint: stop the query, restart it, feed more
    # data — the restarted query must resume (no reprocessing of batch 1,
    # no lost batch 2).
    docs = load_table(spark, sf_dir, "documents")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drop_file(docs.filter(F.col("doc_id") < 50), tmp_path, "rs", "b1.parquet")

    stream = sc.stream_documents(spark, str(tmp_path / "rs"))
    q1 = sc.run_stream_to_parquet(stream.select("doc_id"), out, ckpt, "restart_q")
    _wait(q1)
    q1.stop()
    n1 = spark.read.parquet(out).count()

    _drop_file(docs.filter(F.col("doc_id").between(50, 99)), tmp_path, "rs", "b2.parquet")
    stream2 = sc.stream_documents(spark, str(tmp_path / "rs"))
    q2 = sc.run_stream_to_parquet(stream2.select("doc_id"), out, ckpt, "restart_q")
    _wait(q2)
    q2.stop()
    back = spark.read.parquet(out)
    assert n1 == 50
    assert back.count() == 100                      # no duplicates, no loss
    assert back.select("doc_id").distinct().count() == 100


def test_streaming_sessions_merge(spark, tmp_path):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 1, "click", 1.0, "{}"),   # same session
        (3, "2024-01-01 12:00:00", 1, "click", 1.0, "{}"),   # new session
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    _drop_file(df, tmp_path, "sess", "b1.parquet")

    stream = sc.stream_events(spark, str(tmp_path / "sess"))
    q = sc.run_stream_to_memory(
        sc.streaming_sessions(stream, gap="30 minutes"), "sess_stream", "complete"
    )
    try:
        _wait(q)
        out = spark.table("sess_stream").collect()
    finally:
        q.stop()
    sessions = sorted((str(r["session_start"]), r["n_events"]) for r in out)
    assert sessions == [
        ("2024-01-01 10:00:00", 2),
        ("2024-01-01 12:00:00", 1),
    ]


def test_stream_events_handles_nanos_parquet(spark, sf_dir, tmp_path):
    """The driver has shipped events.ts as both timestamp[us] and
    timestamp[ns]; stream_events must sniff the footer and read either,
    truncating nanos to micros exactly like catalog.load_table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = load_table(spark, sf_dir, "events").limit(200).collect()
    tbl = pa.table({
        "event_id": pa.array([r["event_id"] for r in ev], pa.int64()),
        "ts": pa.array([r["ts"] for r in ev], pa.timestamp("ns")),
        "user_id": pa.array([r["user_id"] for r in ev], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in ev], pa.string()),
        "value": pa.array([r["value"] for r in ev], pa.float64()),
        "props": pa.array([r["props"] for r in ev], pa.string()),
    })
    ns_dir = tmp_path / "ns_events"
    ns_dir.mkdir()
    pq.write_table(tbl, str(ns_dir / "events.parquet"))

    stream = sc.stream_events(spark, str(ns_dir))
    q = sc.run_stream_to_memory(
        sc.streaming_event_window_counts(stream), "ns_stream_check"
    )
    try:
        _wait(q)
    finally:
        q.stop()
    got = spark.table("ns_stream_check").agg(F.sum("n_events")).first()[0]
    assert got == 200


def test_streaming_pii_scrub_matches_batch(spark, sf_dir, tmp_path):
    """The round-4 per-row quality operators compose with readStream
    unchanged (pure narrow transforms): PII-scrubbing a document stream
    yields exactly the batch scrub of the same rows."""
    from week5_datingnlp_big_data_spark.operators import textstats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pii = docs.withColumn(
        "text",
        F.concat(
            F.coalesce("text", F.lit("")),
            F.lit(" mail u"), F.col("doc_id"), F.lit("@ex.org"),
        ),
    )
    _drop_file(pii.filter(F.col("doc_id") < 250), tmp_path, "in", "b1.parquet")
    _drop_file(pii.filter(F.col("doc_id") >= 250), tmp_path, "in", "b2.parquet")

    stream = sc.stream_documents(spark, str(tmp_path / "in")).select("doc_id", "text")
    q = sc.run_stream_to_memory(
        textstats.pii_scrub(stream), "pii_stream", "append"
    )
    try:
        _wait(q)
        got = sorted(map(tuple, spark.table("pii_stream").collect()))
    finally:
        q.stop()
    want = sorted(map(tuple, textstats.pii_scrub(pii).collect()))
    assert got == want and len(got) == 500
    assert all("@" not in r[-1] for r in got)


def test_streaming_bloom_dedup_incremental(spark, tmp_path):
    """Cross-batch Bloom membership: content already ingested in an earlier
    micro-batch must flag maybe_seen in later batches (no false negatives
    across the stream), content never seen must pass when the filter is
    sized properly, and the versioned filter state must equal the batch
    build over everything ingested."""
    from week5_datingnlp_big_data_spark.operators import dedup

    rows1 = [(i, f"first wave doc {i}") for i in range(40)]
    rows2 = (
        [(100 + i, rows1[i][1]) for i in range(10)]          # replays of batch 1
        + [(200 + i, f"second wave doc {i}") for i in range(30)]
    )
    rows3 = [(300, rows2[15][1]), (301, "third wave fresh")]  # replay of batch 2

    def drop(rows, name):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stage = tmp_path / "_bl" / name
        df.coalesce(1).write.parquet(str(stage))
        (tmp_path / "bl").mkdir(parents=True, exist_ok=True)
        import glob as g, shutil
        shutil.copy(g.glob(str(stage / "part-*.parquet"))[0], str(tmp_path / "bl" / name))

    drop(rows1, "b1.parquet")
    drop(rows2, "b2.parquet")
    drop(rows3, "b3.parquet")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "bl"))
    )
    q = sc.streaming_bloom_dedup(
        stream,
        out_dir=str(tmp_path / "bl_out"),
        state_dir=str(tmp_path / "bl_state"),
        checkpoint_dir=str(tmp_path / "bl_ckpt"),
        num_words=256,
        num_hashes=7,
    )
    try:
        _wait(q)
    finally:
        q.stop()

    out = {r.doc_id: r.maybe_seen for r in spark.read.parquet(str(tmp_path / "bl_out")).collect()}
    assert len(out) == 82
    # batch 1 is all-new against an empty filter
    assert not any(out[i] for i in range(40))
    # replays of earlier batches must flag — the no-false-negative law
    assert all(out[100 + i] for i in range(10))
    assert out[300] is True
    # fresh content passes (filter is amply sized: 256*63 bits, 70 docs)
    assert not any(out[200 + i] for i in range(30))
    assert out[301] is False

    # final state version == batch-mode build over all ingested docs
    import glob as g
    latest = sorted(
        g.glob(str(tmp_path / "bl_state" / "v*")),
        key=lambda p: int(p.rsplit("v", 1)[1]),
    )[-1]
    state = sorted(map(tuple, spark.read.parquet(latest).collect()))
    everything = spark.createDataFrame(rows1 + rows2 + rows3, "doc_id long, text string")
    want = sorted(
        map(tuple, dedup.bloom_filter_build(everything, num_words=256, num_hashes=7).collect())
    )
    assert state == want


def test_streaming_minhash_matches_batch(spark, sf_dir, tmp_path):
    """The union of pairs emitted across micro-batches (within-batch +
    new-vs-history) must equal the one-shot batch jaccard_near_dups over
    the concatenated corpus — the append-only incremental-dedup law."""
    from week5_datingnlp_big_data_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    parts = [
        docs.filter(F.col("doc_id") % 3 == i).persist() for i in range(3)
    ]
    for i, p in enumerate(parts):
        _drop_file(p, tmp_path, "mh_in", f"b{i}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "mh_in"))
    )
    q = sc.streaming_minhash_near_dups(
        stream,
        out_dir=str(tmp_path / "mh_out"),
        state_dir=str(tmp_path / "mh_state"),
        checkpoint_dir=str(tmp_path / "mh_ckpt"),
        threshold=0.5,
    )
    try:
        _wait(q, timeout=180)
    finally:
        q.stop()

    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "mh_out")).collect()
    }
    want = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_near_dups(docs, threshold=0.5).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_snapshot_diff_incremental(spark, tmp_path):
    """CDC classification across micro-batches: first sight of an id is
    'added', a re-crawl with identical content is 'unchanged', with new
    content 'changed'; the final state must equal the latest-hash table
    over everything ingested (batch-mode reconciliation)."""
    rows1 = [(i, f"page {i} v1") for i in range(20)]
    rows2 = (
        [(i, f"page {i} v1") for i in range(5)]        # unchanged re-crawl
        + [(i, f"page {i} v2") for i in range(5, 10)]  # changed re-crawl
        + [(100 + i, f"new page {i}") for i in range(5)]
    )

    def drop(rows, name):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stage = tmp_path / "_sd" / name
        df.coalesce(1).write.parquet(str(stage))
        (tmp_path / "sd").mkdir(parents=True, exist_ok=True)
        shutil.copy(
            glob.glob(str(stage / "part-*.parquet"))[0], str(tmp_path / "sd" / name)
        )

    drop(rows1, "b1.parquet")
    drop(rows2, "b2.parquet")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "sd"))
    )
    q = sc.streaming_snapshot_diff(
        stream,
        out_dir=str(tmp_path / "sd_out"),
        state_dir=str(tmp_path / "sd_state"),
        checkpoint_dir=str(tmp_path / "sd_ckpt"),
    )
    try:
        _wait(q)
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "sd_out"))
    by_batch = {
        (r.doc_id, r._batch_id): r.status for r in out.collect()
    }
    assert all(by_batch[(i, 0)] == "added" for i in range(20))
    assert all(by_batch[(i, 1)] == "unchanged" for i in range(5))
    assert all(by_batch[(i, 1)] == "changed" for i in range(5, 10))
    assert all(by_batch[(100 + i, 1)] == "added" for i in range(5))

    # final state == latest hash per id over the whole ingest
    latest = sorted(
        glob.glob(str(tmp_path / "sd_state" / "v*")),
        key=lambda p: int(p.rsplit("v", 1)[1]),
    )[-1]
    state = {
        r.doc_id: r.content_hash for r in spark.read.parquet(latest).collect()
    }
    want_rows = {i: f"page {i} v1" for i in range(20)}
    want_rows.update({i: f"page {i} v2" for i in range(5, 10)})
    want_rows.update({100 + i: f"new page {i}" for i in range(5)})
    expect = {
        r.doc_id: r.h
        for r in spark.createDataFrame(
            list(want_rows.items()), "doc_id long, text string"
        ).select("doc_id", F.sha2("text", 256).alias("h")).collect()
    }
    assert state == expect


def test_streaming_shard_manifest_equals_batch(spark, tmp_path):
    """Incrementally-merged manifest over 3 micro-batches must equal the
    batch manifest of the full corpus — the mergeability contract that
    lets a consumer verify a streaming export like a batch one."""
    import glob as g
    import shutil

    from week5_datingnlp_big_data_spark.operators import shards

    batches = [
        [(i, f"wave one doc {i} text") for i in range(50)],
        [(100 + i, f"wave two doc {i} other text") for i in range(40)],
        [(200 + i, f"wave three {i}") for i in range(30)],
    ]

    def drop(rows, name):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stage = tmp_path / "_mf" / name
        df.coalesce(1).write.parquet(str(stage))
        (tmp_path / "mf").mkdir(parents=True, exist_ok=True)
        shutil.copy(
            g.glob(str(stage / "part-*.parquet"))[0], str(tmp_path / "mf" / name)
        )

    for i, rows in enumerate(batches):
        drop(rows, f"b{i}.parquet")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "mf"))
    )
    q = sc.streaming_shard_manifest(
        stream,
        state_dir=str(tmp_path / "mf_state"),
        checkpoint_dir=str(tmp_path / "mf_ckpt"),
        n_shards=4,
    )
    try:
        _wait(q)
    finally:
        q.stop()
    import pathlib

    versions = sorted(
        pathlib.Path(tmp_path / "mf_state").glob("v*"),
        key=lambda d: int(d.name[1:]),
    )
    final = sorted(map(tuple, spark.read.parquet(str(versions[-1])).collect()))
    all_rows = [r for b in batches for r in b]
    whole = sorted(map(tuple, shards.shard_manifest(
        spark.createDataFrame(all_rows, "doc_id long, text string"), 4
    ).collect()))
    assert final == whole


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path):
    """Stateful funnel state machine: final per-user progress after
    time-ordered micro-batches equals the batch funnel's step counts."""
    from week5_datingnlp_big_data_spark.operators import relational

    ev = load_table(spark, sf_dir, "events")
    # three micro-batches split ON TIME (the in-order contract)
    ordered = ev.orderBy("ts", "event_id")
    n = ordered.count()
    b1 = ordered.limit(n // 3)
    b2 = ordered.subtract(b1).orderBy("ts", "event_id").limit(n // 3)
    b3 = ordered.subtract(b1).subtract(b2)
    _drop_file(b1, tmp_path, "fin", "b1.parquet")
    _drop_file(b2, tmp_path, "fin", "b2.parquet")
    _drop_file(b3, tmp_path, "fin", "b3.parquet")

    stream = sc.stream_events(spark, str(tmp_path / "fin"))
    q = sc.run_stream_to_memory(
        sc.streaming_funnel_progress(stream), "funnel_stream", "update"
    )
    try:
        _wait(q)
        # update mode appends a row per user per batch: keep the LAST
        rows = spark.table("funnel_stream").collect()
    finally:
        q.stop()
    final = {}
    for r in rows:  # memory sink preserves batch order; later rows win
        final[r["user_id"]] = r["steps_done"]
    got = {
        s: sum(1 for v in final.values() if v >= s) for s in (1, 2, 3)
    }

    batch = {
        r["step_idx"]: r["n_users"]
        for r in relational.funnel_conversion(
            ev, steps=("signup", "view", "purchase")
        ).collect()
    }
    assert got == {1: batch[1], 2: batch[2], 3: batch[3]}
    assert got[1] > 0


def test_streaming_source_drift_equals_batch(spark, tmp_path):
    """Incrementally-summed quality histograms over 3 micro-batches must
    yield exactly the batch PSI drift cells of the full corpus."""
    import glob as g
    import pathlib
    import shutil

    from week5_datingnlp_big_data_spark.plans import datapipe

    good = "the quick brown fox jumps over the lazy dog and it runs far"
    junk = "@@@ ### %%% ^^^ &&& *** ((( )))"
    schema = "doc_id long, text string, source string"
    batches = [
        [(i, good, "clean") for i in range(20)] + [(50 + i, junk, "spam") for i in range(5)],
        [(100 + i, junk, "spam") for i in range(15)],
        [(200 + i, good, "clean") for i in range(10)] + [(250, junk, "clean")],
    ]

    def drop(rows, name):
        df = spark.createDataFrame(rows, schema)
        stage = tmp_path / "_dr" / name
        df.coalesce(1).write.parquet(str(stage))
        (tmp_path / "dr").mkdir(parents=True, exist_ok=True)
        shutil.copy(
            g.glob(str(stage / "part-*.parquet"))[0], str(tmp_path / "dr" / name)
        )

    for i, rows in enumerate(batches):
        drop(rows, f"b{i}.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "dr"))
    )
    q = sc.streaming_source_drift(
        stream,
        state_dir=str(tmp_path / "dr_state"),
        checkpoint_dir=str(tmp_path / "dr_ckpt"),
    )
    try:
        _wait(q)
    finally:
        q.stop()
    versions = sorted(
        pathlib.Path(tmp_path / "dr_state").glob("v*"),
        key=lambda d: int(d.name[1:]),
    )
    final_counts = spark.read.parquet(str(versions[-1]))
    streamed = sorted(
        map(tuple, datapipe.drift_cells_from_counts(final_counts).collect())
    )
    all_rows = [r for b in batches for r in b]
    whole = sorted(map(tuple, datapipe.source_quality_drift(
        spark.createDataFrame(all_rows, schema)
    ).collect()))
    assert streamed == whole
    # polarity survives the incremental path: spam drifts hard
    psi = {}
    for row in datapipe.drift_cells_from_counts(final_counts).collect():
        psi[row["source"]] = psi.get(row["source"], 0.0) + row["contribution"]
    assert psi["spam"] > 0.5


def test_streaming_kmv_state_merges_across_batches(spark, sf_dir, tmp_path):
    """Two micro-batches that SPLIT each day's users must drain to the
    same per-day KMV partials as one batch pass — the sketch is a pure
    function of each day's key set, not of how it arrived."""
    from week5_datingnlp_big_data_spark.operators import sketches as sk

    events = load_table(spark, sf_dir, "events")
    _drop_file(events.filter(F.col("user_id") % 2 == 0), tmp_path, "kmv", "b1.parquet")
    _drop_file(events.filter(F.col("user_id") % 2 == 1), tmp_path, "kmv", "b2.parquet")

    stream = sc.stream_events(spark, str(tmp_path / "kmv"))
    q = sc.run_stream_to_memory(
        sc.streaming_daily_kmv(stream, k=32), "kmv_state", output_mode="update"
    )
    try:
        _wait(q)
    finally:
        q.stop()
    snap = spark.table("kmv_state")
    from pyspark.sql import Window

    latest = (
        snap.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("day").orderBy(F.desc("upd"))),
        )
        .filter(F.col("rn") == 1)
        .select("day", F.explode("hs").alias("h"))
    )
    streamed = {
        (r["day"], r["h"]) for r in latest.collect()
    }
    # batch twin: per-day rank window over distinct (day, hash)
    hashed = sk.daily_key_hashes(events)
    w = Window.partitionBy("day").orderBy("h")
    batch = {
        (r["day"], r["h"])
        for r in hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 32)
        .select("day", "h")
        .collect()
    }
    assert streamed == batch
    # at least one day must have actually merged state across batches
    assert snap.filter(F.col("upd") >= 2).count() > 0


def test_streaming_daily_volume_matches_batch_across_batches(
    spark, sf_dir, tmp_path
):
    """Two micro-batches that SPLIT each day's events must drain to the
    exact batch anomaly rows — a per-day count is a pure function of
    the day's row set, so micro-batching cannot change the scored
    output (the 6th stream-batch parity gate)."""
    from week5_datingnlp_big_data_spark.operators import relational

    events = load_table(spark, sf_dir, "events")
    _drop_file(events.filter(F.col("event_id") % 2 == 0), tmp_path, "dv", "b1.parquet")
    _drop_file(events.filter(F.col("event_id") % 2 == 1), tmp_path, "dv", "b2.parquet")

    stream = sc.stream_events(spark, str(tmp_path / "dv"))
    q = sc.run_stream_to_memory(
        sc.streaming_daily_volume(stream), "dv_state", output_mode="complete"
    )
    try:
        _wait(q)
    finally:
        q.stop()
    streamed = sorted(
        map(tuple, relational.score_daily_counts(spark.table("dv_state")).collect())
    )
    batch = sorted(
        map(tuple, relational.daily_count_anomalies(events).collect())
    )
    assert streamed == batch and len(batch) > 0


def test_streaming_latest_user_state_across_batches(spark, sf_dir, tmp_path):
    """Two micro-batches that split each user's events BY TIME must drain
    to the same per-user latest state as one batch pass — latest-state is
    a total-order argmax over the row set, arrival-order invariant. The
    time split guarantees the argmax of many users arrives in a LATER
    batch than their first state write (real cross-batch supersede)."""
    from week5_datingnlp_big_data_spark.operators import relational

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    cut = events.agg(
        F.timestamp_micros(
            ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
            .cast("bigint")
        ).alias("c")
    ).collect()[0]["c"]
    _drop_file(events.filter(F.col("ts") <= F.lit(cut)), tmp_path, "cdc", "b1.parquet")
    _drop_file(events.filter(F.col("ts") > F.lit(cut)), tmp_path, "cdc", "b2.parquet")

    stream = sc.stream_events(spark, str(tmp_path / "cdc"))
    q = sc.run_stream_to_memory(
        sc.streaming_latest_user_state(stream), "cdc_state", output_mode="update"
    )
    try:
        _wait(q)
    finally:
        q.stop()
    from pyspark.sql import Window

    snap = spark.table("cdc_state")
    latest = (
        snap.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("upd"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    streamed = {
        (r["user_id"], r["ts_us"], r["event_id"], r["event_type"])
        for r in latest.collect()
    }
    batch = {
        (r["user_id"], r["ts_us"], r["event_id"], r["event_type"])
        for r in relational.latest_state(
            events.withColumn("ts_us", F.unix_micros("ts")),
            ["user_id"], ["ts", "event_id"], "event_type",
        ).collect()
    }
    assert streamed == batch
    # the split must have actually superseded state across batches for
    # at least one user (their argmax lives in b2 but b1 wrote first)
    superseded = latest.filter(
        (F.col("upd") >= 2) & (F.col("ts_us") > F.unix_micros(F.lit(cut)))
    ).count()
    assert superseded > 0


def test_streaming_latest_user_state_out_of_order(spark, sf_dir, tmp_path):
    """8th stream-batch parity gate: the changelog arrives OUT OF ORDER.
    Batches are split by an md5 parity of event_id — time-decorrelated,
    so for many users batch 2 delivers events OLDER than the state batch
    1 already wrote (the late-arrival case a time-split feed never
    exercises). The latest-state argmax must resist the regression
    (never let an older event supersede newer state) and drain to the
    same per-user snapshot as one batch pass."""
    from week5_datingnlp_big_data_spark.operators import relational

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    parity = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
               16, 10).cast("long") % 2
    )
    _drop_file(events.filter(parity == 0), tmp_path, "ooo", "b1.parquet")
    _drop_file(events.filter(parity == 1), tmp_path, "ooo", "b2.parquet")

    stream = sc.stream_events(spark, str(tmp_path / "ooo"))
    q = sc.run_stream_to_memory(
        sc.streaming_latest_user_state(stream), "ooo_state",
        output_mode="update",
    )
    try:
        _wait(q)
    finally:
        q.stop()
    from pyspark.sql import Window

    latest = (
        spark.table("ooo_state")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("upd"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    streamed = {
        (r["user_id"], r["ts_us"], r["event_id"], r["event_type"])
        for r in latest.collect()
    }
    batch = {
        (r["user_id"], r["ts_us"], r["event_id"], r["event_type"])
        for r in relational.latest_state(
            events.withColumn("ts_us", F.unix_micros("ts")),
            ["user_id"], ["ts", "event_id"], "event_type",
        ).collect()
    }
    assert streamed == batch and len(batch) > 0

    # the split must have produced genuine LATE arrivals: users whose
    # global argmax rode batch 1 but who still received (older) batch-2
    # rows afterwards — their state saw a second update and must NOT
    # have regressed (it did not, or the set compare above would fail)
    agg = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        parity.alias("par"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    tops = (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("par").alias("top_par"))
    )
    late_users = (
        agg.join(tops, "user_id")
        .filter((F.col("top_par") == 0) & (F.col("par") == 1))
        .select("user_id")
        .distinct()
        .count()
    )
    assert late_users > 0
    multi_update = latest.filter(F.col("upd") >= 2).count()
    assert multi_update > 0


def test_streaming_url_keep_first_parity(spark, sf_dir, tmp_path):
    """9th stream-batch parity gate: the URL canonicalizer + keep-first
    election under streaming. Batches are split by md5 parity of doc_id
    (arrival-order-decorrelated, so for many canonical URLs the keeper
    — the minimum doc_id — arrives in batch 2 AFTER batch 1 already
    elected a provisional keeper: real cross-batch supersede). The
    drained latest state per canonical URL must equal the batch
    operator's kept set."""
    from week5_datingnlp_big_data_spark import registry
    from week5_datingnlp_big_data_spark.operators import web

    docs = load_table(spark, sf_dir, "documents")
    parity = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 3, 8),
               16, 10).cast("long") % 2
    )
    _drop_file(docs.filter(parity == 0), tmp_path, "urls", "b1.parquet")
    _drop_file(docs.filter(parity == 1), tmp_path, "urls", "b2.parquet")

    # URL synthesis is pure Catalyst string algebra, so it runs
    # IN-STREAM — the gate covers synth + canonicalize + stateful elect
    stream = registry._synth_urls(
        sc.stream_documents(spark, str(tmp_path / "urls")).select(
            "doc_id", "text"
        )
    )
    q = sc.run_stream_to_memory(
        sc.streaming_url_keep_first(stream), "url_state",
        output_mode="update",
    )
    raw = registry._synth_urls(docs.select("doc_id", "text"))
    try:
        _wait(q)
    finally:
        q.stop()
    from pyspark.sql import Window

    latest = (
        spark.table("url_state")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("canonical_url").orderBy(F.desc("upd"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    streamed = {
        (r["canonical_url"], r["keep_id"]) for r in latest.collect()
    }
    batch = {
        (r["canonical_url"], r["doc_id"])
        for r in web.url_dedup_keep_first(raw).filter("is_kept").collect()
    }
    assert streamed == batch and len(batch) > 0
    # witness: keepers really superseded provisional elections across
    # batches for at least one URL (keeper parity 1, a parity-0 row
    # existed for the same canonical)
    canon = raw.select(
        web.canonical_url("url").alias("c"), "doc_id", parity.alias("par")
    )
    keepers = canon.groupBy("c").agg(F.min("doc_id").alias("k"))
    superseded = (
        canon.join(keepers, "c")
        .groupBy("c")
        .agg(
            F.max((F.col("doc_id") == F.col("k")).cast("int")
                  * (F.col("par") + 1)).alias("keeper_par_plus1"),
            F.sum((F.col("par") == 0).cast("int")).alias("n_par0"),
        )
        .filter((F.col("keeper_par_plus1") == 2) & (F.col("n_par0") > 0))
        .count()
    )
    assert superseded > 0
    multi = latest.filter(F.col("upd") >= 2).count()
    assert multi > 0


def test_streaming_boilerplate_matches_batch(spark, sf_dir, tmp_path):
    """10th stream-batch parity gate: jusText-style boilerplate
    classification under streaming. The fixture pages are pre-exploded
    into lines and split into two micro-batches by md5 parity of
    (doc_id, line_idx) — time-decorrelated, so most docs arrive SPLIT:
    the context rule's verdict from batch 1 is genuinely revised when a
    neighboring line lands in batch 2 (a near line gets rescued by a
    late good neighbor, or separated from one by an inserted line). The
    drained latest verdict per (doc, line) must equal the batch
    operator's output row-for-row, features included."""
    from week5_datingnlp_big_data_spark import registry
    from week5_datingnlp_big_data_spark.operators import filters

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pages = registry._synth_pages(docs)
    lines = (
        pages.select(
            "doc_id",
            F.posexplode(
                F.split(F.coalesce(F.col("text"), F.lit("")), "\n")
            ).alias("line_idx", "_raw"),
        )
        .withColumn("_line", F.trim("_raw"))
        .filter(F.length("_line") > 0)
        .select("doc_id", "line_idx", "_line")
    )
    parity = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("line_idx").cast("string"),
                    )
                ),
                3,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    _drop_file(lines.filter(parity == 0), tmp_path, "bp", "b1.parquet")
    _drop_file(lines.filter(parity == 1), tmp_path, "bp", "b2.parquet")

    stream = (
        spark.readStream.schema("doc_id long, line_idx int, _line string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "bp"))
    )
    q = sc.run_stream_to_memory(
        sc.streaming_boilerplate_stats(stream), "bp_state",
        output_mode="update",
    )
    try:
        _wait(q)
    finally:
        q.stop()

    from pyspark.sql import Window

    emitted = spark.table("bp_state")
    latest = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id", "line_idx").orderBy(
                    F.desc("upd")
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    cols = ["doc_id", "line_idx", "n_words", "link_density",
            "stopword_ratio", "klass", "keep"]
    streamed = {tuple(r[c] for c in cols) for r in latest.collect()}
    batch = {
        tuple(r[c] for c in cols)
        for r in filters.boilerplate_line_stats(pages).collect()
    }
    assert streamed == batch and len(batch) > 0

    # witnesses: (a) docs really split across batches (state updated
    # twice), (b) at least one line's KEEP verdict was revised between
    # updates — the context rule crossed a batch boundary
    multi = latest.filter(F.col("upd") >= 2).count()
    assert multi > 0
    revised = (
        emitted.groupBy("doc_id", "line_idx")
        .agg(F.countDistinct("keep").alias("nk"))
        .filter(F.col("nk") > 1)
        .count()
    )
    assert revised > 0


def test_streaming_host_cap_matches_batch(spark, sf_dir, tmp_path):
    """11th stream-batch parity gate: per-host top-k document caps under
    streaming. Batches split by md5 parity of doc_id, so hosts receive
    docs across BOTH batches and batch-1 provisional keeps are evicted
    when better-scoring batch-2 docs arrive — the gate witnesses real
    evictions AND requires the drained latest kept set per host to equal
    the batch operator's verdicts row for row (rank included)."""
    from week5_datingnlp_big_data_spark import registry
    from week5_datingnlp_big_data_spark.operators import web

    docs = load_table(spark, sf_dir, "documents")
    parity = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 3, 8),
               16, 10).cast("long") % 2
    )
    _drop_file(docs.filter(parity == 0), tmp_path, "hcap", "b1.parquet")
    _drop_file(docs.filter(parity == 1), tmp_path, "hcap", "b2.parquet")

    def scored(df):
        t = F.trim(F.coalesce(F.col("text"), F.lit("")))
        n_words = F.when(t == F.lit(""), F.lit(0)).otherwise(
            F.size(F.split(t, "\\s+"))
        )
        return registry._synth_urls(df.select("doc_id", "text")).select(
            web.canonical_host("url").alias("host"),
            "doc_id",
            n_words.cast("double").alias("score"),
        )

    stream = scored(
        sc.stream_documents(spark, str(tmp_path / "hcap"))
    )
    q = sc.run_stream_to_memory(
        sc.streaming_host_cap(stream), "hcap_state", output_mode="update"
    )
    try:
        _wait(q)
    finally:
        q.stop()
    from pyspark.sql import Window

    sink = spark.table("hcap_state")
    ranked = sink.withColumn(
        "_mx", F.max("upd").over(Window.partitionBy("host"))
    )
    latest = ranked.filter(F.col("upd") == F.col("_mx"))
    streamed = {
        (r["host"], r["doc_id"], r["score"], r["host_rank"])
        for r in latest.collect()
    }
    batch = {
        (r["host"], r["doc_id"], r["score"], r["host_rank"])
        for r in web.host_cap_sample(
            scored(docs), host_col="host", score_col="score",
            id_col="doc_id", cap=3,
        ).select("host", "doc_id", "score", "host_rank").collect()
    }
    assert streamed == batch and len(batch) > 0
    # witness 1: at least one host updated state across both batches
    assert latest.filter(F.col("upd") >= 2).count() > 0
    # witness 2: real EVICTION — a doc kept by an earlier emission is
    # absent from its host's latest kept set
    early = {
        (r["host"], r["doc_id"])
        for r in ranked.filter(F.col("upd") < F.col("_mx")).collect()
    }
    latest_keys = {(h, d) for h, d, _, _ in streamed}
    assert any(k not in latest_keys for k in early)


def test_streaming_recrawl_counts_parity(spark, sf_dir, tmp_path):
    """12th stream-batch parity gate: visit-log accumulation for the
    Cho & Garcia-Molina change-rate estimator. Visit rows split into
    two batches by md5 parity of doc_id; several docs feed the SAME url
    key (doc_id % 200), so one URL's counts really merge across
    batches. The drained latest counts, projected through the SHARED
    lambda expression (web.recrawl_lambda_col), must equal the batch
    operator exactly — including the int64 quantization."""
    from week5_datingnlp_big_data_spark import registry
    from week5_datingnlp_big_data_spark.operators import web

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    parity = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 3, 8),
               16, 10).cast("long") % 2
    )
    _drop_file(docs.filter(parity == 0), tmp_path, "visits", "b1.parquet")
    _drop_file(docs.filter(parity == 1), tmp_path, "visits", "b2.parquet")

    # visit synthesis is pure Catalyst (md5 nibbles + sequence explode),
    # so it runs IN-STREAM: the gate covers synth + stateful count merge
    stream = registry._synth_visit_log(
        sc.stream_documents(spark, str(tmp_path / "visits")).select("doc_id")
    )
    q = sc.run_stream_to_memory(
        sc.streaming_recrawl_counts(stream), "recrawl_state",
        output_mode="update",
    )
    try:
        _wait(q)
    finally:
        q.stop()
    from pyspark.sql import Window

    latest = (
        spark.table("recrawl_state")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("url").orderBy(F.desc("upd"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    streamed = {
        (r["url"], r["n_visits"], r["n_changes"], r["lambda_x1e9"])
        for r in latest.select(
            "url", "n_visits", "n_changes",
            web.recrawl_lambda_col(
                F.col("n_visits"), F.col("n_changes")
            ).alias("lambda_x1e9"),
        ).collect()
    }
    batch = {
        (r["url"], r["n_visits"], r["n_changes"], r["lambda_x1e9"])
        for r in web.recrawl_change_rates(
            registry._synth_visit_log(docs)
        ).collect()
    }
    assert streamed == batch and len(batch) > 0
    # witness: at least one URL merged counts across both batches (its
    # docs straddle the parity split), so upd >= 2 in the latest state
    assert latest.filter(F.col("upd") >= 2).count() > 0


def test_streaming_cell_histogram_divergence_parity(spark, sf_dir, tmp_path):
    """13th stream-batch parity gate: hyperplane-LSH cell histograms for
    the population-divergence monitor. Embedding rows split into two
    batches by md5 parity of vec_id, so most cells accumulate counts
    across BOTH micro-batches; the drained latest histogram must equal
    the batch per-cell counts row-for-row, and the exact-integer TV
    projection over the drained rows must equal the batch scalar."""
    from week5_datingnlp_big_data_spark.operators import similarity
    from week5_datingnlp_big_data_spark.sources.schemas import SCHEMAS

    emb = load_table(spark, sf_dir, "embeddings")
    parity = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 3, 8),
               16, 10).cast("long") % 2
    )
    _drop_file(emb.filter(parity == 0), tmp_path, "emb", "b1.parquet")
    _drop_file(emb.filter(parity == 1), tmp_path, "emb", "b2.parquet")

    stream = (
        spark.readStream.schema(SCHEMAS["embeddings"])
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "emb"))
    )
    q = sc.run_stream_to_memory(
        sc.streaming_cell_counts(stream), "cell_state", output_mode="update"
    )
    try:
        _wait(q)
    finally:
        q.stop()
    from pyspark.sql import Window

    latest = (
        spark.table("cell_state")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cell").orderBy(F.desc("upd"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    streamed = {
        (r["cell"], r["n_a"], r["n_b"]) for r in latest.collect()
    }
    # batch per-cell histogram through the same signature expression
    batch_cells = {
        (r["cell"], r["n_a"], r["n_b"])
        for r in emb.filter(F.col("label").isin(0, 1))
        .select(
            similarity.hyperplane_signature(
                F.col("embedding").cast("array<double>"), 6, 64
            ).alias("cell"),
            F.col("label"),
        )
        .groupBy("cell")
        .agg(
            F.sum((F.col("label") == 0).cast("long")).alias("n_a"),
            F.sum((F.col("label") == 1).cast("long")).alias("n_b"),
        )
        .collect()
    }
    assert streamed == batch_cells and len(batch_cells) > 0
    # scalar parity: exact-integer TV over drained counts == batch row
    rows = sorted(streamed)
    na = sum(a for _, a, _ in rows)
    nb = sum(b for _, _, b in rows)
    tv_num = sum(abs(a * nb - b * na) for _, a, b in rows)
    batch = similarity.group_divergence(emb).collect()[0]
    assert (batch["n_a"], batch["n_b"], batch["tv_num"]) == (na, nb, tv_num)
    # witness: cells really merged counts across both micro-batches
    assert latest.filter(F.col("upd") >= 2).count() > 0
