"""Streaming tests: file-source → memory-sink with availableNow
drains, asserting streaming results equal the batch computation on the
same finite input — the strongest deterministic check for operators
the DuckDB oracle can't express (SURVEY.md §2.9 extension).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from fenix_spark.streaming import (
    sessionize_stateful,
    stream_ingest,
    stream_source,
    windowed_event_counts,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def events_prepared(spark, sf_dir, tmp_path_factory):
    """events with proper timestamp + ts_ms columns, written to a tmp
    dir in TWO files so file-streaming runs multiple batches."""
    from fenix_spark.suite import events_table

    ev = events_table(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        "ts_ms",
        "value",
    )
    path = str(tmp_path_factory.mktemp("events_src"))
    ev.repartition(2).write.mode("overwrite").parquet(path)
    return path, spark.read.parquet(path)


def _drain(stream_df, name, output_mode):
    """Run an availableNow query to completion of its AVAILABLE data.

    Most queries self-terminate; a stateful query holding a pending
    processing-time timeout does NOT (Spark keeps it alive to fire the
    timeout later), so a bare ``awaitTermination(120)`` burns the full
    window doing nothing. Poll instead: once the source reports no
    more data and an empty batch has committed, nothing further can be
    emitted except timeout firings (which every caller's batch-truth
    excludes) — stop there."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if q.awaitTermination(1):
            return q
        status = q.status
        lp = q.lastProgress
        # a committed EMPTY batch after the source reports no more
        # data: everything available has been processed ("cleaning up
        # state" keeps isTriggerActive True forever, so don't wait on it)
        if (
            not status["isDataAvailable"]
            and lp is not None
            and lp["numInputRows"] == 0
        ):
            break
    q.stop()
    return q


def test_stream_ingest_roundtrip(spark, events_prepared, tmp_path):
    src_path, batch_df = events_prepared
    src = stream_source(spark, src_path, batch_df.schema, max_files_per_trigger=1)
    q = stream_ingest(
        src, str(tmp_path), "events_stream", str(tmp_path / "_ckpt"), available_now=True
    )
    q.awaitTermination(120)
    back = spark.read.parquet(str(tmp_path / "sources" / "events_stream"))
    assert back.count() == batch_df.count()
    assert sorted(back.columns) == sorted(batch_df.columns)
    got = {r.event_id for r in back.select("event_id").collect()}
    want = {r.event_id for r in batch_df.select("event_id").collect()}
    assert got == want


def test_windowed_counts_stream_equals_batch(spark, events_prepared):
    src_path, batch_df = events_prepared
    src = stream_source(spark, src_path, batch_df.schema)
    agg = windowed_event_counts(src, ts_col="ts", window_duration="1 hour")
    _drain(agg, "win_counts", "complete")
    streamed = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = {
        (r.window_start, r.window_end, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(batch_df, ts_col="ts").collect()
    }
    assert streamed == batch


def test_stateful_sessionize_state_survives_micro_batches(spark, sf_dir, tmp_path):
    """The hard streaming property: a session spanning a MICRO-BATCH
    BOUNDARY must be stitched by the keyed state, not restarted.

    The split point is CONSTRUCTED to guarantee a straddling session:
    pick a closed multi-event session from the batch sessionizer and
    cut the event stream at its start timestamp, so its first event(s)
    land in micro-batch 0 and the rest in micro-batch 1
    (maxFilesPerTrigger=1, mtime-ordered files). Closed sessions must
    equal the batch sessionizer's — including that stitched one.

    The sink is polled rather than awaiting availableNow termination:
    with ProcessingTimeTimeout state pending, the engine keeps running
    zero-data micro-batches for timeout evaluation, so termination
    would take the full session gap."""
    import os
    import shutil
    import time

    from fenix_spark.suite import _sessionize

    from fenix_spark.suite import events_table

    ev = events_table(spark, sf_dir).select("user_id", "event_id", "ts_ms", "value")

    batch_rows = _sessionize(spark, sf_dir).collect()
    last_start = {}
    for r in batch_rows:
        last_start[r.user_id] = max(last_start.get(r.user_id, -1), r.start_ms)
    batch_closed = {
        (r.user_id, r.start_ms): (r.n_events, r.end_ms)
        for r in batch_rows
        if r.start_ms != last_start[r.user_id]
    }
    # the session to cut through: closed, multi-event, nonzero span
    target = max(
        (k for k, (n, e) in batch_closed.items() if n >= 2 and e > k[1]),
        key=lambda k: batch_closed[k][1] - k[1],
    )
    mid = target[1]  # its start_ms: first event(s) left, rest right

    src_dir = tmp_path / "split_src"
    src_dir.mkdir()
    for i, part in enumerate(
        (ev.where(F.col("ts_ms") <= mid), ev.where(F.col("ts_ms") > mid))
    ):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(stage))
        (f,) = [n for n in os.listdir(stage) if n.endswith(".parquet")]
        dst = src_dir / f"part-{i:03d}.parquet"
        shutil.copy(stage / f, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    batch_df = spark.read.parquet(str(src_dir))
    src = stream_source(
        spark, str(src_dir), batch_df.schema, max_files_per_trigger=1
    ).select("user_id", "event_id", "ts_ms", "value")
    sess = sessionize_stateful(src)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_mb_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if spark.sql("SELECT count(*) AS n FROM sessions_mb_out").head().n >= len(
            batch_closed
        ):
            break
        time.sleep(0.5)
    q.stop()
    streamed = {
        (r.user_id, r.start_ms): (r.n_events, r.end_ms)
        for r in spark.sql("SELECT * FROM sessions_mb_out").collect()
    }

    assert streamed == batch_closed
    # the constructed session did straddle the micro-batch boundary
    assert streamed[target] == batch_closed[target]
    assert target[1] <= mid < batch_closed[target][1]


def test_stateful_sessionize_matches_batch_closed_sessions(spark, events_prepared):
    src_path, batch_df = events_prepared
    src = stream_source(spark, src_path, batch_df.schema).select(
        "user_id", "event_id", "ts_ms", "value"
    )
    # no maxFilesPerTrigger → availableNow drains in ONE micro-batch,
    # so per-user events arrive in-order after the pandas sort (the
    # operator's contract: in-order within batch, state across batches)
    sess = sessionize_stateful(src)
    _drain(sess, "sessions_out", "append")
    streamed = {
        (r.user_id, r.start_ms): (r.n_events, r.end_ms, r.sum_value)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    # batch truth: suite sessionizer; drop each user's LAST session
    # (still open in the stream's state — only emitted on timeout)
    from fenix_spark.suite import _sessionize

    batch_rows = _sessionize(spark, "/root/testdata/sf0.001").collect()
    last_start = {}
    for r in batch_rows:
        last_start[r.user_id] = max(last_start.get(r.user_id, -1), r.start_ms)
    batch_closed = {
        (r.user_id, r.start_ms): (r.n_events, r.end_ms, r.sum_value)
        for r in batch_rows
        if r.start_ms != last_start[r.user_id]
    }
    assert set(streamed) == set(batch_closed)
    for key, (n, end, vsum) in streamed.items():
        bn, bend, bvsum = batch_closed[key]
        assert (n, end) == (bn, bend)
        # float sum order differs (pandas sequential vs Spark agg)
        assert vsum == pytest.approx(bvsum, abs=1e-3)


def test_stream_exact_dedup_matches_batch_distinct(spark, sf_dir, tmp_path):
    """Streaming first-occurrence dedup on the content hash must keep
    exactly one row per distinct normalized document — same distinct
    hash set as the batch dedup, with re-crawled copies (same text,
    new doc_id, later ts) all suppressed."""
    from fenix_spark.functions.texthash import hash60
    from fenix_spark.operators.dedup import normalized_text
    from fenix_spark.streaming import stream_exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(
        "doc_id", "text", F.timestamp_millis(F.col("doc_id") * 1000).alias("ts")
    )
    recrawl = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        F.timestamp_millis(F.col("doc_id") * 1000 + 600_000).alias("ts"),
    )
    src_path = str(tmp_path / "docs_src")
    base.unionByName(recrawl).write.mode("overwrite").parquet(src_path)
    written = spark.read.parquet(src_path)

    src = stream_source(spark, src_path, written.schema)
    deduped = stream_exact_dedup(src, "text", "ts", watermark="1 hour")
    _drain(deduped, "dedup_out", "append")
    out = spark.sql("SELECT content_hash, doc_id FROM dedup_out").collect()

    batch_hashes = {
        r.h
        for r in written.select(
            hash60(normalized_text(F.col("text"))).alias("h")
        ).distinct().collect()
    }
    assert {r.content_hash for r in out} == batch_hashes
    assert len(out) == len(batch_hashes)  # exactly one survivor per hash


def test_stream_simhash_tag_matches_batch(spark, sf_dir, tmp_path):
    """Stateless near-dup tagging: streamed fingerprints and band keys
    must equal the batch operator's on the same input."""
    from fenix_spark.operators.dedup import simhash_fingerprints
    from fenix_spark.streaming import stream_simhash_tag

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    src_path = str(tmp_path / "tag_src")
    docs.write.mode("overwrite").parquet(src_path)
    written = spark.read.parquet(src_path)

    tagged = stream_simhash_tag(
        stream_source(spark, src_path, written.schema), "text"
    ).select("doc_id", "sim", "sim_bands")
    _drain(tagged, "tag_out", "append")
    streamed = {
        r.doc_id: (r.sim, tuple((b.band, b.key) for b in r.sim_bands))
        for r in spark.sql("SELECT * FROM tag_out").collect()
    }
    batch = {
        r.id: r.sim for r in simhash_fingerprints(written, "text", "doc_id").collect()
    }
    assert set(streamed) == set(batch)
    for did, (sim, bands) in streamed.items():
        assert sim == batch[did]
        assert bands == tuple((b, (sim >> (8 * b)) & 255) for b in range(4))


def test_stream_static_enrichment_matches_batch(spark, events_prepared):
    """Stream-static join: every micro-batch row picks up its dimension
    attributes; the drained result equals the batch join, and events
    whose key is absent from the dim survive with nulls (left join)."""
    from fenix_spark.streaming import enrich_stream

    src_path, batch_df = events_prepared
    dim = (
        batch_df.select("user_id")
        .distinct()
        .limit(3)  # deliberately partial: most users have no dim row
        .withColumn("tier", F.concat(F.lit("tier_"), F.col("user_id") % 2))
    )
    dim.cache().count()
    src = stream_source(spark, src_path, batch_df.schema, max_files_per_trigger=1)
    enriched = enrich_stream(src.select("event_id", "user_id"), dim, "user_id")
    _drain(enriched, "enriched_events", "append")
    streamed = {
        (r.event_id, r.tier)
        for r in spark.sql("SELECT event_id, tier FROM enriched_events").collect()
    }
    batch = {
        (r.event_id, r.tier)
        for r in batch_df.select("event_id", "user_id").join(dim, "user_id", "left").collect()
    }
    assert streamed == batch
    assert any(t is None for _, t in streamed)  # unmatched keys kept
    assert any(t is not None for _, t in streamed)


def test_streamed_ingest_feeds_incremental_index(spark, sf_dir, tmp_path):
    """End-to-end training-data pipeline shape: vectors arrive as a
    stream, land in the catalog, and are appended to a frozen-coding
    IVF index whose probe results then cover the new rows."""
    from fenix_spark.artifacts import ensure_artifacts
    from fenix_spark.operators.index import CODE_COL, append_to_index, read_index

    coding, _ = ensure_artifacts(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    src = (
        spark.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    q = stream_ingest(src, str(tmp_path), "vec_stream", str(tmp_path / "_ck"))
    q.awaitTermination(120)
    landed = spark.read.parquet(str(tmp_path / "sources" / "vec_stream"))
    assert landed.count() == emb.count()

    idx_path = str(tmp_path / "idx")
    append_to_index(landed, "embedding", coding, idx_path)  # append into empty = build
    idx = read_index(spark, idx_path)
    assert idx.count() == emb.count()
    assert CODE_COL in idx.columns


def test_stream_ingest_checkpoint_resume_exactly_once(spark, events_prepared, tmp_path):
    """Restarting an ingest against the same checkpoint must be
    exactly-once: already-committed files are not re-ingested, new
    files land exactly once — the property that makes crash-looping a
    100 TB ingest safe."""
    src_path, batch_df = events_prepared
    root, ckpt = str(tmp_path), str(tmp_path / "_ck")

    def drain():
        src = stream_source(spark, src_path, batch_df.schema, max_files_per_trigger=1)
        q = stream_ingest(src, root, "eo", ckpt)
        q.awaitTermination(120)

    drain()
    landed = lambda: spark.read.parquet(f"{root}/sources/eo").count()  # noqa: E731
    n1 = landed()
    assert n1 == batch_df.count()

    drain()  # restart, no new input → nothing re-ingested
    assert landed() == n1

    extra = batch_df.limit(37)
    extra.coalesce(1).write.mode("append").parquet(src_path)
    drain()  # restart, one new file → its rows land exactly once
    assert landed() == n1 + 37


def test_stream_interval_join_matches_batch(spark, events_prepared):
    """Watermarked stream-stream interval join (view→click attribution)
    equals the batch interval join on the same finite input — the
    bounded-state exception to 'no stream-stream joins'."""
    from fenix_spark.streaming import stream_interval_join

    src_path, batch_df = events_prepared
    views_b = batch_df.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    clicks_b = batch_df.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )

    def attributed(views, clicks):
        return stream_interval_join(
            views, clicks, key="user_id", left_ts="ts", right_ts="ts",
            interval="10 minutes", watermark="30 minutes",
        ).select("view_id", "r_click_id")

    src = stream_source(spark, src_path, batch_df.schema, max_files_per_trigger=1)
    views_s = src.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    clicks_s = src.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    _drain(attributed(views_s, clicks_s), "attributed", "append")
    streamed = {
        (r.view_id, r.r_click_id)
        for r in spark.sql("SELECT * FROM attributed").collect()
    }
    batch = {(r.view_id, r.r_click_id) for r in attributed(views_b, clicks_b).collect()}
    assert streamed == batch
    assert len(batch) > 0


@pytest.mark.slow
def test_stream_incremental_neardup_equals_batch(spark, documents, tmp_path):
    """Drive the foreachBatch incremental near-dup over a 3-file
    availableNow stream; the union of per-batch pair outputs must equal
    the one-shot batch recompute over all docs — each pair emitted
    exactly once, in its later member's batch."""
    from fenix_spark.operators.dedup import minhash_neardup_pairs
    from fenix_spark.streaming.dedup import stream_incremental_neardup

    docs = documents.limit(300).select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_incremental_neardup(
            stream,
            str(tmp_path / "state"),
            str(tmp_path / "pairs"),
            "text",
            "doc_id",
            threshold=0.8,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    got = {
        (r.id_l, r.id_r, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "pairs"))
        .select("id_l", "id_r", "jaccard")
        .collect()
    }
    want = {
        (r.id_l, r.id_r, r.jaccard)
        # est_min=None: the incremental state carries band keys, not
        # signatures, so the streamed path matches the UNGATED batch
        # semantics (gate = batch-path work-skip only, see dedup.py)
        for r in minhash_neardup_pairs(
            docs, "text", "doc_id", threshold=0.8, est_min=None
        ).collect()
    }
    assert got == want
    assert want, "corpus must contain near-dup pairs for the test to bite"
    # state grew one fold per batch
    import os

    folds = [d for d in os.listdir(str(tmp_path / "state" / "sets")) if d.startswith("batch_id=")]
    assert len(folds) == 3


def test_trending_terms_streaming_equals_batch(spark, documents, tmp_path):
    """Stream docs (with synthetic timestamps) through the windowed
    term counts; complete-mode drain must match the batch run of the
    same function, and the top-k cut is deterministic."""
    from fenix_spark.streaming.windows import (
        top_terms_per_window,
        windowed_trending_terms,
    )

    docs = documents.limit(200).select(
        "doc_id",
        "text",
        F.timestamp_millis(
            (F.lit(1_700_000_000_000) + F.col("doc_id") * 600_000).cast("bigint")
        ).alias("ts"),
    )
    src = str(tmp_path / "docs_src")
    docs.repartition(2).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    agg = windowed_trending_terms(stream, "text", ts_col="ts")
    _drain(agg, "trend_terms", "complete")
    streamed = {
        (r.window_start, r.term): r.n
        for r in spark.sql("SELECT * FROM trend_terms").collect()
    }
    batch_counts = windowed_trending_terms(spark.read.parquet(src), "text", ts_col="ts")
    batch = {(r.window_start, r.term): r.n for r in batch_counts.collect()}
    assert streamed == batch and batch

    top = top_terms_per_window(batch_counts, k=3).collect()
    by_win: dict = {}
    for r in top:
        by_win.setdefault(r.window_start, []).append((r.rank, r.n, r.term))
    for rows in by_win.values():
        assert len(rows) <= 3
        ranked = sorted(rows)
        assert [r[0] for r in ranked] == list(range(1, len(rows) + 1))
        # ordering law: higher count first, term asc on ties
        for (r1, n1, t1), (r2, n2, t2) in zip(ranked, ranked[1:]):
            assert (n1 > n2) or (n1 == n2 and t1 < t2)


# ---------------------------------------------------- streaming sketches


def test_stream_hll_rollup_matches_batch(spark, events_prepared, tmp_path):
    from fenix_spark.operators.sketches import hll_estimate, hll_rollup
    from fenix_spark.streaming.sketches import read_hll_rollup, stream_hll_rollup

    src, batch_df = events_prepared
    state = str(tmp_path / "hll_state")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_hll_rollup(stream, ["event_type"], "user_id", state)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.event_type: r.distinct_est
        for r in read_hll_rollup(spark, state, ["event_type"]).collect()
    }
    want = {
        r.event_type: r.distinct_est
        for r in hll_estimate(
            hll_rollup(batch_df, ["event_type"], "user_id")
        ).collect()
    }
    # same sketch algorithm over the same values: merged micro-batch
    # partials must estimate within the union-path wobble of the batch
    # sketch (registers identical; estimator path may differ)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= max(2, 0.01 * want[k])


def test_stream_cms_matches_batch_and_compacts(spark, events_prepared, tmp_path):
    from fenix_spark.operators.sketches import cms_build
    from fenix_spark.streaming.sketches import (
        compact_state,
        read_cms,
        stream_cms,
    )

    src, batch_df = events_prepared
    state = str(tmp_path / "cms_state")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_cms(stream, "event_type", state, depth=2, width=64)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.r, r.b): r.c for r in read_cms(spark, state).collect()}
    want = {
        (r.r, r.b): r.c
        for r in cms_build(
            batch_df.select(F.col("event_type").alias("term")), "term", 2, 64
        ).collect()
    }
    assert got == want  # CMS is linear: stream merge == single build

    # compaction folds partials into one dir with identical content
    import os

    new_id = compact_state(spark, state)
    # folds live in their OWN namespace: a fold under batch_id=N would
    # be overwritten when the stream's checkpoint reaches batch N
    assert [d for d in os.listdir(state) if d.startswith("batch_id=")] == []
    assert [d for d in os.listdir(state) if d.startswith("compact=")] == [
        f"compact={new_id}"
    ]
    assert {(r.r, r.b): r.c for r in read_cms(spark, state).collect()} == want


# ------------------------------------------- stateful streaming top-k


def test_stream_heavy_hitters_stateful(spark, tmp_path):
    """Multi-batch stream of docs; the merged streaming MG summaries
    must surface the true heavy term with its full count (no shrink
    ever evicts it at this m), matching the batch operator."""
    import pandas as pd

    from fenix_spark.operators.sketches import heavy_hitters
    from fenix_spark.streaming.topk import merged_heavy_hitters, stream_heavy_hitters

    rows = [(f"doc{i}", "common " + f"rare{i} noise{i % 7} filler{i % 3}") for i in range(300)]
    docs_pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = str(tmp_path / "hh_src")
    batch_df = spark.createDataFrame(docs_pdf)
    batch_df.repartition(3).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_heavy_hitters(stream, "text", shards=8, m=16, emit_top=16)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hh_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    emissions = spark.table("hh_sink")
    assert emissions.where(F.col("version") > 1).count() > 0  # state folded across batches
    got = merged_heavy_hitters(emissions, k=1).collect()
    assert got[0].term == "common"
    # "common" dominates its shard: MG never evicts it and its lower
    # bound stays within the per-shard error of the true 300
    assert 300 - 300 // (16 + 1) <= got[0].lb <= 300

    want = heavy_hitters(spark.read.parquet(src), "text", k=1, m=512).collect()
    assert want[0].term == got[0].term


def test_stream_bloom_matches_batch_and_compacts(spark, events_prepared, tmp_path):
    from fenix_spark.operators.sketches import bloom_build
    from fenix_spark.streaming.sketches import (
        compact_state,
        read_bloom,
        stream_bloom,
    )

    src, batch_df = events_prepared
    state = str(tmp_path / "bloom_state")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_bloom(stream, "user_id", state, m_bits=1 << 12, k=4)
        .option("checkpointLocation", str(tmp_path / "ckb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r.word, r.bits) for r in read_bloom(spark, state).collect()}
    want = {
        (r.word, r.bits)
        for r in bloom_build(batch_df, "user_id", 1 << 12, 4).collect()
    }
    assert got == want  # Bloom OR-merge: stream union == single build

    new_id = compact_state(spark, state)
    compact = {
        (r.word, r.bits)
        for r in spark.read.parquet(f"{state}/compact={new_id}").collect()
    }
    assert compact == want


def test_stream_substring_dedup_equals_batch(spark, tmp_path):
    """Drive the foreachBatch ExactSubstr over a 3-batch availableNow
    stream (monotone ids, sequential file mtimes = arrival order);
    the union of per-batch rewritten docs must equal the one-shot
    batch pass over all docs."""
    import time

    import numpy as np

    from fenix_spark.operators.substring import dedup_substrings
    from fenix_spark.streaming.dedup import stream_substring_dedup

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(150)]
    boiler = [f"bb{i}" for i in range(60)]

    def doc(n):
        return [vocab[i] for i in rng.integers(0, len(vocab), n)]

    batches = {
        "a": {"a00": doc(120) + boiler, "a01": doc(150)},
        "b": {"b00": boiler + doc(90), "b01": doc(130)},  # dup vs batch a
        "c": {"c00": doc(80) + boiler + doc(40), "c01": boiler + doc(20)},
    }
    src = str(tmp_path / "src")
    for key in ("a", "b", "c"):
        rows = [(k, " ".join(v)) for k, v in batches[key].items()]
        spark.createDataFrame(rows, "doc_id string, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(1.1)  # FileStreamSource orders by mtime

    schema = "doc_id string, text string"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_substring_dedup(
            stream,
            str(tmp_path / "state"),
            str(tmp_path / "out"),
            "text",
            "doc_id",
            min_tokens=50,
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    got = {
        r["doc_id"]: (r["text"], r["tokens_removed"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    all_docs = {k: v for b in batches.values() for k, v in b.items()}
    full = dedup_substrings(
        spark.createDataFrame(
            [(k, " ".join(v)) for k, v in sorted(all_docs.items())], schema
        ),
        "text",
        "doc_id",
        min_tokens=50,
    )
    want = {r["doc_id"]: (r["text"], r["tokens_removed"]) for r in full.collect()}
    assert got == want
    # the scenario bites: later copies of the boilerplate were excised
    assert got["b00"][1] >= 60 and got["c01"][1] >= 60
    assert got["a00"][1] == 0  # canonical copy kept


def test_stream_kll_matches_batch_within_error_and_compacts(spark, events_prepared, tmp_path):
    """Streaming KLL partials merged at read time land every quartile
    within the error class of a direct batch build (KLL merge is not
    linear like CMS — equality is rank-error-bounded, asserted against
    the EXACT batch quantiles); compaction folds into the compact=
    namespace with quantiles preserved exactly (same rows)."""
    import os

    from fenix_spark.operators.sketches import kll_quantiles
    from fenix_spark.streaming.sketches import compact_state, read_kll, stream_kll

    src, batch_df = events_prepared
    state = str(tmp_path / "kll_state")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_kll(stream, ["event_type"], "value", state, k=160)
        .option("checkpointLocation", str(tmp_path / "ck_kll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = read_kll(spark, state, ["event_type"], k=160).localCheckpoint()
    # weight conservation across the whole stream
    got_w = {
        r["event_type"]: r["s"]
        for r in merged.groupBy("event_type").agg(F.sum("weight").alias("s")).collect()
    }
    want_w = {
        r["event_type"]: r["n"]
        for r in batch_df.where(F.col("value").isNotNull())
        .groupBy("event_type").agg(F.count("value").alias("n")).collect()
    }
    assert got_w == want_w

    qs = [0.25, 0.5, 0.75]
    got = {
        (r["event_type"], r["q"]): r["value"]
        for r in kll_quantiles(merged, ["event_type"], qs).collect()
    }
    exact = {
        et: sorted(
            r["value"]
            for r in batch_df.where(
                (F.col("event_type") == et) & F.col("value").isNotNull()
            ).select("value").collect()
        )
        for et in want_w
    }
    import numpy as np

    for (et, qq), v in got.items():
        srt = np.array(exact[et], dtype=float)
        rank = np.searchsorted(srt, v, side="right") / len(srt)
        assert abs(rank - qq) <= 0.05, (et, qq, v, rank)

    before = {
        (r["event_type"], r["item"], r["weight"]) for r in merged.collect()
    }
    new_id = compact_state(spark, state)
    assert [d for d in os.listdir(state) if d.startswith("batch_id=")] == []
    assert f"compact={new_id}" in os.listdir(state)
    after_rows = read_kll(spark, state, ["event_type"], k=160)
    # the fold is itself one more KLL merge — weights still conserve
    got_w2 = {
        r["event_type"]: r["s"]
        for r in after_rows.groupBy("event_type").agg(F.sum("weight").alias("s")).collect()
    }
    assert got_w2 == want_w
    got2 = {
        (r["event_type"], r["q"]): r["value"]
        for r in kll_quantiles(after_rows, ["event_type"], qs).collect()
    }
    for (et, qq), v in got2.items():
        srt = np.array(exact[et], dtype=float)
        rank = np.searchsorted(srt, v, side="right") / len(srt)
        assert abs(rank - qq) <= 0.05, ("post-compact", et, qq, v, rank)

    # the _kll_k sidecar pinned the stream's resolution: maintenance
    # folded at k=160 (not the 200 default — a k>200 stream would
    # otherwise be irreversibly coarsened), an argless read resolves
    # the same k, and re-attaching at a different k refuses loudly.
    assert (tmp_path / "kll_state" / "_kll_k").read_text().strip() == "160"
    argless = {
        (r["event_type"], r["item"], r["weight"])
        for r in read_kll(spark, state, ["event_type"]).collect()
    }
    explicit = {
        (r["event_type"], r["item"], r["weight"])
        for r in read_kll(spark, state, ["event_type"], k=160).collect()
    }
    assert argless == explicit
    with pytest.raises(ValueError, match="k=160"):
        stream_kll(stream, ["event_type"], "value", state, k=200)


def test_stream_kll_high_k_survives_compaction(spark, events_prepared, tmp_path):
    """The ADVICE r7 defect, pinned: a k=500 stream compacted by the
    maintenance lane keeps k=500 resolution — compact_state reads the
    sidecar instead of recompacting at the 200 default. Proof is
    structural: a k=500 recompaction of ~n distinct values retains far
    more sketch rows than a k=200 one would (the k=200 fold of the
    same partials is built for comparison)."""
    from fenix_spark.operators.sketches import kll_merge
    from fenix_spark.streaming.sketches import compact_state, read_kll, stream_kll

    src, batch_df = events_prepared
    state = str(tmp_path / "kll500")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_kll(stream, ["event_type"], "value", state, k=500)
        .option("checkpointLocation", str(tmp_path / "ck500"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    partials = spark.read.parquet(
        *[f"{state}/{d}" for d in os.listdir(state) if d.startswith("batch_id=")]
    ).localCheckpoint()
    coarse_rows = kll_merge(partials, ["event_type"], k=200).count()

    compact_state(spark, state)
    folded = read_kll(spark, state, ["event_type"])
    # weights conserved AND resolution kept: strictly more retained
    # rows than the k=200 fold of the identical partials
    assert folded.count() > coarse_rows
    want_w = {
        r["event_type"]: r["n"]
        for r in batch_df.where(F.col("value").isNotNull())
        .groupBy("event_type").agg(F.count("value").alias("n")).collect()
    }
    got_w = {
        r["event_type"]: r["s"]
        for r in folded.groupBy("event_type").agg(F.sum("weight").alias("s")).collect()
    }
    assert got_w == want_w


def test_stream_theta_deterministic_state_and_compaction(spark, events_prepared, tmp_path):
    """Streaming theta sketches: read-time merge equals the batch
    sketch EXACTLY (theta is a pure function of the value set — the
    determinism HLL streams can't promise), estimates track exact
    per-type distinct counts, and compaction folds at the sidecar k
    with identical post-fold rows."""
    from fenix_spark.operators.sketches import theta_estimate, theta_rollup
    from fenix_spark.streaming.sketches import (
        compact_state,
        read_theta,
        stream_theta,
    )

    src, batch_df = events_prepared
    state = str(tmp_path / "theta_state")
    k = 512
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_theta(stream, ["event_type"], "user_id", state, k=k)
        .option("checkpointLocation", str(tmp_path / "ck_theta"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = read_theta(spark, state, ["event_type"]).localCheckpoint()
    direct = theta_rollup(batch_df, ["event_type"], "user_id", k)
    assert set((r["event_type"], r["value"]) for r in merged.collect()) == set(
        (r["event_type"], r["value"]) for r in direct.collect()
    )

    exact = {
        r["event_type"]: r["d"]
        for r in batch_df.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    rse = 1.0 / (k - 2) ** 0.5
    for r in theta_estimate(merged, ["event_type"], k).collect():
        n = exact[r["event_type"]]
        assert abs(r["distinct_est"] - n) <= max(5 * rse * n, 2), (r, n)

    before = set((r["event_type"], r["value"]) for r in merged.collect())
    compact_state(spark, state)
    assert [d for d in os.listdir(state) if d.startswith("batch_id=")] == []
    after = set(
        (r["event_type"], r["value"])
        for r in read_theta(spark, state, ["event_type"]).collect()
    )
    assert after == before
    # sidecar pins k; mismatched re-attach refuses
    assert (tmp_path / "theta_state" / "_theta_k").read_text().strip() == str(k)
    with pytest.raises(ValueError, match=f"k={k}"):
        stream_theta(stream, ["event_type"], "user_id", state, k=1024)


def test_stream_hist_live_drift_against_reference(spark, events_prepared, tmp_path):
    """The live drift loop: stream histogram partials, merge at read,
    score PSI/TV against a frozen reference — streamed rollup equals
    the batch rollup EXACTLY (hist merge is plain sum), drift vs the
    batch's own histogram is exactly zero, drift vs a shifted
    reference is large; compaction folds exactly; layout sidecar
    refuses a mismatched re-attach."""
    from fenix_spark.operators.drift import hist_drift
    from fenix_spark.operators.sketches import hist_rollup
    from fenix_spark.streaming.sketches import (
        compact_state,
        hist_state_layout,
        read_hist,
        stream_hist,
    )

    src, batch_df = events_prepared
    state = str(tmp_path / "hist_state")
    LO, HI, BINS = 0.0, 1000.0, 100
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_hist(stream, ["event_type"], "value", state, LO, HI, BINS)
        .option("checkpointLocation", str(tmp_path / "ck_hist"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert hist_state_layout(spark, state) == (LO, HI, BINS)
    live = read_hist(spark, state, ["event_type"]).localCheckpoint()
    batch = hist_rollup(batch_df, ["event_type"], "value", LO, HI, BINS)
    assert {(r["event_type"], r["bin"]): r["c"] for r in live.collect()} == {
        (r["event_type"], r["bin"]): r["c"] for r in batch.collect()
    }
    # zero drift against itself; real drift against a shifted ref
    z = hist_drift(batch, live, ["event_type"]).collect()
    assert all(r["psi"] == 0.0 and r["tv"] == 0.0 for r in z)
    shifted = hist_rollup(
        batch_df.withColumn("value", F.col("value") * 3 + 200),
        ["event_type"], "value", LO, HI, BINS,
    )
    d = hist_drift(shifted, live, ["event_type"]).collect()
    assert all(r["psi"] > 0.25 for r in d)

    compact_state(spark, state)
    assert [x for x in os.listdir(state) if x.startswith("batch_id=")] == []
    after = read_hist(spark, state, ["event_type"])
    assert {(r["event_type"], r["bin"]): r["c"] for r in after.collect()} == {
        (r["event_type"], r["bin"]): r["c"] for r in batch.collect()
    }
    with pytest.raises(ValueError, match="lo,hi,bins"):
        stream_hist(stream, ["event_type"], "value", state, LO, HI, 64)


def test_stream_counts_live_categorical_drift(spark, events_prepared, tmp_path):
    """Streamed categorical counts == batch counts exactly; zero
    drift vs the batch's own mix; a re-weighted reference registers;
    compaction folds string-binned counts exactly."""
    from fenix_spark.operators.drift import hist_drift
    from fenix_spark.streaming.sketches import (
        compact_state,
        read_counts,
        stream_counts,
    )

    src, batch_df = events_prepared
    state = str(tmp_path / "cnt_state")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_counts(stream.withColumn("g", F.lit("all")), ["g"], "event_type", state)
        .option("checkpointLocation", str(tmp_path / "ck_cnt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    live = read_counts(spark, state, ["g"]).localCheckpoint()
    batch = (
        batch_df.withColumn("g", F.lit("all"))
        .groupBy("g", F.col("event_type").alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    assert {(r["bin"], r["c"]) for r in live.collect()} == {
        (r["bin"], r["c"]) for r in batch.collect()
    }
    z = hist_drift(batch, live, ["g"]).collect()[0]
    assert z["psi"] == 0.0 and z["tv"] == 0.0
    skew = batch.withColumn(
        "c", F.when(F.col("bin") == "click", F.col("c") * 10).otherwise(F.col("c"))
    )
    assert hist_drift(skew, live, ["g"]).collect()[0]["psi"] > 0.1

    before = {(r["bin"], r["c"]) for r in live.collect()}
    compact_state(spark, state)
    after = {(r["bin"], r["c"]) for r in read_counts(spark, state, ["g"]).collect()}
    assert after == before


def test_stream_priority_sample_equals_batch_and_compacts(
    spark, events_prepared, tmp_path
):
    """Live priority sample: the read-time re-selection over streamed
    partials equals the direct batch sample EXACTLY (priorities are a
    pure function of (id, weight, salt)), estimates stay exact for
    small groups, compaction folds at the sidecar configuration, and
    a mismatched re-attach refuses."""
    import os

    from fenix_spark.operators.sampling import priority_sample, priority_take
    from fenix_spark.streaming.sketches import (
        compact_state,
        read_priority,
        stream_priority,
    )

    src, batch_df = events_prepared
    state = str(tmp_path / "pri_state")
    k = 40
    # weight: |value| + 1 so every row is sampleable with skew
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("w", F.abs(F.col("value")) + 1.0)
    )
    q = (
        stream_priority(stream, ["event_type"], "event_id", "w", state, k=k)
        .option("checkpointLocation", str(tmp_path / "ck_pri"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_w = batch_df.withColumn("w", F.abs(F.col("value")) + 1.0)
    direct = {
        (r["event_type"], r["event_id"], r["sample_pri"])
        for r in priority_sample(
            batch_w, ["event_type"], "event_id", "w", k
        ).collect()
    }
    streamed_state = read_priority(spark, state, ["event_type"])
    streamed = {
        (r["event_type"], r["event_id"], r["sample_pri"])
        for r in streamed_state.collect()
    }
    assert streamed == direct

    # the usable sample: k rows per group with threshold estimates
    taken = priority_take(
        streamed_state, ["event_type"], "event_id", "w", k
    ).collect()
    per = {}
    for r in taken:
        per.setdefault(r["event_type"], []).append(r)
    n_per = {
        r["event_type"]: r["n"]
        for r in batch_w.groupBy("event_type").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    for g, rs in per.items():
        assert len(rs) == min(k, n_per[g])

    # compaction folds batch partials away and preserves the state
    compact_state(spark, state)
    assert [d for d in os.listdir(state) if d.startswith("batch_id=")] == []
    after = {
        (r["event_type"], r["event_id"], r["sample_pri"])
        for r in read_priority(spark, state, ["event_type"]).collect()
    }
    assert after == direct

    # sidecar pins configuration; mismatched re-attach refuses
    with pytest.raises(ValueError, match="re-attach"):
        stream_priority(stream, ["event_type"], "event_id", "w", state, k=99)


def test_stream_decay_trending_equals_batch_and_compacts(
    spark, events_prepared, tmp_path
):
    """Live decayed counts: streamed partials merge to EXACTLY the
    batch summary (linearity), read-time re-anchoring shifts scores,
    compaction folds exactly, mismatched re-attach refuses."""
    import os

    from fenix_spark.operators.timeseries import decayed_counts
    from fenix_spark.streaming.sketches import (
        compact_state,
        read_decay,
        stream_decay,
    )

    src, batch_df = events_prepared
    t_ref = int(
        batch_df.agg(F.max("ts_ms")).head()[0]
    )
    hl = 3_600_000
    state = str(tmp_path / "decay_state")
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_decay(stream, ["event_type"], "ts_ms", state, t_ref, hl)
        .option("checkpointLocation", str(tmp_path / "ck_decay"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    direct = {
        r["event_type"]: r["w"]
        for r in decayed_counts(
            batch_df, ["event_type"], "ts_ms", t_ref, hl
        ).collect()
    }
    streamed = {
        r["event_type"]: r["w"]
        for r in read_decay(spark, state, ["event_type"]).collect()
    }
    assert set(streamed) == set(direct)
    for k in direct:
        assert streamed[k] == pytest.approx(direct[k], rel=1e-9), k

    # re-anchor at read time: every score scales by the same factor
    t_now = t_ref + hl
    shifted = {
        r["event_type"]: r["w"]
        for r in read_decay(spark, state, ["event_type"], t_now_ms=t_now).collect()
    }
    for k in direct:
        assert shifted[k] == pytest.approx(direct[k] * 0.5, rel=1e-9), k

    compact_state(spark, state)
    assert [d for d in os.listdir(state) if d.startswith("batch_id=")] == []
    after = {
        r["event_type"]: r["w"]
        for r in read_decay(spark, state, ["event_type"]).collect()
    }
    for k in direct:
        assert after[k] == pytest.approx(direct[k], rel=1e-9), k

    with pytest.raises(ValueError, match="re-attach"):
        stream_decay(stream, ["event_type"], "ts_ms", state, t_ref + 1, hl)


def test_stream_bottomk_sample_equals_batch_and_compacts(
    spark, events_prepared, tmp_path
):
    """Live uniform bottom-k sample: streamed == direct batch sample
    exactly, compaction folds at the sidecar configuration."""
    import os

    from fenix_spark.operators.sampling import bottomk_sample
    from fenix_spark.streaming.sketches import (
        compact_state,
        read_bottomk,
        stream_bottomk,
    )

    src, batch_df = events_prepared
    state = str(tmp_path / "bk_state")
    k = 30
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_bottomk(stream, ["event_type"], "event_id", state, k=k)
        .option("checkpointLocation", str(tmp_path / "ck_bk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    direct = {
        (r["event_type"], r["event_id"])
        for r in bottomk_sample(batch_df, ["event_type"], "event_id", k).collect()
    }
    streamed = {
        (r["event_type"], r["event_id"])
        for r in read_bottomk(spark, state, ["event_type"]).collect()
    }
    assert streamed == direct

    compact_state(spark, state)
    assert [d for d in os.listdir(state) if d.startswith("batch_id=")] == []
    after = {
        (r["event_type"], r["event_id"])
        for r in read_bottomk(spark, state, ["event_type"]).collect()
    }
    assert after == direct
    with pytest.raises(ValueError, match="re-attach"):
        stream_bottomk(stream, ["event_type"], "event_id", state, k=99)


def test_stream_transitions_match_batch_across_boundaries(
    spark, events_prepared, tmp_path
):
    """Transition partials streamed one file per trigger fold to the
    EXACT batch matrix — including the pairs that straddle micro-batch
    boundaries, which the state stitches."""
    import shutil
    import time

    from fenix_spark.operators.sequences import transition_counts
    from fenix_spark.streaming.sequences import (
        merge_transitions,
        stream_transitions,
    )

    src_path, batch_df = events_prepared
    # time-split into two ordered files so pairs straddle the boundary
    mid = batch_df.agg(F.expr("percentile(ts_ms, 0.5)")).head()[0]
    src_dir = tmp_path / "tsrc"
    src_dir.mkdir()
    for i, part in enumerate(
        (
            batch_df.where(F.col("ts_ms") <= mid),
            batch_df.where(F.col("ts_ms") > mid),
        )
    ):
        stage = tmp_path / f"tstage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(stage))
        (f,) = [n for n in os.listdir(stage) if n.endswith(".parquet")]
        dst = src_dir / f"part-{i:03d}.parquet"
        shutil.copy(stage / f, dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    from fenix_spark.streaming import stream_source

    src = stream_source(
        spark, str(src_dir), batch_df.schema, max_files_per_trigger=1
    ).select(
        F.col("user_id").alias("key"), "ts_ms", F.col("event_type").alias("state")
    )
    parts = stream_transitions(src)
    _drain(parts, "transitions_out", "append")
    streamed = {
        (r.from_state, r.to_state): (r.n, round(r.prob, 9))
        for r in merge_transitions(
            spark.sql("SELECT * FROM transitions_out")
        ).collect()
    }
    want = {
        (r.from_state, r.to_state): (r.n, round(r.prob, 9))
        for r in transition_counts(
            spark.read.parquet(str(src_dir)), "user_id", "ts_ms", "event_type"
        ).collect()
    }
    assert streamed == want
    # and the stream really ran more than one batch: partial rows for
    # at least one pair exceed the folded row count
    raw = spark.sql(
        "SELECT from_state, to_state, count(*) AS c FROM transitions_out "
        "GROUP BY 1, 2 ORDER BY c DESC"
    ).head()
    assert raw.c >= 2
