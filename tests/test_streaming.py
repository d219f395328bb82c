"""Structured Streaming forms of SURVEY §2.9 (tests run each stream
with trigger(availableNow=True) against a parquet file-drop dir and
compare to the equivalent batch plan — the unified-model oracle)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sequencing_integration_pipeline1_0_spark.streaming import incremental as st


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """events with a proper timestamp column, written as a file-drop dir."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    from sequencing_integration_pipeline1_0_spark.plans.catalog import _t
    e = (_t(spark, sf_dir, "events")
         .withColumn("event_time", F.timestamp_micros(F.col("ts_us"))))
    e.write.mode("overwrite").parquet(out)
    return out


def _run_stream(spark, df, tmp_path, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    # assert: an unterminated drain would silently hand back a PARTIAL
    # memory table and leak a spinning query into later tests
    assert q.awaitTermination(120), f"drain of {name} did not finish"
    return spark.table(name)


def test_t1_stream_ledger_dedup(spark, events_stream_dir, tmp_path):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = st.read_parquet_stream(spark, events_stream_dir, schema)
    # duplicate the feed (cumulative re-delivery, phl.Rmd re-read pattern)
    doubled = stream.unionByName(stream)
    deduped = st.ledger_dedup_stream(doubled, ["event_id"], "event_time")
    got = _run_stream(spark, deduped, tmp_path, "t1_dedup")
    batch = spark.read.parquet(events_stream_dir)
    assert got.count() == batch.select("event_id").distinct().count()


def test_windowed_counts_stream_matches_batch(spark, events_stream_dir, tmp_path):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = st.read_parquet_stream(spark, events_stream_dir, schema)
    counts = st.windowed_counts(stream, "event_time", ["event_type"],
                                window="1 day", delay="2 days")
    got = _run_stream(spark, counts, tmp_path, "win_counts")
    batch = spark.read.parquet(events_stream_dir)
    expected = (batch.groupBy(F.window("event_time", "1 day"), "event_type")
                     .agg(F.count(F.lit(1)).alias("n"))
                     .select(F.col("window.start").alias("window_start"),
                             "event_type", "n"))
    g = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    e = {(r["window_start"], r["event_type"]): r["n"] for r in expected.collect()}
    # availableNow emits all finalized windows; late-window tail may be
    # held back by the final watermark — every emitted window must match
    assert g, "stream emitted nothing"
    for k, v in g.items():
        assert e[k] == v


def test_foreach_batch_router(spark, events_stream_dir, tmp_path):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = st.read_parquet_stream(spark, events_stream_dir, schema)
    routed = stream.withColumn(
        "route",
        F.when(F.col("event_type") == "purchase", "roster")
         .when(F.col("value") < 0.5, "for_review")
         .otherwise("keep_na"))
    outs = {r: str(tmp_path / r) for r in ["roster", "for_review", "keep_na"]}
    sinks = {r: (lambda p: (lambda df: df.write.mode("append").parquet(p)))(p)
             for r, p in outs.items()}
    q = (routed.writeStream
         .foreachBatch(st.foreach_batch_router("route", sinks))
         .option("checkpointLocation", str(tmp_path / "ckpt_router"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    batch = spark.read.parquet(events_stream_dir)
    n_roster = spark.read.parquet(outs["roster"]).count()
    n_review = spark.read.parquet(outs["for_review"]).count()
    n_keepna = spark.read.parquet(outs["keep_na"]).count()
    # conservation: every input row lands in exactly one output (T6)
    assert n_roster + n_review + n_keepna == batch.count()
    assert n_roster == batch.filter(F.col("event_type") == "purchase").count()


def test_sessionize_state_logic(spark, events_stream_dir, tmp_path):
    """applyInPandasWithState sessionizer: check the per-group session
    algebra through the streaming engine (gap = 6 hours)."""
    schema = spark.read.parquet(events_stream_dir).schema
    stream = st.read_parquet_stream(spark, events_stream_dir, schema)
    gap = 6 * 3_600_000_000
    sessions = st.sessionize(stream.select("user_id", "ts_us"), gap_us=gap,
                         timeout_conf="NoTimeout")
    got = _run_stream(spark, sessions, tmp_path, "sessions")
    # batch oracle: same session split via lag window
    from pyspark.sql import Window
    batch = spark.read.parquet(events_stream_dir).select("user_id", "ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us")
    expected = (batch
                .withColumn("prev", F.lag("ts_us").over(w))
                .withColumn("new_session",
                            (F.col("prev").isNull()
                             | ((F.col("ts_us") - F.col("prev")) > gap)).cast("int"))
                .withColumn("session_id", F.sum("new_session").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)))
                .groupBy("user_id", "session_id")
                .agg(F.min("ts_us").alias("session_start_us"),
                     F.max("ts_us").alias("session_end_us"),
                     F.count(F.lit(1)).alias("n_events")))
    g = {(r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
         for r in got.collect()}
    e = {(r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
         for r in expected.collect()}
    assert g, "no sessions emitted"
    # every emitted (closed) session must match the batch oracle exactly;
    # the final open session per user stays in state at availableNow end
    for k, v in g.items():
        assert e[k] == v


def test_streaming_near_dup_dedup_against_index(spark, sf_dir, tmp_path):
    """Micro-batches probed against a static corpus minhash index keep
    exactly the docs the batch-mode anti-join keeps."""
    from sequencing_integration_pipeline1_0_spark.operators import dedupe_scale as ds
    full = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    cut = full.count() // 2
    corpus = full.filter(F.col("doc_id") < cut)
    incoming_dir = str(tmp_path / "incoming")
    out_dir = str(tmp_path / "survivors")
    full.filter(F.col("doc_id") >= cut).write.parquet(incoming_dir)

    idx = ds.minhash_index(corpus, "doc_id", "text").localCheckpoint()
    schema = spark.read.parquet(incoming_dir).schema
    stream = st.read_parquet_stream(spark, incoming_dir, schema,
                                    max_files_per_trigger=1)
    writer = lambda df: df.write.mode("append").parquet(out_dir)
    q = (stream.writeStream
         .foreachBatch(st.foreach_batch_near_dup_dedup(
             idx, "doc_id", "text", writer, threshold=0.5))
         .option("checkpointLocation", str(tmp_path / "ckpt_neardup"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    batch_mode = st.near_dup_filter_batch(
        idx, full.filter(F.col("doc_id") >= cut), "doc_id", "text",
        threshold=0.5)
    want = {r["doc_id"] for r in batch_mode.collect()}
    assert got == want
    n_incoming = full.count() - cut
    assert 0 < len(got) < n_incoming   # some dropped, some kept


def test_interval_join_stream_matches_batch(spark, events_stream_dir, tmp_path):
    schema = spark.read.parquet(events_stream_dir).schema

    def split(df):
        c = (df.filter(F.col("event_type") == "click")
               .select(F.col("event_id").alias("click_id"), "user_id",
                       F.col("event_time").alias("click_time")))
        p = (df.filter(F.col("event_type") == "purchase")
               .select(F.col("event_id").alias("purchase_id"),
                       F.col("user_id").alias("user_id_p"),
                       F.col("event_time").alias("purchase_time")))
        return c, p

    stream = st.read_parquet_stream(spark, events_stream_dir, schema)
    sc, sp = split(stream)
    streamed = _run_stream(
        spark,
        st.interval_join_streams(sc, sp, "user_id", "user_id_p",
                                 "click_time", "purchase_time",
                                 within="30 minutes"),
        tmp_path, "st_ij")

    batch = spark.read.parquet(events_stream_dir)
    bc, bp = split(batch)
    expected = st.interval_join_streams(bc, bp, "user_id", "user_id_p",
                                        "click_time", "purchase_time",
                                        within="30 minutes")
    key = lambda r: (r["click_id"], r["purchase_id"])  # noqa: E731
    got = sorted(map(key, streamed.collect()))
    want = sorted(map(key, expected.collect()))
    assert got == want and len(want) > 0


def test_ledger_dedup_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Checkpoint-recovery proof for the T1 ledger: drain batch 1,
    RESTART against the same checkpoint with batch 2 = full
    re-delivery of batch 1 plus new records — the re-delivered rows
    must be suppressed by the RESTORED dedup state (not by this run's
    memory), or the second drain would double-emit them. File sink
    (fault-tolerant) so output accumulates across restarts exactly as
    a production job's would."""
    from sequencing_integration_pipeline1_0_spark.plans.catalog import _t
    e = (_t(spark, sf_dir, "events")
         .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
         .select("event_id", "user_id", "event_type", "event_time"))
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b1 = e.filter(F.col("event_id") % 3 != 2)
    b1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        stream = st.read_parquet_stream(spark, src, schema)
        dd = st.ledger_dedup_stream(stream, ["event_id"], "event_time",
                                    delay="3650 days")
        q = (dd.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == b1.select("event_id").distinct().count()
    # batch 2: EVERYTHING again (old rows re-delivered + the new third)
    e.write.mode("append").parquet(src)
    drain()
    got = spark.read.parquet(out)
    n_all = e.select("event_id").distinct().count()
    assert got.count() == n_all                      # no double emission
    assert got.select("event_id").distinct().count() == n_all


def test_interval_join_resumes_from_checkpoint(spark, tmp_path):
    """Checkpoint-recovery proof for the stream-stream interval join:
    phase-2 purchases match CLICKS DELIVERED IN PHASE 1 — the click
    side gets no new files after the restart, so the only way user 2
    can attribute is the click state restored from the checkpoint."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame([(u, base) for u in (1, 2, 3, 4)],
                          "user_id long, click_time timestamp") \
         .write.mode("append").parquet(cdir)
    spark.createDataFrame([(1, base + dt.timedelta(minutes=5))],
                          "user_id_p long, purchase_time timestamp") \
         .write.mode("append").parquet(pdir)
    cschema = spark.read.parquet(cdir).schema
    pschema = spark.read.parquet(pdir).schema

    def drain():
        c = st.read_parquet_stream(spark, cdir, cschema)
        p = st.read_parquet_stream(spark, pdir, pschema)
        j = st.interval_join_streams(c, p, "user_id", "user_id_p",
                                     "click_time", "purchase_time",
                                     within="30 minutes", delay="2 hours")
        q = (j.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    drain()
    assert spark.read.parquet(out).count() == 1
    spark.createDataFrame(
        [(2, base + dt.timedelta(minutes=10)),    # matches phase-1 click
         (5, base + dt.timedelta(minutes=10)),    # no click at all
         (3, base + dt.timedelta(minutes=45))],   # outside the 30-min window
        "user_id_p long, purchase_time timestamp") \
        .write.mode("append").parquet(pdir)
    drain()
    got = sorted(r["user_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2]


def test_sessionize_resumes_from_checkpoint(spark, tmp_path):
    """Checkpoint-recovery proof for the custom stateful sessionizer
    (applyInPandasWithState): phase 2's first event continues the OPEN
    session from phase 1, so the closed session it eventually emits
    must start at phase 1's first timestamp — possible only if the
    (start, last, n) state tuple was restored from the checkpoint; a
    cold restart would emit a session starting at the phase-2 event."""
    import glob as globmod
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, 0), (1, 10)], "user_id long, ts_us long") \
         .write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        stream = st.read_parquet_stream(spark, src, schema)
        s = st.sessionize(stream, gap_us=100, timeout_conf="NoTimeout")
        q = (s.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    drain()
    # phase 1 leaves one OPEN session in state; nothing closed/emitted
    n1 = (spark.read.parquet(out).count()
          if globmod.glob(out + "/*.parquet") else 0)
    assert n1 == 0
    # phase 2: ts=20 joins the open session (gap 100), ts=1_000_000
    # closes it and opens a new one
    spark.createDataFrame([(1, 20), (1, 1_000_000)],
                          "user_id long, ts_us long") \
         .write.mode("append").parquet(src)
    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["session_start_us"], r["session_end_us"], r["n_events"]) \
        == (0, 20, 3)


def test_hll_register_stream_matches_batch_sketch(spark, events_stream_dir,
                                                  tmp_path):
    """The streaming HLL register state, drained, is register-identical
    to the batch sketch over the same rows, and its estimates equal the
    batch evt_hll_daily_users arithmetic."""
    from sequencing_integration_pipeline1_0_spark.operators import (
        sketches as sk)

    schema = spark.read.parquet(events_stream_dir).schema
    stream = st.read_parquet_stream(spark, events_stream_dir, schema)
    regs = st.hll_register_stream(stream, "event_time", "user_id")
    got = _run_stream(spark, regs, tmp_path, "hll_regs")

    batch = spark.read.parquet(events_stream_dir)
    expected = sk.hll_registers(
        batch.select(F.date_trunc("day", "event_time")
                      .alias("window_start"), "user_id"),
        F.col("user_id"), "window_start")
    g = {(r.window_start, r.reg): r.mj for r in got.collect()}
    e = {(r.window_start, r.reg): r.mj for r in expected.collect()}
    assert g, "stream emitted nothing"
    # availableNow may hold back the final watermark-tail window; every
    # emitted register must match the batch sketch exactly
    for k, v in g.items():
        assert e[k] == v

    est = {r.window_start: r.est
           for r in st.hll_estimates_from_registers(got).collect()}
    exact = {r.window_start: r.n for r in
             (batch.groupBy(F.date_trunc("day", "event_time")
                            .alias("window_start"))
                   .agg(F.countDistinct("user_id").alias("n")).collect())}
    for day, v in est.items():
        assert abs(v - exact[day]) / exact[day] < 0.30


def test_ivf_assign_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming cell assignment against a frozen codebook is
    row-identical to similarity.ivf_assign on the same batch — the
    st_ivf_assign parity, pinned here at fixture scale with the
    codebook trained exactly as the catalog query trains it."""
    from sequencing_integration_pipeline1_0_spark.operators import (
        similarity as sim,
    )
    from sequencing_integration_pipeline1_0_spark.plans.catalog import _t

    e = _t(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 10 != 0)
    batch = e.filter(F.col("vec_id") % 10 == 0)
    cb = sim.train_ivf_codebook(corpus, "vec_id", "embedding",
                                n_cells=8, iters=2)
    expected = {(r.id, r.cell_id) for r in
                sim.ivf_assign(batch, "vec_id", "embedding", cb)
                   .select("id", F.col("cell_id").cast("long")
                            .alias("cell_id")).collect()}

    feed = str(tmp_path / "emb_feed")
    batch.write.mode("overwrite").parquet(feed)
    schema = spark.read.parquet(feed).schema
    stream = st.read_parquet_stream(spark, feed, schema)
    assigned = st.ivf_assign_stream(stream, cb, id_col="vec_id",
                                    vec_col="embedding")
    got = {(r.id, r.cell_id) for r in
           _run_stream(spark, assigned, tmp_path,
                       "t_ivf_assign_stream").collect()}
    assert got == expected


def test_ngram_contamination_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streaming ingest screen is row-identical to the batch
    ngram_contamination on the same corpus/bench split — the
    st_decontam_screen parity, pinned at fixture scale."""
    from sequencing_integration_pipeline1_0_spark.operators import (
        textstats as ts,
    )
    from sequencing_integration_pipeline1_0_spark.plans.catalog import _t

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    expected = {(r.doc_id, r.n_shared_ngrams, r.contaminated)
                for r in ts.ngram_contamination(
                    corpus, bench, "doc_id", "text", n=5).collect()}

    feed = str(tmp_path / "docs_feed")
    corpus.write.mode("overwrite").parquet(feed)
    schema = spark.read.parquet(feed).schema
    stream = st.read_parquet_stream(spark, feed, schema)
    screened = st.ngram_contamination_stream(stream, bench,
                                             "doc_id", "text", n=5)
    got = {(r.doc_id, r.n_shared_ngrams, r.contaminated)
           for r in _run_stream(spark, screened, tmp_path,
                                "t_decontam_stream").collect()}
    assert got == expected


def test_keepna_ttl_stream_matches_batch(spark, sf_dir):
    """The streaming retry-queue TTL sweep is row-identical to the
    batch t3_ttl_expiry on the same events — the st_keepna_ttl
    parity (reason strings included), pinned at fixture scale via
    the catalog entries themselves so the two can never drift."""
    from sequencing_integration_pipeline1_0_spark.plans import catalog

    expected = {(r.event_id, r.user_id, r.delete_reason)
                for r in catalog.Q["t3_ttl_expiry"](spark, sf_dir)
                                 .collect()}
    got = {(r.event_id, r.user_id, r.delete_reason)
           for r in catalog.Q["st_keepna_ttl"](spark, sf_dir)
                            .collect()}
    assert got == expected
    assert got  # non-vacuous: the fixture has expirable rows
