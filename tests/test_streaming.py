"""Streaming ingest: incremental micro-batches update the ledger and the
restartable checkpoint skips already-seen files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from optimizerasters_spark import ledger as L
from optimizerasters_spark.pages import synth_pages
from optimizerasters_spark.streaming.snapshot import (
    run_incremental, windowed_rates,
)


def test_incremental_ingest_with_ledger(spark, sf_dir, tmp_path):
    input_dir = str(tmp_path / "incoming")
    workdir = str(tmp_path / "stream_job")
    pages = synth_pages(spark, sf_dir).select(
        "doc_id", "url", "warc_epoch", "text", "lang", "lon_md", "lat_md")

    # chunk 1 arrives
    pages.where(F.col("doc_id") % 2 == 0).write.mode("append") \
        .parquet(input_dir)
    run_incremental(spark, input_dir, workdir)
    led1 = L.read_ledger(spark, workdir)
    n1 = led1.where(F.col("processed") == "yes").count()
    assert n1 == pages.where(F.col("doc_id") % 2 == 0).count()

    # chunk 2 arrives; restart the stream (same checkpoint) -> only new
    # files are read, ledger grows to the full set
    pages.where(F.col("doc_id") % 2 == 1).write.mode("append") \
        .parquet(input_dir)
    run_incremental(spark, input_dir, workdir)
    led2 = L.read_ledger(spark, workdir)
    assert led2.where(F.col("processed") == "yes").count() == pages.count()

    # per-page stream output carries the text hash
    out = spark.read.parquet(os.path.join(workdir, "page_tiles"))
    assert out.count() == pages.count()
    assert "text_sha" in out.columns and "tile_x" in out.columns


def test_windowed_rates_plan(spark, sf_dir, tmp_path):
    """Watermarked windowed aggregation runs to completion in memory sink."""
    input_dir = str(tmp_path / "in2")
    synth_pages(spark, sf_dir).select(
        "doc_id", "url", "warc_epoch", "text", "lang", "lon_md", "lat_md"
    ).limit(200).write.mode("append").parquet(input_dir)
    agg = windowed_rates(spark, input_dir)
    q = (agg.writeStream.format("memory").queryName("rates")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    # append mode emits only watermark-closed windows; table must exist
    assert spark.sql("SELECT * FROM rates").columns == \
        ["window", "lang", "page_count"]


def test_stateful_crawl_tracker(spark, sf_dir, tmp_path):
    """applyInPandasWithState: per-url running state across micro-batches
    equals the batch aggregate."""
    from optimizerasters_spark.streaming.stateful import (
        crawl_tracker_stream,
    )

    input_dir = str(tmp_path / "st_in")
    pages = synth_pages(spark, sf_dir).select(
        "url", "warc_epoch", (F.col("doc_id") % 3).alias("batch_id"))
    pages.limit(300).write.mode("append").parquet(input_dir)

    stream = (spark.readStream
              .schema("url STRING, warc_epoch BIGINT, batch_id BIGINT")
              .parquet(input_dir))
    out = crawl_tracker_stream(stream)
    q = (out.writeStream.format("memory").queryName("tracker")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "st_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r["url"]: (r["n_crawls"], r["latest_epoch"])
           for r in spark.sql("SELECT * FROM tracker").collect()}
    want = {r["url"]: (r["n"], r["mx"])
            for r in (spark.read.parquet(input_dir)
                      .groupBy("url")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.max("warc_epoch").alias("mx"))).collect()}
    assert got == want


def test_streaming_exact_dedup_bounded_state(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate sha256 keys collapse
    within the watermark horizon and the state is BOUNDED (watermark
    eviction) — the streaming twin of dedup_exact. Duplicates injected
    as copies with later doc_ids must not re-emit."""
    from optimizerasters_spark.streaming.snapshot import (
        streaming_exact_dedup,
    )

    input_dir = str(tmp_path / "dd_in")
    pages = synth_pages(spark, sf_dir).select(
        "doc_id", "url", "warc_epoch", "text", "lang", "lon_md", "lat_md"
    ).limit(200)
    dups = (pages.where(F.col("doc_id") % 4 == 0)
            .withColumn("doc_id", F.col("doc_id") + 100000))
    pages.unionByName(dups).write.mode("append").parquet(input_dir)

    out = streaming_exact_dedup(spark, input_dir)
    q = (out.writeStream.format("memory").queryName("dd")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT text_sha FROM dd").collect()
    n_distinct = pages.select(F.sha2("text", 256)).distinct().count()
    assert len(got) == n_distinct
    assert len({r["text_sha"] for r in got}) == n_distinct


def test_streaming_corpus_ingest_dedups_and_replays_idempotently(
        spark, sf_dir, tmp_path):
    """CorpusBuilder behind foreachBatch: files arriving across two
    stream passes dedup against accepted state exactly like batch
    ingest, and re-delivering already-committed files (the foreachBatch
    replay case) accepts nothing new."""
    from optimizerasters_spark.operators.training_incremental import (
        CorpusBuilder,
    )
    from optimizerasters_spark.streaming.snapshot import (
        streaming_corpus_ingest,
    )
    input_dir = str(tmp_path / "corpus_in")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang").where(F.col("doc_id") < 120)
    b1 = docs.where(F.col("doc_id") < 80)
    b1.write.mode("append").parquet(input_dir)

    cb = CorpusBuilder(str(tmp_path / "corpus_state"))
    streaming_corpus_ingest(spark, input_dir, cb)
    n1 = cb.kept(spark).count()
    assert n1 > 0

    # second wave: new docs + exact copies of already-accepted ones
    b2 = docs.where(F.col("doc_id") >= 80).unionByName(
        b1.limit(20).withColumn("doc_id", F.col("doc_id") + 900000))
    b2.write.mode("append").parquet(input_dir)
    streaming_corpus_ingest(spark, input_dir, cb)
    n2 = cb.kept(spark).count()
    assert n2 > n1
    copies = {r["doc_id"] for r in cb.kept(spark).collect()}
    assert not any(d >= 900000 for d in copies)  # replicas rejected

    # replay: same files again (fresh checkpoint simulates redelivery)
    import shutil
    shutil.rmtree(str(tmp_path / "corpus_state" / "_stream_ckpt"))
    streaming_corpus_ingest(spark, input_dir, cb)
    assert cb.kept(spark).count() == n2  # idempotent


def test_streaming_ingest_applies_hygiene_before_state(spark, sf_dir,
                                                       tmp_path):
    """The hygiene hook scrubs every micro-batch BEFORE it can reach
    accepted state (no raw PII ever lands in the corpus), and because
    the scrub is deterministic, replaying the same files accepts
    nothing new — streaming hygiene preserves the replay-idempotence
    contract."""
    import shutil
    from optimizerasters_spark.operators import web
    from optimizerasters_spark.operators.training_incremental import (
        CorpusBuilder,
    )
    from optimizerasters_spark.streaming.snapshot import (
        streaming_corpus_ingest,
    )
    input_dir = str(tmp_path / "dirty_in")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "lang")
            .where(F.col("doc_id") < 60)
            .withColumn("text", F.concat(
                F.col("text"), F.lit(" reach me at spam@evil.example "))))
    docs.write.mode("append").parquet(input_dir)

    def scrub(df):
        return df.withColumn("text", web.scrubbed_col(F.col("text")))

    cb = CorpusBuilder(str(tmp_path / "clean_state"))
    streaming_corpus_ingest(spark, input_dir, cb, hygiene=scrub)
    kept = cb.kept(spark)
    n1 = kept.count()
    assert n1 > 0
    assert kept.where(F.col("text").contains("spam@evil.example")) \
               .count() == 0
    assert kept.where(F.col("text").contains("<EMAIL>")).count() == n1
    # redelivery with the same hygiene: byte-identical scrub -> no-op
    shutil.rmtree(str(tmp_path / "clean_state" / "_stream_ckpt"))
    streaming_corpus_ingest(spark, input_dir, cb, hygiene=scrub)
    assert cb.kept(spark).count() == n1
