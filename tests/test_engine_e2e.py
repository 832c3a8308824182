"""End-to-end engine tests (SURVEY.md §5 items 3-5): byte-identity
invariant, resume semantics, determinism, lineage metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from optimizerasters_spark.engine import Engine, JobConf
from optimizerasters_spark.pages import synth_pages
from optimizerasters_spark import ledger as L


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "job")


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_full_run_and_text_byte_identity(spark, sf_dir, workdir):
    eng = Engine(JobConf(sf_dir=sf_dir, workdir=workdir))
    res = eng.run(spark)

    # every page processed
    led = res["ledger"]
    assert led.where(F.col("processed") != "yes").count() == 0
    assert not eng.has_failures(spark)

    # byte-identity: sha256(text) per url matches the source exactly
    src = synth_pages(spark, sf_dir).select(
        "url", F.sha2(F.col("text"), 256).alias("sha_src"))
    out = res["page_tiles"].dropDuplicates(["url"]).select(
        "url", F.sha2(F.col("text"), 256).alias("sha_out"), "text_sha")
    j = src.join(out, "url", "full")
    assert j.where(
        (F.col("sha_src") != F.col("sha_out")) |
        (F.col("sha_src") != F.col("text_sha")) |
        F.col("sha_src").isNull() | F.col("sha_out").isNull()).count() == 0

    # lineage metrics exist for both stages with positive rows
    m = eng.get_metrics(spark)
    stages = {r["stage"] for r in m.collect()}
    assert {"process", "finalize"} <= stages
    assert m.where(F.col("rows") < 0).count() == 0


def test_resume_skips_processed(spark, sf_dir, workdir):
    eng1 = Engine(JobConf(sf_dir=sf_dir, workdir=workdir))
    res1 = eng1.run(spark)
    n_counts = _sorted_rows(res1["tile_counts"],
                            ["level", "tile_x", "tile_y", "page_count"])

    # second run: everything already 'yes' -> process stage sees 0 rows
    eng2 = Engine(JobConf(sf_dir=sf_dir, workdir=workdir))
    res2 = eng2.run(spark)
    m = eng2.get_metrics(spark)
    second = m.where((F.col("run_id") == eng2.run_id) &
                     (F.col("stage") == "process"))
    total = second.agg(F.coalesce(F.sum("rows"), F.lit(0))).collect()[0][0]
    assert total == 0, "resume must not reprocess completed pages"

    # outputs unchanged
    n_counts2 = _sorted_rows(res2["tile_counts"],
                             ["level", "tile_x", "tile_y", "page_count"])
    assert n_counts == n_counts2


def test_retryall_reprocesses_everything(spark, sf_dir, workdir):
    eng1 = Engine(JobConf(sf_dir=sf_dir, workdir=workdir))
    eng1.run(spark)
    n_pages = synth_pages(spark, sf_dir).select("url").distinct().count()

    eng2 = Engine(JobConf(sf_dir=sf_dir, workdir=workdir, resume="retryall"))
    res2 = eng2.run(spark)
    m = eng2.get_metrics(spark)
    total = (m.where((F.col("run_id") == eng2.run_id) &
                     (F.col("stage") == "process"))
             .agg(F.sum("rows")).collect()[0][0])
    assert total == n_pages

    # outputs still deduplicated (append+dedup idempotence)
    out = res2["page_tiles"]
    assert out.groupBy("url", "polygon_id").count() \
              .where(F.col("count") > 1).count() == 0


def test_determinism_across_workdirs(spark, sf_dir, tmp_path):
    r1 = Engine(JobConf(sf_dir=sf_dir, workdir=str(tmp_path / "a"))).run(spark)
    r2 = Engine(JobConf(sf_dir=sf_dir, workdir=str(tmp_path / "b"))).run(spark)
    cols = ["level", "tile_x", "tile_y", "page_count"]
    assert _sorted_rows(r1["tile_counts"], cols) == \
        _sorted_rows(r2["tile_counts"], cols)
    mcols = ["tile_id", "page_count", "source_uri"]
    assert _sorted_rows(r1["manifest"], mcols) == \
        _sorted_rows(r2["manifest"], mcols)


def test_partial_preseed_resume(spark, sf_dir, workdir):
    """Pre-seed 'yes' for a subset -> engine processes exactly the rest
    (FIXTURES.md T4 scenario)."""
    pages = synth_pages(spark, sf_dir)
    # fresh ledger, mark doc_id%10<3 processed already
    L.init_ledger(spark, workdir, pages, "url")
    done = pages.where(F.col("doc_id") % 10 < 3)
    L.merge_status(spark, workdir, done, "processed", L.YES, "preseed")
    n_total = pages.count()
    n_done = done.count()

    eng = Engine(JobConf(sf_dir=sf_dir, workdir=workdir))
    eng.run(spark)
    m = eng.get_metrics(spark)
    total = (m.where((F.col("run_id") == eng.run_id) &
                     (F.col("stage") == "process"))
             .agg(F.sum("rows")).collect()[0][0])
    assert total == n_total - n_done


def test_quarantine_and_retry_pass(spark, sf_dir, tmp_path):
    """A6: injected failures land in the ledger as 'no', the end-of-run
    retry pass recovers them, final state is complete and failure-free."""
    wd = str(tmp_path / "qjob")
    eng = Engine(JobConf(sf_dir=sf_dir, workdir=wd, inject_fail_mod=7))
    res = eng.run(spark)
    led = res["ledger"]
    assert led.where(F.col("processed") != "yes").count() == 0
    assert not eng.has_failures(spark)
    m = eng.get_metrics(spark)
    stages = {r["stage"] for r in m.collect()}
    assert "retry" in stages
    n_retry = (m.where((F.col("stage") == "retry") &
                       (F.col("run_id") == eng.run_id))
               .agg(F.sum("rows")).collect()[0][0])
    src = synth_pages(spark, sf_dir)
    assert n_retry == src.where(F.col("doc_id") % 7 == 0).count()
    # no duplicate outputs despite the two-phase write
    out = res["page_tiles"]
    assert out.groupBy("url", "polygon_id").count() \
              .where(F.col("count") > 1).count() == 0
