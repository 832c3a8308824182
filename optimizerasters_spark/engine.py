"""End-to-end resumable pipeline — the OptimizeRasters job lifecycle
(SURVEY.md §3.1) re-expressed as checkpointed DataFrame stages:

    pages -> [ledger anti-join] -> dedup -> tile assign -> PIP join
          -> per-page output (append)        [stage "process"]
    per-page output -> pyramid counts -> manifest (overwrite)
                                              [stage "finalize"]

Exactly-once semantics: the per-page stage APPENDS batch directories and
marks the ledger only after a successful write; a crash between write and
mark causes reprocessing, and the finalize stage deduplicates by url —
append + dedup = idempotent, the same trick the reference plays with
updateRecordStatus path normalization (:1835-1891) but keyed by url.

The ``text`` column rides through the per-page output untouched
(byte-identity invariant per BASELINE.json input_hint).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimizerasters_spark import ledger as L
from optimizerasters_spark import lineage
from optimizerasters_spark.operators import dedup, groups, manifest, spatial
from optimizerasters_spark.pages import synth_boundaries, synth_pages

# TIL-group analog: pages sharing a group id finalize together (group
# overview gated on every member processed). The synth url embeds the
# page number; the group key is derived from it so it survives resume
# across runs keyed only by url.
TIL_GROUPS = 25


def til_group_col():
    return (F.regexp_extract(F.col("url"), "/p/(\\d+)$", 1)
            .cast("bigint") % TIL_GROUPS).alias("til_group")


@dataclass
class JobConf:
    sf_dir: str
    workdir: str
    levels: list[int] = field(default_factory=lambda: [0, 4, 8])
    resume: str = "resume"          # or "retryall"
    output_prefix: str = "tiles"
    # proxy payload codec: 'lerc' splits DataFile/IndexFile into
    # .lrc/.idx in the manifest cache paths (UpdateMRF extensions_lup)
    compression: str | None = "lerc"
    # fault injection for quarantine tests: pages with doc_id % N == 0
    # "fail" on their first attempt (None = no injection). Mirrors the
    # reference's failed-upload list + end-of-run retry pass
    # (OptimizeRasters.py:3729-3740, :7004-7049).
    inject_fail_mod: int | None = None
    # task-granularity bound: at most this many pages per write task —
    # the -queuelength chunking knob (OptimizeRasters.py:638-676 chunked
    # the Lambda payload the same way). None = leave partitioning to the
    # scan/AQE. Costs one count job per batch when set, exactly like the
    # reference's len(list) chunk math.
    queue_length: int | None = None
    # force the full-history finalize rebuild (cross-batch dedup + level-0
    # recount from every batch dir ever written) instead of the default
    # incremental merge of only-new batches. retryall implies it — cleared
    # statuses re-emit already-counted pages, invalidating merge history.
    repair: bool = False
    # corpus hygiene applied BEFORE the ledger init (they define the
    # job's input universe, so resume semantics see the filtered set):
    # keep at most this many pages per host (web.domain_cap) ...
    domain_cap_k: int | None = None
    # ... and/or a deterministic md5-threshold sample rate out of 1000
    # (web.hash_sample — the reproducible "1% CI sample" knob)
    sample_milli: int | None = None
    # ... and/or PII redaction at ingest (web.scrubbed_col): emails and
    # phone numbers are rewritten to <EMAIL>/<PHONE> BEFORE the ledger
    # init, so the job's byte-identity invariant holds over the
    # SCRUBBED corpus — the form a compliance review wants (the raw
    # text never lands in any output or checkpoint of this job)
    scrub_pii: bool = False
    # ... and/or URL canonicalization at ingest (web.url_canonicalize):
    # tracking params stripped, host case-folded, default ports and
    # fragments dropped, query params sorted — BEFORE dedup_latest, so
    # byte-different URLs of the same resource collapse to one ledger
    # row (the crawl-level dedup lever ahead of content hashing)
    canonicalize_urls: bool = False


class Engine:
    """Engine(conf).run(spark) -> dict of result DataFrames.

    Public API mirroring the reference embedding contract
    (CodeSamples/processUsingAListOfFiles.py:50-69):
    run(), get_ledger(), has_failures(), get_metrics()."""

    def __init__(self, conf: JobConf):
        self.conf = conf
        self.run_id = uuid.uuid4().hex[:12]
        # batch dirs the last finalize actually read (test/inspection
        # hook for the incremental-cost claim)
        self.last_finalize_inputs: list[str] = []
        # test hook (mirrors last_finalize_inputs): did the most recent
        # til_finalize stage scan page_tiles at all? False on a
        # steady-state resume where no group releases.
        self.last_til_finalize_scanned: bool = False

    # -- paths ------------------------------------------------------------
    def _pages_out(self) -> str:
        return os.path.join(self.conf.workdir, "page_tiles")

    def _tiles_out(self) -> str:
        return os.path.join(self.conf.workdir, "tile_counts")

    def _manifest_out(self) -> str:
        return os.path.join(self.conf.workdir, "manifest")

    def _til_out(self) -> str:
        return os.path.join(self.conf.workdir, "til_overviews")

    def _proxy_csv_out(self) -> str:
        return os.path.join(self.conf.workdir, "proxy_csv")

    def _l0_out(self) -> str:
        return os.path.join(self.conf.workdir, "tile_counts_l0")

    # -- level-0 tile store ------------------------------------------------
    # Versioned immutable snapshots behind a CURRENT pointer (same commit
    # model as ledger._atomic_overwrite); each version carries the list of
    # batch dirs folded into it as a `_merged_batches.txt` sidecar INSIDE
    # the version dir, so counts and merge history commit atomically —
    # a crash mid-finalize leaves the previous version current and the
    # new batches simply re-merge next run.
    def _batch_dirs(self) -> list[str]:
        root = self._pages_out()
        if not os.path.isdir(root):
            return []
        return sorted(n for n in os.listdir(root) if n.startswith("batch="))

    def _read_l0(self, spark: SparkSession
                 ) -> tuple[DataFrame | None, list[str]]:
        ptr = os.path.join(self._l0_out(), "CURRENT")
        if not os.path.exists(ptr):
            return None, []
        with open(ptr) as f:
            vdir = os.path.join(self._l0_out(), f.read().strip())
        with open(os.path.join(vdir, "_merged_batches.txt")) as f:
            merged = [x for x in f.read().splitlines() if x]
        return spark.read.parquet(vdir), merged

    def _write_l0(self, l0: DataFrame, merged_batches: list[str]) -> None:
        root = self._l0_out()
        os.makedirs(root, exist_ok=True)
        vname = f"v-{uuid.uuid4().hex[:12]}"
        vdir = os.path.join(root, vname)
        l0.write.mode("overwrite").parquet(vdir)
        # sidecar lands before the pointer flip; '_'-prefixed files are
        # invisible to parquet readers
        with open(os.path.join(vdir, "_merged_batches.txt"), "w") as f:
            f.write("\n".join(merged_batches))
        ptr_tmp = os.path.join(root, f".CURRENT.tmp-{uuid.uuid4().hex[:6]}")
        with open(ptr_tmp, "w") as f:
            f.write(vname)
        os.replace(ptr_tmp, os.path.join(root, "CURRENT"))

    def _vacuum_l0(self) -> int:
        """Drop superseded / orphaned (crash-before-pointer-flip) level-0
        versions — the tile store's expire-snapshots. Runs at job start
        like ledger.vacuum: no live plan can reference old versions."""
        root = self._l0_out()
        if not os.path.isdir(root):
            return 0
        cur = None
        ptr = os.path.join(root, "CURRENT")
        if os.path.exists(ptr):
            with open(ptr) as f:
                cur = f.read().strip()
        import shutil
        n = 0
        for name in os.listdir(root):
            full = os.path.join(root, name)
            if name != "CURRENT" and name != cur and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
                n += 1
        return n

    # -- lifecycle ---------------------------------------------------------
    def run(self, spark: SparkSession,
            pages: DataFrame | None = None,
            til_members: DataFrame | None = None,
            blocked: DataFrame | None = None) -> dict[str, DataFrame]:
        """``til_members`` (url, til_group) is the DECLARED group
        membership — the .til content analog. Completeness is judged
        against it, so members absent from this run's input keep their
        group un-finalized until a later run processes them. Defaults to
        deriving membership from the current input. ``blocked`` (bdom)
        is an optional domain blocklist applied with the other ingest
        hygiene filters (web.blocklist_filter — exact host or subdomain
        suffix), before the ledger init."""
        conf = self.conf
        os.makedirs(conf.workdir, exist_ok=True)
        L.vacuum(conf.workdir)  # drop snapshots no plan can reference now
        self._vacuum_l0()       # same for superseded level-0 versions
        if pages is None:
            pages = synth_pages(spark, conf.sf_dir)
        if conf.canonicalize_urls:
            from optimizerasters_spark.operators import web
            pages = (web.url_canonicalize(pages)
                     .withColumn("url", F.col("canon_url"))
                     .drop("canon_url", "changed"))
        pages = dedup.dedup_latest(pages)
        if conf.sample_milli is not None:
            from optimizerasters_spark.operators import web
            pages = web.hash_sample(pages, conf.sample_milli, "url")
        if conf.domain_cap_k is not None:
            from optimizerasters_spark.operators import web
            pages = web.domain_cap(pages, conf.domain_cap_k) \
                .drop("host")
        if conf.scrub_pii and "text" in pages.columns:
            from optimizerasters_spark.operators import web
            pages = pages.withColumn("text",
                                     web.scrubbed_col(F.col("text")))
        if blocked is not None:
            from optimizerasters_spark.operators import web
            pages = web.blocklist_filter(pages, blocked).drop("host")

        led = L.read_ledger(spark, conf.workdir)
        if led is None:
            led = L.init_ledger(spark, conf.workdir, pages, "url")
        elif conf.resume == "retryall":
            L.clear_statuses(spark, conf.workdir)
            led = L.read_ledger(spark, conf.workdir)

        # ---- stage "process": per-page tile assign + PIP join ----------
        # row counts ride the stage's own action (Observation) — no
        # extra count pass over the input; per-partition detail comes
        # from the written parquet footers (lineage.py)
        todo = L.pending(pages, led, "processed", "url")
        with lineage.StageTimer(spark, conf.workdir, self.run_id,
                                "process") as st:
            ok, failed = self._split_injected(st.observe(todo))
            self._process_batch(spark, ok, f"batch={self.run_id}",
                                timer=st)
            if failed is not None:
                # quarantine: mark 'no' (A6); dedup-append like
                # _addToFailedList, then ONE retry pass at the end.
                # upsert (not merge): a failed page that entered the
                # input after init must still be recorded
                L.upsert_status(spark, conf.workdir, failed.select("url"),
                                "processed", L.NO, self.run_id)

        # ---- retry pass: reprocess quarantined rows once ----------------
        led_now = L.read_ledger(spark, conf.workdir)
        retry = pages.join(
            led_now.where(F.col("processed") == L.NO).select("url"),
            "url", "left_semi")
        if not retry.isEmpty():
            with lineage.StageTimer(spark, conf.workdir, self.run_id,
                                    "retry") as st:
                self._process_batch(spark, st.observe(retry),
                                    f"batch={self.run_id}-retry",
                                    timer=st)

        # ---- stage "finalize": incremental pyramid merge + manifest -----
        # Counts are ASSOCIATIVE: aggregate only batch dirs not yet folded
        # into the persisted level-0 tile table and merge additively —
        # a resume that processes 0.1 % of pages pays 0.1 % of the
        # finalize, never a corpus-wide re-dedup (the round-2 shape read
        # and double-deduplicated the ENTIRE historical output each run).
        # Cross-batch duplicates can only live among UNMERGED batches
        # (a page re-emits only when its ledger mark was lost, and a
        # batch merges only after its marks land), so the (url,
        # polygon_id) dedup within the unmerged set is exhaustive.
        # repair=True / retryall / missing base fall back to the full
        # rebuild over every batch dir.
        l0_base, merged_batches = self._read_l0(spark)
        batches = self._batch_dirs()
        full_rebuild = (conf.repair or conf.resume == "retryall"
                        or l0_base is None)
        src = batches if full_rebuild \
            else [b for b in batches if b not in merged_batches]
        self.last_finalize_inputs = [
            os.path.join(self._pages_out(), b) for b in src]
        with lineage.StageTimer(spark, conf.workdir, self.run_id,
                                "finalize") as st:
            st.add_output_dir(self._tiles_out())
            if src:
                fresh = (spark.read.parquet(*self.last_finalize_inputs)
                         .dropDuplicates(["url", "polygon_id"])
                         .dropDuplicates(["url"]))
                fresh = st.observe(fresh)
                delta_l0 = spatial.tile_counts_l0(fresh)
                l0 = delta_l0 if full_rebuild \
                    else spatial.merge_l0(l0_base, delta_l0)
                self._write_l0(l0, batches if full_rebuild
                               else merged_batches + src)
                L.upsert_status(spark, conf.workdir, fresh.select("url"),
                                "uploaded", L.YES, self.run_id)
            counts = spatial.levels_from_l0(
                self._read_l0(spark)[0], conf.levels)
            counts.write.mode("overwrite").parquet(self._tiles_out())
            m = manifest.tile_manifest(spark.read.parquet(self._tiles_out()),
                                       conf.output_prefix)
            m = manifest.with_cache_paths(m, conf.output_prefix + "_cache",
                                          compression=conf.compression)
            m.write.mode("overwrite").parquet(self._manifest_out())
            # S13 ObjectID;Raster rows (dense ids, no global sort)
            manifest.proxy_csv_rows(spark.read.parquet(self._manifest_out())) \
                .write.mode("overwrite").parquet(self._proxy_csv_out())

        # ---- stage "til_finalize": gated group-level overviews ----------
        # A complete group (every member's ledger row 'yes') gets ONE
        # overview row appended; incomplete groups are held back and
        # finalize on a later run — the reference's per-.til barrier +
        # createaOverview/ovr->mrf post-processing (:6767-6821). Resume
        # skips groups already in the output (anti-join = the
        # _doPostProcessing ledger check).
        led_fin = L.read_ledger(spark, conf.workdir)
        declared = til_members if til_members is not None \
            else pages.select("url", til_group_col())
        members = declared.join(
            led_fin.select("url", "processed"), "url", "left") \
            .fillna({"processed": ""})
        with lineage.StageTimer(spark, conf.workdir, self.run_id,
                                "til_finalize") as st:
            members = st.observe(members)
            complete = groups.til_complete_groups(
                members, "til_group", "processed").select("til_group")
            # resume anti-join runs BEFORE the stats aggregation: only
            # groups RELEASING THIS RUN (complete and not yet written)
            # send member rows through the shuffle — a steady-state
            # resume shuffles ~nothing instead of re-aggregating every
            # group's full history each run
            try:
                done = spark.read.parquet(self._til_out()) \
                    .select("til_group").dropDuplicates(["til_group"])
                releasing = complete.join(done, "til_group", "left_anti")
            except Exception:  # first run — no output yet
                releasing = complete
            # O(releasing), never O(history): `releasing` is computed
            # from the ledger + the tiny overview output, so a
            # steady-state resume (nothing releasing) short-circuits
            # without touching page_tiles at all, and otherwise
            # page_tiles is semi-joined down to the releasing groups'
            # member urls BEFORE the url dedup — the shuffle is
            # proportional to the releasing members, not the corpus.
            if releasing.isEmpty():
                self.last_til_finalize_scanned = False
            else:
                self.last_til_finalize_scanned = True
                # overview stats group by the DECLARED membership (join
                # on url), not a re-derivation of the group key from the
                # url — a caller-supplied til_members whose grouping
                # differs from the default URL formula must aggregate
                # under ITS groups
                release_members = declared.select("url", "til_group") \
                    .join(releasing, "til_group", "left_semi")
                fresh = (spark.read.parquet(self._pages_out())
                         .select("url", "tile_x", "tile_y")
                         .join(release_members.select("url"),
                               "url", "left_semi")
                         .dropDuplicates(["url"])
                         .join(release_members, "url")
                         .groupBy("til_group")
                         .agg(F.count(F.lit(1)).alias("member_count"),
                              F.countDistinct("tile_x", "tile_y")
                               .alias("n_tiles")))
                if not fresh.isEmpty():
                    fresh.withColumn("finalized_run",
                                     F.lit(self.run_id)) \
                        .write.mode("append").parquet(self._til_out())

        out = {
            "page_tiles": spark.read.parquet(self._pages_out())
                               .dropDuplicates(["url", "polygon_id"]),
            "tile_counts": spark.read.parquet(self._tiles_out()),
            "manifest": spark.read.parquet(self._manifest_out()),
            "proxy_csv": spark.read.parquet(self._proxy_csv_out()),
            "ledger": L.read_ledger(spark, conf.workdir),
        }
        try:
            out["til_overviews"] = spark.read.parquet(self._til_out())
        except Exception:
            out["til_overviews"] = None
        return out

    # -- internals -----------------------------------------------------------
    def _split_injected(self, todo: DataFrame):
        """Fault injection split: (ok, failed|None)."""
        mod = self.conf.inject_fail_mod
        if not mod:
            return todo, None
        return (todo.where(F.col("doc_id") % mod != 0),
                todo.where(F.col("doc_id") % mod == 0))

    def _process_batch(self, spark: SparkSession, batch: DataFrame,
                       batch_name: str, timer=None) -> None:
        """Tile + PIP join a page batch, append its output dir, then MERGE
        the ledger (write-before-mark = at-least-once + dedup)."""
        tiled = spatial.with_tiles(batch)
        joined = spatial.pip_join(tiled, synth_boundaries(spark),
                                  how="left")
        out = joined.select(
            "url", "doc_id", "tile_x", "tile_y", "polygon_id",
            "warc_epoch", "lang", "text",
            F.sha2(F.col("text"), 256).alias("text_sha"))
        ql = self.conf.queue_length
        if ql:
            # bound pages per WRITE task (the -queuelength chunk math).
            # Applied at the sink — an upstream repartition would be
            # absorbed by the join/agg shuffles. repartition-by-number is
            # exempt from AQE coalescing, so the file count holds.
            n = batch.count()
            if n == 0:
                return
            out = out.repartition(max(1, -(-n // ql)))
        batch_dir = os.path.join(self._pages_out(), batch_name)
        out.write.mode("overwrite").parquet(batch_dir)
        if timer is not None:
            timer.add_output_dir(batch_dir)
        # upsert (not merge): pages that entered the input AFTER the
        # ledger was initialized must be inserted, or they would
        # reprocess on every resume with their status never recorded
        L.upsert_status(spark, self.conf.workdir,
                        spark.read.parquet(batch_dir).select("url"),
                        "processed", L.YES, self.run_id)

    # -- embedding API ------------------------------------------------------
    def get_ledger(self, spark: SparkSession) -> DataFrame | None:
        return L.read_ledger(spark, self.conf.workdir)

    def has_failures(self, spark: SparkSession) -> bool:
        led = self.get_ledger(spark)
        return led is not None and L.has_failures(led)

    def get_metrics(self, spark: SparkSession) -> DataFrame | None:
        return lineage.read_metrics(spark, self.conf.workdir)
