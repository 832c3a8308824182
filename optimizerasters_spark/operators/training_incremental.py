"""Incremental corpus build: the training-data pipeline as a RESUMABLE
batch-ingest engine (the streaming-shaped twin of operators/training.py,
state-on-parquet like engine.py's level-0 store).

A 100 TB corpus is not deduplicated in one job — crawls arrive in
batches, and each batch must dedup against everything ACCEPTED so far
without re-scanning it. State per workdir (append-only parquet):

  * ``shas``  — sha256 of every accepted text (exact-dup gate),
  * ``bands`` — (doc_id, band_id, band_key) LSH bands of accepted docs
    (near-dup gate: new docs meet old docs ONLY through a band-bucket
    equi-join — O(batch + matched candidates), never O(corpus)),
  * ``kept``  — the accepted documents themselves.

Ingest order is acceptance order: first-arrived wins (the old doc keeps
its slot, the newcomer drops), which equals the batch pipeline's
lowest-doc_id-wins rule whenever batches arrive in id order — the
equivalence test pins that. Within a batch, the batch rule applies
verbatim (exact: min doc_id per sha; near-dup: drop the higher id of
every Jaccard-verified pair).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from optimizerasters_spark.operators import dedup as D
from optimizerasters_spark.operators import training as T


class CorpusBuilder:
    """CorpusBuilder(workdir).ingest(batch_df) -> per-batch stats."""

    def __init__(self, workdir: str, jaccard_micro: int = T.JACCARD_MICRO,
                 num_hashes: int = 8, bands: int = 4, shingle_n: int = 3):
        self.workdir = workdir
        self.jaccard_micro = jaccard_micro
        self.num_hashes, self.bands, self.shingle_n = \
            num_hashes, bands, shingle_n
        os.makedirs(workdir, exist_ok=True)

    def _p(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _read(self, spark: SparkSession, name: str) -> DataFrame | None:
        try:
            return spark.read.parquet(self._p(name))
        except Exception:
            return None

    def kept(self, spark: SparkSession) -> DataFrame | None:
        return self._read(spark, "kept")

    def ingest(self, spark: SparkSession, batch: DataFrame
               ) -> dict[str, int]:
        """Dedup ``batch`` against itself and all prior state; append
        survivors. Returns acceptance stats."""
        n_in = batch.count()
        # 1. exact: one representative (min doc_id) per sha within the
        #    batch, then anti-join the accepted sha set
        b = batch.withColumn("text_sha", F.sha2(F.col("text"), 256))
        w_min = b.groupBy("text_sha").agg(F.min("doc_id").alias("doc_id"))
        reps = b.join(w_min, ["text_sha", "doc_id"], "left_semi")
        old_shas = self._read(spark, "shas")
        if old_shas is not None:
            reps = reps.join(old_shas, "text_sha", "left_anti")

        # 2. bands for the surviving batch docs (O(batch))
        new_bands = D._banded_signatures(
            reps, self.num_hashes, self.bands, self.shingle_n,
            "text", None)

        # 3a. intra-batch near-dups: the batch rule verbatim
        intra_victims = (D.ngram_jaccard_pairs(
            reps, self.num_hashes, self.bands, self.shingle_n,
            min_jaccard_micro=self.jaccard_micro)
            .select(F.col("doc_b").alias("doc_id")).distinct())
        reps2 = reps.join(intra_victims, "doc_id", "left_anti")

        # 3b. cross-state near-dups: new docs meeting ACCEPTED docs in a
        #     band bucket, Jaccard-verified against those old docs only
        old_bands = self._read(spark, "bands")
        if old_bands is not None:
            cand = (new_bands.join(
                        old_bands
                        .withColumnRenamed("doc_id", "old_id"),
                        ["band_id", "band_key"])
                    .select("doc_id", "old_id").distinct())
            if not cand.isEmpty():
                kept_old = self._read(spark, "kept")
                old_docs = (kept_old
                            .join(cand.select("old_id").distinct(),
                                  kept_old["doc_id"] == F.col("old_id"),
                                  "left_semi"))
                both = reps2.select("doc_id", "text").unionByName(
                    old_docs.select("doc_id", "text"))
                sh = D.exploded_shingles(both, self.shingle_n, "text")
                sizes = sh.groupBy("doc_id").agg(
                    F.count(F.lit(1)).alias("n_sh"))
                sa = sh.select(F.col("doc_id").alias("old_id"), "s")
                sb = sh.select(F.col("doc_id"), "s")
                inter = (cand.join(sa, "old_id").join(sb, ["doc_id", "s"])
                         .groupBy("doc_id", "old_id")
                         .agg(F.count(F.lit(1)).alias("n_inter")))
                jac = (inter
                       .join(sizes.select(
                           F.col("doc_id").alias("old_id"),
                           F.col("n_sh").alias("n_a")), "old_id")
                       .join(sizes.select("doc_id",
                                          F.col("n_sh").alias("n_b")),
                             "doc_id")
                       .where(F.floor(F.col("n_inter") * 1000000 /
                              (F.col("n_a") + F.col("n_b") -
                               F.col("n_inter")))
                              >= self.jaccard_micro))
                cross_victims = jac.select("doc_id").distinct()
                reps2 = reps2.join(cross_victims, "doc_id", "left_anti")

        # 4. append survivors + their state (write-once per batch; the
        #    kept write lands LAST so a crash mid-ingest over-filters
        #    (re-ingest drops already-recorded survivors as exact dups)
        #    rather than double-accepting)
        accepted = reps2
        n_acc = accepted.count()
        if n_acc > 0:
            accepted.select("text_sha").write.mode("append") \
                .parquet(self._p("shas"))
            (new_bands.join(accepted.select("doc_id"), "doc_id",
                            "left_semi")
             .write.mode("append").parquet(self._p("bands")))
            accepted.drop("text_sha").write.mode("append") \
                .parquet(self._p("kept"))
        return {"in": n_in, "accepted": n_acc}
