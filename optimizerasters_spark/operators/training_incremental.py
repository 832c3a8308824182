"""Incremental corpus build: the training-data pipeline as a RESUMABLE
batch-ingest engine (the streaming-shaped twin of operators/training.py,
state-on-parquet like engine.py's level-0 store).

A 100 TB corpus is not deduplicated in one job — crawls arrive in
batches, and each batch must dedup against everything ACCEPTED so far
without re-scanning it. State per workdir (append-only parquet, every
row stamped with its ``batch_seq``):

  * ``shas``  — sha256 of every accepted text (exact-dup gate),
  * ``bands`` — (doc_id, band_id, band_key) LSH bands of accepted docs
    (near-dup gate: new docs meet old docs ONLY through a band-bucket
    equi-join — O(batch + matched candidates), never O(corpus)),
  * ``kept``  — the accepted documents themselves.

Crash safety (the ledger.py ``_commit`` pattern): each ingest first
claims a monotonically increasing attempt id in ``_attempts.txt``,
stamps every state row it appends with that id, and appends the id to
``_commits.txt`` only AFTER all three parquet appends landed. Readers
filter state to committed attempt ids, so a crash anywhere mid-ingest
leaves orphan rows that are invisible forever — a re-ingest of the same
batch dedups against committed state only and accepts the full batch.
No crash window loses documents.

Ingest order is acceptance order: first-arrived wins (the old doc keeps
its slot, the newcomer drops). Within a batch, the one-shot batch rule
applies verbatim (exact: min doc_id per sha; near-dup: drop the higher
id of every Jaccard-verified pair). Across batches the match to the
one-shot pipeline holds for exact duplicates and for DIRECT near-dup
pairs under id-ordered arrival; it intentionally diverges on TRANSITIVE
chains: bands of dropped near-dup victims are not persisted, so a later
doc that near-dups ONLY an already-dropped victim is accepted (it
duplicates nothing in the corpus), whereas the one-shot pipeline's
pair set over all reps would drop it. The equivalence test excludes
such chains; the divergence is the better dedup semantics, not an
accident.
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
        # test hook: raise after the named state append ("shas" |
        # "bands" | "kept") to simulate a crash inside the write window
        self._crash_after: str | None = None
        os.makedirs(workdir, exist_ok=True)

    def _p(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _ids(self, name: str) -> list[int]:
        try:
            with open(self._p(name)) as fh:
                return [int(ln) for ln in fh.read().split() if ln]
        except FileNotFoundError:
            return []

    def _claim_attempt(self) -> int:
        seq = max(self._ids("_attempts.txt"), default=0) + 1
        with open(self._p("_attempts.txt"), "a") as fh:
            fh.write(f"{seq}\n")
        return seq

    def _commit(self, seq: int) -> None:
        with open(self._p("_commits.txt"), "a") as fh:
            fh.write(f"{seq}\n")

    def _read(self, spark: SparkSession, name: str) -> DataFrame | None:
        """Committed state only: orphan rows from crashed attempts are
        filtered out here and never influence any later ingest."""
        committed = self._ids("_commits.txt")
        if not committed:
            return None
        try:
            df = spark.read.parquet(self._p(name))
        except Exception:
            return None
        return df.where(F.col("batch_seq").isin(committed)) \
            .drop("batch_seq")

    def _append(self, df: DataFrame, name: str, seq: int) -> None:
        df.withColumn("batch_seq", F.lit(seq)) \
            .write.mode("append").parquet(self._p(name))
        if self._crash_after == name:
            raise RuntimeError(f"injected crash after {name} append")

    def kept(self, spark: SparkSession) -> DataFrame | None:
        return self._read(spark, "kept")

    def ingest(self, spark: SparkSession, batch: DataFrame
               ) -> dict[str, int]:
        """Dedup ``batch`` against itself and all committed prior state;
        append survivors and commit. Returns acceptance stats."""
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
        kept_old = self._read(spark, "kept")
        # bands and kept commit atomically (one marker per attempt), so
        # bands-without-kept cannot happen; guard anyway so a manually
        # mangled workdir degrades to "no cross-state verify" instead of
        # an AttributeError
        if old_bands is not None and kept_old is not None:
            cand = (new_bands.join(
                        old_bands
                        .withColumnRenamed("doc_id", "old_id"),
                        ["band_id", "band_key"])
                    .select("doc_id", "old_id").distinct())
            if not cand.isEmpty():
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

        # 4. append survivors + their state under a fresh attempt id;
        #    the commit marker lands LAST, so a crash between any two
        #    appends leaves only invisible orphan rows and the batch
        #    re-ingests cleanly (no document is ever lost)
        accepted = reps2
        n_acc = accepted.count()
        if n_acc > 0:
            seq = self._claim_attempt()
            self._append(accepted.select("text_sha"), "shas", seq)
            self._append(
                new_bands.join(accepted.select("doc_id"), "doc_id",
                               "left_semi"),
                "bands", seq)
            self._append(accepted.drop("text_sha"), "kept", seq)
            self._commit(seq)
        return {"in": n_in, "accepted": n_acc}
