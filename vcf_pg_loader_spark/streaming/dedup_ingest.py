"""Streaming near-dup-gated corpus ingest: every arriving micro-batch of
documents is admitted only if it is neither an exact copy nor a near-dup
of anything already admitted — the online form of the batch dedup
pipeline (operators/dedup.py), maintained exactly-once.

State is two tables inside ONE swap-atomic target directory:

  corpus/  (doc_id, text, doc_fp)        — the admitted documents
  bands/   (doc_id, band_id, band_key)   — their LSH index
                                           (operators/dedup.py
                                           lsh_band_table)

Admission for a batch:
  1. exact gate: md5 fingerprint anti-join against corpus (plus
     intra-batch min-id per fingerprint);
  2. near-dup gate vs EXISTING docs: the batch's band rows equi-join the
     persisted band INDEX — only colliding docs fetch shingles for exact
     Jaccard verification, so per-batch cost ∝ batch size + collisions,
     NEVER a corpus re-scan (the property that makes streaming ingest
     sustainable at 100 TB);
  3. near-dup gate within the batch itself (keep min-id per cluster via
     the batch-local LSH + connected components).

Exactly-once: ledger + in-target batch marker + two-move swap recovery,
inherited from ParquetUpsertSink (streaming/sink.py).  Both state
tables stage into one directory and swap together, so a crash can never
leave corpus and index describing different document sets.

Determinism: all hashes are the md5-derived h60 family, so the admitted
set is a pure function of the arrival partition into batches.  Order
DOES matter across batches — first arrival wins, later near-dups are
rejected — which is the semantics an ingest gate wants (batch dedup's
min-id canonical is the offline analogue).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators import dedup as D
from vcf_pg_loader_spark.operators.text import fingerprint
from vcf_pg_loader_spark.streaming.sink import ParquetUpsertSink


class NearDupIngestSink(ParquetUpsertSink):
    def __init__(
        self,
        target: str,
        ngram: int = 3,
        k: int = 8,
        bands: int = 4,
        threshold: float = 0.8,
    ):
        super().__init__(target, key=["doc_id"])
        self.ngram = ngram
        self.k = k
        self.bands = bands
        self.threshold = threshold

    # -- state ----------------------------------------------------------
    def read_corpus(self, spark) -> DataFrame:
        return self._table(spark, "corpus")

    def read(self, spark) -> DataFrame:  # the base reads target/ directly
        return self.read_corpus(spark)

    # -- admission ------------------------------------------------------
    def _admit(self, spark, batch: DataFrame) -> DataFrame:
        """The subset of `batch` that survives all three gates, with its
        doc_fp column attached."""
        fp = fingerprint(batch.dropDuplicates(["doc_id"]))

        # intra-batch exact: min doc_id per fingerprint
        canon = fp.groupBy("doc_fp").agg(F.min("doc_id").alias("doc_id"))
        fp = fp.join(canon, ["doc_fp", "doc_id"], "left_semi")

        corpus_old = self._table(spark, "corpus")
        if corpus_old is not None:
            fp = fp.join(
                corpus_old.select("doc_fp").distinct(), "doc_fp", "left_anti"
            )

        from pyspark.storagelevel import StorageLevel

        sh_new = D.shingles(fp, "doc_id", "text", self.ngram).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        bands_new = D.lsh_band_table(
            D.minhash_signatures(sh_new, self.k), self.k, self.bands
        )

        # near-dup vs EXISTING: collide against the persisted index,
        # verify only colliding (new, old) pairs with exact Jaccard
        bands_old = self._table(spark, "bands")
        if bands_old is not None and corpus_old is not None:
            cand = (
                bands_new.alias("n")
                .join(
                    bands_old.alias("o"),
                    (F.col("n.band_id") == F.col("o.band_id"))
                    & (F.col("n.band_key") == F.col("o.band_key")),
                )
                .select(
                    F.col("o.doc_id").alias("d1"), F.col("n.doc_id").alias("d2")
                )
                .distinct()
            )
            # shingles for the colliding OLD docs only
            old_hit = corpus_old.join(
                cand.select(F.col("d1").alias("doc_id")).distinct(),
                "doc_id",
                "left_semi",
            )
            sh_old = D.shingles(old_hit, "doc_id", "text", self.ngram)
            dup = D.verify_candidate_jaccard(
                cand, sh_old.unionByName(sh_new), self.threshold
            )
            fp = fp.join(
                dup.select(F.col("d2").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            )

        # near-dup within the batch: LSH + CC, keep min-id per cluster
        pairs = D.verify_candidate_jaccard(
            D.lsh_candidate_pairs(
                D.minhash_signatures(sh_new, self.k), self.k, self.bands
            ),
            sh_new,
            self.threshold,
        )
        # restrict to pairs still alive after the gates above
        alive = fp.select("doc_id")
        pairs = (
            pairs.join(
                alive.withColumnRenamed("doc_id", "d1"), "d1", "left_semi"
            ).join(alive.withColumnRenamed("doc_id", "d2"), "d2", "left_semi")
        )
        cc = D.connected_components(pairs.select("d1", "d2"), "d1", "d2")
        admitted = D.keep_canonical(fp, cc, "doc_id")
        sh_new.unpersist()
        return admitted

    # -- exactly-once apply --------------------------------------------
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.applied(batch_id):
            return
        self._recover()
        marker = self._read_marker()
        if marker is not None and marker["batch_id"] == batch_id:
            self._record(batch_id, marker["n_rows"])
            return
        spark = batch_df.sparkSession
        admitted = self._admit(spark, batch_df)
        corpus_old = self._table(spark, "corpus")
        new_corpus = (
            admitted
            if corpus_old is None
            else corpus_old.unionByName(admitted)
        )
        add_bands = D.lsh_band_table(
            D.minhash_signatures(
                D.shingles(admitted, "doc_id", "text", self.ngram), self.k
            ),
            self.k,
            self.bands,
        )
        bands_old = self._table(spark, "bands")
        new_bands = (
            add_bands
            if bands_old is None
            else bands_old.unionByName(add_bands)
        )
        n = self._swap_in_frames(
            {"corpus": new_corpus, "bands": new_bands},
            batch_id,
            count_table="corpus",
        )
        self._record(batch_id, n)


class BM25IndexSink(ParquetUpsertSink):
    """Live keyword-search maintenance: each micro-batch's documents
    tokenize ONCE and their postings/doclens append into a persisted
    BM25 index (sources/bm25_index.py layout); corpus stats recompute
    from the (tiny) doclens table.  Serving goes through
    BM25Index.search at any moment — the streaming completion of the
    build-once/serve-many story: the index is now MAINTAINED, not just
    built.

    Documents are immutable once indexed (re-sent doc_ids are dropped —
    the ingest-idempotence stance); postings for a batch are therefore
    pure appends, and all three tables swap together so postings,
    lengths, and stats always describe the same corpus."""

    def __init__(self, target: str, id_col: str = "doc_id", text_col: str = "text"):
        super().__init__(target, key=[id_col])
        self.id_col = id_col
        self.text_col = text_col

    def index(self, spark):
        from vcf_pg_loader_spark.sources.bm25_index import BM25Index

        return BM25Index(spark, self.target)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from vcf_pg_loader_spark.sources.bm25_index import _term_bucket

        if self.applied(batch_id):
            return
        self._recover()
        marker = self._read_marker()
        if marker is not None and marker["batch_id"] == batch_id:
            self._record(batch_id, marker["n_rows"])
            return
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([self.id_col])
        old_dl = self._table(spark, "doclens")
        if old_dl is not None:
            batch = batch.join(
                old_dl.select(F.col("doc_id").alias(self.id_col)),
                self.id_col,
                "left_anti",
            )
        toks = batch.select(
            F.col(self.id_col).alias("doc_id"),
            F.explode(F.split(F.col(self.text_col), " ")).alias("term"),
        ).filter(F.col("term") != "")
        tf = (
            toks.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("bucket", _term_bucket(F.col("term")))
        )
        dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        old_tf = self._table(spark, "postings")
        new_tf = tf if old_tf is None else old_tf.unionByName(tf)
        new_dl = dl if old_dl is None else old_dl.unionByName(dl)
        stats = new_dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("dl").cast("bigint")).cast("double")
                / F.count(F.lit(1))
            ).alias("avgdl"),
        )
        n = self._swap_in_frames(
            {"postings": new_tf, "doclens": new_dl, "stats": stats},
            batch_id,
            count_table="doclens",
            partition_by={"postings": ["bucket"]},
        )
        self._record(batch_id, n)
