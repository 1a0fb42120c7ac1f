"""Retraction-maintained training-shard layout (operators/shards.py).

The shard layout is the LAST structure in the maintenance family — the
one trainers actually read — and it is the cheapest to maintain
incrementally because every cross-document dependency is confined to a
shard: a document's shard is a pure hash of its id, so a corpus delta
(inserts, deletes, changed docs as ±1 Z-set tuples) touches exactly the
shards of the changed documents, and repacking a shard needs only that
shard's surviving (doc_id, okey, n_tokens) rows — which the persisted
layout already carries.  Per batch:

  work   = O(|delta|) per-doc facts + a repack window over the touched
           shards only (the packing window partitions by shard, so a
           touched-shards-only input recomputes exactly those)
  writes = touched shard partitions of `layout` and `manifest`;
           untouched shard directories hard-link through the atomic
           swap (ParquetUpsertSink._swap_in_frames prune=)

State, one swap-atomic directory:

  layout/   (doc_id, okey, n_tokens, dfp, start_offset, first_seq,
             n_crossings) partitioned by shard — the packed order a
             trainer streams; dfp is the content fingerprint the
             CLI's kept-corpus self-diff keys on (no text in state)
  manifest/ (n_docs, n_tokens, n_seqs, shard_fp) partitioned by shard —
             per-shard integrity record (order-independent bit_xor over
             the packed rows)

Exactly-once, single-writer lease, ledger auto-compaction, and the
parameter fingerprint (n_shards, seq_len) all come from the
ParquetUpsertSink template.  Note n_shards is NOT a rebucket-able
layout key: growing it changes the assignment itself (every manifest
row moves), so the correct migration is a rebuild under a bumped
structure version, never an in-place rewrite.

Reference parity: the staging step of the reference's batched COPY
loader (loader.py:512-516) — re-expressed as a resumable,
incrementally maintained layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.shards import (
    N_SHARDS,
    SEQ_LEN,
    shard_base,
    shard_layout_from_lengths,
    shard_manifest,
    shard_of,
)
from vcf_pg_loader_spark.streaming.retract import split_zset
from vcf_pg_loader_spark.streaming.sink import ParquetUpsertSink, isin_values

_LAYOUT_COLS = ["doc_id", "shard", "okey", "n_tokens", "dfp"]


class TrainingShardSink(ParquetUpsertSink):
    """Maintains the training-shard layout from a documents Z-set."""

    def __init__(
        self,
        target: str,
        n_shards: int = N_SHARDS,
        seq_len: int = SEQ_LEN,
        merges: list[tuple[str, str]] | None = None,
        vocab_fp: int | None = None,
    ):
        """``merges`` switches packing to TOKENIZER space: per-doc
        n_tokens comes from operators/bpe.py bpe_token_lengths under
        the given merge table instead of the whitespace count, so the
        layout's seq_len cuts speak the trainer's tokens (round-11
        verdict item 3).  ``vocab_fp`` is the vocab artifact's
        corpus_fp (cli train-vocab); it joins the parameter fingerprint
        so a layout packed under one tokenizer REFUSES maintenance or
        reads under another."""
        super().__init__(target, key=["doc_id"])
        self.n_shards = n_shards
        self.seq_len = seq_len
        self.merges = (
            [tuple(m) for m in merges] if merges is not None else None
        )
        self.vocab_fp = vocab_fp

    def _params_fingerprint(self) -> dict:
        # every key is SEMANTIC: a different shard count moves every
        # document's assignment, a different seq_len changes every
        # packed offset, and a different tokenizer changes every length
        # — state built under other values must refuse
        fp = {"n_shards": self.n_shards, "seq_len": self.seq_len}
        if self.merges is not None:
            fp["token_space"] = "bpe"
            fp["vocab_fp"] = self.vocab_fp
        return fp

    def _lengths(self, docs: DataFrame) -> DataFrame | None:
        if self.merges is None:
            return None
        from vcf_pg_loader_spark.operators.bpe import bpe_token_lengths

        return bpe_token_lengths(docs, self.merges)

    # -- serve ----------------------------------------------------------
    def manifest(self, spark) -> DataFrame:
        man = self._table(spark, "manifest")
        if man is None:
            raise FileNotFoundError(
                f"no maintained state at {self.target}; apply a batch first"
            )
        # partition-column inference may narrow shard to int; serve the
        # declared bigint shape
        return man.select(
            F.col("shard").cast("bigint").alias("shard"),
            "n_docs",
            "n_tokens",
            "n_seqs",
            "shard_fp",
        )

    def layout(self, spark) -> DataFrame:
        lay = self._table(spark, "layout")
        if lay is None:
            raise FileNotFoundError(
                f"no maintained state at {self.target}; apply a batch first"
            )
        return lay.select(
            "doc_id",
            F.col("shard").cast("bigint").alias("shard"),
            "okey",
            "n_tokens",
            "dfp",
            "start_offset",
            "first_seq",
            "n_crossings",
        )

    def materialize(
        self, spark, corpus: DataFrame, shards: list[int] | None = None
    ) -> DataFrame:
        """The loader read path: join the layout against a corpus
        (doc_id, text) and emit each requested shard's documents in
        packed order with their offsets — the stream a trainer cuts
        into sequences.  The join prunes to the requested shards
        BEFORE touching the corpus (broadcast of the shard rows when
        small, shuffle-on-doc_id otherwise — Spark's planner picks),
        so materializing one shard reads O(shard), not O(corpus).
        Text lives in the corpus only; shard state stays text-free."""
        lay = self.layout(spark)
        if shards is not None:
            from vcf_pg_loader_spark.streaming.sink import isin_values

            lay = lay.filter(isin_values(F.col("shard"), set(shards)))
        return (
            lay.join(corpus.select("doc_id", "text"), "doc_id")
            .select(
                "shard",
                "okey",
                "doc_id",
                "start_offset",
                "first_seq",
                "n_tokens",
                "text",
            )
            # one partition per shard BEFORE the within-partition sort:
            # without it the join's partitioning can interleave one
            # shard's rows across partitions and the "packed order"
            # this method promises would only hold per-partition
            # (round-11 advice item 3)
            .repartition(F.col("shard"))
            .sortWithinPartitions("shard", "okey", "doc_id")
        )

    # -- maintenance -----------------------------------------------------
    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ins, dels = split_zset(batch_df, "doc_id")
        ins = ins.dropDuplicates(["doc_id"])
        touched = dels.unionByName(ins.select("doc_id")).distinct()

        new_base = shard_base(
            ins, n_shards=self.n_shards, lengths=self._lengths(ins)
        )
        old = self._table_raw(spark, "layout")
        if old is None:
            base = new_base
            prune = None
        else:
            # touched shard set: bounded by n_shards — control-plane
            tb = {
                r[0]
                for r in touched.select(
                    shard_of(F.col("doc_id"), self.n_shards).alias("b")
                )
                .distinct()
                .collect()
            }
            surviving = (
                old.filter(isin_values(F.col("shard"), tb))
                .join(touched, "doc_id", "left_anti")
                .select(*_LAYOUT_COLS)
            )
            base = surviving.unionByName(new_base.select(*_LAYOUT_COLS))
            prune = {f"shard={b}" for b in tb}

        layout = shard_layout_from_lengths(base, self.seq_len)
        man = shard_manifest(layout, self.seq_len)
        n = self._swap_in_frames(
            {"layout": layout, "manifest": man},
            batch_id,
            count_table="layout",
            partition_by={"layout": ["shard"], "manifest": ["shard"]},
            prune=(
                {"layout": prune, "manifest": prune}
                if prune is not None
                else None
            ),
        )
        self._record(batch_id, n)
