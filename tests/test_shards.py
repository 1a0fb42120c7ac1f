"""Training-shard layout (operators/shards.py, streaming/shards.py).

Packing invariants, incremental-equals-scratch maintenance, replay
idempotence, parameter-fingerprint refusal, and the inode-level pin
that a small delta rewrites only the touched shard partitions.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators import shards as SH
from vcf_pg_loader_spark.operators.ivm import MULT, zset_snapshot_delta
from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india".split()


def _docs(spark, ids):
    rows = [
        (i, " ".join(WORDS[(i + j) % len(WORDS)] for j in range((i % 17) + 3)))
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _scratch(docs):
    return (
        SH.shard_manifest(SH.shard_layout(docs))
        .orderBy("shard")
        .collect()
    )


def _served(sink, spark):
    return sink.manifest(spark).orderBy("shard").collect()


class TestLayoutInvariants:
    def test_offsets_contiguous_per_shard(self, spark):
        lay = SH.shard_layout(_docs(spark, range(200))).collect()
        by_shard: dict[int, list] = {}
        for r in lay:
            by_shard.setdefault(r.shard, []).append(r)
        assert len(by_shard) > 1
        for rows in by_shard.values():
            rows.sort(key=lambda r: (r.okey, r.doc_id))
            pos = 0
            for r in rows:
                assert r.start_offset == pos
                assert r.first_seq == pos // SH.SEQ_LEN
                last = pos + r.n_tokens - 1
                assert r.n_crossings == last // SH.SEQ_LEN - r.first_seq
                pos += r.n_tokens

    def test_assignment_is_pure_function_of_id(self, spark):
        a = {
            r.doc_id: (r.shard, r.okey)
            for r in SH.shard_layout(_docs(spark, range(50))).collect()
        }
        # a different corpus containing some of the same ids assigns
        # them identically — the property that confines deltas
        b = {
            r.doc_id: (r.shard, r.okey)
            for r in SH.shard_layout(
                _docs(spark, range(0, 100, 2))
            ).collect()
        }
        for i in set(a) & set(b):
            assert a[i] == b[i]

    def test_manifest_covers_packing(self, spark):
        docs = _docs(spark, range(120))
        man = {r.shard: r for r in _scratch(docs)}
        lay = SH.shard_layout(docs).collect()
        for s, r in man.items():
            toks = sum(x.n_tokens for x in lay if x.shard == s)
            assert r.n_tokens == toks
            assert r.n_seqs == -(-toks // SH.SEQ_LEN)


class TestShardSequences:
    def test_spans_tile_sequences_and_documents(self, spark):
        docs = _docs(spark, range(180))
        lay = SH.shard_layout(docs)
        spans = SH.shard_sequences(lay).collect()

        # every document's spans tile [0, n_tokens) in order
        ntok = {r.doc_id: r.n_tokens for r in lay.collect()}
        by_doc: dict[int, list] = {}
        for r in spans:
            by_doc.setdefault(r.doc_id, []).append(r)
        for d, rows in by_doc.items():
            rows.sort(key=lambda r: r.tok_start)
            pos = 0
            for r in rows:
                assert r.tok_start == pos
                assert r.tok_len > 0
                pos += r.tok_len
            assert pos == ntok[d]

        # every sequence's spans tile [0, seq_len) except the shard's
        # final (ragged) sequence
        by_seq: dict[tuple, list] = {}
        for r in spans:
            by_seq.setdefault((r.shard, r.seq_id), []).append(r)
        last_seq = {}
        for (s, q) in by_seq:
            last_seq[s] = max(last_seq.get(s, -1), q)
        for (s, q), rows in by_seq.items():
            rows.sort(key=lambda r: r.seq_off)
            pos = 0
            for r in rows:
                assert r.seq_off == pos
                pos += r.tok_len
            if q < last_seq[s]:
                assert pos == SH.SEQ_LEN
            else:
                assert 0 < pos <= SH.SEQ_LEN


class TestMaintainedShards:
    def test_incremental_equals_scratch(self, spark, tmp_path):
        sink = TrainingShardSink(str(tmp_path / "state"))
        d0 = _docs(spark, range(100))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        assert _served(sink, spark) == _scratch(d0)

        # delete some, change some, insert some — one Z-set batch
        d1 = _docs(spark, [i for i in range(130) if i % 9 != 4]).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 11 == 3,
                F.concat(F.col("text"), F.lit(" changed")),
            ).otherwise(F.col("text")),
        )
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)
        assert _served(sink, spark) == _scratch(d1)
        lay = (
            sink.layout(spark)
            .orderBy("shard", "okey", "doc_id")
            .drop("shard")
            .collect()
        )
        scratch_lay = (
            SH.shard_layout(d1)
            .orderBy("shard", "okey", "doc_id")
            .drop("shard")
            .collect()
        )
        assert lay == scratch_lay

    def test_replay_is_noop(self, spark, tmp_path):
        sink = TrainingShardSink(str(tmp_path / "state"))
        d0 = _docs(spark, range(40))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        before = _served(sink, spark)
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        assert _served(sink, spark) == before

    def test_param_mismatch_refused(self, spark, tmp_path):
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)
        sink.apply_batch(
            _docs(spark, range(20)).withColumn(
                MULT, F.lit(1).cast("bigint")
            ),
            0,
        )
        other = TrainingShardSink(t, seq_len=SH.SEQ_LEN * 2)
        with pytest.raises(ValueError, match="parameters"):
            other.apply_batch(
                _docs(spark, range(20, 25)).withColumn(
                    MULT, F.lit(1).cast("bigint")
                ),
                1,
            )

    def test_fully_retracted_shard_vanishes(self, spark, tmp_path):
        sink = TrainingShardSink(str(tmp_path / "state"))
        d0 = _docs(spark, range(60))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        # retract every doc of one shard
        sh = {r.doc_id: r.shard for r in SH.shard_layout(d0).collect()}
        victim = sh[0]
        keep_ids = [i for i, s in sh.items() if s != victim]
        d1 = _docs(spark, keep_ids)
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)
        served = _served(sink, spark)
        assert victim not in {r.shard for r in served}
        assert served == _scratch(d1)


class TestMaterialize:
    def test_materialize_packs_in_layout_order(self, spark, tmp_path):
        corpus = _docs(spark, range(80))
        sink = TrainingShardSink(str(tmp_path / "state"))
        sink.apply_batch(
            corpus.withColumn(MULT, F.lit(1).cast("bigint")), 0
        )
        out = sink.materialize(spark, corpus, shards=[0, 3]).collect()
        assert {r.shard for r in out} == {0, 3}
        texts = {r.doc_id: r.text for r in corpus.collect()}
        lay = {
            r.doc_id: r
            for r in SH.shard_layout(corpus).collect()
            if r.shard in (0, 3)
        }
        assert {r.doc_id for r in out} == set(lay)
        for r in out:
            assert r.text == texts[r.doc_id]
            assert r.start_offset == lay[r.doc_id].start_offset

    def test_export_shard_cli(self, spark, tmp_path, capsys):
        import json as _json

        from vcf_pg_loader_spark.cli import main

        corpus_path = str(tmp_path / "corpus")
        corpus = _docs(spark, range(60))
        corpus.write.parquet(corpus_path)
        state = str(tmp_path / "state")
        TrainingShardSink(state).apply_batch(
            corpus.withColumn(MULT, F.lit(1).cast("bigint")), 0
        )
        out = str(tmp_path / "out")
        assert main(
            ["export-shard", "--state", state, "--corpus", corpus_path,
             "--out", out, "--shards", "1,2"]
        ) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["shards"] == 2
        got = spark.read.parquet(out)
        assert {r.shard for r in got.select("shard").distinct().collect()} \
            == {1, 2}
        # per-shard token totals match the manifest
        man = {
            r.shard: r.n_tokens
            for r in TrainingShardSink(state).manifest(spark).collect()
        }
        for s in (1, 2):
            toks = sum(
                r.n_tokens
                for r in got.filter(F.col("shard") == s).collect()
            )
            assert toks == man[s]


class TestShardStreamingWiring:
    def test_streaming_equals_direct(self, spark, tmp_path):
        """Structured Streaming ingestion (writeStream -> foreachBatch
        -> apply_batch across multi-file micro-batches) yields the same
        layout and manifest as one direct apply of the whole corpus."""
        src = str(tmp_path / "in")
        d0 = _docs(spark, range(40))
        d1 = _docs(spark, range(40, 70))
        d0.coalesce(1).write.mode("append").parquet(src)
        d1.coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema(
            "doc_id bigint, text string"
        ).parquet(src)
        sink = TrainingShardSink(str(tmp_path / "stream_state"))
        (
            stream.writeStream.foreachBatch(sink.apply_batch)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .option("maxFilesPerTrigger", 1)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        assert _served(sink, spark) == _scratch(_docs(spark, range(70)))


class TestPrunedShardWrites:
    def _inodes(self, table_dir):
        out = {}
        for entry in os.listdir(table_dir):
            p = os.path.join(table_dir, entry)
            if "=" in entry and os.path.isdir(p):
                out[entry] = {
                    f: os.stat(os.path.join(p, f)).st_ino
                    for f in os.listdir(p)
                    if not f.startswith(("_", "."))
                }
        return out

    def test_untouched_shards_hard_link(self, spark, tmp_path):
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)
        d0 = _docs(spark, range(150))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        before = {
            tbl: self._inodes(os.path.join(t, tbl))
            for tbl in ("layout", "manifest")
        }

        # one changed doc -> exactly one touched shard
        d1 = d0.withColumn(
            "text",
            F.when(
                F.col("doc_id") == 7,
                F.concat(F.col("text"), F.lit(" moved")),
            ).otherwise(F.col("text")),
        )
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)
        touched = f"shard={[r.shard for r in SH.shard_layout(d1).filter(F.col('doc_id') == 7).collect()][0]}"

        for tbl in ("layout", "manifest"):
            after = self._inodes(os.path.join(t, tbl))
            assert touched in after
            same = [
                p
                for p in after
                if p != touched and after[p] == before[tbl][p]
            ]
            # every untouched shard directory survived by hard-link
            assert len(same) == len(after) - 1
            assert after[touched] != before[tbl].get(touched)
        assert _served(sink, spark) == _scratch(d1)


class TestTokenizerSpacePacking:
    """Round-12 (verdict item 3): the layout packs in BPE-token space
    when a merge table is supplied, the vocab fingerprint gates state
    access, and delta repacks stay shard-pruned."""

    MERGES = [("a", "l"), ("al", "pha"), ("o", "t")]

    def _lengths(self, spark, docs):
        from vcf_pg_loader_spark.operators.bpe import bpe_token_lengths

        return bpe_token_lengths(docs, self.MERGES)

    def _scratch_bpe(self, spark, docs):
        base = SH.shard_base(docs, lengths=self._lengths(spark, docs))
        return (
            SH.shard_manifest(SH.shard_layout_from_lengths(base))
            .orderBy("shard")
            .collect()
        )

    def test_lengths_differ_from_whitespace(self, spark):
        docs = _docs(spark, range(50))
        ws = {
            r.doc_id: r.n_tokens
            for r in SH.shard_base(docs).collect()
        }
        bpe = {
            r.doc_id: r.n_tokens
            for r in self._lengths(spark, docs).collect()
        }
        # BPE splits words into >1 symbol pieces: strictly more tokens
        # than whitespace words for every doc in this fixture
        assert all(bpe[d] > ws[d] for d in ws)

    def test_incremental_equals_scratch_bpe(self, spark, tmp_path):
        from vcf_pg_loader_spark.operators.bpe import (
            tokenizer_fingerprint,
        )

        t = str(tmp_path / "state")
        sink = TrainingShardSink(
            t, merges=self.MERGES,
            vocab_fp=tokenizer_fingerprint(self.MERGES),
        )
        d0 = _docs(spark, range(120))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        d1 = _docs(spark, range(20, 160))
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)
        assert _served(sink, spark) == self._scratch_bpe(spark, d1)

    def test_vocab_fingerprint_refused(self, spark, tmp_path):
        from vcf_pg_loader_spark.operators.bpe import (
            tokenizer_fingerprint,
        )

        t = str(tmp_path / "state")
        sink = TrainingShardSink(
            t, merges=self.MERGES,
            vocab_fp=tokenizer_fingerprint(self.MERGES),
        )
        d0 = _docs(spark, range(40))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        # a different vocab fingerprint must refuse
        other = TrainingShardSink(t, merges=self.MERGES, vocab_fp=43)
        with pytest.raises(ValueError, match="parameters"):
            other.apply_batch(
                d0.withColumn(MULT, F.lit(1).cast("bigint")), 1
            )
        # ... and so must a whitespace-space sink over the BPE state
        ws = TrainingShardSink(t)
        with pytest.raises(ValueError, match="parameters"):
            ws.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 2)

    def test_bpe_delta_repack_stays_pruned(self, spark, tmp_path):
        from vcf_pg_loader_spark.operators.bpe import (
            tokenizer_fingerprint,
        )

        t = str(tmp_path / "state")
        sink = TrainingShardSink(
            t, merges=self.MERGES,
            vocab_fp=tokenizer_fingerprint(self.MERGES),
        )
        d0 = _docs(spark, range(150))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        inodes = TestPrunedShardWrites._inodes
        before = {
            tbl: inodes(None, os.path.join(t, tbl))
            for tbl in ("layout", "manifest")
        }
        d1 = d0.withColumn(
            "text",
            F.when(
                F.col("doc_id") == 7,
                F.concat(F.col("text"), F.lit(" moved")),
            ).otherwise(F.col("text")),
        )
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)
        touched_shard = SH.shard_layout(d1).filter(
            F.col("doc_id") == 7
        ).collect()[0].shard
        touched = f"shard={touched_shard}"
        for tbl in ("layout", "manifest"):
            after = inodes(None, os.path.join(t, tbl))
            same = [
                p
                for p in after
                if p != touched and after[p] == before[tbl][p]
            ]
            assert len(same) == len(after) - 1
            assert after[touched] != before[tbl].get(touched)
        assert _served(sink, spark) == self._scratch_bpe(spark, d1)

    def test_export_shard_cli_bpe_roundtrip(self, spark, tmp_path, capsys):
        import json as _json

        from vcf_pg_loader_spark.cli import main

        docs = _docs(spark, range(60))
        corpus = str(tmp_path / "corpus")
        docs.write.parquet(corpus)
        vocab = str(tmp_path / "vocab.json")
        with open(vocab, "w") as fh:
            _json.dump(
                {"merges": [list(m) for m in self.MERGES],
                 "corpus_fp": 42, "n_docs": 60}, fh
            )
        from vcf_pg_loader_spark.operators.bpe import (
            tokenizer_fingerprint,
        )

        t = str(tmp_path / "state")
        sink = TrainingShardSink(
            t, merges=self.MERGES,
            vocab_fp=tokenizer_fingerprint(self.MERGES),
        )
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)

        out = str(tmp_path / "export")
        assert main(
            ["export-shard", "--state", t, "--corpus", corpus,
             "--out", out, "--merges", vocab]
        ) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["written_docs"] == rep["docs"] == 60
        assert rep["written_tokens"] == rep["tokens"]

        # without --merges the vocab-space state must refuse
        with pytest.raises(ValueError, match="parameters"):
            main(["export-shard", "--state", t, "--corpus", corpus,
                  "--out", str(tmp_path / "e2")])

    def test_export_shard_integrity_check_fails_on_stale_corpus(
        self, spark, tmp_path, capsys
    ):
        """Round-11 advice item 4: a corpus missing layout doc_ids
        exports truncated shards — the CLI must cross-check written
        counts against the manifest and exit nonzero."""
        import json as _json

        from vcf_pg_loader_spark.cli import main

        docs = _docs(spark, range(40))
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        stale = str(tmp_path / "stale_corpus")
        docs.filter(F.col("doc_id") < 30).write.parquet(stale)
        rc = main(
            ["export-shard", "--state", t, "--corpus", stale,
             "--out", str(tmp_path / "export")]
        )
        assert rc == 1
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["written_docs"] < rep["docs"]
        assert "does not match" in rep["error"]


class TestReshard:
    """Round-12 (verdict item 4): n_shards/seq_len migration from the
    persisted layout's own facts — manifest tuple-equal to a
    from-scratch build, and provably no document text re-read."""

    def test_reshard_16_to_64_equals_scratch(self, spark, tmp_path):
        from vcf_pg_loader_spark.cli import main
        import json as _json

        docs = _docs(spark, range(200))
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)  # 16 shards, 512 seq_len
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)

        assert main(
            ["reshard", "--state", t, "--n-shards", "64",
             "--seq-len", "128"]
        ) == 0

        new_sink = TrainingShardSink(t, n_shards=64, seq_len=128)
        got = _served(new_sink, spark)
        want = (
            SH.shard_manifest(
                SH.shard_layout(docs, n_shards=64, seq_len=128),
                seq_len=128,
            )
            .orderBy("shard")
            .collect()
        )
        assert got == want
        # fingerprint restamped: the OLD parameters now refuse
        with pytest.raises(ValueError, match="parameters"):
            TrainingShardSink(t).apply_batch(
                docs.limit(1).withColumn(
                    MULT, F.lit(1).cast("bigint")
                ),
                1,
            )
        # ... and maintenance resumes under the new ones
        d1 = _docs(spark, range(10, 210))
        new_sink.apply_batch(zset_snapshot_delta(docs, d1, "doc_id"), 1)
        assert _served(new_sink, spark) == (
            SH.shard_manifest(
                SH.shard_layout(d1, n_shards=64, seq_len=128), seq_len=128
            )
            .orderBy("shard")
            .collect()
        )

    def test_reshard_never_reads_documents(self, spark, tmp_path):
        """The strongest no-text-scan proof: build the state, then make
        the corpus unreadable — reshard must still succeed because it
        rebuilds from persisted (doc_id, n_tokens, dfp) alone.  A
        BPE-packed layout keeps its token lengths verbatim without the
        vocab artifact present."""
        from vcf_pg_loader_spark.streaming.shards import reshard_state

        merges = [("a", "l"), ("o", "t")]
        docs = _docs(spark, range(80))
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t, merges=merges, vocab_fp=7)
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        old_lengths = {
            r.doc_id: r.n_tokens for r in sink.layout(spark).collect()
        }
        # no corpus parquet exists anywhere under tmp_path/state's reach;
        # pass nothing text-like and reshard in place
        out = reshard_state(spark, t, n_shards=8)
        assert out["n_shards_new"] == 8 and out["seq_len_new"] == SH.SEQ_LEN
        new_sink = TrainingShardSink(
            t, n_shards=8, merges=merges, vocab_fp=7
        )
        new_lengths = {
            r.doc_id: r.n_tokens for r in new_sink.layout(spark).collect()
        }
        # token-space lengths carried verbatim (not re-derived)
        assert new_lengths == old_lengths
        # vocab fingerprint preserved through the restamp
        import json as _json, os as _os

        with open(_os.path.join(t, "_params.json")) as fh:
            fp = _json.load(fh)
        assert fp == {
            "n_shards": 8,
            "seq_len": SH.SEQ_LEN,
            "token_space": "bpe",
            "vocab_fp": 7,
        }

    def test_reshard_noop_and_missing_refused(self, spark, tmp_path):
        from vcf_pg_loader_spark.streaming.shards import reshard_state

        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)
        sink.apply_batch(
            _docs(spark, range(10)).withColumn(
                MULT, F.lit(1).cast("bigint")
            ),
            0,
        )
        with pytest.raises(ValueError, match="already at"):
            reshard_state(spark, t, n_shards=SH.N_SHARDS)
        with pytest.raises(ValueError, match="n-shards"):
            reshard_state(spark, t)
        with pytest.raises(FileNotFoundError):
            reshard_state(
                spark, str(tmp_path / "nope"), n_shards=8
            )


class TestEpochPinnedServing:
    """Round-12 (verdict item 5): a trainer streaming shards under an
    epoch pin must see identical bytes before, during, and after
    sync-corpus applies the next epoch."""

    def _stamp(self, sink, fp, bid):
        sink.stamp_epoch({"epoch_fp": fp, "batch_id": bid})

    def test_pinned_read_is_stable_across_next_epoch(self, spark, tmp_path):
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)
        d0 = _docs(spark, range(100))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        self._stamp(sink, "E0", 0)

        corpus0 = d0  # the corpus matching epoch E0
        def pinned():
            return sorted(
                (r.shard, r.okey, r.doc_id, r.start_offset, r.text)
                for r in sink.materialize(
                    spark, corpus0, epoch="E0"
                ).collect()
            )

        before = pinned()
        man_before = sink.manifest(spark, epoch="E0").orderBy(
            "shard"
        ).collect()
        assert before  # non-trivial

        # epoch E1 applies: docs leave, arrive, and change
        d1 = _docs(spark, range(50, 180))
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)
        self._stamp(sink, "E1", 1)

        assert pinned() == before
        assert (
            sink.manifest(spark, epoch="E0").orderBy("shard").collect()
            == man_before
        )
        # live read moved on
        assert _served(sink, spark) == _scratch(d1)
        assert _served(sink, spark) != [
            (r.shard, r.n_docs, r.n_tokens, r.n_seqs, r.shard_fp)
            for r in man_before
        ]

    def test_retention_evicts_oldest(self, spark, tmp_path):
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)
        d = _docs(spark, range(30))
        sink.apply_batch(d.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        import time

        for i, fp in enumerate(("E0", "E1", "E2")):
            self._stamp(sink, fp, i)
            time.sleep(0.05)  # distinct mtimes for retention order
        # RETAIN_EPOCHS=2: E0 evicted, E1/E2 retained
        with pytest.raises(FileNotFoundError, match="retained snapshot"):
            sink.layout(spark, epoch="E0")
        assert sink.layout(spark, epoch="E1").count() == 30
        assert sink.layout(spark, epoch="E2").count() == 30

    def test_export_shard_cli_epoch_pin(self, spark, tmp_path, capsys):
        import json as _json

        from vcf_pg_loader_spark.cli import main

        d0 = _docs(spark, range(40))
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        self._stamp(sink, "E0", 0)
        corpus0 = str(tmp_path / "corpus0")
        d0.write.parquet(corpus0)

        # next epoch lands before the export runs
        d1 = _docs(spark, range(20, 90))
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)
        self._stamp(sink, "E1", 1)

        out = str(tmp_path / "export")
        assert main(
            ["export-shard", "--state", t, "--corpus", corpus0,
             "--out", out, "--epoch", "E0"]
        ) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # integrity holds against the PINNED manifest (40 docs), not
        # the live one (E1's doc set)
        assert rep["written_docs"] == rep["docs"] == 40


class TestZeroTokenDocs:
    def test_empty_doc_occupies_no_sequence(self, spark):
        """A zero-token document (empty text in BPE space) sits in the
        layout but must not generate spans or sequences."""
        from vcf_pg_loader_spark.operators.bpe import bpe_token_lengths

        docs = spark.createDataFrame(
            [(0, "alpha beta gamma delta"), (1, ""), (2, "epsilon zeta")],
            "doc_id bigint, text string",
        )
        merges = [("a", "l")]
        lengths = bpe_token_lengths(docs, merges)
        assert {
            r.doc_id: r.n_tokens for r in lengths.collect()
        }[1] == 0
        layout = SH.shard_layout_from_lengths(
            SH.shard_base(docs, lengths=lengths), seq_len=8
        )
        spans = SH.shard_sequences(layout, seq_len=8).collect()
        assert all(r.doc_id != 1 for r in spans)
        assert all(r.tok_len > 0 for r in spans)
        # manifest token sums still tile exactly
        man = SH.shard_manifest(layout, seq_len=8).collect()
        assert sum(r.n_tokens for r in man) == sum(
            r.n_tokens for r in layout.collect()
        )


class TestDocSepPacking:
    """EOS/doc-separator-aware packing (shard_base doc_sep=, sink
    doc_sep=/eos_token=): every document budgets its separators, cuts
    land in the same token space the trainer streams, and doc_sep is a
    semantic packing parameter (fingerprinted)."""

    def test_doc_sep_budgets_every_doc(self, spark):
        docs = _docs(spark, range(40))
        plain = {r.doc_id: r.n_tokens for r in SH.shard_base(docs).collect()}
        sep = {
            r.doc_id: r.n_tokens
            for r in SH.shard_base(docs, doc_sep=2).collect()
        }
        assert all(sep[d] == plain[d] + 2 for d in plain)
        # the lengths-frame path budgets identically
        lens = SH.shard_base(docs).select("doc_id", "n_tokens")
        via_lengths = {
            r.doc_id: r.n_tokens
            for r in SH.shard_base(docs, lengths=lens, doc_sep=2).collect()
        }
        assert via_lengths == sep

    def test_sequences_carry_one_eos_per_doc(self, spark, tmp_path):
        docs = _docs(spark, range(60))
        sink = TrainingShardSink(
            str(tmp_path / "state"), seq_len=32, doc_sep=1, eos_token="<eos>"
        )
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        seqs = sink.materialize_sequences(spark, docs).collect()
        man = {r.shard: r for r in _served(sink, spark)}
        by_shard: dict[int, list] = {}
        for r in seqs:
            by_shard.setdefault(r.shard, []).append(r)
        n_docs_total = docs.count()
        eos_seen = 0
        for s, rows in by_shard.items():
            rows.sort(key=lambda r: r.seq_id)
            stream = [t for r in rows for t in r.tokens]
            # the shard's stream length equals the manifest's token
            # count (content + separators) ...
            assert len(stream) == man[s].n_tokens
            # ... and ends with a separator (last doc's EOS)
            assert stream[-1] == "<eos>"
            eos_seen += sum(1 for t in stream if t == "<eos>")
        # exactly one separator per document, corpus-wide
        assert eos_seen == n_docs_total

    def test_incremental_equals_scratch_doc_sep(self, spark, tmp_path):
        sink = TrainingShardSink(str(tmp_path / "state"), doc_sep=1)
        d0 = _docs(spark, range(90))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        d1 = _docs(spark, range(25, 140))
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)
        scratch = (
            SH.shard_manifest(SH.shard_layout(d1, doc_sep=1))
            .orderBy("shard")
            .collect()
        )
        assert _served(sink, spark) == scratch

    def test_doc_sep_fingerprint_refused(self, spark, tmp_path):
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t, doc_sep=1)
        d0 = _docs(spark, range(20))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        plain = TrainingShardSink(t)
        with pytest.raises(ValueError, match="parameters"):
            plain.apply_batch(
                d0.withColumn(MULT, F.lit(1).cast("bigint")), 1
            )
        # eos_token is spelling, not packing: same doc_sep with a
        # different spelling is ACCEPTED (offsets are invariant to it)
        spelled = TrainingShardSink(t, doc_sep=1, eos_token="<|eot|>")
        spelled.apply_batch(
            _docs(spark, range(20, 24)).withColumn(
                MULT, F.lit(1).cast("bigint")
            ),
            1,
        )

    def test_empty_doc_still_emits_eos_bpe(self, spark, tmp_path):
        """In BPE space an empty document has 0 content tokens but
        still occupies doc_sep slots — its sequence contribution is
        exactly the separator."""
        docs = spark.createDataFrame(
            [(0, "alpha beta"), (1, ""), (2, "gamma")],
            "doc_id bigint, text string",
        )
        sink = TrainingShardSink(
            str(tmp_path / "state"),
            seq_len=8,
            merges=[("a", "l")],
            vocab_fp=7,
            doc_sep=1,
        )
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        lay = {r.doc_id: r for r in sink.layout(spark).collect()}
        assert lay[1].n_tokens == 1
        seqs = sink.materialize_sequences(spark, docs).collect()
        stream = [
            t
            for r in sorted(seqs, key=lambda r: (r.shard, r.seq_id))
            for t in r.tokens
        ]
        assert stream.count("</s>") == 3
        assert len(stream) == sum(r.n_tokens for r in lay.values())


class TestCurriculumOrder:
    def test_buckets_pack_in_order_within_shard(self, spark):
        docs = _docs(spark, range(200))
        nt = F.size(F.split(F.col("text"), " "))
        bucket = F.least(F.lit(3), F.floor(nt / F.lit(8))).cast("bigint")
        base = SH.shard_base(
            docs, order_col=SH.curriculum_okey(bucket, F.col("doc_id"))
        )
        lay = SH.shard_layout_from_lengths(base).collect()
        by_shard: dict[int, list] = {}
        for r in lay:
            by_shard.setdefault(r.shard, []).append(r)
        multi = 0
        for rows in by_shard.values():
            rows.sort(key=lambda r: r.start_offset)
            buckets = [min(3, r.n_tokens // 8) for r in rows]
            # bucket ids are non-decreasing along the packed stream
            assert buckets == sorted(buckets)
            if len(set(buckets)) > 1:
                multi += 1
        assert multi > 0  # the fixture actually exercises >1 bucket

    def test_curriculum_preserves_assignment_and_totals(self, spark):
        docs = _docs(spark, range(150))
        nt = F.size(F.split(F.col("text"), " "))
        bucket = F.least(F.lit(3), F.floor(nt / F.lit(8))).cast("bigint")
        cur = SH.shard_layout_from_lengths(
            SH.shard_base(
                docs,
                order_col=SH.curriculum_okey(bucket, F.col("doc_id")),
            )
        )
        plain = SH.shard_layout(docs)
        a = {r.doc_id: (r.shard, r.n_tokens) for r in cur.collect()}
        b = {r.doc_id: (r.shard, r.n_tokens) for r in plain.collect()}
        assert a == b  # ordering never moves assignment or counts


class TestPackEfficiency:
    def test_identities_and_bound(self, spark):
        docs = _docs(spark, range(160))
        man = SH.shard_manifest(SH.shard_layout(docs))
        eff = SH.pack_efficiency(man).collect()
        assert len(eff) > 0
        for r in eff:
            assert r.capacity == r.n_seqs * SH.SEQ_LEN
            assert r.pad_tokens == r.capacity - r.n_tokens
            # concat-and-cut: waste strictly under one sequence
            assert 0 <= r.pad_tokens < SH.SEQ_LEN
            assert r.fill_ratio == pytest.approx(
                r.n_tokens / r.capacity, abs=1e-6
            )

    def test_export_sequences_cli_doc_sep(self, spark, tmp_path, capsys):
        """export-sequences on an EOS-budgeted state: doc_sep rides in
        from the persisted params, the integrity sums (which include
        separators) hold, and the spelled separator appears once per
        document in the written sequences."""
        import json as _json

        from vcf_pg_loader_spark.cli import main

        corpus_path = str(tmp_path / "corpus")
        corpus = _docs(spark, range(50))
        corpus.write.parquet(corpus_path)
        state = str(tmp_path / "state")
        TrainingShardSink(state, seq_len=32, doc_sep=1).apply_batch(
            corpus.withColumn(MULT, F.lit(1).cast("bigint")), 0
        )
        out = str(tmp_path / "out")
        assert main(
            ["export-sequences", "--state", state, "--corpus", corpus_path,
             "--out", out, "--eos-token", "<|eot|>"]
        ) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["written_tokens"] == rep["tokens"]
        assert rep["written_seqs"] == rep["seqs"]
        toks = [
            t
            for r in spark.read.parquet(out).collect()
            for t in r.tokens
        ]
        assert toks.count("<|eot|>") == 50


class TestEpochSequenceOrder:
    def test_permutation_per_epoch_deterministic_and_distinct(self, spark):
        docs = _docs(spark, range(400))
        man = SH.shard_manifest(SH.shard_layout(docs, seq_len=64), seq_len=64)
        e1 = SH.epoch_sequence_order(man, 1).collect()
        e1b = SH.epoch_sequence_order(man, 1).collect()
        e2 = SH.epoch_sequence_order(man, 2).collect()
        key = lambda rows: sorted((r.shard, r.seq_id, r.epoch_pos) for r in rows)
        assert key(e1) == key(e1b)  # deterministic
        assert key(e1) != key(e2)  # epochs differ
        # per shard: epoch_pos is a bijection onto 1..n_seqs, and the
        # schedule covers exactly the manifest's sequences
        n_seqs = {r.shard: r.n_seqs for r in man.collect()}
        by_shard: dict[int, list] = {}
        for r in e1:
            by_shard.setdefault(r.shard, []).append(r)
        assert set(by_shard) == set(n_seqs)
        for s, rows in by_shard.items():
            assert sorted(r.epoch_pos for r in rows) == list(
                range(1, n_seqs[s] + 1)
            )
            assert sorted(r.seq_id for r in rows) == list(range(n_seqs[s]))

    def test_export_sequences_cli_train_epoch(self, spark, tmp_path, capsys):
        """--train-epoch writes each shard file in the epoch schedule:
        same sequences (integrity sums hold), epoch_pos attached, rows
        within a shard file ordered by epoch_pos — and two epochs give
        different schedules over identical sequence bytes."""
        import json as _json

        from vcf_pg_loader_spark.cli import main

        corpus_path = str(tmp_path / "corpus")
        corpus = _docs(spark, range(60))
        corpus.write.parquet(corpus_path)
        state = str(tmp_path / "state")
        TrainingShardSink(state, seq_len=32).apply_batch(
            corpus.withColumn(MULT, F.lit(1).cast("bigint")), 0
        )

        def export(epoch_args, name):
            out = str(tmp_path / name)
            assert main(
                ["export-sequences", "--state", state, "--corpus",
                 corpus_path, "--out", out] + epoch_args
            ) == 0
            rep = _json.loads(
                capsys.readouterr().out.strip().splitlines()[-1]
            )
            assert rep["written_seqs"] == rep["seqs"]
            assert rep["written_tokens"] == rep["tokens"]
            return out

        out1 = export(["--train-epoch", "1"], "e1")
        out2 = export(["--train-epoch", "2"], "e2")
        e1 = spark.read.parquet(out1).collect()
        e2 = spark.read.parquet(out2).collect()
        # identical sequence bytes under both schedules
        k = lambda rows: sorted(
            (r.shard, r.seq_id, tuple(r.tokens)) for r in rows
        )
        assert k(e1) == k(e2)
        # ... but different schedules
        s = lambda rows: sorted(
            (r.shard, r.seq_id, r.epoch_pos) for r in rows
        )
        assert s(e1) != s(e2)
        # each shard's file is physically ordered by epoch_pos
        import os as _os

        for d in _os.listdir(out1):
            if not d.startswith("shard="):
                continue
            rows = spark.read.parquet(_os.path.join(out1, d)).collect()
            pos = [r.epoch_pos for r in rows]
            assert pos == sorted(pos)


class TestSeqDecontam:
    def test_cross_boundary_hits_exist_and_are_bounded(self, spark, sf_dir):
        """Sequence-level decontamination finds hits, every crossing
        hit is also a hit (n_cross <= n_hits), and at least one hit
        crosses a document boundary in the fixture corpus — the
        contamination class that only exists after packing."""
        from vcf_pg_loader_spark.queries.pipeline import q_seq_decontam

        rows = q_seq_decontam(spark, sf_dir).collect()
        assert rows
        assert all(0 <= r.n_cross_boundary <= r.n_hits for r in rows)
        assert sum(r.n_cross_boundary for r in rows) > 0

    def test_cross_boundary_shingle_detected(self, spark):
        """A constructed boundary crossing: doc A ends 'u v', doc B
        starts 'w' and packs immediately after A in the same shard;
        the trigram 'u v w' exists in NO single train document but
        must appear as a crossing window of the packed stream."""
        docs = spark.createDataFrame(
            [(i, f"filler{i} pad{i} word{i}") for i in range(64)],
            "doc_id bigint, text string",
        )
        lay = SH.shard_layout(docs, seq_len=512)
        rows = sorted(
            lay.collect(), key=lambda r: (r.shard, r.okey, r.doc_id)
        )
        # find two docs adjacent in one shard's packed order
        a, b = next(
            (x, y)
            for x, y in zip(rows, rows[1:])
            if x.shard == y.shard
        )
        spans = SH.shard_sequences(lay, seq_len=512)
        pieces = docs.select(
            "doc_id", F.split(F.col("text"), " ").alias("pieces")
        )
        seqs = SH.sequence_stream(spans, pieces)
        stream = [
            t
            for r in sorted(
                (r for r in seqs.collect() if r.shard == a.shard),
                key=lambda r: r.seq_id,
            )
            for t in r.tokens
        ]
        # the crossing trigram: last token of A, first two of B
        cross = f"word{a.doc_id} filler{b.doc_id} pad{b.doc_id}"
        grams = {
            " ".join(stream[i : i + 3]) for i in range(len(stream) - 2)
        }
        assert cross in grams
        # ...and no single document contains it
        assert all(
            cross not in r.text for r in docs.collect()
        )

    def test_doc_sep_interrupts_crossing_windows(self, spark):
        """With doc_sep=1 every would-be crossing window contains the
        separator token, so no crossing n-gram can match an eval
        vocabulary drawn from real text — EOS-aware packing removes the
        contamination class q_seq_decontam measures."""
        docs = spark.createDataFrame(
            [(i, f"filler{i} pad{i} word{i}") for i in range(64)],
            "doc_id bigint, text string",
        )
        base = SH.shard_base(docs, doc_sep=1)
        lay = SH.shard_layout_from_lengths(base, seq_len=512)
        spans = SH.shard_sequences(lay, seq_len=512)
        pieces = docs.select(
            "doc_id",
            F.concat(
                F.split(F.col("text"), " "), F.array(F.lit("</s>"))
            ).alias("pieces"),
        )
        seqs = SH.sequence_stream(spans, pieces)
        bounds = {r.doc_id: r for r in lay.collect()}
        for r in seqs.collect():
            toks = list(r.tokens)
            starts = sorted(b for b in r.doc_bounds)
            # every trigram window that spans a document boundary
            # includes the separator; doc-internal windows never do
            for i in range(len(toks) - 2):
                w = toks[i : i + 3]
                crossing = any(i < b <= i + 2 for b in starts if b > 0)
                if crossing:
                    assert "</s>" in w
        assert len(bounds) == 64


class TestTokenBudget:
    def test_minimal_prefix_semantics(self, spark, sf_dir):
        """The selection equals the minimal hash-ordered prefix whose
        token sum reaches the budget — verified against a directly
        computed global prefix over the same keys."""
        from vcf_pg_loader_spark.functions.hashing import h60
        from vcf_pg_loader_spark.queries.pipeline import (
            TB_SALT,
            TOKEN_BUDGET,
            q_token_budget,
        )
        from vcf_pg_loader_spark.sources.tables import load_table

        got = {
            r.source: (r.n_docs, r.n_tokens)
            for r in q_token_budget(spark, sf_dir).collect()
        }
        rows = (
            load_table(spark, sf_dir, "documents")
            .select(
                "doc_id",
                "source",
                F.size(F.split(F.col("text"), " "))
                .cast("bigint")
                .alias("nt"),
                h60(F.col("doc_id").cast("string"), TB_SALT).alias("key"),
            )
            .collect()
        )
        rows.sort(key=lambda r: (r.key, r.doc_id))
        cum, want, last_nt = 0, {}, 0
        for r in rows:
            if cum >= TOKEN_BUDGET:
                break
            d, t = want.get(r.source, (0, 0))
            want[r.source] = (d + 1, t + r.nt)
            cum += r.nt
            last_nt = r.nt
        assert got == want
        total = sum(t for _, t in got.values())
        assert total == cum and total >= TOKEN_BUDGET
        # minimality: without the crossing doc the prefix is short
        assert total - last_nt < TOKEN_BUDGET


class TestExportEpochOrder:
    def test_schedule_matches_sequences_and_is_deterministic(
        self, spark, tmp_path, capsys
    ):
        """export-epoch-order ships only the schedule: rows cover
        exactly the manifest's sequences, two runs of the same epoch
        are identical, and joining the schedule to an epoch-less
        export reproduces the --train-epoch ordering."""
        import json as _json

        from vcf_pg_loader_spark.cli import main

        corpus_path = str(tmp_path / "corpus")
        corpus = _docs(spark, range(50))
        corpus.write.parquet(corpus_path)
        state = str(tmp_path / "state")
        TrainingShardSink(state, seq_len=32).apply_batch(
            corpus.withColumn(MULT, F.lit(1).cast("bigint")), 0
        )
        o1, o2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        for out in (o1, o2):
            assert main(
                ["export-epoch-order", "--state", state,
                 "--train-epoch", "5", "--out", out]
            ) == 0
            rep = _json.loads(
                capsys.readouterr().out.strip().splitlines()[-1]
            )
            assert "error" not in rep
        k = lambda p: sorted(
            (r.shard, r.seq_id, r.epoch_pos)
            for r in spark.read.parquet(p).collect()
        )
        assert k(o1) == k(o2)
        man = {
            r.shard: r.n_seqs
            for r in TrainingShardSink(state, seq_len=32)
            .manifest(spark)
            .collect()
        }
        sched = spark.read.parquet(o1).collect()
        per = {}
        for r in sched:
            per.setdefault(r.shard, []).append(r)
        assert {s: len(v) for s, v in per.items()} == {
            s: n for s, n in man.items()
        }
        for s, rows in per.items():
            assert sorted(r.epoch_pos for r in rows) == list(
                range(1, man[s] + 1)
            )


class TestSeqDecontamCLI:
    def test_detects_constructed_crossing(self, spark, tmp_path, capsys):
        """A crossing n-gram planted across two adjacent docs in the
        maintained layout is found (n_cross_boundary >= 1), the report
        parquet matches the printed totals, and --fail-on-hit exits 1;
        a disjoint eval corpus exits 0 with an empty report."""
        import json as _json

        from vcf_pg_loader_spark.cli import main

        docs = spark.createDataFrame(
            [(i, f"filler{i} pad{i} word{i}") for i in range(64)],
            "doc_id bigint, text string",
        )
        corpus = str(tmp_path / "corpus")
        docs.write.parquet(corpus)
        state = str(tmp_path / "state")
        TrainingShardSink(state).apply_batch(
            docs.withColumn(MULT, F.lit(1).cast("bigint")), 0
        )
        lay = sorted(
            SH.shard_layout(docs).collect(),
            key=lambda r: (r.shard, r.okey, r.doc_id),
        )
        a, b = next(
            (x, y) for x, y in zip(lay, lay[1:]) if x.shard == y.shard
        )
        cross = f"word{a.doc_id} filler{b.doc_id} pad{b.doc_id}"
        ev = spark.createDataFrame(
            [(10_000, f"prefixtok {cross} suffixtok")],
            "doc_id bigint, text string",
        )
        ev_path = str(tmp_path / "eval")
        ev.write.parquet(ev_path)
        out = str(tmp_path / "report")
        rc = main(
            ["seq-decontam", "--state", state, "--corpus", corpus,
             "--eval", ev_path, "--out", out, "--fail-on-hit"]
        )
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 1
        assert rep["cross_boundary_hits"] >= 1
        got = spark.read.parquet(out).collect()
        assert sum(r.n_hits for r in got) == rep["hits"]

        # disjoint eval: clean exit, empty report
        ev2 = spark.createDataFrame(
            [(10_001, "zebra yak xylophone")],
            "doc_id bigint, text string",
        )
        ev2_path = str(tmp_path / "eval2")
        ev2.write.parquet(ev2_path)
        out2 = str(tmp_path / "report2")
        rc2 = main(
            ["seq-decontam", "--state", state, "--corpus", corpus,
             "--eval", ev2_path, "--out", out2, "--fail-on-hit"]
        )
        rep2 = _json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert rc2 == 0 and rep2["contaminated_seqs"] == 0


class TestMaxDocTokens:
    def test_incremental_equals_scratch_and_streams_match(
        self, spark, tmp_path
    ):
        """A capped sink packs least(len, cap) per doc, maintenance
        stays incremental==scratch, and materialized sequences carry
        exactly the first cap tokens of each document."""
        cap = 5
        sink = TrainingShardSink(
            str(tmp_path / "state"), seq_len=32, max_doc_tokens=cap
        )
        d0 = _docs(spark, range(80))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        d1 = _docs(spark, range(20, 110))
        sink.apply_batch(zset_snapshot_delta(d0, d1, "doc_id"), 1)

        lens = {
            r.doc_id: r.n_tokens for r in sink.layout(spark).collect()
        }
        texts = {r.doc_id: r.text for r in d1.collect()}
        assert lens == {
            d: min(len(t.split(" ")), cap) for d, t in texts.items()
        }
        scratch_lengths = d1.select(
            "doc_id",
            F.least(
                F.size(F.split(F.col("text"), " ")), F.lit(cap)
            ).cast("bigint").alias("n_tokens"),
        )
        scratch = (
            SH.shard_manifest(
                SH.shard_layout_from_lengths(
                    SH.shard_base(d1, lengths=scratch_lengths), 32
                ),
                32,
            )
            .orderBy("shard")
            .collect()
        )
        assert _served(sink, spark) == scratch

        seqs = sink.materialize_sequences(spark, d1).collect()
        man = {r.shard: r.n_tokens for r in _served(sink, spark)}
        by_shard: dict[int, list] = {}
        for r in seqs:
            by_shard.setdefault(r.shard, []).append(r)
        for s, rows in by_shard.items():
            stream = [
                t
                for r in sorted(rows, key=lambda r: r.seq_id)
                for t in r.tokens
            ]
            assert len(stream) == man[s]

    def test_cap_fingerprint_refused(self, spark, tmp_path):
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t, max_doc_tokens=5)
        d0 = _docs(spark, range(20))
        sink.apply_batch(d0.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        uncapped = TrainingShardSink(t)
        with pytest.raises(ValueError, match="parameters"):
            uncapped.apply_batch(
                d0.withColumn(MULT, F.lit(1).cast("bigint")), 1
            )


class TestMaskSchedule:
    def test_fraction_determinism_and_bounds(self, spark, sf_dir):
        """The schedule is deterministic, masks a fraction near
        MASK_SPAN/MASK_RATE, every count is within [0, n_tokens], and
        zero-mask sequences still appear."""
        from vcf_pg_loader_spark.queries.pipeline import (
            MASK_RATE,
            MASK_SPAN,
            q_mask_schedule,
        )

        a = q_mask_schedule(spark, sf_dir).collect()
        b = q_mask_schedule(spark, sf_dir).collect()
        key = lambda rows: sorted(
            (r.shard, r.seq_id, r.n_masked, r.mask_fp) for r in rows
        )
        assert key(a) == key(b)
        tot = sum(r.n_tokens for r in a)
        masked = sum(r.n_masked for r in a)
        expect = MASK_SPAN / MASK_RATE
        assert 0.5 * expect <= masked / tot <= 1.5 * expect
        assert all(0 <= r.n_masked <= r.n_tokens for r in a)
