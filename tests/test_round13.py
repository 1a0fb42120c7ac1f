"""Round-13 additions: chars-mode tokenizer plumbing through the
maintained sinks and CLI, token-id assignment + the binary wire
format, and the round-12 ADVICE fixes (emit-pieces truncation slice,
seq-decontam legacy-state refusal)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.ivm import MULT


class TestEmitPiecesMaxDocTokens:
    def test_capped_layout_exports_sliced_stream(
        self, spark, tmp_path, capsys
    ):
        """round-12 ADVICE (medium): --emit-pieces on a max_doc_tokens
        state must slice pieces to the cap before the separator append
        — without the slice the attached stream overruns the budgeted
        n_tokens and the integrity check exits 1 with a misleading
        wrong-corpus error."""
        from vcf_pg_loader_spark.cli import main
        from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

        merges = [("a", "l")]
        rows = [
            (i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(20)
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        corpus = str(tmp_path / "corpus")
        docs.write.parquet(corpus)
        vocab = str(tmp_path / "vocab.json")
        json.dump(
            {"merges": [list(m) for m in merges], "corpus_fp": 9,
             "n_docs": 20},
            open(vocab, "w"),
        )
        t = str(tmp_path / "state")
        sink = TrainingShardSink(
            t, merges=merges, vocab_fp=9, doc_sep=1, max_doc_tokens=5
        )
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        out = str(tmp_path / "export")
        assert main(
            ["export-shard", "--state", t, "--corpus", corpus,
             "--out", out, "--merges", vocab, "--emit-pieces"]
        ) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert (
            rep["written_piece_tokens"]
            == rep["written_tokens"]
            == rep["tokens"]
        )
        # every doc's attached stream is cap + separator long
        got = spark.read.parquet(out).select(F.size("pieces")).collect()
        assert all(r[0] == 6 for r in got)


class TestSeqDecontamLegacyState:
    def test_state_without_params_refused(self, spark, tmp_path, capsys):
        """round-12 ADVICE: a pre-fingerprint state (no _params.json)
        has an unknowable token space — refuse instead of silently
        scanning a possibly-BPE-packed layout in whitespace space."""
        from vcf_pg_loader_spark.cli import main
        from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

        rows = [(i, f"a b c d{i}") for i in range(10)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        corpus = str(tmp_path / "corpus")
        docs.write.parquet(corpus)
        evals = str(tmp_path / "evals")
        docs.limit(2).write.parquet(evals)
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t)
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        os.remove(os.path.join(t, "_params.json"))  # legacy shape
        rc = main(
            ["seq-decontam", "--state", t, "--corpus", corpus,
             "--eval", evals, "--out", str(tmp_path / "rep"),
             "--ngram", "2"]
        )
        assert rc == 2


class TestTokenIdAssignment:
    def test_dense_ids_specials_alphabet_then_merges(self):
        from vcf_pg_loader_spark.operators import tokenids as T

        alphabet = ["a", "b", "</w>"]
        merges = [("a", "b"), ("ab", "</w>")]
        pieces = T.vocab_pieces(alphabet, merges)
        assert pieces == ["<pad>", "<unk>", "a", "b", "</w>", "ab", "ab</w>"]
        ids = T.piece_ids(alphabet, merges)
        assert ids["<pad>"] == 0 and ids["<unk>"] == 1
        assert ids["a"] == 2 and ids["ab</w>"] == 6

    def test_collision_keeps_first_id(self):
        from vcf_pg_loader_spark.operators import tokenids as T

        # a merge product recreating an alphabet piece keeps the
        # earlier id; encode stays a plain dict lookup
        ids = T.piece_ids(["<", "/", "w", ">", "</w>"], [("<", "/"), ("</", "w>")])
        assert ids["</w>"] == 6  # the alphabet occurrence, not the merge

    def test_ids_col_arrow_maps_and_unks(self, spark):
        from vcf_pg_loader_spark.operators import tokenids as T

        alphabet = ["a", "b", "</w>"]
        merges = [("a", "b")]
        df = spark.createDataFrame(
            [(0, ["ab", "</w>", "zzz"])],
            "seq_id bigint, tokens array<string>",
        )
        out = T.ids_col_arrow(df, alphabet, merges).collect()[0]
        assert list(out["ids"]) == [5, 4, T.UNK_ID]

    def test_write_id_shards_roundtrip_and_padding(self, spark, tmp_path):
        from vcf_pg_loader_spark.operators import tokenids as T

        seq_len = 4
        rows = [
            (0, 0, [2, 3, 4, 5]),
            (0, 1, [6, 7]),  # tail -> padded
            (3, 0, [9, 9, 9, 9]),
        ]
        df = spark.createDataFrame(
            rows, "shard bigint, seq_id bigint, ids array<int>"
        )
        out = str(tmp_path / "bin")
        man = T.write_id_shards(df, out, seq_len)
        assert set(man["shards"]) == {"0", "3"}
        s0 = man["shards"]["0"]
        assert s0["n_seqs"] == 2 and s0["n_tokens"] == 6 and s0["n_pad"] == 2
        assert s0["bytes"] == 2 * seq_len * 4
        mat = T.read_id_shard(os.path.join(out, s0["file"]), seq_len)
        assert mat.tolist() == [[2, 3, 4, 5], [6, 7, T.PAD_ID, T.PAD_ID]]
        assert os.path.getsize(os.path.join(out, s0["file"])) == s0["bytes"]
        # stream md5 matches the bytes on disk
        import hashlib

        raw = open(os.path.join(out, s0["file"]), "rb").read()
        assert hashlib.md5(raw).hexdigest() == s0["ids_fp"]


class TestExportSequencesIds:
    def test_cli_bin_export_round_trips(self, spark, tmp_path, capsys):
        """export-sequences --emit-ids --bin-out: parquet ids, binary
        shards, and the string path all agree; the bin manifest
        cross-checks against the layout manifest."""
        from vcf_pg_loader_spark.cli import main
        from vcf_pg_loader_spark.operators import tokenids as T
        from vcf_pg_loader_spark.operators.bpe import (
            bpe_learn_local,
            word_counts,
        )
        from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

        rows = [
            (i, " ".join(f"w{j % 5}" for j in range(6 + i % 7)))
            for i in range(40)
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        corpus = str(tmp_path / "corpus")
        docs.write.parquet(corpus)
        merges = bpe_learn_local(docs, 6)
        alphabet = T.alphabet_from_counts(word_counts(docs), "words")
        vocab = str(tmp_path / "vocab.json")
        json.dump(
            {"merges": [list(m) for m in merges], "corpus_fp": 11,
             "n_docs": 40, "alphabet": alphabet},
            open(vocab, "w"),
        )
        t = str(tmp_path / "state")
        sink = TrainingShardSink(
            t, merges=merges, vocab_fp=11, n_shards=4, seq_len=16
        )
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        out = str(tmp_path / "seqs")
        bin_out = str(tmp_path / "bin")
        assert main(
            ["export-sequences", "--state", t, "--corpus", corpus,
             "--merges", vocab, "--out", out,
             "--emit-ids", "--bin-out", bin_out]
        ) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "error" not in rep
        assert rep["bin_shards"] >= 1

        vp = T.vocab_pieces(alphabet, merges)
        man = json.load(open(os.path.join(bin_out, "manifest.json")))
        assert man["seq_len"] == 16
        pq = {
            (r["shard"], r["seq_id"]): (list(r["tokens"]), list(r["ids"]))
            for r in spark.read.parquet(out).collect()
        }
        for key, (toks, ids) in pq.items():
            # parquet ids are the piece mapping exactly
            assert [vp[i] for i in ids] == toks
        for k, info in man["shards"].items():
            mat = T.read_id_shard(
                os.path.join(bin_out, info["file"]), man["seq_len"]
            )
            shard_rows = sorted(
                (sk for sk in pq if sk[0] == int(k)), key=lambda x: x[1]
            )
            assert mat.shape[0] == len(shard_rows) == info["n_seqs"]
            for row, sk in zip(mat, shard_rows):
                ids = pq[sk][1]
                assert list(row[: len(ids)]) == ids
                assert all(x == T.PAD_ID for x in row[len(ids):])

    def test_emit_ids_needs_alphabet_artifact(self, spark, tmp_path, capsys):
        from vcf_pg_loader_spark.cli import main
        from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

        rows = [(i, "a b c") for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        corpus = str(tmp_path / "corpus")
        docs.write.parquet(corpus)
        vocab = str(tmp_path / "vocab.json")
        json.dump(
            {"merges": [["a", "b"]], "corpus_fp": 3, "n_docs": 5},
            open(vocab, "w"),
        )  # pre-round-13 artifact: no alphabet
        t = str(tmp_path / "state")
        sink = TrainingShardSink(t, merges=[("a", "b")], vocab_fp=3)
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        rc = main(
            ["export-sequences", "--state", t, "--corpus", corpus,
             "--merges", vocab, "--out", str(tmp_path / "o"),
             "--emit-ids"]
        )
        assert rc == 2


class TestVocabSinkCharsMode:
    def test_maintained_counts_match_chars_word_counts(self, spark, tmp_path):
        from vcf_pg_loader_spark.operators.bpe import word_counts
        from vcf_pg_loader_spark.streaming.vocab import VocabSink

        rows = [(i, "abcdefg" * (1 + i % 3)) for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        t = str(tmp_path / "vstate")
        sink = VocabSink(t, mode="chars", max_chars=4)
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        got = {
            (r["w"], r["n"]) for r in sink.counts(spark).collect()
        }
        want = {
            (r["w"], r["n"])
            for r in word_counts(docs, mode="chars", max_chars=4).collect()
        }
        assert got == want

    def test_mode_mismatch_refuses(self, spark, tmp_path):
        from vcf_pg_loader_spark.streaming.vocab import VocabSink

        rows = [(0, "some words here")]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        t = str(tmp_path / "vstate")
        VocabSink(t, mode="chars", max_chars=4).apply_batch(
            docs.withColumn(MULT, F.lit(1).cast("bigint")), 0
        )
        with pytest.raises(ValueError, match="parameters"):
            VocabSink(t).apply_batch(
                docs.withColumn(MULT, F.lit(1).cast("bigint")), 1
            )


class TestShardSinkCharsMode:
    def test_chars_layout_packs_and_serves(self, spark, tmp_path):
        """chars-mode packed layout: lengths equal the chars-mode
        encoder, materialize_sequences reconstructs the corpus text
        exactly (no END sentinel), and a words-mode sink refuses the
        chars-packed state."""
        from vcf_pg_loader_spark.operators.bpe import (
            bpe_learn_local,
            bpe_token_lengths,
        )
        from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

        rows = [(i, "xyzw" * (2 + i % 5)) for i in range(30)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        merges = bpe_learn_local(docs, 6, mode="chars", max_chars=4)
        t = str(tmp_path / "state")
        sink = TrainingShardSink(
            t, merges=merges, vocab_fp=7, n_shards=4, seq_len=8,
            token_mode="chars", max_chars=4,
        )
        sink.apply_batch(docs.withColumn(MULT, F.lit(1).cast("bigint")), 0)
        lay = {r["doc_id"]: r["n_tokens"] for r in sink.layout(spark).collect()}
        want = {
            r["doc_id"]: r["n_tokens"]
            for r in bpe_token_lengths(
                docs, merges, mode="chars", max_chars=4
            ).collect()
        }
        assert lay == want
        seqs = sink.materialize_sequences(spark, docs)
        total = seqs.agg(F.sum(F.size("tokens"))).collect()[0][0]
        assert total == sum(want.values())
        # wrong-mode construction refuses the persisted fingerprint
        with pytest.raises(ValueError, match="parameters"):
            TrainingShardSink(
                t, merges=merges, vocab_fp=7, n_shards=4, seq_len=8
            ).apply_batch(
                docs.withColumn(MULT, F.lit(1).cast("bigint")), 1
            )
