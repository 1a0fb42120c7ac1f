"""Round-12 additions: bench drifter re-measures (verdict item 6) and
the sync-corpus tokenizer-space wiring (--shards-merges)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)


class TestDrifterRemeasures:
    def test_spike_is_remeasured_and_flagged_transient(self, spark, sf_dir):
        import time

        from vcf_pg_loader_spark.queries import all_queries

        # measure a REAL warm wall for the query so `prev` is what a
        # previous round would have recorded on this box
        fn = all_queries()["q_chrom_counts"]
        fn(spark, sf_dir).count()
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            reps.append(time.perf_counter() - t0)
        # median-of-3, like the re-measure itself, so the two medians
        # sit well inside the 1.5x band on any box
        real_warm = sorted(reps)[1]

        timings = {"q_chrom_counts": {"warm_sec": 50.0, "cold_sec": 51.0}}
        prev = {"queries": {"q_chrom_counts": {"warm_sec": real_warm}}}
        out = bench.drifter_remeasures(spark, sf_dir, timings, prev)
        assert list(out) == ["q_chrom_counts"]
        d = out["q_chrom_counts"]
        assert d["prev_warm_sec"] == real_warm
        assert d["sweep_warm_sec"] == 50.0
        assert len(d["remeasure_secs"]) == bench.DRIFT_REPS
        # the warmed re-measure lands back in the previous round's band:
        # the spike reads as transient, exactly the hand protocol
        assert d["remeasure_median_sec"] < 50.0
        assert d["transient"] is True

    def test_no_previous_detail_is_noop(self, spark, sf_dir):
        assert bench.drifter_remeasures(
            spark, sf_dir, {"q_chrom_counts": {"warm_sec": 9.0}}, None
        ) == {}

    def test_below_floor_and_in_band_skipped(self, spark, sf_dir):
        timings = {
            "q_chrom_counts": {"warm_sec": 0.4},  # below floor
            "q_setops": {"warm_sec": 1.0},  # ratio 1.0: in band
        }
        prev = {
            "queries": {
                "q_chrom_counts": {"warm_sec": 0.01},
                "q_setops": {"warm_sec": 1.0},
            }
        }
        assert bench.drifter_remeasures(spark, sf_dir, timings, prev) == {}

    def test_top_n_bounded(self, spark, sf_dir):
        names = [
            "q_chrom_counts", "q_setops", "q_distinct_agg",
            "q_rollup", "q_having_dups", "q_conditional_counts",
            "q_percentile",
        ]
        timings = {n: {"warm_sec": 40.0} for n in names}
        prev = {"queries": {n: {"warm_sec": 0.2} for n in names}}
        out = bench.drifter_remeasures(spark, sf_dir, timings, prev)
        assert len(out) == bench.DRIFT_TOP_N


class TestSyncCorpusShardsMerges:
    def test_sync_packs_in_tokenizer_space(self, spark, tmp_path, capsys):
        """sync-corpus --shards-state --shards-merges maintains the
        layout in BPE space; a second sync with a different vocab
        refuses (fingerprint), and with the same vocab succeeds."""
        from vcf_pg_loader_spark.cli import main
        from vcf_pg_loader_spark.operators.bpe import bpe_token_lengths
        from vcf_pg_loader_spark.operators import shards as SH
        from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

        rows = [
            (i, f"alpha beta gamma delta doc{i} alpha beta")
            for i in range(40)
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        snap = str(tmp_path / "snap")
        docs.write.parquet(snap)
        vocab = str(tmp_path / "vocab.json")
        merges = [["a", "l"], ["be", "ta"]]
        with open(vocab, "w") as fh:
            json.dump({"merges": merges, "corpus_fp": 99, "n_docs": 40}, fh)

        state = str(tmp_path / "state")
        shards = str(tmp_path / "shards")
        assert main(
            ["sync-corpus", "--state", state, "--snapshot", snap,
             "--batch-id", "0", "--shards-state", shards,
             "--shards-merges", vocab]
        ) == 0
        capsys.readouterr()

        sink = TrainingShardSink(
            shards, merges=[tuple(m) for m in merges], vocab_fp=99
        )
        got = {
            r.doc_id: r.n_tokens for r in sink.layout(spark).collect()
        }
        want = {
            r.doc_id: r.n_tokens
            for r in bpe_token_lengths(
                docs, [tuple(m) for m in merges]
            ).collect()
        }
        assert got == want  # packed in BPE tokens, not whitespace
        ws = {r.doc_id: r.n_tokens for r in SH.shard_base(docs).collect()}
        assert got != ws

        # a different vocab must refuse the state
        vocab2 = str(tmp_path / "vocab2.json")
        with open(vocab2, "w") as fh:
            json.dump({"merges": merges, "corpus_fp": 7, "n_docs": 40}, fh)
        with pytest.raises(ValueError, match="parameters"):
            main(
                ["sync-corpus", "--state", state, "--snapshot", snap,
                 "--batch-id", "1", "--shards-state", shards,
                 "--shards-merges", vocab2]
            )
