"""Corpus-epoch stamps and the verify-consistency verb.

sync-corpus stamps every lockstep-synced state with the snapshot's
content fingerprint + batch id; verify-consistency proves N states are
views of the same corpus (or refutes it) from the stamps alone.
"""

from __future__ import annotations

import json

from vcf_pg_loader_spark.cli import main
from vcf_pg_loader_spark.streaming.sink import ParquetUpsertSink

STOP = (
    "the cat and the dog ran to the big house of the old king with a "
    "very small bird near the open door"
)

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
).split()


def _text(i: int) -> str:
    body = " ".join(
        WORDS[(i * 7 + j) % len(WORDS)] + WORDS[(i + j * 5) % 19]
        for j in range(15)
    )
    return STOP + " " + body


def _write_snapshot(spark, path, ids):
    spark.createDataFrame(
        [(i, _text(i), f"src{i % 3}") for i in ids],
        "doc_id bigint, text string, source string",
    ).coalesce(1).write.parquet(path)


def _sync(state_dirs, snapshot, batch_id):
    state, funnel, card = state_dirs
    return main(
        ["sync-corpus", "--state", state, "--snapshot", snapshot,
         "--batch-id", str(batch_id), "--funnel-state", funnel,
         "--card-state", card]
    )


class TestEpochStamp:
    def test_lockstep_sync_is_consistent(self, spark, tmp_path, capsys):
        v1 = str(tmp_path / "v1")
        _write_snapshot(spark, v1, range(12))
        dirs = tuple(str(tmp_path / n) for n in ("state", "funnel", "card"))
        assert _sync(dirs, v1, 0) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "epoch_fp" in out

        assert main(["verify-consistency", "--states", *dirs]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["consistent"]
        fps = {s["epoch"]["epoch_fp"] for s in rep["states"]}
        assert fps == {out["epoch_fp"]}
        assert all(s["epoch_applied"] for s in rep["states"])

    def test_partial_sync_detected(self, spark, tmp_path, capsys):
        v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
        _write_snapshot(spark, v1, range(12))
        _write_snapshot(spark, v2, [i for i in range(14) if i != 3])
        dirs = tuple(str(tmp_path / n) for n in ("state", "funnel", "card"))
        assert _sync(dirs, v1, 0) == 0
        # the second sync advances ONLY the cluster state — the funnel
        # and card are now views of the old snapshot
        assert main(
            ["sync-corpus", "--state", dirs[0], "--snapshot", v2,
             "--batch-id", "1"]
        ) == 0
        capsys.readouterr()
        assert main(["verify-consistency", "--states", *dirs]) == 1
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert not rep["consistent"]
        fps = {s["epoch"]["epoch_fp"] for s in rep["states"]}
        assert len(fps) == 2

    def test_missing_stamp_detected(self, tmp_path, capsys):
        # a state that was never epoch-stamped (built pre-stamp, or
        # synced out of band) fails the audit rather than passing
        bare = str(tmp_path / "bare")
        ParquetUpsertSink(bare, key=[])._record(0, 1)
        assert main(["verify-consistency", "--states", bare]) == 1
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert not rep["consistent"]
        assert rep["states"][0]["epoch"] is None

    def test_shards_state_tracks_kept_corpus(self, spark, tmp_path, capsys):
        """--shards-state packs the CURATED corpus: near-dup losers
        never enter the layout, and a keep-FLIP (an existing doc whose
        text changes into a near-dup of an earlier doc) retracts it
        from its shard even though no snapshot row for it was removed."""
        from vcf_pg_loader_spark.operators import shards as SH
        from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

        base = _text(1)
        near = base + " tail"  # near-dup of doc 1 (high Jaccard)
        v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
        rows1 = [(i, _text(i), f"src{i % 3}") for i in range(20)]
        # v1 already contains one loser: doc 15 is a near-dup of doc 1
        rows1[15] = (15, near, "src0")
        spark.createDataFrame(
            rows1, "doc_id bigint, text string, source string"
        ).coalesce(1).write.parquet(v1)
        # v2: doc 7's text FLIPS into a near-dup of doc 1 (keep-flip
        # with no removal); doc 3 is removed outright; doc 21 arrives
        rows2 = [
            (i, near if i == 7 else _text(i), f"src{i % 3}")
            for i in range(22)
            if i != 3
        ]
        rows2 = [r if r[0] != 15 else (15, near, "src0") for r in rows2]
        spark.createDataFrame(
            rows2, "doc_id bigint, text string, source string"
        ).coalesce(1).write.parquet(v2)

        dirs = tuple(str(tmp_path / n) for n in ("state", "shards"))
        for bid, snap in enumerate((v1, v2)):
            assert main(
                ["sync-corpus", "--state", dirs[0], "--snapshot", snap,
                 "--batch-id", str(bid), "--shards-state", dirs[1]]
            ) == 0
        capsys.readouterr()
        assert main(["verify-consistency", "--states", *dirs]) == 0

        sink = TrainingShardSink(dirs[1])
        served = sink.manifest(spark).orderBy("shard").collect()
        kept_ids = {r.doc_id for r in sink.layout(spark).collect()}
        # losers are out of the layout: 15 (near-dup since v1) and 7
        # (flipped in v2); doc 1 (cluster canonical) stays; 3 removed
        assert 1 in kept_ids
        assert 15 not in kept_ids and 7 not in kept_ids
        assert 3 not in kept_ids and 21 in kept_ids
        # and the layout equals a from-scratch build over exactly the
        # kept docs of v2
        kept_docs = spark.createDataFrame(
            [r for r in rows2 if r[0] in kept_ids],
            "doc_id bigint, text string, source string",
        )
        scratch = (
            SH.shard_manifest(SH.shard_layout(kept_docs))
            .orderBy("shard")
            .collect()
        )
        assert served == scratch

    def test_state_stats_reports_epoch(self, spark, tmp_path, capsys):
        v1 = str(tmp_path / "v1")
        _write_snapshot(spark, v1, range(10))
        dirs = tuple(str(tmp_path / n) for n in ("state", "funnel", "card"))
        assert _sync(dirs, v1, 0) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert main(["state-stats", "--state", dirs[0]]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["epoch"]["epoch_fp"] == out["epoch_fp"]
        assert rep["epoch"]["batch_id"] == 0

    def test_mix_budget_shards(self, spark, tmp_path, capsys):
        """--mix-budget packs only the temperature-mixed selection of
        the kept corpus; quota displacement across syncs retracts via
        the self-diff (the selection is a pure function of the kept
        set and budget)."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.functions.hashing import h60
        from vcf_pg_loader_spark.operators import shards as SH
        from vcf_pg_loader_spark.streaming.shards import TrainingShardSink

        v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
        _write_snapshot(spark, v1, range(30))
        _write_snapshot(spark, v2, range(40))
        dirs = tuple(str(tmp_path / n) for n in ("state", "shards"))
        budget = 18
        for bid, snap in enumerate((v1, v2)):
            assert main(
                ["sync-corpus", "--state", dirs[0], "--snapshot", snap,
                 "--batch-id", str(bid), "--shards-state", dirs[1],
                 "--mix-budget", str(budget)]
            ) == 0
        capsys.readouterr()

        # expected selection: all v2 docs are kept (distinct texts),
        # per-source sqrt quotas over budget, hash-rank filled
        kd = spark.read.parquet(v2)
        counts = kd.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        scaled = counts.withColumn("_s", F.sqrt("n"))
        tot = scaled.agg(
            F.sum(F.col("_s").cast("decimal(20,12)"))
            .cast("double").alias("_t"))
        plan = scaled.crossJoin(F.broadcast(tot)).select(
            "source",
            F.floor(F.lit(budget) * (F.col("_s") / F.col("_t")))
            .cast("bigint").alias("pd"))
        w = Window.partitionBy("source").orderBy(
            h60(F.col("doc_id").cast("string"), "mix:"), F.col("doc_id"))
        sel = (kd.withColumn("_rn", F.row_number().over(w))
               .join(F.broadcast(plan), "source")
               .filter(F.col("_rn") <= F.col("pd"))
               .select("doc_id", "text"))
        sel_n = sel.count()
        assert 0 < sel_n < 40  # a real subset

        sink = TrainingShardSink(dirs[1])
        got_ids = {r.doc_id for r in sink.layout(spark).collect()}
        assert got_ids == {r.doc_id for r in sel.collect()}
        served = sink.manifest(spark).orderBy("shard").collect()
        scratch = (SH.shard_manifest(SH.shard_layout(sel))
                   .orderBy("shard").collect())
        assert served == scratch
        assert sink.read_epoch()["mix_budget"] == budget

    def test_epoch_fp_is_content_keyed(self, spark, tmp_path, capsys):
        # identical snapshot content at a different path -> same fp
        v1, v1b = str(tmp_path / "v1"), str(tmp_path / "v1b")
        _write_snapshot(spark, v1, range(8))
        _write_snapshot(spark, v1b, range(8))
        d1 = tuple(str(tmp_path / n) for n in ("s1", "f1", "c1"))
        d2 = tuple(str(tmp_path / n) for n in ("s2", "f2", "c2"))
        assert _sync(d1, v1, 0) == 0
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert _sync(d2, v1b, 0) == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["epoch_fp"] == out2["epoch_fp"]
        # and the two pipelines cross-verify as one corpus
        assert main(
            ["verify-consistency", "--states", *d1, *d2]
        ) == 0


class TestEpochStampReplaySafety:
    """Round-11 advice items 1-2: a replayed batch id must not re-stamp
    a state with a new snapshot's epoch, and source-only snapshot
    changes must fingerprint distinctly."""

    def _stamp_of(self, state):
        with open(f"{state}_epoch.json") as fh:
            return json.load(fh)

    def test_replay_same_snapshot_is_clean_noop(self, spark, tmp_path, capsys):
        v1 = str(tmp_path / "v1")
        _write_snapshot(spark, v1, range(8))
        dirs = tuple(str(tmp_path / n) for n in ("s", "f", "c"))
        assert _sync(dirs, v1, 0) == 0
        capsys.readouterr()
        before = self._stamp_of(dirs[0])
        assert _sync(dirs, v1, 0) == 0  # replay: same snapshot+batch
        assert self._stamp_of(dirs[0]) == before

    def test_replayed_batch_id_with_new_snapshot_refused(
        self, spark, tmp_path, capsys
    ):
        import pytest

        v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
        _write_snapshot(spark, v1, range(8))
        _write_snapshot(spark, v2, range(4, 14))  # different content
        dirs = tuple(str(tmp_path / n) for n in ("s", "f", "c"))
        assert _sync(dirs, v1, 0) == 0
        capsys.readouterr()
        before = self._stamp_of(dirs[0])
        # reusing batch id 0 for a DIFFERENT snapshot: the apply is a
        # silent no-op, so stamping v2's epoch would make
        # verify-consistency vouch for a diverged state — must refuse
        # and must NOT rewrite the stamp
        with pytest.raises(ValueError, match="reused batch id"):
            _sync(dirs, v2, 0)
        assert self._stamp_of(dirs[0]) == before
        # the correct path (fresh batch id) still works
        assert _sync(dirs, v2, 1) == 0

    def test_source_only_change_gets_new_epoch_fp(
        self, spark, tmp_path, capsys
    ):
        v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
        ids = range(8)
        _write_snapshot(spark, v1, ids)
        # same doc_ids and text, every source moved
        spark.createDataFrame(
            [(i, _text(i), f"moved{i % 2}") for i in ids],
            "doc_id bigint, text string, source string",
        ).coalesce(1).write.parquet(v2)
        d1 = tuple(str(tmp_path / n) for n in ("s1", "f1", "c1"))
        d2 = tuple(str(tmp_path / n) for n in ("s2", "f2", "c2"))
        assert _sync(d1, v1, 0) == 0
        out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert _sync(d2, v2, 0) == 0
        out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["epoch_fp"] != out2["epoch_fp"]

    def test_sourceless_snapshot_keeps_two_part_formula(
        self, spark, tmp_path, capsys
    ):
        """A snapshot without a source column fingerprints exactly as
        before the source fold-in (stamps stay comparable), and equals
        itself deterministically."""
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.functions.hashing import h60

        v = str(tmp_path / "v")
        spark.createDataFrame(
            [(i, _text(i)) for i in range(6)],
            "doc_id bigint, text string",
        ).write.parquet(v)
        dirs = tuple(str(tmp_path / n) for n in ("s", "f", "c"))
        assert _sync(dirs, v, 0) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        want = (
            spark.read.parquet(v)
            .agg(
                F.coalesce(
                    F.bit_xor(
                        h60(
                            F.concat_ws(
                                ":",
                                F.col("doc_id").cast("string"),
                                F.md5("text"),
                            ),
                            "epoch:",
                        )
                    ),
                    F.lit(0),
                ).alias("fp")
            )
            .collect()[0]
            .fp
        )
        assert out["epoch_fp"] == int(want)
