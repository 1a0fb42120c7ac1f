"""Streaming near-dup-gated ingest (streaming/dedup_ingest.py): exact
and near duplicates are rejected against everything already admitted,
first arrival wins, replays are no-ops, and the real streaming wiring
(file source, availableNow) produces the same admitted set as direct
batch application.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.streaming.dedup_ingest import NearDupIngestSink

BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu one two three four five six seven eight nine ten"
)
NEAR = BASE.rsplit(" ", 1)[0] + " eleven"  # one token differs -> J ~ 0.94
THIRD = (
    "genuinely distinct third document text mentioning vectors indexes "
    "bloom filters histograms quantiles retrieval scoring and nothing else "
    "that overlaps the other fixtures in any three token window at all"
)
OTHER = (
    "completely different content about query engines shuffles partitions "
    "and broadcast joins with nothing shared with the phonetic alphabet at "
    "all in any window of three consecutive tokens anywhere in this text"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestNearDupIngest:
    def test_gates_and_first_arrival_wins(self, spark, tmp_path):
        sink = NearDupIngestSink(str(tmp_path / "corpus"))

        # batch 0: BASE + an exact copy + a near-dup + one genuine doc
        b0 = _df(
            spark,
            [(1, BASE), (2, BASE), (3, NEAR), (10, OTHER)],
        )
        sink.apply_batch(b0, 0)
        got0 = {r.doc_id for r in sink.read_corpus(spark).collect()}
        assert got0 == {1, 10}  # min-id canonical; copy and near-dup gone

        # batch 1: another exact copy, another near-dup, one new doc
        b1 = _df(
            spark,
            [(21, BASE), (22, NEAR), (30, THIRD)],
        )
        sink.apply_batch(b1, 1)
        got1 = {r.doc_id for r in sink.read_corpus(spark).collect()}
        assert 21 not in got1  # exact dup of admitted doc 1
        assert 22 not in got1  # near-dup of admitted doc 1 (cross-batch!)
        assert got1 == {1, 10, 30}

    def test_replay_is_noop(self, spark, tmp_path):
        sink = NearDupIngestSink(str(tmp_path / "corpus"))
        sink.apply_batch(_df(spark, [(1, BASE), (10, OTHER)]), 0)
        n1 = sink.read_corpus(spark).count()
        sink.apply_batch(_df(spark, [(1, BASE), (10, OTHER)]), 0)  # replay
        assert sink.read_corpus(spark).count() == n1

    def test_marker_recovery_no_double_admit(self, spark, tmp_path):
        import os

        sink = NearDupIngestSink(str(tmp_path / "corpus"))
        sink.apply_batch(_df(spark, [(1, BASE)]), 0)
        sink.apply_batch(_df(spark, [(10, OTHER)]), 1)
        n = sink.read_corpus(spark).count()
        os.remove(sink._ledger_path(1))  # crash before the ledger write
        sink.apply_batch(_df(spark, [(10, OTHER)]), 1)  # replay
        assert sink.read_corpus(spark).count() == n
        assert sink.applied(1)

    def test_band_index_matches_corpus(self, spark, tmp_path):
        """The swapped-together invariant: every admitted doc has band
        rows, every band row's doc is in the corpus."""
        sink = NearDupIngestSink(str(tmp_path / "corpus"))
        sink.apply_batch(_df(spark, [(1, BASE), (10, OTHER)]), 0)
        sink.apply_batch(_df(spark, [(30, THIRD)]), 1)
        corpus = {r.doc_id for r in sink.read_corpus(spark).collect()}
        bands = {
            r.doc_id for r in sink._table(spark, "bands").collect()
        }
        assert corpus == bands

    def test_streaming_wiring_equals_direct(self, spark, tmp_path):
        from vcf_pg_loader_spark.streaming.events import read_events_stream

        src = str(tmp_path / "in")
        rows0 = [(1, BASE), (2, BASE), (10, OTHER)]
        rows1 = [(21, NEAR), (30, THIRD)]
        schema = "doc_id bigint, text string"
        # one file per micro-batch
        _df(spark, rows0).coalesce(1).write.mode("append").parquet(src)
        _df(spark, rows1).coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(schema).parquet(src)
        )
        sink = NearDupIngestSink(str(tmp_path / "corpus_stream"))
        (
            stream.writeStream.foreachBatch(sink.apply_batch)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .option("maxFilesPerTrigger", 1)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        got = {r.doc_id for r in sink.read_corpus(spark).collect()}
        # admitted set: dedup within/across batches, first arrival wins
        assert 2 not in got and 21 not in got
        assert {1, 10, 30} <= got


class TestBM25IndexSink:
    def test_maintained_index_equals_fresh_build(self, spark, tmp_path):
        from vcf_pg_loader_spark.sources.bm25_index import BM25Index
        from vcf_pg_loader_spark.streaming.dedup_ingest import BM25IndexSink

        rows = [
            (1, "spark shuffle join shuffle broadcast"),
            (2, "broadcast join window sort"),
            (3, "spark spark merge window"),
            (4, "completely different vocabulary here tonight"),
        ]
        docs = _df(spark, rows)
        sink = BM25IndexSink(str(tmp_path / "idx"))
        sink.apply_batch(docs.filter(F.col("doc_id") <= 2), 0)
        sink.apply_batch(docs.filter(F.col("doc_id") > 2), 1)

        fresh = BM25Index(spark, str(tmp_path / "fresh"))
        fresh.build(docs)
        terms = ["spark", "join", "window"]
        got = sorted(
            map(tuple, sink.index(spark).search(terms, k=4).collect())
        )
        want = sorted(map(tuple, fresh.search(terms, k=4).collect()))
        assert got == want and len(want) > 0

    def test_replay_and_resent_docs_are_noops(self, spark, tmp_path):
        from vcf_pg_loader_spark.streaming.dedup_ingest import BM25IndexSink

        docs = _df(spark, [(1, "alpha beta gamma"), (2, "beta gamma delta")])
        sink = BM25IndexSink(str(tmp_path / "idx"))
        sink.apply_batch(docs, 0)
        n0 = sink._table(spark, "postings").count()
        sink.apply_batch(docs, 0)  # replayed batch id
        assert sink._table(spark, "postings").count() == n0
        sink.apply_batch(docs, 1)  # same docs, NEW batch id: doc-level gate
        assert sink._table(spark, "postings").count() == n0

    def test_postings_stay_bucket_partitioned(self, spark, tmp_path):
        import glob as g

        from vcf_pg_loader_spark.streaming.dedup_ingest import BM25IndexSink

        docs = _df(spark, [(i, f"word{i} common text here") for i in range(12)])
        sink = BM25IndexSink(str(tmp_path / "idx"))
        sink.apply_batch(docs, 0)
        assert g.glob(str(tmp_path / "idx" / "postings" / "bucket=*"))


def _emb_df(spark, vids):
    """Deterministic 8-dim vectors: direction = vid % 12 one-hot-ish with
    a vid-dependent secondary component; vids congruent mod 12 within
    {0..47} share a direction EXACTLY (cosine 1.0) — planted semantic
    dups, including cross-batch ones."""
    rows = []
    for vid in vids:
        d = vid % 12
        vec = [0.0] * 8
        vec[d % 8] = 1.0
        vec[(d + 3) % 8] += 0.25 * (d % 4)
        scale = 1.0 + (vid // 12) * 0.5  # parallel, different magnitude
        rows.append((vid, [x * scale for x in vec]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


class TestSemDeDupIngestSink:
    TAU = 0.9

    def _sink(self, tmp_path):
        from vcf_pg_loader_spark.streaming.dedup_ingest import SemDeDupIngestSink

        return SemDeDupIngestSink(
            str(tmp_path / "semdedup"), k_centroids=4, n_iter=2, tau=self.TAU
        )

    def test_maintained_equals_batch_semdedup_on_union(self, spark, tmp_path):
        """Two batches through the sink == one batch SemDeDup over the
        union computed with the sink's (bootstrap) centroids: same
        cluster table, same keep set — including components MERGED by a
        batch-2 vector similar to two previously-separate batch-1 docs."""
        from vcf_pg_loader_spark.operators import dedup as D
        from vcf_pg_loader_spark.operators import similarity as S

        sink = self._sink(tmp_path)
        b0, b1 = list(range(0, 30)), list(range(30, 48))
        sink.apply_batch(_emb_df(spark, b0), 0)
        sink.apply_batch(_emb_df(spark, b1), 1)

        maintained_keep = {r.vec_id for r in sink.keep(spark).collect()}
        maintained_cc = {
            (r.node, r.comp) for r in sink.clusters(spark).collect()
        }

        union = _emb_df(spark, b0 + b1)
        cents = sink.centroids(spark)
        assigned = S.ivf_assign(union, cents, kernel="exact")
        pairs = sink._sem_pairs(assigned, assigned, same=True)
        cc = D.connected_components(pairs, "d1", "d2")
        want_cc = {(r.node, r.comp) for r in cc.collect()}
        want_keep = {
            r.vec_id
            for r in D.keep_canonical(
                union.select("vec_id"), cc, "vec_id"
            ).collect()
        }
        assert maintained_cc == want_cc and len(want_cc) > 0
        assert maintained_keep == want_keep
        # cross-batch dups actually exist and were dropped
        dropped_from_b1 = set(b1) - maintained_keep
        assert dropped_from_b1  # batch-2 vectors lost to batch-1 canonicals

    def test_replay_is_noop(self, spark, tmp_path):
        import os

        sink = self._sink(tmp_path)
        sink.apply_batch(_emb_df(spark, range(0, 30)), 0)
        b1 = _emb_df(spark, range(30, 48))
        sink.apply_batch(b1, 1)
        keep1 = {r.vec_id for r in sink.keep(spark).collect()}
        n1 = sink._table(spark, "vectors").count()

        # ledger replay short-circuit
        sink.apply_batch(b1, 1)
        assert sink._table(spark, "vectors").count() == n1

        # crash-after-swap-before-ledger: marker finishes the bookkeeping
        os.remove(sink._ledger_path(1))
        sink.apply_batch(b1, 1)
        assert sink._table(spark, "vectors").count() == n1
        assert {r.vec_id for r in sink.keep(spark).collect()} == keep1
        assert sink.applied(1)

    def test_vectors_partitioned_by_cell(self, spark, tmp_path):
        import glob as g

        sink = self._sink(tmp_path)
        sink.apply_batch(_emb_df(spark, range(0, 30)), 0)
        cells = g.glob(str(tmp_path / "semdedup" / "vectors" / "cid=*"))
        assert len(cells) >= 2  # landing-cell pruning maps to directories


class TestBM25SinkEmptyDocs:
    def test_empty_text_doc_counts_toward_idf(self, spark, tmp_path):
        """A zero-token doc must land in doclens (dl=0) so n_docs — and
        thus idf and scores — match a fresh BM25Index over the same
        corpus (the build-side advisory fix, mirrored in maintenance),
        and so the idempotence gate stops re-admitting it."""
        from vcf_pg_loader_spark.sources.bm25_index import BM25Index
        from vcf_pg_loader_spark.streaming.dedup_ingest import BM25IndexSink

        rows0 = [(1, "spark shuffle join shuffle"), (2, "")]
        rows1 = [(3, "broadcast join"), (4, "   "), (5, "spark window"), (2, "")]
        sink = BM25IndexSink(str(tmp_path / "idx"))
        sink.apply_batch(_df(spark, rows0), 0)
        sink.apply_batch(_df(spark, rows1), 1)

        fresh = BM25Index(spark, str(tmp_path / "fresh"))
        fresh.build(_df(spark, [(1, "spark shuffle join shuffle"), (2, ""),
                                (3, "broadcast join"), (4, "   "),
                                (5, "spark window")]))
        served = sorted(
            map(tuple, sink.index(spark).search(["spark", "join"], k=5).collect())
        )
        want = sorted(
            map(tuple, fresh.search(["spark", "join"], k=5).collect())
        )
        assert served == want and len(served) == 3
        # doc 2 ingested once, counted once
        dl = sink._table(spark, "doclens")
        assert dl.filter(F.col("doc_id") == 2).count() == 1
        stats = sink._table(spark, "stats").first()
        assert stats.n_docs == 5
