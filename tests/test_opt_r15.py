"""Round-15 optimization pins: restructured operators must produce
bit-identical results to their pre-optimization formulations.

Each test spells the ORIGINAL (pre-optimization) plan shape inline as
the reference and asserts the production operator matches it exactly —
so the optimized internals (shared aggregates, persisted subtrees,
single-pass counters) can never drift from the semantics the oracle
pins.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class TestDocNLLRestructure:
    """operators/lm.py doc_nll: c1 and the vocabulary size are now
    derived from the (persisted, vocabulary-sized) c12 table instead of
    three independent corpus-wide bigram aggregations — guide §2.3
    'aggregate before you shuffle' / §5 reuse.  c(w1) == Σ_w2 c12 and
    |distinct w2| are identities over the same bigram multiset, so the
    NLL doubles must match bit-for-bit."""

    ROWS = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox naps under the old tree"),
        (3, "zq xv jk wp mn bg td lr cs fh"),
        (4, "one two one two one two one two"),
        (5, "solo"),
        (6, ""),
    ]

    def _reference_nll(self, docs, k=0.5):
        # the pre-optimization formulation, verbatim: four independent
        # passes over the exploded bigram frame
        toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        n1 = F.greatest(F.size(toks) - 1, F.lit(0))
        grams = F.zip_with(
            F.slice(toks, 1, n1),
            F.slice(toks, 2, n1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        bg = docs.select(F.col("doc_id"), F.explode(grams).alias("g")).select(
            "doc_id", "g.w1", "g.w2"
        )
        c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
        c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
        vocab = bg.select("w2").distinct().agg(F.count(F.lit(1)).alias("v"))
        logprob = F.log(
            (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
        )
        return (
            bg.join(c12, ["w1", "w2"])
            .join(c1, "w1")
            .crossJoin(F.broadcast(vocab))
            .select(F.col("doc_id"), logprob.alias("lp"))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.round(
                    -(
                        F.sum(F.col("lp").cast("decimal(24,12)")).cast(
                            "double"
                        )
                    )
                    / F.count(F.lit(1)),
                    6,
                ).alias("nll"),
            )
        )

    def test_doc_nll_matches_four_pass_reference(self, spark):
        from vcf_pg_loader_spark.operators.lm import doc_nll

        docs = spark.createDataFrame(self.ROWS, "doc_id bigint, text string")
        got = {
            r.doc_id: (r.n_bigrams, r.nll)
            for r in doc_nll(docs).collect()
        }
        want = {
            r.doc_id: (r.n_bigrams, r.nll)
            for r in self._reference_nll(docs).collect()
        }
        assert got == want
        spark.catalog.clearCache()

    def test_bigram_model_tables_match_direct_aggregations(self, spark):
        from vcf_pg_loader_spark.operators.lm import bigram_model

        docs = spark.createDataFrame(self.ROWS, "doc_id bigint, text string")
        c12, c1, vocab = bigram_model(docs)
        c12_rows = {(r.w1, r.w2): r.c12 for r in c12.collect()}
        # c1 must equal the direct per-w1 bigram count
        direct_c1 = {}
        for (w1, _w2), c in c12_rows.items():
            direct_c1[w1] = direct_c1.get(w1, 0) + c
        assert {r.w1: r.c1 for r in c1.collect()} == direct_c1
        # vocab must equal |distinct w2|
        assert vocab.collect()[0].v == len({w2 for _w1, w2 in c12_rows})
        spark.catalog.clearCache()


class TestDsirBucketStatsRestructure:
    """q_dsir_weights (queries/pipeline.py): the target/source bucket
    totals now come from ONE conditional-count aggregation over the
    exploded grams with the grand totals window-attached, replacing
    three independent corpus passes — guide §1.2/§2.3.  The identity:
    summing per-(doc, bucket) counts over docs equals counting gram
    rows per bucket (filtered to target docs for nt), and the window
    totals equal the scalar-aggregate totals, so every operand double
    of the log-ratio is bit-identical.  Pinned here against the
    pre-optimization three-branch formulation on an inline corpus."""

    ROWS = [
        (1, "alpha beta gamma alpha", "en"),
        (2, "beta gamma delta", "en"),
        (3, "alpha beta", "fr"),
        (4, "delta epsilon zeta eta theta", "de"),
        (5, "alpha alpha alpha", "en"),
        (6, "", "en"),
    ]

    def _reference_lr(self, docs):
        # the pre-optimization formulation, verbatim
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.queries.pipeline import (
            DSIR_ALPHA,
            DSIR_BUCKETS,
            DSIR_TARGET_LANG,
            _dsir_features,
        )

        feats = _dsir_features(docs)
        target_ids = docs.filter(
            F.col("lang") == DSIR_TARGET_LANG
        ).select("doc_id")
        tgt = (
            feats.join(target_ids, "doc_id", "left_semi")
            .groupBy("b")
            .agg(F.sum("n").alias("nt"))
        )
        src = feats.groupBy("b").agg(F.sum("n").alias("ns"))
        tt = tgt.agg(F.sum("nt").alias("Tt"))
        ts = src.agg(F.sum("ns").alias("Ts"))
        a, m = DSIR_ALPHA, DSIR_BUCKETS
        return (
            src.join(tgt, "b", "left")
            .crossJoin(F.broadcast(tt))
            .crossJoin(F.broadcast(ts))
            .select(
                "b",
                (
                    F.log(
                        (F.coalesce(F.col("nt"), F.lit(0)) + F.lit(a))
                        / (F.col("Tt") + F.lit(a * m))
                    )
                    - F.log(
                        (F.col("ns") + F.lit(a)) / (F.col("Ts") + F.lit(a * m))
                    )
                ).alias("lr"),
            )
        )

    def test_single_pass_weights_match_three_branch_reference(self, spark):
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.queries.pipeline import _dsir_features

        docs = spark.createDataFrame(
            self.ROWS, "doc_id bigint, text string, lang string"
        )
        lr = self._reference_lr(docs)
        want = {
            r.doc_id: r.log_weight
            for r in (
                _dsir_features(docs)
                .join(F.broadcast(lr), "b")
                .groupBy("doc_id")
                .agg(
                    F.round(
                        F.sum(
                            (F.col("n") * F.col("lr")).cast("decimal(24,12)")
                        ).cast("double"),
                        6,
                    ).alias("log_weight")
                )
            ).collect()
        }
        # production path: write docs as the documents table of a tmp
        # sf dir so q_dsir_weights runs verbatim
        import os
        import tempfile

        from vcf_pg_loader_spark.queries.pipeline import q_dsir_weights

        with tempfile.TemporaryDirectory() as d:
            docs.withColumn("source", F.lit("s")).withColumn(
                "n_chars", F.length("text")
            ).write.parquet(os.path.join(d, "documents.parquet"))
            got = {
                r.doc_id: r.log_weight
                for r in q_dsir_weights(spark, d).collect()
            }
        assert got == want
        spark.catalog.clearCache()


class TestRecallSampleRestructure:
    """operators/dedup.py lsh_recall_sample: the three crossJoined
    aggregates (each re-executing the AllPairs subtree) are now one
    left-join + one aggregate over a single execution of the true-pair
    pipeline — guide §1.2 'don't compute things you throw away'.  The
    counters must match a driver-side reference computed from the
    constituent operators."""

    ROWS = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta iota"),
        (2, "one two three four five six seven eight nine"),
        (3, "one two three four five six seven eight ten"),
        (4, "totally unrelated words appear in this document"),
        (5, "more unrelated text with different content here"),
        (6, "cats dogs birds fish mice snakes horses cows"),
        (7, "red green blue yellow purple orange pink brown"),
    ]

    def test_counters_match_constituent_operators(self, spark):
        from pyspark.storagelevel import StorageLevel

        from vcf_pg_loader_spark.operators.dedup import (
            lsh_candidate_pairs,
            lsh_recall_sample,
            minhash_signatures,
            prefix_filtered_jaccard_pairs,
            shingles,
        )

        docs = spark.createDataFrame(self.ROWS, "doc_id bigint, text string")
        n, k, bands, t = 3, 8, 4, 0.5
        got = lsh_recall_sample(
            docs, "doc_id", "text", n=n, k=k, bands=bands,
            threshold=t, sample_mod=1,
        ).collect()[0]
        # reference: true pairs and banded candidates computed by the
        # constituent operators, coverage counted driver-side
        sh = shingles(docs, "doc_id", "text", n).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        true_pairs = {
            (r.d1, r.d2)
            for r in prefix_filtered_jaccard_pairs(sh, t)
            .select("d1", "d2")
            .collect()
        }
        cands = {
            (r.d1, r.d2)
            for r in lsh_candidate_pairs(
                minhash_signatures(sh, k), k, bands
            ).collect()
        }
        assert got.n_sample_docs == len(self.ROWS)
        assert got.n_true_pairs == len(true_pairs)
        assert got.n_banded_pairs == len(true_pairs & cands)
        want_recall = (
            1.0
            if not true_pairs
            else round(len(true_pairs & cands) / len(true_pairs), 6)
        )
        assert got.recall == want_recall
        spark.catalog.clearCache()
