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


class TestIvfAssignRestructure:
    """operators/similarity.py _ivf_assign / _ivf_rank_centroids and
    operators/pq.py pq_encode: the crossJoin-against-centroid-rows +
    groupBy(vid)/window formulations are now row-local array folds over
    ONE broadcast centroid-array row — guide §2.4 'remove shuffles
    outright'.  array_min / array_sort over (d, cid) structs compare
    field-by-field, so the winners are exactly the old
    min(struct(d, cid)) / ROW_NUMBER() ORDER BY d, cid picks; the
    distance arithmetic is written identically, so assignments, ranks
    and PQ codes must match bit-for-bit — and the new plans must carry
    ZERO Exchange (the corpus never shuffles to be assigned/encoded)."""

    def _emb(self, spark, n=40, d=8):
        rows = [
            (i, [((i * 7 + j * 13) % 19) - 9.0 + 0.25 * j for j in range(d)])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )

    def _reference_assign(self, vecs, cents, kernel="exact"):
        # the pre-optimization formulation, verbatim: corpus × centroids
        # broadcast cross join, hash-aggregate argmin keyed on vid
        from vcf_pg_loader_spark.operators.similarity import _dot

        dot = _dot(kernel)
        scored = vecs.crossJoin(F.broadcast(cents)).select(
            "vid",
            "vec",
            "vv",
            "cid",
            (
                (F.col("vv") - F.lit(2.0) * dot(F.col("vec"), F.col("cvec")))
                + F.col("cc")
            ).alias("d"),
        )
        return (
            scored.groupBy("vid")
            .agg(
                F.first("vec").alias("vec"),
                F.first("vv").alias("vv"),
                F.min(F.struct("d", "cid")).alias("_m"),
            )
            .select("vid", "vec", "vv", F.col("_m.cid").alias("cid"))
        )

    def test_assign_matches_reference_bitwise(self, spark):
        from vcf_pg_loader_spark.operators.similarity import (
            _ivf_assign,
            _prep_vectors,
        )

        emb = self._emb(spark)
        vecs = _prep_vectors(emb, "vec_id", "embedding")
        cents = vecs.orderBy("vid").limit(5).select(
            F.col("vid").alias("cid"),
            F.col("vec").alias("cvec"),
            F.col("vv").alias("cc"),
        )
        got = {
            r.vid: r.cid for r in _ivf_assign(vecs, cents).collect()
        }
        want = {
            r.vid: r.cid
            for r in self._reference_assign(vecs, cents).collect()
        }
        assert got == want

    def test_rank_matches_window_reference(self, spark):
        from pyspark.sql.window import Window

        from vcf_pg_loader_spark.operators.similarity import (
            _dot,
            _ivf_rank_centroids,
            _prep_vectors,
        )

        emb = self._emb(spark, n=12)
        vecs = _prep_vectors(emb, "vec_id", "embedding")
        cents = vecs.orderBy("vid").limit(4).select(
            F.col("vid").alias("cid"),
            F.col("vec").alias("cvec"),
            F.col("vv").alias("cc"),
        )
        dot = _dot("exact")
        scored = vecs.crossJoin(F.broadcast(cents)).select(
            "vid",
            "cid",
            (
                (F.col("vv") - F.lit(2.0) * dot(F.col("vec"), F.col("cvec")))
                + F.col("cc")
            ).alias("d"),
        )
        w = Window.partitionBy("vid").orderBy(F.asc("d"), F.asc("cid"))
        want = {
            (r.vid, r.cid): r.rn
            for r in scored.withColumn(
                "rn", F.row_number().over(w)
            ).collect()
        }
        got = {
            (r.vid, r.cid): r.rn
            for r in _ivf_rank_centroids(vecs, cents).collect()
        }
        assert got == want

    def test_assign_and_encode_plans_have_no_exchange(self, spark):
        from vcf_pg_loader_spark.operators.pq import pq_encode, pq_fit
        from vcf_pg_loader_spark.operators.similarity import (
            _ivf_assign,
            _prep_vectors,
        )

        emb = self._emb(spark)
        vecs = _prep_vectors(emb, "vec_id", "embedding")
        cents = vecs.orderBy("vid").limit(5).select(
            F.col("vid").alias("cid"),
            F.col("vec").alias("cvec"),
            F.col("vv").alias("cc"),
        )
        assigned = _ivf_assign(vecs, cents)
        plan = assigned._jdf.queryExecution().executedPlan().toString()
        # the one-row centroid-array aggregate pays a SinglePartition
        # exchange of k rows inside the broadcast subtree; the corpus
        # itself must never shuffle (no hash partitioning anywhere)
        assert "hashpartitioning" not in plan

        books = pq_fit(emb, m=4, k_sub=4)
        codes = pq_encode(emb, books, m=4)
        plan = codes._jdf.queryExecution().executedPlan().toString()
        # the codebook subtree may aggregate (it is k-sized); the corpus
        # side must not shuffle: no hashpartitioning on vid anywhere
        assert "hashpartitioning(vid" not in plan

    def test_pq_codes_match_reference(self, spark):
        from vcf_pg_loader_spark.operators.pq import (
            _subvector,
            pq_encode,
            pq_fit,
        )
        from vcf_pg_loader_spark.operators.similarity import dot_fast

        emb = self._emb(spark, n=24, d=8)
        m, k_sub = 4, 4
        books = pq_fit(emb, m=m, k_sub=k_sub)
        got = {
            r.vid: list(r.codes) for r in pq_encode(emb, books, m=m).collect()
        }
        # reference: the pre-optimization per-subspace loop, verbatim
        vecs = emb.select(
            F.col("vec_id").alias("vid"),
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("vec"),
        )
        parts = None
        for sub in range(m):
            sv = vecs.select(
                "vid", _subvector(F.col("vec"), m, sub).alias("sv")
            )
            scored = sv.join(
                F.broadcast(books.filter(F.col("sub") == sub)), how="cross"
            ).select(
                "vid",
                F.lit(sub).alias("sub"),
                "code",
                (
                    dot_fast(F.col("sv"), F.col("sv"))
                    - 2.0 * dot_fast(F.col("sv"), F.col("cvec"))
                    + dot_fast(F.col("cvec"), F.col("cvec"))
                ).alias("d"),
            )
            best = scored.groupBy("vid", "sub").agg(
                F.min(F.struct("d", "code")).alias("_m")
            )
            part = best.select("vid", "sub", F.col("_m.code").alias("code"))
            parts = part if parts is None else parts.unionByName(part)
        want = {
            r.vid: list(r.codes)
            for r in parts.groupBy("vid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("sub", "code"))
                ).alias("_sc")
            )
            .select(
                "vid",
                F.transform(F.col("_sc"), lambda s: s.code).alias("codes"),
            )
            .collect()
        }
        assert got == want


class TestCmsPreaggRestructure:
    """operators/sketch.py cms_partial: multiplicities are now summed
    per DISTINCT value BEFORE the md5-derived h60 hash and the rowpos
    explode — guide §2.3 'aggregate before you shuffle'.  Count-Min
    counters are linear, so Σ_occurrences m == Σ_values (Σ m per value)
    per (row, pos): exact integers, the sketch must match the
    per-occurrence formulation bit-for-bit, signed multiplicities
    included."""

    def _reference_partial(self, df, value_col, rows, width, mult_col):
        # the pre-optimization formulation, verbatim: hash + explode per
        # occurrence, one terminal (row, pos) aggregation
        from vcf_pg_loader_spark.functions.hashing import h60
        from vcf_pg_loader_spark.operators.sketch import _cms_rowpos_pairs

        m = (
            F.col(mult_col).cast("bigint")
            if mult_col
            else F.lit(1).cast("bigint")
        )
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(
                h60(F.col(value_col), salt="cms:").alias("_h"), m.alias("_m")
            )
            .select(
                F.col("_m"),
                F.explode(
                    _cms_rowpos_pairs(F.col("_h"), rows, width)
                ).alias("_rp"),
            )
            .select(
                F.col("_rp.row").alias("row"),
                F.col("_rp.pos").alias("pos"),
                "_m",
            )
            .groupBy("row", "pos")
            .agg(F.sum("_m").alias("cnt"))
        )

    def test_partial_matches_reference_with_signed_mults(self, spark):
        from vcf_pg_loader_spark.operators.sketch import cms_partial

        rows = [
            ("alpha", 1), ("alpha", 1), ("beta", 1), ("gamma", 1),
            ("alpha", -1), ("beta", -1), ("beta", 1), ("delta", -1),
            (None, 1), ("gamma", 1), ("alpha", 1),
        ]
        df = spark.createDataFrame(rows, "token string, zmult bigint")
        got = {
            (r.row, r.pos): r.cnt
            for r in cms_partial(
                df, "token", rows=4, width=64, mult_col="zmult"
            ).collect()
        }
        want = {
            (r.row, r.pos): r.cnt
            for r in self._reference_partial(
                df, "token", 4, 64, "zmult"
            ).collect()
        }
        assert got == want

    def test_partial_matches_reference_unit_mult(self, spark):
        from vcf_pg_loader_spark.operators.sketch import cms_partial

        df = spark.createDataFrame(
            [(t,) for t in "a b c a b a d e f a".split()], "token string"
        )
        got = {
            (r.row, r.pos): r.cnt
            for r in cms_partial(df, "token", rows=4, width=32).collect()
        }
        want = {
            (r.row, r.pos): r.cnt
            for r in self._reference_partial(
                df, "token", 4, 32, None
            ).collect()
        }
        assert got == want


class TestVerifyJaccardRestructure:
    """operators/dedup.py verify_candidate_jaccard: the row-expanded
    pair×shingle join + per-pair count + twice-joined sizes aggregation
    is now per-doc sorted shingle arrays + row-local array_intersect —
    guide §2.4 (six exchanges → three).  shingles() emits distinct grams
    per doc, so the intersection size and hence the rounded jaccard are
    bit-identical; zero-overlap candidates drop in both shapes."""

    def _reference_verify(self, cands, sh, threshold):
        # the pre-optimization formulation, verbatim
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            cands.join(a, cands["d1"] == F.col("a.doc_id"))
            .join(
                b,
                (cands["d2"] == F.col("b.doc_id"))
                & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        sa = sizes.alias("sa")
        sb = sizes.alias("sb")
        return (
            inter.join(sa, F.col("d1") == F.col("sa.doc_id"))
            .join(sb, F.col("d2") == F.col("sb.doc_id"))
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_inter")
                    / (
                        F.col("sa.n_sh")
                        + F.col("sb.n_sh")
                        - F.col("n_inter")
                    ),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("d1", "d2", "n_inter", "jaccard")
        )

    def test_matches_reference_incl_zero_overlap_and_threshold_zero(
        self, spark
    ):
        from vcf_pg_loader_spark.operators.dedup import (
            shingles,
            verify_candidate_jaccard,
        )

        docs = spark.createDataFrame(
            [
                (1, "a b c d e f g"),
                (2, "a b c d e f h"),
                (3, "a b c d e f g"),
                (4, "x y z w v u t"),
                (5, "p q r s"),
            ],
            "doc_id bigint, text string",
        )
        sh = shingles(docs, "doc_id", "text", 3)
        cands = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5)],
            "d1 bigint, d2 bigint",
        )
        for t in (0.0, 0.5, 0.8):
            got = {
                tuple(r)
                for r in verify_candidate_jaccard(cands, sh, t).collect()
            }
            want = {
                tuple(r)
                for r in self._reference_verify(cands, sh, t).collect()
            }
            assert got == want, f"threshold {t}"
        # sanity: the zero-overlap pair (1,4) is absent even at t=0.0
        got0 = {
            (r.d1, r.d2)
            for r in verify_candidate_jaccard(cands, sh, 0.0).collect()
        }
        assert (1, 4) not in got0


class TestCappedSmallBucketArrayPairs:
    """operators/dedup.py lsh_candidate_pairs_capped: small-bucket pairs
    are now generated row-locally from a per-bucket sorted member array
    (bounded by the cap itself) instead of a second window execution
    feeding a bucket self-join — guide §2.4.  sort_array + suffix
    slicing enumerates exactly the d1 < d2 member pairs the self-join's
    a.doc_id < b.doc_id predicate emitted, so the candidate set (and
    hence everything verified downstream) is identical; the star path
    for oversized buckets and the routed frame are untouched."""

    def _reference_capped(self, sig, k, bands, cap):
        # the pre-optimization small-bucket formulation, verbatim:
        # window-sized band table self-joined on the bucket keys
        from pyspark.sql import Window

        from vcf_pg_loader_spark.operators.dedup import lsh_band_table

        banded = lsh_band_table(sig, k, bands)
        w = Window.partitionBy("band_id", "band_key")
        sized = banded.withColumn(
            "_sz", F.count(F.lit(1)).over(w)
        ).withColumn("_bmin", F.min("doc_id").over(w))
        small = sized.filter(F.col("_sz") <= cap).select(
            "doc_id", "band_id", "band_key"
        )
        a = small.alias("a")
        b = small.alias("b")
        pairs_small = a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        big = sized.filter(F.col("_sz") > cap)
        pairs_big = big.filter(F.col("doc_id") != F.col("_bmin")).select(
            F.col("_bmin").alias("d1"), F.col("doc_id").alias("d2")
        )
        return pairs_small.unionByName(pairs_big).distinct()

    def _docs(self, spark, as_string_ids=False):
        rows = [(i, "a b c d e f g h i j") for i in range(1, 13)] + [
            (100, "x y z w v u t s r q"),
            (101, "x y z w v u t s r p"),
            (102, "m n o p q r s t u v"),
            (103, "entirely different words appear in this document here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        if as_string_ids:
            docs = docs.select(
                F.concat(F.lit("id"), F.col("doc_id").cast("string")).alias(
                    "doc_id"
                ),
                "text",
            )
        return docs

    def test_matches_reference_binding_and_nonbinding_cap(self, spark):
        from vcf_pg_loader_spark.operators.dedup import (
            lsh_candidate_pairs_capped,
            minhash_signatures,
            shingles,
        )

        docs = self._docs(spark)
        sh = shingles(docs, "doc_id", "text", 3)
        sig = minhash_signatures(sh, 8)
        for cap in (1, 2, 10_000):  # binding hard, binding, non-binding
            got_pairs, got_routed = lsh_candidate_pairs_capped(
                sig, 8, 4, bucket_cap=cap
            )
            want = {
                tuple(r)
                for r in self._reference_capped(sig, 8, 4, cap).collect()
            }
            got = {tuple(r) for r in got_pairs.collect()}
            assert got == want, f"cap {cap}"
            if cap == 10_000:
                assert got_routed.count() == 0

    def test_string_ids_same_order_as_join_predicate(self, spark):
        """sort_array on string ids must agree with the old predicate's
        lexicographic a.doc_id < b.doc_id (same total order)."""
        from vcf_pg_loader_spark.operators.dedup import (
            lsh_candidate_pairs_capped,
            minhash_signatures,
            shingles,
        )

        docs = self._docs(spark, as_string_ids=True)
        sig = minhash_signatures(shingles(docs, "doc_id", "text", 3), 8)
        got_pairs, _ = lsh_candidate_pairs_capped(sig, 8, 4, bucket_cap=2)
        want = {
            tuple(r) for r in self._reference_capped(sig, 8, 4, 2).collect()
        }
        assert {tuple(r) for r in got_pairs.collect()} == want


class TestVerifyCandidateDocPrefilter:
    """operators/dedup.py verify_candidate_jaccard invariant: docs
    outside the candidate list can never affect the output (the two
    inner joins restrict to candidate ids), pinned on a corpus where
    most docs are NOT candidates, plus the empty-candidates edge.  This
    is the equivalence a semi-join prefilter of the set aggregation
    would rely on — measured and REJECTED in optimization round 15
    (every prefilter variant lost its interleaved A/B; see the kernel
    docstring) — kept as a pin so the invariant survives whatever shape
    the kernel takes next."""

    def test_non_candidate_docs_do_not_change_output(self, spark):
        from vcf_pg_loader_spark.operators.dedup import (
            shingles,
            verify_candidate_jaccard,
        )

        rows = [(i, f"filler document number {i} with its own words {i}")
                for i in range(10, 40)]
        rows += [
            (1, "a b c d e f g"),
            (2, "a b c d e f h"),
            (3, "a b c d e f g"),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        sh = shingles(docs, "doc_id", "text", 3)
        cands = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3)], "d1 bigint, d2 bigint"
        )
        got = {
            tuple(r)
            for r in verify_candidate_jaccard(cands, sh, 0.5).collect()
        }
        # reference: the same kernel fed ONLY the candidate docs' shingles
        # (what the semi-join reduces it to) must equal the full-corpus
        # call — and both must contain the known duplicate pair
        sh_c = sh.filter(F.col("doc_id").isin(1, 2, 3))
        want = {
            tuple(r)
            for r in verify_candidate_jaccard(cands, sh_c, 0.5).collect()
        }
        assert got == want
        assert {(d1, d2) for (d1, d2, *_rest) in got} == {
            (1, 2), (1, 3), (2, 3)
        }

    def test_empty_candidates(self, spark):
        from vcf_pg_loader_spark.operators.dedup import (
            shingles,
            verify_candidate_jaccard,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d e")], "doc_id bigint, text string"
        )
        sh = shingles(docs, "doc_id", "text", 3)
        cands = spark.createDataFrame([], "d1 bigint, d2 bigint")
        assert verify_candidate_jaccard(cands, sh, 0.0).count() == 0
