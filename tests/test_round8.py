"""Round-8 tests: ADVICE fixes (structured-malformed JPEG, sink
unpersist discipline, VectorIndex bare-relative root) plus the round's
new operators (added incrementally below)."""
import os

import numpy as np
import pytest


def _strip_segment(data: bytes, marker: int) -> bytes:
    """Remove every segment with the given marker byte from a JPEG."""
    out = bytearray(data[:2])
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            out += data[i:]
            break
        m = data[i + 1]
        if m == 0xD9:
            out += data[i:]
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            out += data[i : i + 2]
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        if m != marker:
            out += data[i : i + 2 + seg_len]
        i += 2 + seg_len
        if m == 0xDA:  # entropy data follows to EOI
            out += data[i:]
            break
    return bytes(out)


def _zero_sof_sampling(data: bytes) -> bytes:
    """Zero the h/v sampling nibbles of the first SOF0 component."""
    out = bytearray(data)
    i = 2
    while i < len(out):
        if out[i] != 0xFF:
            break
        m = out[i + 1]
        seg_len = int.from_bytes(out[i + 2 : i + 4], "big")
        if m in (0xC0, 0xC1):
            out[i + 4 + 7] = 0x00  # first component's hv byte
            return bytes(out)
        i += 2 + seg_len
    raise AssertionError("no SOF found")


class TestStructuredMalformedJpeg:
    """ADVICE #1: structured-malformed shapes (missing DHT/DQT, zero hv
    nibble) must raise ValueError from decode_jpeg — never KeyError or
    ZeroDivisionError — so the multimodal decode seam falls through."""

    def _valid(self):
        from vcf_pg_loader_spark.operators._jpeg import encode_jpeg

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        return encode_jpeg(img, "4:4:4")

    def test_missing_dht_raises_valueerror(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg

        bad = _strip_segment(self._valid(), 0xC4)
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    def test_missing_dqt_raises_valueerror(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg

        bad = _strip_segment(self._valid(), 0xDB)
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    def test_zero_sampling_factor_raises_valueerror(self):
        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg

        bad = _zero_sof_sampling(self._valid())
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    def test_decode_seam_survives_structured_malformed(self):
        """The multimodal seam must return the deterministic fake (or a
        PIL decode) rather than crash on structured-malformed JPEG."""
        from vcf_pg_loader_spark.operators.multimodal import _decode_image

        bad = _strip_segment(self._valid(), 0xC4)
        out = _decode_image(bad)
        assert out.ndim == 3 and out.shape[2] == 3


class TestVectorIndexRelativeRoot:
    """ADVICE #3: build() must work for a bare relative root ('idx')."""

    def test_bare_relative_root(self, spark, tmp_path, monkeypatch):
        from vcf_pg_loader_spark.sources.vector_index import VectorIndex

        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(0)
        rows = [
            (i, [float(x) for x in rng.normal(size=8)]) for i in range(64)
        ]
        vecs = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>"
        )
        idx = VectorIndex(spark, "idx")
        idx.build(vecs, k_centroids=4, m=2, k_sub=4)
        assert os.path.isdir("idx")
        q = spark.createDataFrame(rows[:2], "vec_id int, embedding array<double>")
        hits = idx.search(q, k=3)
        assert hits.count() > 0


# ---------------------------------------------------------------------------
# Retraction-maintained served structures (streaming/retract.py)
# ---------------------------------------------------------------------------
BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu one two three four five six seven eight nine ten"
)
NEAR = BASE.rsplit(" ", 1)[0] + " eleven"  # 1 token off BASE
NEAR2 = NEAR.replace("oscar", "oscarx", 1)  # 1 token off NEAR, 2 off BASE
OTHER = (
    "completely different content about query engines shuffles partitions "
    "and broadcast joins with nothing shared with the phonetic alphabet at "
    "all in any window of three consecutive tokens anywhere in this text"
)


def _zdf(spark, rows, mult=None):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    if mult is not None:
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.operators.ivm import MULT

        df = df.withColumn(MULT, F.lit(mult).cast("bigint"))
    return df


class TestDedupClusterMaintSink:
    def _sink(self, tmp_path):
        from vcf_pg_loader_spark.streaming.retract import (
            DedupClusterMaintSink,
        )

        return DedupClusterMaintSink(str(tmp_path / "clusters"))

    def _keep(self, sink, spark):
        return {r.doc_id for r in sink.keep(spark).collect()}

    def test_chain_fixture_shape(self, spark):
        """Pin the fixture geometry the split test relies on: BASE~NEAR
        and NEAR~NEAR2 are near-dups, BASE~NEAR2 is not."""
        from vcf_pg_loader_spark.operators import dedup as D

        docs = _zdf(spark, [(1, BASE), (2, NEAR), (3, NEAR2)])
        pairs = {
            (r.d1, r.d2)
            for r in D.minhash_lsh_dedup(docs, "doc_id", "text").collect()
        }
        assert (1, 2) in pairs and (2, 3) in pairs
        assert (1, 3) not in pairs

    def test_delete_splits_component(self, spark, tmp_path):
        """Deleting a cut vertex SPLITS its cluster — the case a
        labels-only store cannot get right (the maintained pair set
        can): BASE-NEAR-NEAR2 is a chain; removing NEAR leaves BASE and
        NEAR2 unrelated, so BOTH must be kept afterwards."""
        sink = self._sink(tmp_path)
        sink.apply_batch(
            _zdf(spark, [(1, BASE), (2, NEAR), (3, NEAR2), (10, OTHER)]), 0
        )
        assert self._keep(sink, spark) == {1, 10}  # one chain cluster
        sink.apply_batch(_zdf(spark, [(2, NEAR)], mult=-1), 1)
        assert self._keep(sink, spark) == {1, 3, 10}  # split: 3 revives

    def test_delete_reelects_canonical(self, spark, tmp_path):
        sink = self._sink(tmp_path)
        sink.apply_batch(_zdf(spark, [(1, BASE), (2, NEAR), (10, OTHER)]), 0)
        assert self._keep(sink, spark) == {1, 10}
        sink.apply_batch(_zdf(spark, [(1, BASE)], mult=-1), 1)
        assert self._keep(sink, spark) == {2, 10}  # loser promoted

    def test_reinsert_recollides(self, spark, tmp_path):
        sink = self._sink(tmp_path)
        sink.apply_batch(_zdf(spark, [(1, BASE), (10, OTHER)]), 0)
        sink.apply_batch(_zdf(spark, [(1, BASE)], mult=-1), 1)
        assert self._keep(sink, spark) == {10}
        sink.apply_batch(_zdf(spark, [(1, BASE)], mult=1), 2)
        sink.apply_batch(_zdf(spark, [(2, NEAR)], mult=1), 3)
        assert self._keep(sink, spark) == {1, 10}  # 2 collides with 1

    def test_same_batch_cancellation_and_replay(self, spark, tmp_path):
        sink = self._sink(tmp_path)
        sink.apply_batch(_zdf(spark, [(1, BASE), (10, OTHER)]), 0)
        sink.apply_batch(_zdf(spark, [(1, BASE)], mult=-1), 1)
        # +1 and -1 for doc 1 in ONE batch consolidate to a no-op: it
        # stays deleted; doc 20 inserts normally
        mixed = _zdf(spark, [(1, BASE)], mult=1).unionByName(
            _zdf(spark, [(1, BASE)], mult=-1)
        ).unionByName(_zdf(spark, [(20, NEAR2)], mult=1))
        sink.apply_batch(mixed, 2)
        assert self._keep(sink, spark) == {10, 20}
        before = self._keep(sink, spark)
        sink.apply_batch(mixed, 2)  # ledger replay: no-op
        assert self._keep(sink, spark) == before


class TestBM25Retract:
    def test_delete_matches_fresh_build(self, spark, tmp_path):
        from vcf_pg_loader_spark.sources.bm25_index import BM25Index
        from vcf_pg_loader_spark.streaming.dedup_ingest import BM25IndexSink

        rows = [
            (1, "spark shuffle join broadcast spark"),
            (2, "spark window aggregate"),
            (3, "vector index probe spark shuffle"),
            (4, ""),  # zero-token doc still counts toward n_docs
        ]
        sink = BM25IndexSink(str(tmp_path / "idx"))
        sink.apply_batch(_zdf(spark, rows), 0)
        sink.apply_batch(_zdf(spark, [(1, rows[0][1])], mult=-1), 1)

        fresh = BM25Index(spark, str(tmp_path / "fresh"))
        fresh.build(_zdf(spark, rows[1:]))
        got = [
            (r.doc_id, r.score, r.rn)
            for r in BM25Index(spark, sink.target)
            .search(["spark", "shuffle"], 5)
            .collect()
        ]
        want = [
            (r.doc_id, r.score, r.rn)
            for r in fresh.search(["spark", "shuffle"], 5).collect()
        ]
        assert got == want
        stats = spark.read.parquet(f"{sink.target}/stats").first()
        assert stats.n_docs == 3  # decremented, zero-token doc counted

    def test_delete_then_reinsert(self, spark, tmp_path):
        from vcf_pg_loader_spark.sources.bm25_index import BM25Index
        from vcf_pg_loader_spark.streaming.dedup_ingest import BM25IndexSink

        sink = BM25IndexSink(str(tmp_path / "idx"))
        sink.apply_batch(
            _zdf(spark, [(1, "alpha beta gamma"), (2, "alpha delta")]), 0
        )
        sink.apply_batch(_zdf(spark, [(1, "alpha beta gamma")], mult=-1), 1)
        sink.apply_batch(_zdf(spark, [(1, "fresh text alpha")], mult=1), 2)
        fresh = BM25Index(spark, str(tmp_path / "fresh"))
        fresh.build(
            _zdf(spark, [(1, "fresh text alpha"), (2, "alpha delta")])
        )
        got = [
            (r.doc_id, r.score)
            for r in BM25Index(spark, sink.target).search(["alpha"], 5).collect()
        ]
        want = [
            (r.doc_id, r.score) for r in fresh.search(["alpha"], 5).collect()
        ]
        assert got == want


# quality-passing variants: the funnel's quality gate needs stopwords
_SW = " the cat and the dog ran to the big house of the old king"
QBASE = BASE + _SW
QNEAR = NEAR + _SW
QOTHER = OTHER + _SW


class TestFunnelReportSink:
    def _sink(self, tmp_path, nll_max=1e9):
        from vcf_pg_loader_spark.streaming.retract import FunnelReportSink

        return FunnelReportSink(str(tmp_path / "funnel"), nll_max)

    def _stages(self, sink, spark):
        return {r.doc_id: r.stage for r in sink.report(spark).collect()}

    def test_delete_promotes_exact_loser_into_near_dup_graph(
        self, spark, tmp_path
    ):
        """A=1 kept, its exact copy 5 is exact_dup, near-dup 9 is
        near_dup.  Deleting 1 re-elects 5 as fingerprint canonical AND 9
        must STAY near_dup via its maintained pair with 5."""
        sink = self._sink(tmp_path)
        sink.apply_batch(
            _zdf(spark, [(1, QBASE), (5, QBASE), (9, QNEAR), (10, QOTHER)]), 0
        )
        s0 = self._stages(sink, spark)
        assert (s0[1], s0[5], s0[9], s0[10]) == (
            "kept", "exact_dup", "near_dup", "kept",
        )
        sink.apply_batch(_zdf(spark, [(1, QBASE)], mult=-1), 1)
        s1 = self._stages(sink, spark)
        assert 1 not in s1
        assert (s1[5], s1[9], s1[10]) == ("kept", "near_dup", "kept")

    def test_quality_and_replay(self, spark, tmp_path):
        sink = self._sink(tmp_path)
        b0 = _zdf(spark, [(1, QBASE), (2, "tiny doc"), (10, QOTHER)])
        sink.apply_batch(b0, 0)
        s = self._stages(sink, spark)
        assert s[2].startswith("quality:too_short")
        assert s[1] == "kept" and s[10] == "kept"
        sink.apply_batch(b0, 0)  # replay
        assert self._stages(sink, spark) == s

    def test_lm_gate_fires_under_frozen_model(self, spark, tmp_path):
        """With an impossible nll_max every quality-kept doc in a LATER
        batch trips the lm_nll stage (scored under the bootstrap model);
        bootstrap docs score near the training distribution and pass."""
        sink = self._sink(tmp_path, nll_max=0.5)
        sink.apply_batch(_zdf(spark, [(1, QBASE), (10, QOTHER)]), 0)
        sink.apply_batch(_zdf(spark, [(20, QNEAR.replace('oscar', 'oscarx', 1))]), 1)
        s = self._stages(sink, spark)
        assert s[20] == "lm_nll"


class TestImageNearDup:
    """Round-8 item #3: re-encoded copies of the same pixels (PNG vs
    baseline JPEG vs subsampling-shifted JPEG) must cluster under the
    perceptual hash, while distinct images must not."""

    def test_ahash_stable_across_reencoding(self):
        from vcf_pg_loader_spark.operators._jpeg import encode_jpeg
        from vcf_pg_loader_spark.operators._png import (
            decode_png,
            encode_png,
        )
        from vcf_pg_loader_spark.operators.multimodal import (
            _ahash64,
            _decode_image,
        )
        from vcf_pg_loader_spark.queries.pipeline import _block_image

        img = _block_image(3)
        h_png = _ahash64(_decode_image(encode_png(img)))
        h_444 = _ahash64(_decode_image(encode_jpeg(img, "4:4:4")))
        h_420 = _ahash64(_decode_image(encode_jpeg(img, "4:2:0")))
        assert h_png == h_444 == h_420  # codec noise never flips a bit
        assert decode_png(encode_png(img)).shape == img.shape

    def test_planted_reencoded_copies_cluster(self, spark):
        from vcf_pg_loader_spark.queries.pipeline import (
            IMG_GROUPS,
            q_image_neardup,
        )

        rows = q_image_neardup(spark, "unused").collect()
        assert len(rows) == IMG_GROUPS * 3
        by_cluster: dict[int, list[int]] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r.media_id)
        # exactly one cluster per source image, holding its 3 encodings
        assert len(by_cluster) == IMG_GROUPS
        for gid in range(IMG_GROUPS):
            assert sorted(by_cluster[gid * 10]) == [
                gid * 10, gid * 10 + 1, gid * 10 + 2,
            ]

    def test_exact_content_dedup_misses_reencodes(self, spark):
        """The motivating gap: sha256 content dedup sees 3 distinct
        blobs where the perceptual hash sees one image."""
        from vcf_pg_loader_spark.operators.multimodal import (
            dedup_by_content,
        )
        from vcf_pg_loader_spark.queries.pipeline import _image_fixture_rows

        media = spark.createDataFrame(
            _image_fixture_rows()[:3], "media_id bigint, content binary"
        )
        assert dedup_by_content(media).count() == 3


class TestSketchBoundedRank:
    """Round-8 item #4: global_rank partitioned on HDR-sketch quantile
    bounds instead of repartitionByRange's reservoir sample — ranks stay
    exact and 90%-tie-heavy keys still yield balanced partitions."""

    def _docs(self, spark, n=4000):
        from pyspark.sql import functions as F

        # 90% of docs share ONE token count; ids shuffle via a hash so
        # tie order is not arrival order
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 9, F.lit(50))
            .otherwise(F.pmod(F.xxhash64("id", "id"), F.lit(400)) + 1)
            .cast("int")
            .alias("n_tokens"),
        )

    def test_ranks_exact_under_tie_heavy_skew(self, spark):
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.operators.rank import (
            global_rank,
            hash_sample_bounds,
        )

        t = self._docs(spark)
        key = F.col("n_tokens").cast("bigint") * F.lit(1 << 24) + F.col(
            "doc_id"
        )
        keyed = t.withColumn("_skey", key)
        bounds = hash_sample_bounds(keyed, "_skey", 16)
        got = (
            global_rank(
                keyed,
                [("n_tokens", True), ("doc_id", True)],
                split_col="_skey",
                split_bounds=bounds,
            )
            .select("doc_id", "rank")
            .collect()
        )
        want = {
            r.doc_id: i + 1
            for i, r in enumerate(
                t.orderBy("n_tokens", "doc_id").collect()
            )
        }
        assert {r.doc_id: r.rank for r in got} == want

    def test_sketch_bounds_balance_ties(self, spark):
        """The hash-sample bounds split the 90%-tie run by the id half
        of the composite key — the case the log-bucketed HDR sketch
        measurably cannot handle (its relative resolution collapses the
        whole tie run into one bucket: partition sizes [3698, 252, 50]
        when this test drove rank_split_bounds instead)."""
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.operators.rank import hash_sample_bounds

        t = self._docs(spark)
        key = F.col("n_tokens").cast("bigint") * F.lit(1 << 24) + F.col(
            "doc_id"
        )
        keyed = t.withColumn("_skey", key)
        n_parts = 16
        bounds = hash_sample_bounds(keyed, "_skey", n_parts)
        pid = sum(
            (F.col("_skey") > F.lit(float(b))).cast("int") for b in bounds
        )
        sizes = [
            r.n
            for r in keyed.groupBy(pid.alias("pid"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        mean = sum(sizes) / n_parts
        # the 90%-tie value is SPLIT across partitions by the id half of
        # the key; bound the hottest partition against the mean
        assert max(sizes) / mean < 2.0, sizes

    def test_length_batches_sketch_path_matches_default(self, spark):
        from vcf_pg_loader_spark.operators.rank import length_batches

        docs = self._docs(spark).selectExpr(
            "doc_id",
            "concat_ws(' ', transform(sequence(1, n_tokens), x -> 'w'))"
            " AS text",
        )
        a = {
            tuple(r)
            for r in length_batches(docs, 8).collect()
        }
        b = {
            tuple(r)
            for r in length_batches(
                docs, 8, use_sketch_bounds=True
            ).collect()
        }
        assert a == b


class TestCountedAggIVM:
    """Round-8 item #6: counted IVM through aggregate-over-join — the
    maintained SUM/COUNT rollup stays exact under deletions, and the
    decimal fold makes batch order irrelevant."""

    def _frames(self, spark):
        li = spark.createDataFrame(
            [(1, 5.0), (1, 7.0), (2, 3.0), (2, 9.0), (3, 4.0)],
            "o_orderkey bigint, l_quantity double",
        )
        orders = spark.createDataFrame(
            [(1, "HIGH"), (2, "LOW"), (3, "LOW")],
            "o_orderkey bigint, o_orderpriority string",
        )
        return li, orders

    def _run(self, spark, batch_order):
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.operators.ivm import (
            as_zset,
            maintain_agg_join_view_counted,
            zset_normalize,
        )

        li, orders = self._frames(spark)
        no_orders = as_zset(orders.limit(0))
        batches = [
            (as_zset(li.filter(F.col("o_orderkey") != 2)), as_zset(orders)),
            (as_zset(li.filter(F.col("o_orderkey") == 2)), no_orders),
            # retract every qty<5 lineitem (one joins through HIGH, one
            # through LOW) — counts decrement, a group may vanish
            (as_zset(li.filter(F.col("l_quantity") < 5), mult=-1), no_orders),
        ]
        agg = None
        l_old = as_zset(li.limit(0))
        r_old = no_orders
        for i in batch_order:
            dl, dr = batches[i]
            agg = maintain_agg_join_view_counted(
                agg, l_old, dl, r_old, dr, "o_orderkey",
                ["o_orderpriority"], "l_quantity",
            )
            l_old = zset_normalize(l_old.unionByName(dl))
            r_old = zset_normalize(r_old.unionByName(dr))
        return {
            r.o_orderpriority: (r._cnt, float(r._sum))
            for r in agg.collect()
        }

    def test_deletion_exact_vs_recompute(self, spark):
        got = self._run(spark, [0, 1, 2])
        # retained rows: (1,5),(1,7),(2,9) -> HIGH {5,7}, LOW {9}
        assert got == {"HIGH": (2, 12.0), "LOW": (1, 9.0)}

    def test_fold_order_irrelevant(self, spark):
        a = self._run(spark, [0, 1, 2])
        b = self._run(spark, [1, 0, 2])
        assert a == b

    def test_group_vanishes_at_zero_count(self, spark):
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.operators.ivm import (
            as_zset,
            maintain_agg_join_view_counted,
            zset_normalize,
        )

        li, orders = self._frames(spark)
        lo_li = li.filter(F.col("o_orderkey") != 1)  # only LOW rows
        agg = maintain_agg_join_view_counted(
            None, as_zset(li.limit(0)), as_zset(lo_li),
            as_zset(orders.limit(0)), as_zset(orders),
            "o_orderkey", ["o_orderpriority"], "l_quantity",
        )
        l_old = zset_normalize(as_zset(li.limit(0)).unionByName(as_zset(lo_li)))
        agg2 = maintain_agg_join_view_counted(
            agg, l_old, as_zset(lo_li, mult=-1),
            as_zset(orders), as_zset(orders.limit(0)),
            "o_orderkey", ["o_orderpriority"], "l_quantity",
        )
        assert agg2.count() == 0  # every LOW row retracted -> no groups


class TestProgressiveJpeg:
    """Round-8 stretch item: SOF2 progressive decode (T.81 Annex G),
    proven by round-trip against the repo's own progressive encoder —
    DC first + DC refinement + banded AC first + AC refinement scans,
    exercising EOB-runs, ZRL runs, and correction-bit interleaving."""

    def test_roundtrip_within_idct_rounding(self):
        from vcf_pg_loader_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        for seed in range(4):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
            dec = decode_jpeg(encode_jpeg_progressive(img))
            assert dec.shape == img.shape
            err = int(np.max(np.abs(dec.astype(int) - img.astype(int))))
            assert err <= 2  # same bound as the baseline round-trip

    def test_progressive_matches_baseline_decode(self):
        """Both codec paths reconstruct the SAME pixels (both carry the
        identical all-ones-quantized coefficients)."""
        from vcf_pg_loader_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        seq = decode_jpeg(encode_jpeg(img, "4:4:4"))
        prog = decode_jpeg(encode_jpeg_progressive(img))
        assert np.array_equal(seq, prog)

    def test_decode_seam_gets_real_progressive_pixels(self):
        """The multimodal seam now decodes progressive JPEG for real
        (previously: PIL fallback or the deterministic 8x8 fake)."""
        from vcf_pg_loader_spark.operators._jpeg import (
            encode_jpeg_progressive,
        )
        from vcf_pg_loader_spark.operators.multimodal import _decode_image

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        out = _decode_image(encode_jpeg_progressive(img))
        assert out.shape == img.shape
        assert int(np.max(np.abs(out.astype(int) - img.astype(int)))) <= 2

    def test_truncated_progressive_raises_valueerror(self):
        from vcf_pg_loader_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        enc = encode_jpeg_progressive(img)
        for cut in (len(enc) // 3, len(enc) // 2, len(enc) - 10):
            with pytest.raises(ValueError):
                decode_jpeg(enc[:cut] )


class TestSemDeDupRetract:
    """SemDeDupIngestSink Z-set batches: deletions drop the vector and
    its incident pairs and re-run CC over the pair table — including
    the cut-vertex split a labels-only fold cannot express."""

    def _vec(self, x, y):
        return [float(x), float(y)] + [0.0] * 6

    def _zv(self, spark, rows, mult=None):
        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.operators.ivm import MULT

        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        if mult is not None:
            df = df.withColumn(MULT, F.lit(mult).cast("bigint"))
        return df

    def _sink(self, tmp_path, tau=0.9):
        from vcf_pg_loader_spark.streaming.dedup_ingest import (
            SemDeDupIngestSink,
        )

        return SemDeDupIngestSink(
            str(tmp_path / "sem"), k_centroids=2, n_iter=2, tau=tau
        )

    def _keep(self, sink, spark):
        return {r.vec_id for r in sink.keep(spark).collect()}

    def test_delete_splits_semantic_chain(self, spark, tmp_path):
        # a ~ b and b ~ c at tau=0.9, but a !~ c: a 3-chain in one cell
        a = self._vec(1.0, 0.0)
        b = self._vec(1.0, 0.35)
        c = self._vec(1.0, 0.75)
        far = self._vec(-1.0, 0.0)
        import numpy as np

        def cos(u, v):
            u, v = np.array(u), np.array(v)
            return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

        assert cos(a, b) > 0.9 and cos(b, c) > 0.9 and cos(a, c) < 0.9

        sink = self._sink(tmp_path)
        sink.apply_batch(
            self._zv(spark, [(1, a), (2, b), (3, c), (10, far)], 1), 0
        )
        assert self._keep(sink, spark) == {1, 10}  # one chain cluster
        sink.apply_batch(self._zv(spark, [(2, b)], -1), 1)
        assert self._keep(sink, spark) == {1, 3, 10}  # split: 3 revives

    def test_reinsert_and_replay(self, spark, tmp_path):
        a = self._vec(1.0, 0.0)
        b = self._vec(1.0, 0.2)
        far = self._vec(-1.0, 0.0)
        sink = self._sink(tmp_path)
        sink.apply_batch(self._zv(spark, [(1, a), (10, far)], 1), 0)
        sink.apply_batch(self._zv(spark, [(1, a)], -1), 1)
        assert self._keep(sink, spark) == {10}
        b2 = self._zv(spark, [(1, a)], 1).unionByName(
            self._zv(spark, [(2, b)], 1)
        )
        sink.apply_batch(b2, 2)
        assert self._keep(sink, spark) == {1, 10}  # 1~2 re-collide
        sink.apply_batch(b2, 2)  # ledger replay: no-op
        assert self._keep(sink, spark) == {1, 10}

    def test_plain_batches_keep_first_arrival_semantics(
        self, spark, tmp_path
    ):
        a = self._vec(1.0, 0.0)
        other = self._vec(0.0, 1.0)
        sink = self._sink(tmp_path)
        sink.apply_batch(self._zv(spark, [(1, a), (10, other)]), 0)
        # plain (non-Z-set) re-send of vid 1 with DIFFERENT vector: first
        # arrival wins, the new vector is dropped
        sink.apply_batch(self._zv(spark, [(1, other)]), 1)
        vecs = {
            r.vid: r.vec[:2]
            for r in spark.read.parquet(f"{sink.target}/vectors").collect()
        }
        assert vecs[1] == [1.0, 0.0]


class TestCountedRollupSink:
    def test_retraction_decrements_and_zero_groups_vanish(
        self, spark, tmp_path
    ):
        import datetime

        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.operators.ivm import MULT
        from vcf_pg_loader_spark.streaming.sink import CountedRollupSink

        t0 = datetime.datetime(2024, 1, 1, 10, 30)
        rows = [
            (t0, "click", 2.0),
            (t0, "click", 3.0),
            (t0, "view", 5.0),
        ]

        def z(rs, mult):
            return spark.createDataFrame(
                rs, "ts timestamp, event_type string, value double"
            ).withColumn(MULT, F.lit(mult).cast("bigint"))

        sink = CountedRollupSink(str(tmp_path / "roll"))
        sink.apply_batch(z(rows, 1), 0)
        sink.apply_batch(z([rows[0]], -1), 1)  # retract one click
        sink.apply_batch(z([rows[2]], -1), 2)  # retract the only view
        got = {
            (r.event_type, r.n_events, r.total_value)
            for r in spark.read.parquet(sink.target).select(
                "event_type",
                "n_events",
                F.col("_sum_value").cast("double").alias("total_value"),
            ).collect()
        }
        assert got == {("click", 1, 3.0)}  # view group vanished

    def test_replay_is_noop(self, spark, tmp_path):
        import datetime

        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.operators.ivm import MULT
        from vcf_pg_loader_spark.streaming.sink import CountedRollupSink

        t0 = datetime.datetime(2024, 1, 1, 9, 0)
        b = spark.createDataFrame(
            [(t0, "click", 1.0)], "ts timestamp, event_type string, value double"
        ).withColumn(MULT, F.lit(-1).cast("bigint"))
        sink = CountedRollupSink(str(tmp_path / "roll"))
        ins = spark.createDataFrame(
            [(t0, "click", 1.0), (t0, "click", 4.0)],
            "ts timestamp, event_type string, value double",
        )
        sink.apply_batch(ins, 0)
        sink.apply_batch(b, 1)
        sink.apply_batch(b, 1)  # replayed retraction must not re-apply
        row = spark.read.parquet(sink.target).first()
        assert row.n_events == 1 and float(row._sum_value) == 4.0


class TestVectorIndexDelta:
    def _vecs(self, spark, ids):
        rng = np.random.default_rng(0)
        all_rows = {
            i: [float(x) for x in np.random.default_rng(100 + i).normal(size=8)]
            for i in range(64)
        }
        return spark.createDataFrame(
            [(i, all_rows[i]) for i in ids],
            "vec_id int, embedding array<double>",
        )

    def test_delta_matches_fresh_build_flat(self, spark, tmp_path):
        from vcf_pg_loader_spark.sources.vector_index import VectorIndex

        full = self._vecs(spark, range(64))
        retained_ids = [i for i in range(64) if i % 5 != 2]
        idx = VectorIndex(spark, str(tmp_path / "idx"))
        idx.build(full, k_centroids=4, kernel="exact", pq=False)
        idx.apply_delta(
            delete_ids=full.filter("vec_id % 5 = 2").select("vec_id")
        )
        q = self._vecs(spark, retained_ids[:3])
        got = {
            (r.query_id, r.cand_id, r.rn)
            for r in idx.search_flat(q, k=5).collect()
        }
        # fresh index over retained rows with the SAME frozen centroids
        # is not constructible via build() (it would refit k-means), so
        # assert semantics instead: no deleted id is ever returned and
        # every query still gets k candidates
        assert got and all(c % 5 != 2 for _q, c, _r in got)
        by_q = {}
        for qq, c, r in got:
            by_q.setdefault(qq, []).append(r)
        assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())

    def test_delta_prunes_pq_codes_and_reinserts(self, spark, tmp_path):
        from vcf_pg_loader_spark.sources.vector_index import VectorIndex

        full = self._vecs(spark, range(32))
        idx = VectorIndex(spark, str(tmp_path / "idx"))
        idx.build(full, k_centroids=4, m=2, k_sub=4)
        idx.apply_delta(
            delete_ids=full.filter("vec_id < 8").select("vec_id")
        )
        codes_ids = {
            r.vid for r in spark.read.parquet(f"{idx.root}/codes").collect()
        }
        vec_ids = {
            r.vid for r in spark.read.parquet(f"{idx.root}/vectors").collect()
        }
        assert codes_ids == vec_ids == set(range(8, 32))
        idx.apply_delta(inserts=self._vecs(spark, range(4)))
        vec_ids2 = {
            r.vid for r in spark.read.parquet(f"{idx.root}/vectors").collect()
        }
        assert vec_ids2 == set(range(4)) | set(range(8, 32))
        assert idx.search(self._vecs(spark, [10]), k=3).count() > 0


class TestZsetStreamingWiring:
    """Z-set retraction batches through REAL Structured Streaming
    (file source, availableNow, foreachBatch) — deletes ride the same
    stream as inserts via the MULT column, exactly like a CDC feed."""

    def test_cluster_maint_from_stream(self, spark, tmp_path):
        from vcf_pg_loader_spark.streaming.retract import (
            DedupClusterMaintSink,
        )

        src = str(tmp_path / "in")
        schema = "doc_id bigint, text string, _mult bigint"
        b0 = _zdf(spark, [(1, BASE), (2, NEAR), (10, OTHER)], 1)
        b1 = _zdf(spark, [(1, BASE)], -1)
        b0.coalesce(1).write.mode("append").parquet(src)
        b1.coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema(schema).parquet(src)
        sink = DedupClusterMaintSink(str(tmp_path / "clusters"))
        (
            stream.writeStream.foreachBatch(sink.apply_batch)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .option("maxFilesPerTrigger", 1)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        keep = {r.doc_id for r in sink.keep(spark).collect()}
        # doc 1 deleted after its near-dup 2 arrived: 2 is promoted
        assert keep == {2, 10}


class TestRetractSequenceProperty:
    """Randomized insert/delete interleavings: after ANY Z-set batch
    sequence, the maintained cluster store must equal a from-scratch
    LSH+CC+keep over exactly the retained docs."""

    POOL = {
        1: BASE,
        2: NEAR,
        3: NEAR2,
        10: OTHER,
        11: OTHER.replace("query", "queryx", 1),
        20: "short unrelated text with nothing in common here at all",
    }

    def _recompute_keep(self, spark, retained):
        from vcf_pg_loader_spark.operators import dedup as D

        if not retained:
            return set()
        docs = _zdf(spark, [(i, self.POOL[i]) for i in sorted(retained)])
        pairs = D.minhash_lsh_dedup(docs, "doc_id", "text")
        cc = D.connected_components(pairs.select("d1", "d2"), "d1", "d2")
        return {
            r.doc_id
            for r in D.keep_canonical(
                docs.select("doc_id"), cc, "doc_id"
            ).collect()
        }

    def test_random_interleavings_match_recompute(self, spark, tmp_path):
        import random

        from vcf_pg_loader_spark.streaming.retract import (
            DedupClusterMaintSink,
        )

        rng = random.Random(77)
        for trial in range(3):
            sink = DedupClusterMaintSink(
                str(tmp_path / f"c{trial}")
            )
            present: set[int] = set()
            ids = sorted(self.POOL)
            for batch_id in range(5):
                ins = rng.sample(ids, rng.randint(0, 3))
                dels = rng.sample(ids, rng.randint(0, 2))
                ins_f = _zdf(
                    spark, [(i, self.POOL[i]) for i in ins], 1
                )
                del_f = _zdf(
                    spark, [(i, self.POOL[i]) for i in dels], -1
                )
                sink.apply_batch(ins_f.unionByName(del_f), batch_id)
                # replicate the Z-set semantics driver-side
                both = set(ins) & set(dels)
                present |= set(ins) - both
                present -= set(dels) - both
                got = {r.doc_id for r in sink.keep(spark).collect()}
                want = self._recompute_keep(spark, present)
                assert got == want, (
                    trial, batch_id, ins, dels, present, got, want,
                )


class TestAudioNearDup:
    def test_fingerprint_stable_across_encodings(self):
        from vcf_pg_loader_spark.operators.multimodal import (
            _audio_hash64,
            _decode_wav_pcm,
            _wav_sample_rate,
        )
        from vcf_pg_loader_spark.queries.pipeline import (
            _tone_grid_wave,
            _wav_bytes,
        )

        hi = _tone_grid_wave(5, 16000)
        variants = [
            _wav_bytes(hi, 16000, 2),
            _wav_bytes(hi, 16000, 1),
            _wav_bytes(_tone_grid_wave(5, 8000), 8000, 2),
        ]
        hashes = [
            _audio_hash64(_decode_wav_pcm(v), _wav_sample_rate(v))
            for v in variants
        ]
        assert len({h for h in hashes}) == 1  # bit-identical here

    def test_planted_reencoded_audio_clusters(self, spark):
        from vcf_pg_loader_spark.queries.pipeline import (
            AUDIO_GROUPS,
            q_audio_neardup,
        )

        rows = q_audio_neardup(spark, "unused").collect()
        assert len(rows) == AUDIO_GROUPS * 3
        by_cluster: dict[int, list[int]] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r.media_id)
        assert len(by_cluster) == AUDIO_GROUPS
        for g in range(AUDIO_GROUPS):
            assert sorted(by_cluster[g * 10]) == [
                g * 10, g * 10 + 1, g * 10 + 2,
            ]


class TestRetractCorpusCli:
    def test_end_to_end(self, spark, tmp_path, capsys):
        import json as _json

        from pyspark.sql import functions as F

        from vcf_pg_loader_spark.cli import main
        from vcf_pg_loader_spark.operators.ivm import MULT

        state = str(tmp_path / "state")
        b0 = _zdf(
            spark, [(1, BASE), (2, NEAR), (10, OTHER)], 1
        )
        b0_path = str(tmp_path / "b0")
        b0.write.parquet(b0_path)
        assert main([
            "retract-corpus", "--state", state, "--batch", b0_path,
            "--batch-id", "0",
        ]) == 0
        out0 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out0["docs_kept"] == 2  # near-dup 2 collapsed into 1

        dels = spark.createDataFrame([(1,)], "doc_id bigint")
        del_path = str(tmp_path / "dels")
        dels.write.parquet(del_path)
        out_dir = str(tmp_path / "kept")
        assert main([
            "retract-corpus", "--state", state, "--delete-ids", del_path,
            "--batch-id", "1", "--out", out_dir,
        ]) == 0
        out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["docs_kept"] == 2  # 2 promoted after 1's takedown
        kept_ids = {
            r.doc_id for r in spark.read.parquet(out_dir).collect()
        }
        assert kept_ids == {2, 10}
        # replay of the same batch id is a no-op
        assert main([
            "retract-corpus", "--state", state, "--delete-ids", del_path,
            "--batch-id", "1",
        ]) == 0


class TestGoldenProgressiveFixture:
    """Checked-in SOF2 fixture with pinned bytes AND pinned decoded
    pixels: permanent determinism evidence for the progressive decode
    path (the baseline golden_16x16.jpg pattern)."""

    def test_pinned_bytes_and_pixels(self):
        import hashlib

        from vcf_pg_loader_spark.operators._jpeg import decode_jpeg

        with open(
            "tests/fixtures/golden_16x16_progressive.jpg", "rb"
        ) as fh:
            enc = fh.read()
        assert (
            hashlib.sha256(enc).hexdigest()
            == "292dbfeeaffc9e39aea23dde75e5371ee45e596926e36252d33cc14f2f6a8ec4"
        )
        assert enc[2:4] != b"\xff\xc0" and b"\xff\xc2" in enc[:200]
        dec = decode_jpeg(enc)
        assert dec.shape == (16, 16, 3)
        assert (
            hashlib.sha256(dec.tobytes()).hexdigest()
            == "d111aab35a2f4f417c151257472851e3a7e2ed4ca57d1f785023d4c819aade20"
        )
        assert dec[0, 0].tolist() == [68, 35, 52]
        assert dec[0, 15].tolist() == [73, 76, 30]
        assert dec[15, 0].tolist() == [156, 60, 156]
        assert dec[15, 15].tolist() == [59, 222, 178]


class TestWinnowIndexSink:
    def test_delete_matches_fresh_winnow(self, spark, tmp_path):
        from vcf_pg_loader_spark.operators import text as T
        from vcf_pg_loader_spark.streaming.retract import WinnowIndexSink

        rows = [(i, (BASE + f" extra{i % 4}") * 2) for i in range(8)]
        sink = WinnowIndexSink(str(tmp_path / "wn"))
        sink.apply_batch(_zdf(spark, rows[:5]), 0)
        sink.apply_batch(_zdf(spark, rows[5:]), 1)
        sink.apply_batch(_zdf(spark, rows[2:4], mult=-1), 2)
        got = {
            (r.d1, r.d2, r.n_shared)
            for r in sink.overlap_pairs(spark, 10, 3).collect()
        }
        retained = _zdf(spark, rows[:2] + rows[4:])
        want = {
            (r.d1, r.d2, r.n_shared)
            for r in T.winnow_overlap_pairs(
                T.winnow_fingerprints(retained), 10, 3
            ).collect()
        }
        assert got == want and got  # non-trivial overlap set

    def test_replay_and_reinsert(self, spark, tmp_path):
        from vcf_pg_loader_spark.streaming.retract import WinnowIndexSink

        sink = WinnowIndexSink(str(tmp_path / "wn"))
        b0 = _zdf(spark, [(1, BASE * 2), (2, OTHER * 2)])
        sink.apply_batch(b0, 0)
        n0 = spark.read.parquet(f"{sink.target}/fps").count()
        sink.apply_batch(b0, 0)  # replay: no-op
        assert spark.read.parquet(f"{sink.target}/fps").count() == n0
        sink.apply_batch(_zdf(spark, [(1, BASE * 2)], mult=-1), 1)
        ids = {
            r.doc_id
            for r in spark.read.parquet(f"{sink.target}/fps")
            .select("doc_id").distinct().collect()
        }
        assert ids == {2}
        sink.apply_batch(_zdf(spark, [(1, BASE * 2)], mult=1), 2)
        ids2 = {
            r.doc_id
            for r in spark.read.parquet(f"{sink.target}/fps")
            .select("doc_id").distinct().collect()
        }
        assert ids2 == {1, 2}
