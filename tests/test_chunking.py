"""Tests for sequence chunking and concat-and-cut packing
(operators/chunking.py): window coverage invariants, edge cases, and
plan shape (no Python UDF, single explode, no shuffle for chunking)."""

from __future__ import annotations

import pytest

from vcf_pg_loader_spark.operators import chunking as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestChunkTokenWindows:
    def test_short_doc_single_chunk(self, spark):
        df = _docs(spark, [(1, "a", "x y z")])
        out = C.chunk_token_windows(df, window=8, stride=4).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.chunk_id, r.start_token, r.n_tokens) == (0, 0, 3)

    def test_exact_window_boundary(self, spark):
        # n == window -> exactly one chunk even though stride < window
        text = " ".join(f"t{i}" for i in range(8))
        df = _docs(spark, [(1, "a", text)])
        out = C.chunk_token_windows(df, window=8, stride=4).collect()
        assert len(out) == 1 and out[0].n_tokens == 8

    def test_stride_overlap_and_tail(self, spark):
        # n=10, window=8, stride=4 -> chunks at 0 (8 toks) and 4 (6 toks)
        text = " ".join(f"t{i}" for i in range(10))
        df = _docs(spark, [(1, "a", text)])
        out = sorted(
            C.chunk_token_windows(df, window=8, stride=4).collect(),
            key=lambda r: r.chunk_id,
        )
        assert [(r.start_token, r.n_tokens) for r in out] == [(0, 8), (4, 6)]

    def test_every_token_covered(self, spark):
        # Union of [start, start+n_tokens) must cover [0, n) for any n
        for n in (1, 7, 8, 9, 20, 33):
            text = " ".join(f"t{i}" for i in range(n))
            df = _docs(spark, [(1, "a", text)])
            spans = [
                (r.start_token, r.start_token + r.n_tokens)
                for r in C.chunk_token_windows(df, window=8, stride=5).collect()
            ]
            covered = set()
            for a, b in spans:
                covered.update(range(a, b))
            assert covered == set(range(n)), f"n={n} spans={spans}"

    def test_identical_windows_hash_equal(self, spark):
        df = _docs(spark, [(1, "a", "p q r s"), (2, "a", "p q r s")])
        out = C.chunk_token_windows(df, window=4, stride=4).collect()
        hashes = {r.chunk_hash for r in out}
        assert len(out) == 2 and len(hashes) == 1

    def test_invalid_params_raise(self, spark):
        df = _docs(spark, [(1, "a", "x")])
        with pytest.raises(ValueError):
            C.chunk_token_windows(df, window=0, stride=4)
        with pytest.raises(ValueError):
            C.chunk_token_windows(df, window=4, stride=0)

    def test_plan_no_python_udf_no_shuffle(self, spark):
        df = _docs(spark, [(1, "a", "x y z")])
        plan = C.chunk_token_windows(df)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan  # narrow: per-row explode only


class TestPackContiguous:
    def test_bins_fill_in_order(self, spark):
        # 3 docs of 4 tokens each, capacity 8: docs 1+2 share bin 0,
        # doc 3 starts bin 1; nothing straddles a boundary.
        rows = [(i, "a", "w x y z") for i in (1, 2, 3)]
        out = {
            r.doc_id: r
            for r in C.pack_contiguous(_docs(spark, rows), capacity=8).collect()
        }
        assert [out[i].first_bin for i in (1, 2, 3)] == [0, 0, 1]
        assert [out[i].start_offset for i in (1, 2, 3)] == [0, 4, 8]
        assert all(out[i].n_boundary_crossings == 0 for i in (1, 2, 3))

    def test_boundary_straddle_counted(self, spark):
        # capacity 5: doc1 (4 toks) bin 0; doc2 (4 toks) spans offset 4..7
        # -> crosses the bin 0/1 boundary once.
        rows = [(1, "a", "w x y z"), (2, "a", "w x y z")]
        out = {
            r.doc_id: r
            for r in C.pack_contiguous(_docs(spark, rows), capacity=5).collect()
        }
        assert out[2].n_boundary_crossings == 1

    def test_groups_pack_independently(self, spark):
        rows = [(1, "a", "w x"), (2, "b", "w x")]
        out = {
            r.doc_id: r
            for r in C.pack_contiguous(_docs(spark, rows), capacity=8).collect()
        }
        # each source restarts at offset 0 / bin 0
        assert out[1].start_offset == 0 and out[2].start_offset == 0

    def test_long_doc_crosses_many(self, spark):
        text = " ".join(f"t{i}" for i in range(20))
        out = C.pack_contiguous(
            _docs(spark, [(1, "a", text)]), capacity=6
        ).collect()[0]
        # tokens 0..19 with capacity 6 -> bins 0,1,2,3 -> 3 crossings
        assert out.first_bin == 0 and out.n_boundary_crossings == 3
