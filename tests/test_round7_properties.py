"""Hypothesis property tests for the round-7 operators, checked against
plain-Python references: counted (Z-set) IVM under arbitrary
insert/delete batch sequences, distributed global rank vs sorted
enumeration, and JPEG round-trip across random images.

Spark calls are expensive per example, so examples are kept small and
few; hypothesis explores structure (batch splits, delete patterns,
shapes), Spark evaluates each drawn case once.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


class TestZSetIVMProperty:
    @settings(**SETTINGS)
    @given(
        st.lists(  # batches of (is_delete, [(k, v-id)]) for the LEFT side
            st.tuples(
                st.booleans(),
                st.lists(
                    st.tuples(st.integers(0, 3), st.integers(0, 2)),
                    min_size=1,
                    max_size=6,
                ),
            ),
            min_size=1,
            max_size=4,
        )
    )
    def test_maintained_equals_recompute(self, spark, batches):
        """Fold arbitrary insert/delete batches of L against a fixed R:
        the maintained Z-set view == the join of the NET left multiset
        against R, computed in plain Python with Counters.  Deletes may
        drive a tuple's multiplicity negative mid-stream (a retraction
        arriving before its insert) — the algebra must still net out."""
        from vcf_pg_loader_spark.operators.ivm import (
            as_zset,
            maintain_join_view_counted,
            zset_normalize,
        )

        r_rows = [(0, "x"), (1, "y"), (2, "z")]  # key 3 never matches
        right = as_zset(
            spark.createDataFrame(r_rows, "k bigint, w string")
        )

        net: Counter = Counter()
        view = None
        l_old = as_zset(
            spark.createDataFrame([], "k bigint, v string")
        )
        empty_r = right.limit(0)
        for is_delete, rows in batches:
            mult = -1 if is_delete else 1
            for k, vid in rows:
                net[(k, f"v{vid}")] += mult
            dl = as_zset(
                spark.createDataFrame(
                    [(k, f"v{vid}") for k, vid in rows], "k bigint, v string"
                ),
                mult,
            )
            view = maintain_join_view_counted(
                view, l_old, dl, right, empty_r, "k"
            )
            l_old = zset_normalize(l_old.unionByName(dl))

        want: Counter = Counter()
        r_map = dict(r_rows)
        for (k, v), m in net.items():
            if m and k in r_map:
                want[(k, v, r_map[k])] += m
        want = {t: m for t, m in want.items() if m != 0}
        got = {(r.k, r.v, r.w): r._mult for r in view.collect()}
        assert got == want


class TestGlobalRankProperty:
    @settings(**SETTINGS)
    @given(
        st.lists(st.integers(-20, 20), min_size=1, max_size=80),
        st.integers(2, 9),
    )
    def test_rank_matches_sorted_enumeration(self, spark, values, ranges):
        from vcf_pg_loader_spark.operators.rank import global_rank

        rows = [(i, v) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "id bigint, v int")
        got = {
            (r.id, r.v): r["rank"]
            for r in global_rank(
                df, [("v", True), ("id", True)], num_ranges=ranges
            ).collect()
        }
        want = {
            (i, v): rank
            for rank, (v, i) in enumerate(
                sorted((v, i) for i, v in rows), start=1
            )
        }
        assert got == want


# Provable round-trip envelope of the all-ones-quantizer codec
# (operators/_jpeg.py).  The only lossy step is np.rint on the FDCT
# coefficients (_encode_block), so each of the 64 coefficients of a
# block carries error |e| <= 0.5.  The IDCT is the orthonormal 8-point
# DCT-II matrix A, whose every row has abs-sum  s = max_i sum_k
# |A[i,k]| = 2.6418459874...  Per-pixel plane error is
#   |sum_{k,l} e_kl A[i,k] A[j,l]| <= 0.5 * s^2 = 3.4896751...
# The YCbCr->RGB inverse amplifies plane errors by at most the B
# channel's 1 + 1.772 = 2.772 abs row-sum, and the final uint8
# rounding adds 0.5:
#   2.772 * 3.48968 + 0.5 = 10.173...  ->  integer bound 10.
# (R: 2.402*B+0.5 = 8.88, G: 2.058*B+0.5 = 7.68.)  Empirically random
# images stay <= 3 (pinned below); the old <=2 assertion was a ~1/200
# Hypothesis flake — seed 1061251287 produces a single pixel at 3.
JPEG_ROUNDTRIP_BOUND = 10


class TestJPEGRoundtripProperty:
    @settings(**SETTINGS)
    @given(
        st.integers(1, 4),  # height in 8-px blocks
        st.integers(1, 4),  # width in 8-px blocks
        st.integers(0, 2**31 - 1),
    )
    @example(1, 4, 1061251287)  # historical falsifier of the old <=2 bound
    def test_roundtrip_within_idct_rounding(self, h8, w8, seed):
        from vcf_pg_loader_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (8 * h8, 8 * w8, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, "4:4:4"))
        assert dec.shape == img.shape
        err = int(np.max(np.abs(dec.astype(int) - img.astype(int))))
        assert err <= JPEG_ROUNDTRIP_BOUND

    def test_roundtrip_pinned_seeds_stay_tight(self):
        """Deterministic regression: on these fixed inputs (including the
        seed that falsified the old <=2 bound) the codec's observed error
        is exactly <= 3.  Unlike the property above this cannot flake —
        if a codec change pushes these inputs past 3, that is a real
        accuracy regression even though the provable envelope is 10."""
        from vcf_pg_loader_spark.operators._jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        for seed, shape in [
            (1061251287, (8, 32, 3)),  # the 1-pixel-at-3 falsifier
            (0, (16, 16, 3)),
            (12345, (32, 8, 3)),
            (999983, (24, 24, 3)),
        ]:
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            dec = decode_jpeg(encode_jpeg(img, "4:4:4"))
            err = int(np.max(np.abs(dec.astype(int) - img.astype(int))))
            assert err <= 3, (seed, err)

    @settings(**SETTINGS)
    @given(st.binary(min_size=0, max_size=64))
    def test_garbage_never_escapes_valueerror(self, junk):
        from vcf_pg_loader_spark.operators import _jpeg

        data = b"\xff\xd8" + junk
        try:
            out = _jpeg.decode_jpeg(data)
            assert out.ndim == 3  # only a genuinely decodable input
        except ValueError:
            pass  # the seam's contract
