"""asof_join unit coverage: directions, tolerance, ties, no-match rows.

The backward path is also oracle-checked against DuckDB's native ASOF
LEFT JOIN at sf0.01 (q_asof_join); these tests pin the semantics the
oracle query doesn't reach (forward direction, tolerance windows,
equal-timestamp inclusivity, empty groups) on a hand-built frame.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.asof import asof_join


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 10, minute)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(30)),
            (3, "u2", _ts(5)),   # before any right row for u2
            (4, "u3", _ts(20)),  # u3 has no right rows at all
        ],
        "id int, u string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(10), 100.0),  # equal ts: must match id=1 (inclusive)
            ("u1", _ts(25), 250.0),
            ("u2", _ts(8), 80.0),
        ],
        "u string, ts timestamp, v double",
    )
    return left, right


class TestAsofJoin:
    def test_backward(self, spark, frames):
        left, right = frames
        got = {
            r.id: (r.asof_v, r.asof_ts)
            for r in asof_join(left, right, "ts", ["u"]).collect()
        }
        assert got[1] == (100.0, _ts(10))  # inclusive equal-ts match
        assert got[2] == (250.0, _ts(25))  # latest prior, not first
        assert got[3] == (None, None)      # right rows exist only later
        assert got[4] == (None, None)      # empty group
        assert len(got) == 4               # left rows all preserved once

    def test_forward(self, spark, frames):
        left, right = frames
        got = {
            r.id: r.asof_v
            for r in asof_join(
                left, right, "ts", ["u"], direction="forward"
            ).collect()
        }
        assert got[1] == 100.0   # equal ts inclusive in forward too
        assert got[2] is None    # nothing at/after minute 30
        assert got[3] == 80.0    # next right row at minute 8
        assert got[4] is None

    def test_tolerance(self, spark, frames):
        left, right = frames
        got = {
            r.id: r.asof_v
            for r in asof_join(
                left,
                right,
                "ts",
                ["u"],
                tolerance=F.expr("INTERVAL '4' MINUTE"),
            ).collect()
        }
        assert got[1] == 100.0  # gap 0 <= 4 min
        assert got[2] is None   # gap 5 min > 4 min -> nulled
        assert got[3] is None

    def test_bad_direction(self, frames):
        left, right = frames
        with pytest.raises(ValueError):
            asof_join(left, right, "ts", ["u"], direction="nearest")


class TestAsofRandomized:
    def test_matches_brute_force_on_random_data(self, spark):
        """Seeded random streams, operator vs an O(n^2) Python reference —
        covers interleavings/boundaries a hand-built fixture misses."""
        import random

        rng = random.Random(42)
        n_users = 7
        left_rows = [
            (i, f"u{rng.randrange(n_users)}", _ts(rng.randrange(60)))
            for i in range(200)
        ]
        right_rows = []
        used = set()
        for j in range(150):
            key = (f"u{rng.randrange(n_users)}", rng.randrange(60))
            if key in used:  # unique (group, ts): no ambiguous ties
                continue
            used.add(key)
            right_rows.append((key[0], _ts(key[1]), float(j)))
        left = spark.createDataFrame(left_rows, "id int, u string, ts timestamp")
        right = spark.createDataFrame(right_rows, "u string, ts timestamp, v double")

        got = {
            r.id: r.asof_v
            for r in asof_join(left, right, "ts", ["u"]).collect()
        }
        for i, u, ts in left_rows:
            cands = [(rts, v) for (ru, rts, v) in right_rows
                     if ru == u and rts <= ts]
            want = max(cands)[1] if cands else None
            assert got[i] == want, (i, u, ts, got[i], want)


class TestAsofEdges:
    def test_empty_right_preserves_left_with_nulls(self, spark, frames):
        left, right = frames
        empty = right.limit(0)
        got = asof_join(left, empty, "ts", ["u"]).collect()
        assert len(got) == 4
        assert all(r.asof_v is None and r.asof_ts is None for r in got)

    def test_empty_left_yields_empty(self, spark, frames):
        left, right = frames
        assert asof_join(left.limit(0), right, "ts", ["u"]).count() == 0
