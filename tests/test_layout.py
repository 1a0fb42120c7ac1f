"""Z-order layout: Morton-code correctness and two-dimensional pruning.

The pruning test measures the thing Z-ordering exists for: after laying
lineitem out along the Z-curve of (l_orderkey, l_partkey), a selective
filter on EITHER column alone must be satisfiable from a small fraction
of the files (per-file min/max ranges cover compact rectangles), where
a one-dimensional sort prunes only its own column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.layout import (
    interleave_bits,
    write_zordered,
    zorder_key,
)
from vcf_pg_loader_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _morton_py(a: int, b: int, bits: int = 21) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i + 1)
        out |= ((b >> i) & 1) << (2 * i)
    return out


class TestMortonCode:
    def test_matches_python_reference(self, spark):
        import random

        rng = random.Random(7)
        rows = [(rng.randrange(1 << 21), rng.randrange(1 << 21)) for _ in range(200)]
        df = spark.createDataFrame(rows, "a long, b long")
        got = df.select(
            "a", "b", interleave_bits(F.col("a"), F.col("b")).alias("z")
        ).collect()
        for r in got:
            assert r.z == _morton_py(r.a, r.b), (r.a, r.b)

    def test_constant_column_safe(self, spark):
        df = spark.createDataFrame([(5, i) for i in range(10)], "a long, b long")
        out = zorder_key(df, "a", "b", bits=8)
        assert out.select("_z").distinct().count() == 10  # no div-by-zero


class TestZorderPruning:
    @pytest.mark.parametrize("col", ["l_orderkey", "l_partkey"])
    def test_both_dimensions_prune(self, spark, tmp_path, col):
        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        path = str(tmp_path / "z")
        write_zordered(li, path, "l_orderkey", "l_partkey", files=16)

        # per-file min/max of the filtered column: a point-ish predicate
        # must fall inside few files' ranges
        import pyarrow.parquet as pq
        import glob as g

        lo = li.agg(F.min(col)).first()[0]
        hi = li.agg(F.max(col)).first()[0]
        probe_lo, probe_hi = lo, lo + (hi - lo) // 20  # bottom 5% band
        touched = 0
        files = g.glob(f"{path}/*.parquet")
        assert len(files) >= 8
        col_idx = ["l_orderkey", "l_partkey", "l_quantity"].index(col)
        for f in files:
            md = pq.read_metadata(f)
            fmin = min(
                md.row_group(i).column(col_idx).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(col_idx).statistics.max
                for i in range(md.num_row_groups)
            )
            if fmin <= probe_hi and fmax >= probe_lo:
                touched += 1
        # a 5% band on either dimension touches well under half the files
        assert touched <= len(files) // 2, (col, touched, len(files))


class TestNDimZorder:
    def test_three_way_interleave_matches_reference(self, spark):
        from vcf_pg_loader_spark.operators.layout import interleave_bits_n

        def ref(vals, bits, n):
            out = 0
            for i in range(bits):
                for j, v in enumerate(vals):
                    out |= ((v >> i) & 1) << (i * n + (n - 1 - j))
            return out

        import random

        rng = random.Random(11)
        rows = [
            tuple(rng.randrange(1 << 10) for _ in range(3)) for _ in range(100)
        ]
        df = spark.createDataFrame(rows, "a long, b long, c long")
        got = df.select(
            "a", "b", "c",
            interleave_bits_n([F.col("a"), F.col("b"), F.col("c")], 10).alias("z"),
        ).collect()
        for r in got:
            assert r.z == ref((r.a, r.b, r.c), 10, 3)

    def test_overflow_guard(self, spark):
        from vcf_pg_loader_spark.operators.layout import interleave_bits_n

        with pytest.raises(ValueError):
            interleave_bits_n([F.col("a")] * 4, 21)  # 84 bits > 62

    def test_three_column_write(self, spark, tmp_path):
        from vcf_pg_loader_spark.operators.layout import write_zordered

        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey"
        )
        path = str(tmp_path / "z3")
        write_zordered(li, path, "l_orderkey", "l_partkey", "l_suppkey", files=8)
        assert spark.read.parquet(path).count() == li.count()
