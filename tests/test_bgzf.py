"""Splittable BGZF reading: a single .vcf.gz must scan on many cores.

Covers the round-2 verdict's top scale gap: vanilla Spark reads any
.gz as one task; sources/bgzf.py resynchronizes on block boundaries so
one monolithic bgzipped file parallelizes like a native splittable
source, with Hadoop-style line-ownership semantics at range edges."""

from __future__ import annotations

import gzip

import pytest

from vcf_pg_loader_spark.sources.bgzf import (
    BGZF_EOF,
    bgzf_text,
    is_bgzf,
    read_text_auto,
    write_bgzf,
)


def _mklines(n: int) -> list[str]:
    # mixed lengths, including lines long enough to span several 64 KiB
    # blocks, and tab-heavy VCF-ish rows
    out = []
    for i in range(n):
        if i % 997 == 0:
            out.append("LONG" + str(i) + "x" * 150_000)
        else:
            out.append(f"chr{i % 22 + 1}\t{1000 + i}\trs{i}\tA\tC\t{i % 60}\tPASS\tAC={i}")
    return out


@pytest.fixture(scope="module")
def bgzf_file(tmp_path_factory):
    lines = _mklines(20_000)
    data = ("\n".join(lines) + "\n").encode()
    p = tmp_path_factory.mktemp("bgzf") / "body.txt.gz"
    write_bgzf(str(p), data)
    return str(p), lines


class TestDetection:
    def test_is_bgzf_true_for_bgzf(self, bgzf_file):
        assert is_bgzf(bgzf_file[0])

    def test_is_bgzf_false_for_plain_gzip(self, tmp_path):
        p = tmp_path / "plain.gz"
        with gzip.open(p, "wb") as fh:
            fh.write(b"hello\nworld\n")
        assert not is_bgzf(str(p))

    def test_gzip_can_read_bgzf(self, bgzf_file):
        # BGZF must stay valid gzip (driver-side header reads rely on it)
        with gzip.open(bgzf_file[0], "rt") as fh:
            assert fh.readline().startswith(("chr", "LONG"))

    def test_eof_marker_is_valid_empty_block(self, tmp_path):
        import zlib

        assert zlib.decompress(BGZF_EOF, wbits=31) == b""


class TestSplitRead:
    def test_lines_round_trip_exactly(self, spark, bgzf_file):
        path, lines = bgzf_file
        got = [r["value"] for r in bgzf_text(spark, path).collect()]
        assert sorted(got) == sorted(lines)

    def test_scan_has_many_partitions(self, spark, bgzf_file):
        path, _ = bgzf_file
        df = bgzf_text(spark, path)
        n = df.rdd.getNumPartitions()
        assert n > 1, "single bgzf file must not be a one-task scan"

    def test_range_edges_with_tiny_splits(self, spark, bgzf_file):
        # Force dozens of ranges so nearly every task hits the
        # discard-first-line / read-one-past-end protocol.
        path, lines = bgzf_file
        got = [r["value"] for r in bgzf_text(spark, path, min_ranges=48).collect()]
        assert sorted(got) == sorted(lines)

    def test_read_text_auto_routes_bgzf(self, spark, bgzf_file):
        path, lines = bgzf_file
        df = read_text_auto(spark, path)
        assert df.rdd.getNumPartitions() > 1
        assert df.count() == len(lines)

    def test_read_text_auto_plain_text_passthrough(self, spark, tmp_path):
        p = tmp_path / "x.txt"
        p.write_text("a\nb\n")
        assert read_text_auto(spark, str(p)).count() == 2


class TestVcfIntegration:
    def test_bgzf_vcf_matches_uncompressed(self, spark, tmp_path):
        from tests.vcf_fixtures import write_vcf

        rows = [
            f"chr{i % 22 + 1}\t{1000 + i}\trs{i}\tA\tC,T\t50\tPASS\tDP={i};AF=0.1,0.2"
            for i in range(300)
        ]
        plain = write_vcf(str(tmp_path / "v.vcf"), rows)
        data = open(plain, "rb").read()
        gz = tmp_path / "v.vcf.gz"
        write_bgzf(str(gz), data)

        from vcf_pg_loader_spark.sources.vcf import read_vcf

        a = read_vcf(spark, str(plain)).orderBy("chrom", "pos", "alt").collect()
        b = read_vcf(spark, str(gz)).orderBy("chrom", "pos", "alt").collect()
        assert a == b
