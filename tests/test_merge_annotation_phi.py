"""Merge/upsert semantics, config-driven annotation tables, ADJ filter,
imputation metrics, PHI sanitization, trigram similarity."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.vcf_fixtures import write_vcf
from vcf_pg_loader_spark.functions.genomics import passes_adj
from vcf_pg_loader_spark.functions.imputation import (
    ImputationSource,
    detect_imputation_source,
    with_imputation_metrics,
)
from vcf_pg_loader_spark.functions.phi import sanitize_header
from vcf_pg_loader_spark.operators.merge import merge_insert_only, merge_upsert
from vcf_pg_loader_spark.operators.text import trigram_similarity
from vcf_pg_loader_spark.sources.annotation import (
    load_annotation_vcf,
    load_field_config,
    upsert_annotations,
)


class TestMerge:
    def test_insert_only(self, spark):
        existing = spark.createDataFrame(
            [("chr1", 100, "A", "G", 0.1)], ["chrom", "pos", "ref", "alt", "af"]
        )
        incoming = spark.createDataFrame(
            [("chr1", 100, "A", "G", 0.9), ("chr1", 200, "T", "C", 0.2)],
            ["chrom", "pos", "ref", "alt", "af"],
        )
        out = merge_insert_only(
            existing, incoming, ["chrom", "pos", "ref", "alt"]
        ).collect()
        by_pos = {r.pos: r.af for r in out}
        assert by_pos == {100: 0.1, 200: 0.2}  # existing wins, new added

    def test_upsert(self, spark):
        existing = spark.createDataFrame(
            [("s1", 0.1), ("s2", 0.2)], ["key", "val"]
        )
        incoming = spark.createDataFrame([("s2", 0.9), ("s3", 0.3)], ["key", "val"])
        out = {r.key: r.val for r in merge_upsert(existing, incoming, ["key"]).collect()}
        assert out == {"s1": 0.1, "s2": 0.9, "s3": 0.3}  # incoming wins

    def test_upsert_deterministic(self, spark):
        existing = spark.createDataFrame([("k", 1, "a")], ["key", "v", "tag"])
        incoming = spark.createDataFrame(
            [("k", 2, "b"), ("k", 2, "c")], ["key", "v", "tag"]
        )
        r1 = merge_upsert(existing, incoming, ["key"]).collect()
        r2 = merge_upsert(existing, incoming, ["key"]).collect()
        assert r1 == r2  # stable winner under re-execution


class TestAnnotationConfig:
    def test_config_and_load(self, spark, tmp_path):
        cfg_path = tmp_path / "fields.json"
        cfg_path.write_text(
            json.dumps(
                [
                    {"field": "AC", "alias": "gnomad_ac"},
                    {"field": "AF", "alias": "gnomad_af", "multiplier": 2000000},
                    {"field": "FILTER", "alias": "gnomad_filter",
                     "missing_string": "PASS"},
                ]
            )
        )
        cfg = load_field_config(str(cfg_path))
        assert [c.field_type for c in cfg] == ["Integer", "Float", "String"]

        vcf = write_vcf(
            str(tmp_path / "anno.vcf"),
            [
                "chr1\t100\trs1\tA\tG\t50.0\tPASS\tDP=30;AF=0.001;AC=5",
                "chr1\t200\trs2\tT\tC,G\t50.0\tq10\tAF=0.5,0.25;AC=10,2",
            ],
        )
        df = load_annotation_vcf(spark, vcf, cfg)
        rows = {(r.pos, r.alt): r for r in df.collect()}
        assert rows[(100, "G")].gnomad_ac == 5
        assert rows[(100, "G")].gnomad_af == pytest.approx(0.001)
        assert rows[(100, "G")].gnomad_filter == "PASS"
        # per-ALT extraction flows through the config path
        assert rows[(200, "C")].gnomad_ac == 10
        assert rows[(200, "G")].gnomad_ac == 2
        assert rows[(200, "C")].gnomad_filter == "q10"

    def test_upsert_annotations(self, spark):
        existing = spark.createDataFrame(
            [("chr1", 100, "A", "G", 1)], ["chrom", "pos", "ref", "alt", "x"]
        )
        incoming = spark.createDataFrame(
            [("chr1", 100, "A", "G", 2), ("chr2", 1, "C", "T", 3)],
            ["chrom", "pos", "ref", "alt", "x"],
        )
        out = upsert_annotations(existing, incoming)
        assert out.count() == 2  # DO NOTHING on conflict
        assert out.filter("pos = 100").collect()[0].x == 1

    def test_bad_config(self, tmp_path):
        p = tmp_path / "bad.json"
        p.write_text('{"field": "AC"}')
        with pytest.raises(ValueError, match="JSON array"):
            load_field_config(str(p))


class TestAdjFilter:
    CASES = [
        ("0/1", 99, 30, [15, 15], True),
        ("0/1", 10, 30, [15, 15], False),   # low GQ
        ("0/1", 99, 5, [15, 15], False),    # low DP
        ("0/1", 99, 30, [29, 1], False),    # het AB < 0.2
        ("1/1", 99, 30, [0, 30], True),     # hom: AB not checked
        ("0/1", None, None, None, True),    # all missing pass
    ]

    @pytest.mark.parametrize("gt,gq,dp,ad,expected", CASES)
    def test_adj(self, spark, gt, gq, dp, ad, expected):
        df = spark.createDataFrame(
            [(gt, gq, dp, ad)],
            "gt string, gq int, dp int, ad array<int>",
        )
        got = df.select(
            passes_adj(F.col("gt"), F.col("gq"), F.col("dp"), F.col("ad")).alias("p")
        ).collect()[0].p
        assert got is expected


class TestImputation:
    def test_detect(self):
        assert detect_imputation_source("##source=Minimac4") == ImputationSource.MINIMAC4
        assert detect_imputation_source('##INFO=<ID=DR2,Number=1,Type=Float,Description="d">') == ImputationSource.BEAGLE
        assert detect_imputation_source('##INFO=<ID=INFO,Number=1,Type=Float,Description="i">') == ImputationSource.IMPUTE2
        assert detect_imputation_source("##nothing") == ImputationSource.UNKNOWN

    def test_extract_minimac(self, spark):
        df = spark.createDataFrame(
            [({"R2": "0.85", "IMPUTED": None},), ({"R2": "1.0", "TYPED": None},)],
            "info map<string,string>",
        )
        rows = with_imputation_metrics(df, ImputationSource.MINIMAC4).collect()
        assert rows[0].info_score == pytest.approx(0.85)
        assert rows[0].is_imputed is True and rows[0].is_typed is False
        assert rows[1].is_typed is True

    def test_extract_beagle_typed(self, spark):
        df = spark.createDataFrame(
            [({"DR2": "1.0"},), ({"DR2": "0.7", "IMP": None},)],
            "info map<string,string>",
        )
        rows = with_imputation_metrics(df, ImputationSource.BEAGLE).collect()
        assert rows[0].is_typed is True and rows[0].is_imputed is False
        assert rows[1].is_imputed is True and rows[1].is_typed is False


class TestPHI:
    def test_sanitize(self):
        header = (
            "##source=test PATIENT_ID=12345\n"
            "##file=/home/doctor/secret.vcf\n"
            "##date=2024-01-01\n"
            "##clean=ok"
        )
        res = sanitize_header(header)
        assert "[REDACTED]" in res.sanitized_header
        assert "12345" not in res.sanitized_header
        assert "/home/doctor" not in res.sanitized_header
        assert "2024-01-01" not in res.sanitized_header
        assert "##clean=ok" in res.sanitized_header
        kinds = {f["kind"] for f in res.findings}
        assert {"patient_id", "unix_home_path", "iso_date"} <= kinds
        assert res.risk_level in ("medium", "high")

    def test_clean_header(self):
        res = sanitize_header("##fileformat=VCFv4.2\n##source=tool")
        assert res.findings == [] and res.risk_level == "low"


class TestTrigram:
    def test_similarity(self, spark):
        df = spark.createDataFrame(
            [("p.Arg117His", "p.Arg117His"), ("p.Arg117His", "p.Arg117Cys"),
             ("abc", "xyz")],
            ["a", "b"],
        )
        rows = df.select(
            trigram_similarity(F.col("a"), F.col("b")).alias("sim")
        ).collect()
        assert rows[0].sim == pytest.approx(1.0)
        assert 0.0 < rows[1].sim < 1.0
        assert rows[2].sim == 0.0
