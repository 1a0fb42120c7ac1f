"""CLI command surface (reference cli.py commands on the Spark engine)."""

from __future__ import annotations

import json

import pytest

from tests.vcf_fixtures import write_vcf
from vcf_pg_loader_spark.cli import main


@pytest.fixture(scope="module")
def vcf_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rows = [
        "chr1\t100\trs1\tA\tG\t50.0\tPASS\tDP=30\tGT\t0/1\t0/0",
        "chr2\t200\trs2\tT\tC\t60.0\tPASS\tDP=20\tGT\t1/1\t0/1",
    ]
    return write_vcf(str(d / "cli.vcf"), rows, samples=["s1", "s2"])


def test_load_validate_query_roundtrip(spark, tmp_path, vcf_file, capsys):
    store = str(tmp_path / "store")
    assert main(["load", vcf_file, "--store", store, "--normalize"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["variants_loaded"] == 2 and not out["skipped"]

    # idempotent reload skips
    assert main(["load", vcf_file, "--store", store]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["skipped"] is True

    assert main(["validate", vcf_file]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["records"] == 2 and out["duplicate_sites"] == 0

    assert (
        main(
            [
                "annotation-query",
                "SELECT chrom, COUNT(*) AS n FROM variants GROUP BY chrom",
                "--store",
                store,
            ]
        )
        == 0
    )
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["chrom"] for r in rows} == {"chr1", "chr2"}


def test_sample_qc_and_gwas_flow(spark, tmp_path, vcf_file, capsys):
    store = str(tmp_path / "store2")
    main(["load", vcf_file, "--store", store])
    capsys.readouterr()

    gwas = tmp_path / "g.tsv"
    gwas.write_text(
        "CHR\tPOS\tEA\tOA\tP\tSNP\tBETA\tSE\n1\t100\tG\tA\t1e-8\trs1\t0.05\t0.01\n"
    )
    assert main(["import-gwas", str(gwas), "--store", store]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["matched"] == 1

    assert main(["compute-sample-qc", vcf_file, "--store", store]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert {r["sample_id"] for r in lines} == {"s1", "s2"}

    out_dir = str(tmp_path / "plink")
    assert main(["export-plink", "--store", store, "--out", out_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 1

    assert main(["refresh-views", "--store", store]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["refreshed"] == 2


def test_import_frequencies_and_ld_block_stats(spark, tmp_path, capsys):
    vcf = tmp_path / "gnomad.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        '##INFO=<ID=AF_afr,Number=A,Type=Float,Description="a">\n'
        '##INFO=<ID=AF_nfe,Number=A,Type=Float,Description="a">\n'
        '##INFO=<ID=AF_fin,Number=A,Type=Float,Description="a">\n'
        '##INFO=<ID=AC_afr,Number=A,Type=Integer,Description="a">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tG\t50\tPASS\tAF_afr=0.1;AF_nfe=0.3;AF_fin=0.9;AC_afr=5\n"
        "chr1\t200\t.\tC\tT\t50\tPASS\tAF_afr=0.2\n"
    )
    store = str(tmp_path / "store")
    assert main(["import-frequencies", str(vcf), "--store", store]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # site1: afr, nfe, fin; site2: afr
    assert out["frequency_rows"] == 4
    assert out["popmax_variants"] == 2

    pm = {
        r.pos: r
        for r in spark.read.parquet(f"{store}/popmax").collect()
    }
    # FIN excluded as bottlenecked: popmax at site 100 is NFE 0.3
    assert pm[100].popmax_population == "NFE"
    assert pm[100].popmax_af == pytest.approx(0.3)

    bed = tmp_path / "blocks.bed"
    bed.write_text("chrom\tstart\tend\tn_snps_1kg\nchr1\t1\t1000\t50\n")
    assert main(["ld-block-stats", str(bed), "--population", "EUR"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows[0]["block_count"] == 1 and rows[0]["population"] == "EUR"


def test_load_features_flag(spark, tmp_path, vcf_file, capsys):
    """--features '' (minimal) and 'all' both load; comma lists parse."""
    s1 = str(tmp_path / "store_min")
    assert main(["load", vcf_file, "--store", s1, "--features", ""]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["variants_loaded"] == 2

    s2 = str(tmp_path / "store_all")
    assert main(["load", vcf_file, "--store", s2, "--features", "all"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["variants_loaded"] == 2

    s3 = str(tmp_path / "store_groups")
    assert (
        main(
            ["load", vcf_file, "--store", s3, "--features",
             "imputation,clinvar"]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["variants_loaded"] == 2


def test_compact_command(spark, tmp_path, capsys):
    store = str(tmp_path / "cstore")
    for i in range(3):
        rows = [f"chr1\t{100 + 10 * i + j}\trsc{i}_{j}\tA\tG\t50.0\tPASS\tDP=9"
                for j in range(2)]
        vcf = write_vcf(str(tmp_path / f"cc{i}.vcf"), rows)
        assert main(["load", vcf, "--store", store]) == 0
    capsys.readouterr()
    assert main(["compact", "--store", store]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 6 and out["partitions"] == 1
    assert out["files_after"] < out["files_before"]


def test_build_rsid_index_command(spark, tmp_path, capsys):
    store_path = str(tmp_path / "ristore")
    rows = [f"chr1\t{100 + j}\trsX{j}\tA\tG\t50.0\tPASS\tDP=9" for j in range(5)]
    vcf = write_vcf(str(tmp_path / "ri.vcf"), rows)
    assert main(["load", vcf, "--store", store_path]) == 0
    capsys.readouterr()
    assert main(["build-rsid-index", "--store", store_path, "--files", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    import os
    assert os.path.isdir(out["rsid_index"])


def test_profile_and_dedup_corpus(spark, tmp_path, capsys):
    import json as _json

    from vcf_pg_loader_spark.cli import main
    from vcf_pg_loader_spark.sources.tables import load_table

    # profile the events fixture
    events_src = "/root/testdata/sf0.001/events.parquet"
    assert main(["profile", events_src, "--key", "user_id",
                 "--column", "value"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_rows"] > 0
    assert rep["user_id_distinct_exact"] > 0
    assert rep["value_p50_est"] > 0 and rep["value_p99_est"] >= rep["value_p50_est"]

    # dedup a corpus with planted duplicates end-to-end
    corpus = str(tmp_path / "corpus")
    base = "alpha bravo charlie delta echo foxtrot golf hotel india " * 3
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(0)
    rows = [(1, base), (2, base), (3, "entirely different text about joins "
                                     "and shuffles and partitions here")]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        corpus
    )
    out = str(tmp_path / "kept")
    clusters = str(tmp_path / "clusters")
    assert main(["dedup-corpus", corpus, "--out", out,
                 "--clusters", clusters]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["docs_in"] == 3 and rep["docs_kept"] == 2
    kept_ids = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept_ids == {1, 3}

    # second run serves from the persisted cluster table (no rebuild)
    out2 = str(tmp_path / "kept2")
    assert main(["dedup-corpus", corpus, "--out", out2,
                 "--clusters", clusters]) == 0
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == {1, 3}


def test_benchmark_giab_flag(spark, capsys):
    """--giab runs the GIAB-shaped parse bench (reference benchmark.py's
    giab=True mode) and reports the distribution it generated."""
    assert main(["benchmark", "--variants", "5000", "--giab"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["variants"] == 5000
    assert out["rows_after_decomposition"] == 5050  # 1% multiallelic
    assert out["variants_per_sec"] > 0
    assert out["snp_pct"] == 83.0 and out["indel_pct"] == 16.0
