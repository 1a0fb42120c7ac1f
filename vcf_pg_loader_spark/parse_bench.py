"""Synthetic VCF parse-throughput measurement (BASELINE.md row 1).

The reference publishes 106k variants/sec single-process for its cyvcf2
pull-parser (reference README.md:374-380).  The comparable number here
is the distributed text-scan parse rate: synthetic VCF in the shape of
the reference's generator (reference benchmark.py:147-180 — sprinkled
multiallelics and indels), written as multiple shards so the scan
parallelizes the way any real multi-file load does, then
read_vcf(normalize=True) with a count() to force full parsing.

Shared by `cli.py benchmark` and the per-round `bench.py` line.
"""

from __future__ import annotations

import os
import time

_HEADER = (
    "##fileformat=VCFv4.2\n"
    '##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">\n'
    '##INFO=<ID=AF,Number=A,Type=Float,Description="AF">\n'
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
)
_BASES = ["A", "C", "G", "T"]


def write_synthetic_vcf(dirpath: str, n_variants: int, shards: int = 16) -> str:
    """Write n_variants across `shards` header-bearing files; returns a
    glob matching them."""
    per = max(1, n_variants // shards)
    written = 0
    for s in range(shards):
        take = min(per, n_variants - written) if s < shards - 1 else n_variants - written
        if take <= 0:
            break
        with open(os.path.join(dirpath, f"bench_{s:04d}.vcf"), "w") as fh:
            fh.write(_HEADER)
            for j in range(take):
                i = written + j
                ref = _BASES[i % 4]
                alt = _BASES[(i + 1) % 4]
                if i % 20 == 0:
                    alt = f"{alt},{_BASES[(i + 2) % 4]}"
                if i % 6 == 5:
                    ref = ref + "TT"
                fh.write(
                    f"chr{(i % 22) + 1}\t{1000 + i}\trs{i}\t{ref}\t{alt}\t50.0"
                    f"\tPASS\tDP={i % 100};AF=0.{i % 9 + 1}\n"
                )
        written += take
    return os.path.join(dirpath, "bench_*.vcf")


def write_synthetic_vcf_bgzf(path: str, n_variants: int) -> None:
    """ONE bgzipped VCF file with n_variants — the monolithic-`.vcf.gz`
    shape that defeats vanilla Spark's gzip handling (one task)."""
    import io

    from vcf_pg_loader_spark.sources.bgzf import write_bgzf

    buf = io.StringIO()
    buf.write(_HEADER)
    for i in range(n_variants):
        ref = _BASES[i % 4]
        alt = _BASES[(i + 1) % 4]
        if i % 20 == 0:
            alt = f"{alt},{_BASES[(i + 2) % 4]}"
        if i % 6 == 5:
            ref = ref + "TT"
        buf.write(
            f"chr{(i % 22) + 1}\t{1000 + i}\trs{i}\t{ref}\t{alt}\t50.0"
            f"\tPASS\tDP={i % 100};AF=0.{i % 9 + 1}\n"
        )
    write_bgzf(path, buf.getvalue().encode())


def parse_throughput_bgzf(spark, n_variants: int = 2_000_000) -> dict:
    """Parse rate over ONE bgzipped file via the splittable BGZF reader.

    The reference streams a single .vcf.gz at ~106k variants/s on one
    core (vcf_parser.py:520-657); vanilla Spark would match its
    one-core-ness.  The BGZF range reader instead scans with
    default-parallelism tasks, so this number should track the multi-file
    rate, not the single-core rate."""
    import tempfile

    from vcf_pg_loader_spark.sources.bgzf import bgzf_text
    from vcf_pg_loader_spark.sources.vcf import read_vcf

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bench.vcf.gz")
        write_synthetic_vcf_bgzf(path, n_variants)
        scan_tasks = bgzf_text(spark, path).rdd.getNumPartitions()  # rdd-ok (bench introspection)
        mb = round(os.path.getsize(path) / 1e6, 1)
        # Warm up on a same-shape input big enough to span EVERY core's
        # range: besides the one-time codegen/JIT compile, each of the
        # 32 Python workers pays a cold pandas/pyarrow import on its
        # first mapInPandas task — a tiny warmup file (1-2 ranges) warms
        # only 2 workers and the timed run still eats ~30 cold starts.
        # 300k variants -> ~2.4 MB compressed -> >32 of the 64 KiB
        # minimum ranges, so every worker is hot before the clock runs.
        warm = os.path.join(d, "warm.vcf.gz")
        write_synthetic_vcf_bgzf(warm, 300_000)
        read_vcf(spark, warm, normalize=True).count()
        with open(path, "rb") as fh:  # page-cache prewarm (see above)
            while fh.read(1 << 22):
                pass
        # one full-size untimed pass: the small warm file compiles the
        # plan, but JIT of the chunk-split/explode path only stabilizes
        # after a full-volume pass (observed ramp 175k -> 360k -> 555k
        # v/s across identical passes); throughput benches report steady
        # state per the docs/SCALE.md methodology note
        first = time.perf_counter()
        read_vcf(spark, path, normalize=True).count()
        first_sec = time.perf_counter() - first
        # best-of-two timed passes (steady state; the JIT ramp can still
        # eat the first — same policy as parse_throughput)
        dt = float("inf")
        rows = 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = read_vcf(spark, path, normalize=True).count()
            dt = min(dt, time.perf_counter() - t0)
    return {
        "variants": n_variants,
        "rows_after_decomposition": rows,
        "sec": round(dt, 3),
        "variants_per_sec": round(n_variants / dt, 1),
        "first_pass_sec": round(first_sec, 3),
        "scan_tasks": scan_tasks,
        "compressed_mb": mb,
    }


# ---------------------------------------------------------------------------
# GIAB-shaped synthetic VCF: the reference benchmarks against a generator
# tuned to GIAB v4.2.1 HG002 chr21 statistics (reference benchmark.py:147-180,
# tests/benchmark/README.md:17-33): ~83.3% SNPs / 16.7% indels, ~1%
# multiallelic, 57% het / 43% hom-alt genotypes, and long platform/callset
# INFO strings.  The uniform generator above is the easy case for the
# parser (short INFO, sparse indels); this shape stresses the normalizer
# (indel left-trim, multiallelic decomposition) and INFO tokenization the
# way real benchmark data does, so its rate is reported alongside.
# Everything is deterministic (index arithmetic, no RNG) so the measured
# corpus is identical across rounds.
# ---------------------------------------------------------------------------
_GIAB_HEADER = (
    "##fileformat=VCFv4.2\n"
    '##FILTER=<ID=PASS,Description="All filters passed">\n'
    '##INFO=<ID=platforms,Number=1,Type=Integer,Description="Platforms">\n'
    '##INFO=<ID=platformnames,Number=.,Type=String,Description="Names">\n'
    '##INFO=<ID=datasets,Number=1,Type=Integer,Description="Datasets">\n'
    '##INFO=<ID=datasetnames,Number=.,Type=String,Description="Names">\n'
    '##INFO=<ID=callsets,Number=1,Type=Integer,Description="Callsets">\n'
    '##INFO=<ID=callsetnames,Number=.,Type=String,Description="Names">\n'
    '##INFO=<ID=datasetsmissingcall,Number=.,Type=String,Description="Missing">\n'
    '##INFO=<ID=callable,Number=.,Type=String,Description="Callable">\n'
    '##INFO=<ID=difficultregion,Number=.,Type=String,Description="Regions">\n'
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">\n'
    '##FORMAT=<ID=ADALL,Number=R,Type=Integer,Description="Allelic depths">\n'
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Quality">\n'
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE01\n"
)
_GIAB_PLATFORMS = ["Illumina", "PacBio", "10X", "IonTorrent", "SOLID"]
_GIAB_DATASETS = ["HiSeq300x", "CCS15kb", "10XGenomics", "IonExome", "SolidSE"]
_GIAB_REGIONS = ["lowmappability", "segdup", "tandemrepeat", "gcgt85"]


def _giab_line(i: int) -> str:
    """One deterministic GIAB-shaped variant line for index i.

    Per-100 residue classes pin the mix exactly: class 0 is multiallelic
    (1%), classes 1-16 are indels (16%), the rest SNPs (83%) — matching
    GIAB v4.2.1 chr21's 83.3/16.7 SNP/indel split and ~1% multiallelic
    density within a percent."""
    ref = _BASES[i % 4]
    alt = _BASES[(i + 1) % 4]
    klass = i % 100
    if klass == 0:  # multiallelic SNP
        alt = f"{alt},{_BASES[(i + 2) % 4]}"
    elif klass <= 16:  # indel, length 1-15, ins/del alternating
        tail = "".join(_BASES[(i + j) % 4] for j in range((i * 7) % 15 + 1))
        if i % 2 == 0:
            ref = ref + tail
        else:
            alt = alt + tail
    # long INFO: platform/callset metadata strings like the GIAB callset
    np_, nd = i % 4 + 1, i % 5 + 1
    plats = ",".join(_GIAB_PLATFORMS[(i + j) % 5] for j in range(np_))
    dsets = ",".join(_GIAB_DATASETS[(i + j) % 5] for j in range(nd))
    regions = ",".join(_GIAB_REGIONS[(i + j) % 4] for j in range(i % 3 + 1))
    info = (
        f"platforms={np_};platformnames={plats};datasets={nd};"
        f"datasetnames={dsets};callsets={nd};callsetnames={dsets};"
        f"datasetsmissingcall={_GIAB_DATASETS[(i + 2) % 5]};"
        f"callable=CS_{_GIAB_DATASETS[i % 5]}_callable;"
        f"difficultregion={regions}"
    )
    gt = "0/1" if (i * 13) % 100 < 57 else "1/1"  # 57% het / 43% hom-alt
    dp = 30 + (i * 31) % 970
    ref_reads = (i * 17) % (dp + 1) if gt == "0/1" else 0
    fmt = f"{gt}:{dp}:{ref_reads},{dp - ref_reads}:{90 + (i * 11) % 310}"
    return (
        f"chr{(i % 22) + 1}\t{10_000 + i}\t.\t{ref}\t{alt}\t50\tPASS\t"
        f"{info}\tGT:DP:ADALL:GQ\t{fmt}\n"
    )


def write_synthetic_vcf_giab(
    dirpath: str, n_variants: int, shards: int = 16
) -> str:
    """GIAB-shaped shards (same sharding contract as write_synthetic_vcf);
    returns a glob matching them."""
    per = max(1, n_variants // shards)
    written = 0
    for s in range(shards):
        take = (
            min(per, n_variants - written)
            if s < shards - 1
            else n_variants - written
        )
        if take <= 0:
            break
        with open(os.path.join(dirpath, f"giab_{s:04d}.vcf"), "w") as fh:
            fh.write(_GIAB_HEADER)
            for j in range(take):
                fh.write(_giab_line(written + j))
        written += take
    return os.path.join(dirpath, "giab_*.vcf")


def parse_throughput_giab(spark, n_variants: int = 1_000_000) -> dict:
    """Parse rate on the GIAB-shaped corpus (same methodology as
    parse_throughput: warmup pass, page-cache prewarm, one untimed
    full-volume pass, best-of-two timed passes)."""
    import glob as _glob
    import tempfile

    from vcf_pg_loader_spark.sources.vcf import read_vcf

    with tempfile.TemporaryDirectory() as d:
        glob = write_synthetic_vcf_giab(d, n_variants)
        with tempfile.TemporaryDirectory() as wd:
            warm_glob = write_synthetic_vcf_giab(wd, 10_000, 2)
            read_vcf(spark, warm_glob, normalize=True).count()
        for f in _glob.glob(glob):
            with open(f, "rb") as fh:
                while fh.read(1 << 22):
                    pass
        read_vcf(spark, glob, normalize=True).count()  # JIT steady state
        dt = float("inf")
        rows = 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = read_vcf(spark, glob, normalize=True).count()
            dt = min(dt, time.perf_counter() - t0)
    return {
        "variants": n_variants,
        "rows_after_decomposition": rows,
        "sec": round(dt, 3),
        "variants_per_sec": round(n_variants / dt, 1),
        "snp_pct": 83.0,
        "indel_pct": 16.0,
        "multiallelic_pct": 1.0,
    }


def parse_throughput(
    spark, n_variants: int = 2_000_000, shards: int = 16
) -> dict:
    """Measure read_vcf parse rate; returns {variants, sec, variants_per_sec}.

    Timing covers scan+parse+decompose+normalize only — file generation
    is outside the window (the reference number times parsing, not I/O
    of its generator either).
    """
    import tempfile

    from vcf_pg_loader_spark.sources.vcf import read_vcf

    with tempfile.TemporaryDirectory() as d:
        glob = write_synthetic_vcf(d, n_variants, shards)
        # Same-shape warmup run: exclude one-time codegen/JIT compilation
        # of the parse plan from the throughput window (see
        # parse_throughput_bgzf).
        import tempfile as _tf

        with _tf.TemporaryDirectory() as wd:
            warm_glob = write_synthetic_vcf(wd, 10_000, 2)
            read_vcf(spark, warm_glob, normalize=True).count()
            read_vcf(spark, warm_glob, normalize=True, features="all").count()
        # prewarm the OS page cache over the just-written shards so the
        # timed windows measure parse throughput, not first-touch disk
        # I/O (the reference's 106k/s number is likewise CPU-bound)
        import glob as _glob

        for f in _glob.glob(glob):
            with open(f, "rb") as fh:
                while fh.read(1 << 22):
                    pass
        # one full-size untimed pass: the 10k warmup compiles the plan but
        # JIT of the parse/explode path only stabilizes across FULL-volume
        # passes (observed ramp spans 2-3 of them; without this the
        # "minimal" window reads slower than the full-features window that
        # runs after it, purely from JIT ordering)
        read_vcf(spark, glob, normalize=True).count()
        # default ("auto") load: the bench header declares only DP and AF,
        # so annotation/imputation/ClinVar projections are skipped — the
        # rate a real load of an unannotated VCF pays.  Two timed passes,
        # best-of (the steady-state number per the docs/SCALE.md
        # methodology note; the ramp tail can still eat the first one).
        dt = float("inf")
        rows = 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = read_vcf(spark, glob, normalize=True).count()
            dt = min(dt, time.perf_counter() - t0)
        # features="all": every derived-column group computed whether or
        # not the header declares its fields — the round-3/4 regression
        # shape, reported alongside so the feature tax stays visible
        t0 = time.perf_counter()
        read_vcf(spark, glob, normalize=True, features="all").count()
        dt_full = time.perf_counter() - t0
    # rate is per INPUT variant (the reference's unit); decomposition
    # makes output rows a superset, reported separately.
    return {
        "variants": n_variants,
        "rows_after_decomposition": rows,
        "sec": round(dt, 3),
        "variants_per_sec": round(n_variants / dt, 1),
        "full_features_sec": round(dt_full, 3),
        "full_features_variants_per_sec": round(n_variants / dt_full, 1),
    }
