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
        t0 = time.perf_counter()
        rows = read_vcf(spark, glob, normalize=True).count()
        dt = time.perf_counter() - t0
    # rate is per INPUT variant (the reference's unit); decomposition
    # makes output rows a superset, reported separately.
    return {
        "variants": n_variants,
        "rows_after_decomposition": rows,
        "sec": round(dt, 3),
        "variants_per_sec": round(n_variants / dt, 1),
    }
