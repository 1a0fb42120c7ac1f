"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {slowest few}, "sf": ...}.

The stdout contract line is kept deliberately small (well under 2 KB):
the driver stores only a bounded tail of stdout and failed to parse
round 4's 87-query line (`parsed: null` despite rc=0).  The full
per-query timing map, per-query errors, parse-throughput detail, and the
skew-join rehearsal metrics are written to BENCH_DETAIL.json instead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_TOP_N_IN_CONTRACT_LINE = 8


def _drain_task_metrics(df):
    """Materialize `df` and measure, per output partition (= per reducer
    task), the drain wall-time and row count; returns their maxima.

    The drain runs Python-side so the absolute seconds include pickle
    transfer — use them RELATIVELY (plain vs salted on identical data),
    which is exactly the straggler comparison salting exists to win.
    """
    from pyspark import AccumulatorParam

    class _Max(AccumulatorParam):
        def zero(self, value):
            return value

        def addInPlace(self, a, b):
            return a if a >= b else b

    sc = df.sparkSession.sparkContext
    acc_sec = sc.accumulator(0.0, _Max())
    acc_rows = sc.accumulator(0.0, _Max())

    def drain(it):
        t0 = time.perf_counter()
        n = 0
        for _ in it:
            n += 1
        acc_sec.add(time.perf_counter() - t0)
        acc_rows.add(float(n))
        yield n

    df.rdd.mapPartitions(drain).count()  # rdd-ok (bench introspection)
    return acc_sec.value, int(acc_rows.value)


def skew_rehearsal(spark, sf_dir: str) -> dict:
    """Skewed-key join rehearsal: half of lineitem lands on ONE key, the
    other half spreads; compare a plain shuffle join vs the salted join
    (operators/skew.py).

    Auto-broadcast AND adaptive execution are disabled for the rehearsal:
    AQE's skew-join splitting already rescues this shape at runtime (that
    is why session.py enables it), so the vanilla sort-merge path — the
    one a cluster without AQE, or a skewed aggregation AQE cannot split,
    would run — is the honest baseline salting exists to fix.  Two
    metrics per variant: wall time of a join+agg, and the max per-task
    drain time / row count of the join output (the straggler metric —
    wall time on local[32] hides a 1-of-32 straggler almost entirely;
    max-task is what collapses on a 1000-executor cluster).
    """
    from pyspark.sql import functions as F

    from vcf_pg_loader_spark.operators.skew import salted_join
    from vcf_pg_loader_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    big = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
        .otherwise(F.col("l_partkey"))
        .alias("k"),
        "l_quantity",
    )
    small = (
        li.select(F.col("l_partkey").alias("k")).distinct()
        .union(spark.range(1).select(F.lit(0).alias("k")))
        .distinct()
        .withColumn("w", F.col("k") % 97)
    )
    out: dict = {}
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        variants = {
            "plain": lambda: big.join(small, "k"),
            "salted": lambda: salted_join(big, small, ["k"]),
        }
        for name, build in variants.items():
            t0 = time.perf_counter()
            build().agg(F.sum("l_quantity"), F.sum("w")).collect()
            wall = time.perf_counter() - t0
            max_sec, max_rows = _drain_task_metrics(build().select("k"))
            out[name] = {
                "wall_sec": round(wall, 3),
                "max_task_drain_sec": round(max_sec, 3),
                "max_task_rows": max_rows,
            }
    except Exception as exc:  # pragma: no cover - defensive bench path
        out["error"] = f"{type(exc).__name__}: {exc}"[:500]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from vcf_pg_loader_spark.queries import all_queries
    from vcf_pg_loader_spark.session import get_spark

    spark = get_spark(app_name="vcf-pg-loader-spark-bench")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session bring-up.
    from vcf_pg_loader_spark.sources.tables import FIXTURE_TABLES, load_table

    for t in FIXTURE_TABLES:
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name, fn in all_queries().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()  # full execution; result sizes vary, count
            # avoids driver-collect skew for the large window outputs
        except Exception as exc:  # one bad query must not zero the round
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        # some operators persist multiply-consumed intermediates (LSH
        # shingles, winnow fingerprints); drop them so cached blocks from
        # query N never crowd executor memory for query N+1 or the parse
        # benchmarks below (round-4 parse-rate regression).
        spark.catalog.clearCache()

    # VCF parse throughput (BASELINE.md row 1: reference claims 106k/s
    # single-process) — measured every round so the one directly
    # comparable reference number is tracked.  Reports the default
    # ("auto"-feature) scan and the full-featured scan separately.
    from vcf_pg_loader_spark.parse_bench import (
        parse_throughput,
        parse_throughput_bgzf,
    )

    try:
        parse = parse_throughput(
            spark, int(os.environ.get("SPARK_GRAFT_PARSE_N", "2000000"))
        )
    except Exception as exc:
        errors["_vcf_parse"] = f"{type(exc).__name__}: {exc}"[:500]
        parse = {"variants_per_sec": None, "variants": None,
                 "rows_after_decomposition": None,
                 "full_features_variants_per_sec": None}
    print(f"# vcf_parse: {parse}", file=sys.stderr)

    # Same parse over ONE monolithic bgzipped file — the shape that is a
    # one-core scan on vanilla Spark; the BGZF range reader keeps it wide.
    try:
        parse_gz = parse_throughput_bgzf(
            spark, int(os.environ.get("SPARK_GRAFT_PARSE_N", "2000000"))
        )
    except Exception as exc:
        errors["_vcf_parse_bgzf"] = f"{type(exc).__name__}: {exc}"[:500]
        parse_gz = {"variants_per_sec": None, "scan_tasks": None}
    print(f"# vcf_parse_bgzf: {parse_gz}", file=sys.stderr)

    skew = skew_rehearsal(spark, sf_dir)
    print(f"# skew_join: {skew}", file=sys.stderr)

    detail = {
        "sf": sf,
        "sf_dir": sf_dir,
        "total_sec": round(total, 3),
        "queries": timings,
        "errors": errors,
        "vcf_parse": parse,
        "vcf_parse_bgzf": parse_gz,
        "skew_rehearsal": skew,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(f"# full detail -> {detail_path}", file=sys.stderr)

    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[
            :_TOP_N_IN_CONTRACT_LINE
        ]
    )
    plain = skew.get("plain", {})
    salted = skew.get("salted", {})
    # ONE compact line for the driver (it parses stdout and keeps only a
    # bounded tail — keep this well under 2 KB; detail lives in
    # BENCH_DETAIL.json).
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf,
                "queries": slowest,
                "queries_total": len(timings),
                "queries_failed": len(errors),
                "vcf_parse_variants_per_sec": parse["variants_per_sec"],
                "vcf_parse_full_features_variants_per_sec": parse.get(
                    "full_features_variants_per_sec"
                ),
                "vcf_parse_bgzf_single_file_variants_per_sec": parse_gz[
                    "variants_per_sec"
                ],
                "skew_max_task_rows_plain": plain.get("max_task_rows"),
                "skew_max_task_rows_salted": salted.get("max_task_rows"),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
