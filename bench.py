"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    # VCF parse throughput (BASELINE.md row 1: reference claims 106k/s
    # single-process) — measured every round so the one directly
    # comparable reference number is tracked.
    from vcf_pg_loader_spark.parse_bench import parse_throughput

    try:
        parse = parse_throughput(
            spark, int(os.environ.get("SPARK_GRAFT_PARSE_N", "2000000"))
        )
    except Exception as exc:
        errors["_vcf_parse"] = f"{type(exc).__name__}: {exc}"[:500]
        parse = {"variants_per_sec": None, "variants": None,
                 "rows_after_decomposition": None}
    print(f"# vcf_parse: {parse}", file=sys.stderr)

    # Same parse over ONE monolithic bgzipped file — the shape that is a
    # one-core scan on vanilla Spark; the BGZF range reader keeps it wide.
    from vcf_pg_loader_spark.parse_bench import parse_throughput_bgzf

    try:
        parse_gz = parse_throughput_bgzf(
            spark, int(os.environ.get("SPARK_GRAFT_PARSE_N", "2000000"))
        )
    except Exception as exc:
        errors["_vcf_parse_bgzf"] = f"{type(exc).__name__}: {exc}"[:500]
        parse_gz = {"variants_per_sec": None, "scan_tasks": None}
    print(f"# vcf_parse_bgzf: {parse_gz}", file=sys.stderr)

    # Skewed-key join rehearsal: half of lineitem lands on ONE key, the
    # other half spreads; compare a plain shuffle join vs the salted
    # join (operators/skew.py) with auto-broadcast disabled so both run
    # the sort-merge path that a 100 TB non-broadcastable dim would.
    from pyspark.sql import functions as F

    from vcf_pg_loader_spark.operators.skew import salted_join

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
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plain_s = salted_s = None
    try:
        t0 = time.perf_counter()
        big.join(small, "k").agg(F.sum("l_quantity"), F.sum("w")).collect()
        plain_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        salted_join(big, small, ["k"]).agg(
            F.sum("l_quantity"), F.sum("w")
        ).collect()
        salted_s = time.perf_counter() - t0
    except Exception as exc:
        errors["_skew_join"] = f"{type(exc).__name__}: {exc}"[:500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    print(
        f"# skew_join: plain={plain_s}s salted={salted_s}s",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                "sf": sf,
                "vcf_parse_variants_per_sec": parse["variants_per_sec"],
                "vcf_parse_variants": parse["variants"],
                "vcf_parse_rows": parse["rows_after_decomposition"],
                "vcf_parse_bgzf_single_file_variants_per_sec": parse_gz[
                    "variants_per_sec"
                ],
                "vcf_parse_bgzf_scan_tasks": parse_gz["scan_tasks"],
                "skew_join_plain_sec": round(plain_s, 3) if plain_s else None,
                "skew_join_salted_sec": round(salted_s, 3) if salted_s else None,
            }
        )
    )


if __name__ == "__main__":
    main()
