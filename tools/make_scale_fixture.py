"""Deterministic scaled-up fixture generator (optimization round 16,
verdict item 2): tiles the sf0.1 driver fixture T times with
key-offset/vocabulary-disjoint copies, written as MULTI-FILE parquet,
so the bench queries become compute-bound instead of
single-scan-task/scheduler-bound — the measurement point where
32 cores must beat 8.

Design per table:
  - keyed tables (lineitem/orders/customer/supplier/part, events,
    embeddings, documents): every key column is offset by
    tile * (max_key + 1), so joins stay consistent and distinct
    counts scale with T;
  - documents.text: every word gets a per-tile suffix, making tile
    vocabularies DISJOINT — no cross-tile exact/near-dup pairs, no
    cross-tile BPE types — so LSH/BPE work scales ~linearly in T
    (a plain copy would make every doc a 10-way duplicate and the
    verify join quadratic);
  - region/nation (enumeration dims): copied as-is;
  - all outputs repartition(files_per_table) so every scan has
    parallel splits.

    python tools/make_scale_fixture.py --src /root/testdata/sf0.1 \
        --out /root/scaledata/x8 --tiles 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/scaledata/x8")
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--files-per-table", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vcf_pg_loader_spark.session import get_spark

    spark = get_spark(app_name="make-scale-fixture")
    os.makedirs(args.out, exist_ok=True)
    t_all = time.monotonic()

    for t in COPY_AS_IS:
        df = spark.read.parquet(f"{args.src}/{t}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{args.out}/{t}.parquet")
        print(f"{t}: copied", flush=True)

    for t, keys in KEY_COLS.items():
        t0 = time.monotonic()
        df = spark.read.parquet(f"{args.src}/{t}.parquet")
        offsets = {
            k: int(df.agg(F.max(F.col(k).cast("bigint"))).collect()[0][0]) + 1
            for k in keys
        }
        tiled = df.crossJoin(
            spark.range(args.tiles).select(F.col("id").alias("_tile"))
        )
        for k in keys:
            dt = dict(df.dtypes)[k]
            tiled = tiled.withColumn(
                k,
                (F.col(k).cast("bigint") + F.col("_tile") * offsets[k]).cast(dt),
            )
        if t == "documents":
            # per-tile word suffix -> disjoint vocabularies across tiles
            tiled = tiled.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.when(w == "", w).otherwise(
                            F.concat(w, F.lit("~"), F.col("_tile").cast("string"))
                        ),
                    ),
                    " ",
                ),
            )
        tiled = tiled.drop("_tile")
        (tiled.repartition(args.files_per_table)
              .write.mode("overwrite").parquet(f"{args.out}/{t}.parquet"))
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"{t}: {n} rows in {time.monotonic()-t0:.1f}s", flush=True)

    print(f"done in {time.monotonic()-t_all:.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
