"""Scale rehearsal for the bpe_learn_local driver-collect guard
(optimization round 16, verdict item 1).

Builds an ADVERSARIALLY WIDE type table — a synthetic corpus whose
word-type count far exceeds the guard bound (every word unique, the
100 TB singleton-tail shape) — and calls bpe_learn_local with a bound
well below it.  Records:

  - that the guard's overflow probe collected at most bound+1 rows
    (DataFrame.collect instrumented),
  - that the fallback engaged (bpe_learn_batched ran),
  - driver peak RSS before/after (the collect must not scale with the
    type table),
  - the merges equal the batched trainer's on the same corpus
    (identical-model pin at rehearsal scale),
  - wall times for both paths.

Writes one JSON blob (default SCALE_r16_bpe_guard.json).

    python tools/bpe_guard_rehearsal.py [--types 2000000] [--bound 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--types", type=int, default=2_000_000,
                    help="distinct word types in the adversarial corpus")
    ap.add_argument("--bound", type=int, default=100_000,
                    help="max_types guard bound (must be << --types)")
    ap.add_argument("--n-merges", type=int, default=8)
    ap.add_argument("--out", default="SCALE_r16_bpe_guard.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vcf_pg_loader_spark.operators import bpe as B
    from vcf_pg_loader_spark.session import get_spark

    spark = get_spark(app_name="bpe-guard-rehearsal")

    # Adversarial corpus: every document is 20 words; all but two words
    # per document are GLOBALLY UNIQUE (the singleton tail), while two
    # planted words repeat corpus-wide so training has real merges to
    # find.  base36 ids keep the alphabet small and realistic.
    n_docs = args.types // 18  # 18 unique words per doc
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.lit("lowest"),
                F.lit("newest"),
                *[
                    F.concat(
                        F.lit("u"),
                        F.conv(
                            (F.col("id") * 18 + i).cast("string"), 10, 36
                        ),
                    )
                    for i in range(18)
                ],
            ).alias("text"),
        )
    )

    report: dict = {
        "types_target": args.types,
        "n_docs": n_docs,
        "bound": args.bound,
        "n_merges": args.n_merges,
    }

    t0 = time.monotonic()
    n_types = B.word_counts(docs).count()
    report["n_types_actual"] = n_types
    report["type_count_sec"] = round(time.monotonic() - t0, 2)
    assert n_types > args.bound, "corpus not adversarial enough"

    # instrument the collect path
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover
        from pyspark.sql import DataFrame

    real_collect = DataFrame.collect
    collect_sizes: list[int] = []

    def spy(self):
        rows = real_collect(self)
        collect_sizes.append(len(rows))
        return rows

    fallback = {"ran": False}
    real_batched = B.bpe_learn_batched

    def batched_spy(*a, **kw):
        fallback["ran"] = True
        return real_batched(*a, **kw)

    DataFrame.collect = spy
    B.bpe_learn_batched = batched_spy
    rss_before = peak_rss_mb()
    t0 = time.monotonic()
    try:
        merges_guarded = B.bpe_learn_local(
            docs, n_merges=args.n_merges, max_types=args.bound
        )
    finally:
        DataFrame.collect = real_collect
        B.bpe_learn_batched = real_batched
    report["guarded_wall_sec"] = round(time.monotonic() - t0, 2)
    report["fallback_engaged"] = fallback["ran"]
    report["probe_collect_rows"] = collect_sizes[0] if collect_sizes else None
    report["max_collect_rows"] = max(collect_sizes) if collect_sizes else None
    report["driver_peak_rss_mb_before"] = round(rss_before, 1)
    report["driver_peak_rss_mb_after"] = round(peak_rss_mb(), 1)
    report["merges_guarded"] = [list(m) for m in merges_guarded]

    # pin: the pure batched trainer learns the identical model
    t0 = time.monotonic()
    merges_batched = real_batched(docs, n_merges=args.n_merges)
    report["batched_wall_sec"] = round(time.monotonic() - t0, 2)
    report["merges_identical_to_batched"] = merges_guarded == merges_batched

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
