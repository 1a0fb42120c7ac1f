"""Deterministic span-corruption masking (round-12 verdict item 4).

The mask schedule is a pure function of (shard, seq_id, position) — a
position is a span START when its salted hash lands in 1/rate of its
range, and each start masks `span` consecutive positions (clipped at
the sequence end).  Purity is the scale property: 1000 dataloader
shards reproduce the identical noise with no shared RNG state, and the
schedule can be recomputed from the span recipe alone (no text) to
integrity-check an export.

This module is the single home of the arithmetic; the oracle query
(queries/pipeline.py q_mask_schedule / q_train_sequences_masked) and
the export path (cli export-sequences --mask-schedule) both call it,
so the trainer-facing bytes and the CORRECTNESS pin can never drift.

Unlike the original q_mask_schedule plan (positions explode -> hash
filter -> span explode -> distinct -> collect_list: three shuffles),
:func:`mask_positions_col` is a pure ARRAY expression — the whole
schedule computes per-row inside whole-stage codegen, no shuffle at
all, which is the plan you want when attaching masks to an export
that is already one shuffle end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.hashing import h60

# expected masked fraction = MASK_SPAN / MASK_RATE (15%, T5-style)
MASK_RATE = 20
MASK_SPAN = 3
MASK_SALT = "mask:"


def mask_positions_col(
    shard: Column,
    seq_id: Column,
    n: Column,
    rate: int = MASK_RATE,
    span: int = MASK_SPAN,
    salt: str = MASK_SALT,
) -> Column:
    """array<bigint> of masked positions for a sequence of `n` tokens
    — sorted, distinct, every value in [0, n).  Pure per-row array
    expression (filter/transform/flatten), no shuffle, no Python."""
    pos = F.sequence(F.lit(0).cast("bigint"), n.cast("bigint") - 1)
    is_start = lambda p: (  # noqa: E731 — lambda for the HOF
        F.pmod(
            h60(
                F.concat_ws(
                    ":",
                    shard.cast("string"),
                    seq_id.cast("string"),
                    p.cast("string"),
                ),
                salt,
            ),
            F.lit(rate),
        )
        == 0
    )
    starts = F.filter(pos, is_start)
    spans_ = F.transform(
        starts,
        lambda p: F.sequence(
            p, F.least(p + F.lit(span - 1), n.cast("bigint") - 1)
        ),
    )
    empty = F.array().cast("array<bigint>")
    return F.when(n.cast("bigint") <= 0, empty).otherwise(
        F.array_sort(F.array_distinct(F.flatten(spans_)))
    )
