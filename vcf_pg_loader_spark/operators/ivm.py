"""Incremental view maintenance for inner-join views (insert-only).

The delta-join rule: for inserts dL, dR,

    (L ∪ dL) ⋈ (R ∪ dR)  =  L⋈R  ∪  dL⋈R  ∪  L⋈dR  ∪  dL⋈dR

so a materialized join view folds a batch of inserts by joining ONLY the
deltas against the other side — cost ∝ |dL|·sel + |dR|·sel per batch,
never a recompute of |L|·|R|.  This is the classic counting-free IVM
rule for insert-only streams (Gupta & Mumick's survey; deletions need
counted multiplicities — out of scope here, matching the engine's
append-only store semantics where removal is batch-level
delete+rewrite, not row retraction).

Composes with the engine's other incremental structures: the join delta
feeds rollup partials (operators/rollup.py) for incremental
aggregate-over-join views, and the foreachBatch sinks (streaming/
sink.py) give the same fold exactly-once semantics from a live stream.

Scale shape: each maintenance step is two keyed joins of a SMALL delta
against a large base — the base never re-shuffles if it is bucketed on
the join key (sources/store.py write_bucketed), and the delta side is
usually broadcastable.  Fold order does not matter (union is
commutative/associative), so k batches can fold in any order — the
property the tests pin.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def join_delta(
    left_old: DataFrame,
    left_delta: DataFrame,
    right_old: DataFrame,
    right_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Rows the view GAINS when dL and dR arrive: dL⋈R ∪ L⋈dR ∪ dL⋈dR."""
    on = [on] if isinstance(on, str) else list(on)
    parts = [
        left_delta.join(right_old, on),
        left_old.join(right_delta, on),
        left_delta.join(right_delta, on),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def maintain_join_view(
    view_old: DataFrame | None,
    left_old: DataFrame,
    left_delta: DataFrame,
    right_old: DataFrame,
    right_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """One maintenance step: the view plus its delta.  `view_old=None`
    bootstraps from an empty view (left_old/right_old empty too)."""
    delta = join_delta(left_old, left_delta, right_old, right_delta, on)
    return delta if view_old is None else view_old.unionByName(delta)
