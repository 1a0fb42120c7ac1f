"""BPE merge learning (Sennrich et al. 2016): learn the top-k byte-pair
merges from a corpus — the tokenizer-training primitive, expressed as an
iterative DataFrame computation like connected_components.

Shape per round (the 100 TB story):
  - the corpus collapses ONCE to (word, count) — BPE statistics are
    word-level, so all further rounds run on the vocabulary (10^5-10^6
    rows), not the corpus;
  - pair counts = one explode over each word's adjacent symbol pairs,
    weighted by word count, one keyed sum;
  - the argmax pair (one tiny ordered limit-1) becomes the round's
    merge; applying it is a per-word array fold (F.aggregate) that
    replicates greedy left-to-right merging — no Python in any plan;
  - localCheckpoint truncates the growing lineage each round, the same
    iterative-Spark pattern as connected_components.

The learned merge TABLE is the model; applying it to new text is the
same fold replayed in merge order.  Correctness is pinned against a
plain-Python reference implementation (tests/test_bpe.py) rather than
the SQL oracle: the per-round argmax routes one scalar through the
driver (it IS the model parameter being learned), which makes the whole
loop driver-mediated — the documented weaker check, like PQ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, per the original formulation


def word_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, n): the corpus collapsed to word statistics."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(w: Column) -> Column:
    """Character symbols + the end-of-word marker."""
    chars = F.filter(F.split(w, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END)))


def _adjacent_pairs(sym: Column) -> Column:
    n = F.size(sym)
    return F.zip_with(
        F.slice(sym, 1, n - 1),
        F.slice(sym, 2, n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )


def _apply_merge(sym: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol, as a pure array fold."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        # try_element_at: ANSI-safe on the empty accumulator (plain
        # element_at throws; `&` does not short-circuit — the shingles
        # lesson applied to folds)
        prev = F.try_element_at(acc, F.lit(-1))
        can = (F.size(acc) > 0) & (prev == F.lit(left)) & (x == F.lit(right))
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(sym, F.array().cast("array<string>"), step)


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn `n_merges` merges; returns them in order.  Ties break by
    (left, right) lexicographic order so the result is deterministic on
    any partitioning."""
    wc = word_counts(docs, id_col, text_col)
    state = wc.select(
        _initial_symbols(F.col("w")).alias("sym"), F.col("n")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts = (
            state.select(F.explode(_adjacent_pairs(F.col("sym"))).alias("p"), "n")
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("c"))
        )
        best = (
            pair_counts.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < 2:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        state = state.select(
            _apply_merge(F.col("sym"), left, right).alias("sym"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table to a corpus: (id, tokens) where each
    word is segmented by replaying the merges in order — one fold per
    merge, all JVM-side."""
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    sym = _initial_symbols(F.col("w"))
    for left, right in merges:
        sym = _apply_merge(sym, left, right)
    return words.select(id_col, F.col("w"), sym.alias("pieces"))


def bpe_encode_arrow(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The production encode for LONG merge lists (round 11): the
    expression path stacks one fold into the plan PER merge — fine to
    ~64 merges, pathological for a production tokenizer's thousands —
    so this runs ONE Arrow-batched mapInPandas pass with a
    rank-priority encoder: repeatedly merge the lowest-rank pair
    present (leftmost on ties).  That is provably equal to replaying
    the merges in order — a merge's operands can only be produced by
    lower-rank merges, so while any lower-rank pair exists it is
    always merged first — and tests/test_bpe.py pins the two paths
    token-for-token.  A per-task word cache makes encode cost
    O(unique words), not O(tokens).  The merge list is a driver-side
    constant captured in the closure (like the frozen-LM arrays in
    operators/lm.py): learned distributed, shipped with the task.

    Output schema matches :func:`bpe_encode`: (id, w, pieces), one row
    per word occurrence."""
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    rank = {pair: i for i, pair in enumerate(merges)}
    no_rank = len(rank)

    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    out_schema = StructType(
        list(words.schema.fields)
        + [StructField("pieces", ArrayType(StringType()))]
    )

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [END]
        while len(syms) > 1:
            best_i, best_r = -1, no_rank
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]), no_rank)
                if r < best_r:
                    best_i, best_r = i, r
            if best_i < 0 or best_r >= no_rank:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def batches(it):
        cache: dict = {}
        for pdf in it:
            pdf["pieces"] = [encode_word(w, cache) for w in pdf["w"]]
            yield pdf

    return words.mapInPandas(batches, schema=out_schema)
