"""Distributed tokenizer-vocabulary induction (BPE over a word table).

The classic scaling trick (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): BPE never needs the
corpus after the first pass — merges operate on the WORD-FREQUENCY
table, whose size follows Heaps' law (millions of rows at 100 TB, not
trillions).  So the plan is:

  1. one corpus-wide shuffle builds (word, cnt)           — heavy, once
  2. each merge iteration runs on the compact word table  — cheap, N×
       pair-count explode → arg-max pair (TakeOrdered, k=1)
       → greedy left-to-right merge fold (F.aggregate, JVM-side)

The per-iteration arg-max is a 1-row collect — control-plane by design
(the merge decision IS one global scalar).  Lineage grows one
``transform`` per merge, so the loop localCheckpoints the word table
every CHECKPOINT_EVERY merges — without it, 200 merges deep the plan
re-derives every prior fold on each action.

Symbols are plain characters with no end-of-word marker (merges are
confined to words by construction since the table is per-word); the
greedy fold merges left-to-right, so overlapping occurrences ("aaa"
under pair (a,a)) collapse the leftmost pair first — the same rule as
the reference Python BPE in tests/test_vocab.py, which pins the whole
loop's output.

Scale notes: the only O(corpus) work is step 1 (map-side-combinable
groupBy).  apply_bpe as column expressions nests one fold per merge —
fine to ~64 merges; past that, tokenize with the learned merge list in
a vectorized Arrow batch (mapInPandas) instead of stacking expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators.text import tokens

CHECKPOINT_EVERY = 10


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the one corpus-wide shuffle."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def to_symbol_table(words: DataFrame) -> DataFrame:
    """(syms array<string>, cnt): each word split into characters."""
    return words.select(
        F.split(F.col("word"), "").alias("syms"), F.col("cnt")
    )


def pair_counts(symtab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency."""
    n = F.size("syms")
    pairs = F.arrays_zip(
        F.slice("syms", 1, n - 1).alias("a"),
        F.slice("syms", 2, n - 1).alias("b"),
    )
    return (
        symtab.filter(n >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def top_pair(pairs: DataFrame) -> tuple[str, str, int] | None:
    """Deterministic arg-max: count desc, then lexicographic (a, b).
    One row — TakeOrderedAndProject, never a global sort."""
    rows = pairs.orderBy(
        F.col("cnt").desc(), F.col("a"), F.col("b")
    ).limit(1).collect()
    if not rows:
        return None
    r = rows[0]
    return r.a, r.b, r.cnt


def merge_pair_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — a
    JVM-side fold (F.aggregate), no Python in the loop."""
    merged = a + b
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    list in application order.  Stops early when no pair reaches
    ``min_pair_count`` (merging hapax pairs memorizes the corpus)."""
    symtab = to_symbol_table(word_counts(df, text_col)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        best = top_pair(pair_counts(symtab))
        if best is None or best[2] < min_pair_count:
            break
        a, b, _ = best
        merges.append((a, b))
        symtab = symtab.select(
            merge_pair_expr(F.col("syms"), a, b).alias("syms"), "cnt"
        )
        if (i + 1) % CHECKPOINT_EVERY == 0:
            symtab = symtab.localCheckpoint()
    return merges


def bpe_vocab(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(token, cnt) after applying the learned merges to the word
    table: the induced subword vocabulary with corpus frequencies."""
    symtab = to_symbol_table(word_counts(df, text_col))
    syms = F.col("syms")
    for a, b in merges:
        syms = merge_pair_expr(syms, a, b)
    return (
        symtab.select(F.explode(syms).alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("cnt"))
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize each document with the learned merges — per-word
    character split, then the merge folds in order, flattened.  Column
    expressions only; for merge lists past ~64 use an Arrow-batched
    tokenizer (see module docstring)."""
    word_syms = F.transform(
        tokens(F.col(text_col)), lambda w: F.split(w, "")
    )
    for a, b in merges:
        word_syms = F.transform(
            word_syms, lambda s: merge_pair_expr(s, a, b)  # noqa: B023
        )
    return df.withColumn(out_col, F.flatten(word_syms))


def apply_bpe_arrow(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """The production encode path for LONG merge lists: one Arrow-batched
    mapInPandas pass applies every merge with a rank-priority encoder —
    O(word_len × log) per word regardless of merge count, where the
    expression path stacks one fold PER merge into the plan.  Pinned
    token-for-token equal to :func:`apply_bpe` in tests/test_vocab.py
    (rank order — lowest-rank pair first, leftmost on ties — produces
    the same result as applying the merges sequentially).

    The merge list is a driver-side constant captured in the closure
    (exactly like the frozen-LM arrays in operators/lm.py): learned
    distributed, broadcast implicitly with the task, never re-derived
    per batch."""
    from pyspark.sql.types import ArrayType, StringType, StructField

    rank = {pair: i for i, pair in enumerate(merges)}
    schema_fields = df.schema.fields + [
        StructField(out_col, ArrayType(StringType()))
    ]
    from pyspark.sql.types import StructType

    out_schema = StructType(schema_fields)

    def encode_word(word: str, cache: dict) -> list[str]:
        if word in cache:
            return cache[word]
        syms = list(word)
        while len(syms) > 1:
            best_i, best_r = -1, len(rank)
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]), len(rank))
                if r < best_r:
                    best_i, best_r = i, r
            if best_i < 0 or best_r >= len(rank):
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def batches(it):
        cache: dict = {}
        for pdf in it:
            pdf[out_col] = [
                [
                    t
                    for w in (txt.split(" ") if txt else [])
                    for t in encode_word(w, cache)
                ]
                for txt in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)
