"""Sequence chunking and packing for training-data pipelines.

Two operators a large-scale LLM data pipeline needs between "clean
documents" and "training batches":

- `chunk_token_windows`: cut each document's token stream into
  fixed-size windows with a configurable stride (overlap), the standard
  "context-window chunking" step before tokenized examples are written.
- `pack_contiguous`: concat-and-cut sequence packing — documents are
  laid end-to-end in a deterministic order and cut into fixed-capacity
  bins; emits each document's bin placement and how many bin boundaries
  it straddles (the quantity packing schemes try to minimize).

Reference analogue: none (pipeline extension; the reference is a
genomics ETL engine — see SURVEY.md §2 extension track).

Scale notes (100 TB): chunking is a narrow per-row transform + explode
— no shuffle, stays in whole-stage codegen (split/slice/sequence are
all JVM built-ins; no Python UDF).  Packing needs a running total,
which would be a single-partition window if done globally; instead it
is windowed PER GROUP (default: the `source` column), which is exactly
how production packers shard anyway (pack within a shard, never across
shards).  Each group's window is a partition-local sort — distributed
across executors by the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vcf_pg_loader_spark.operators.text import tokens


def chunk_token_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding token windows: chunk i covers tokens [i*stride, i*stride+window).

    The last chunk may be shorter than `window`; every token belongs to at
    least one chunk.  Number of chunks = 1 if n <= window else
    ceil((n - window) / stride) + 1.

    Output: (id, chunk_id, start_token, n_tokens, chunk_hash) where
    chunk_hash is md5 of the space-rejoined window — the key downstream
    chunk-level dedup joins on.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    last = F.when(n <= window, F.lit(0)).otherwise(
        F.ceil((n - F.lit(window)).cast("double") / F.lit(stride)).cast("int")
    )
    chunk = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, F.lit(window)
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            F.explode(F.sequence(F.lit(0), last)).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            (F.col("chunk_id") * stride).alias("start_token"),
            F.size(chunk).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


def sql_chunk_token_windows(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> str:
    """DuckDB twin of `chunk_token_windows` (1-based list_slice)."""
    toks = f"string_split({text_col}, ' ')"
    return f"""
WITH t AS (
  SELECT {id_col}, {toks} AS toks, len({toks}) AS n FROM {table}
),
c AS (
  SELECT {id_col}, toks,
         CAST(unnest(generate_series(0,
           CASE WHEN n <= {window} THEN 0
                ELSE CAST(CEIL((n - {window}) / CAST({stride} AS DOUBLE))
                          AS BIGINT)
           END)) AS INT) AS chunk_id
  FROM t
)
SELECT {id_col}, chunk_id,
       chunk_id * {stride} AS start_token,
       CAST(len(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {window}])
            AS INT) AS n_tokens,
       md5(array_to_string(
           toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {window}],
           ' ')) AS chunk_hash
FROM c
"""


def pack_contiguous(
    df: DataFrame,
    capacity: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-cut packing: within each group, documents ordered by id
    are laid end-to-end and cut into bins of `capacity` tokens.

    Output per document: its token offset in the group's stream, the bin
    its first token lands in, and `n_boundary_crossings` — how many bin
    boundaries the document straddles (0 means it fits inside one bin).
    """
    n = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n).over(w)
    start = (cum - n).alias("start_offset")
    first_bin = F.floor((cum - n) / capacity)
    last_bin = F.floor((cum - 1) / capacity)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        n.alias("n_tokens"),
        start,
        first_bin.alias("first_bin"),
        (last_bin - first_bin).cast("int").alias("n_boundary_crossings"),
    )


def sql_pack_contiguous(
    capacity: int,
    table: str = "documents",
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `pack_contiguous`."""
    n = f"len(string_split({text_col}, ' '))"
    return f"""
WITH t AS (
  SELECT {id_col}, {group_col}, {n} AS n_tokens,
         SUM({n}) OVER (PARTITION BY {group_col} ORDER BY {id_col}
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM {table}
)
SELECT {id_col}, {group_col}, CAST(n_tokens AS INT) AS n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST(FLOOR((cum - n_tokens) / {capacity}) AS BIGINT) AS first_bin,
       CAST(FLOOR((cum - 1) / {capacity})
            - FLOOR((cum - n_tokens) / {capacity}) AS INT)
         AS n_boundary_crossings
FROM t
"""
