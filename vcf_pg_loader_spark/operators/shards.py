"""Training-shard layout: the corpus's final load-ready form.

A curation pipeline's end product is not a report — it is the shard
files a trainer streams.  This module computes that layout with three
deterministic stages, each a pure function of the document set so the
whole thing is incrementally maintainable (streaming/shards.py) and
oracle-checkable:

  1. **Stable shard assignment** — ``shard = h60(doc_id, salt) mod
     n_shards``.  A document's shard never depends on other rows, so a
     corpus delta touches exactly the shards of the changed documents;
     at 100 TB ``n_shards`` is sized so one shard (corpus_bytes /
     n_shards) fits a repack task comfortably.
  2. **Deterministic within-shard shuffle** — documents order by a
     second, independent hash (the epoch-shuffle trick,
     queries/pipeline.py q_epoch_shuffle): trainers see a fixed
     pseudo-random order without a global sort, and the order is
     reproducible from doc ids alone.
  3. **Concat-and-cut packing** — the shard's token stream is cut into
     ``seq_len``-token sequences (the same semantics as
     operators/chunking.py pack_contiguous); each document records its
     start offset, first sequence, and boundary crossings.

The per-shard **manifest** (doc/token/sequence counts plus an
order-independent ``bit_xor`` content fingerprint over the packed
rows) is the integrity artifact a trainer checks before reading.

Reference parity: the reference stages load-ready record batches
before COPY (vcf_pg_loader's batched ``copy_records_to_table`` flow,
loader.py:512-516, batch_size loader.py:100); this is that staging
step re-expressed as a deterministic, resumable layout over a
distributed corpus.

Scale notes: stage 1 and 2 are narrow column expressions; the only
wide operation is the per-shard window in stage 3, which shuffles on
``shard`` — one shuffle, partition count = n_shards, each task a
single shard's stream.  The manifest is one map-side-combinable
aggregate over the layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vcf_pg_loader_spark.functions.hashing import h60, sql_h60
from vcf_pg_loader_spark.operators.text import tokens

N_SHARDS = 16
SEQ_LEN = 512
SHARD_SALT = "shard:"
ORDER_SALT = "sorder:"
FP_SALT = "sfp:"


def shard_of(id_col: Column, n_shards: int = N_SHARDS) -> Column:
    """Stable shard in [0, n_shards) from the document id alone."""
    return F.pmod(h60(id_col.cast("string"), SHARD_SALT), F.lit(n_shards))


def sql_shard_of(expr: str, n_shards: int = N_SHARDS) -> str:
    h = sql_h60(f"CAST({expr} AS VARCHAR)", SHARD_SALT)
    return f"((({h}) % {n_shards}) + {n_shards}) % {n_shards}"


def order_key(id_col: Column) -> Column:
    """Deterministic pseudo-random within-shard order key, independent
    of the shard hash (different salt)."""
    return h60(id_col.cast("string"), ORDER_SALT)


def sql_order_key(expr: str) -> str:
    return sql_h60(f"CAST({expr} AS VARCHAR)", ORDER_SALT)


_BUCKET_SHIFT = 1 << 60  # h60 < 2^60, so bucket*2^60 + h60 never collides


def curriculum_okey(bucket_col: Column, id_col: Column) -> Column:
    """Curriculum order key: documents pack bucket-by-bucket (0 first),
    hash-shuffled WITHIN each bucket — e.g. a length or quality bucket
    gives short/low-quality docs first and long/high-quality last while
    keeping the within-stage order pseudo-random and reproducible.
    Composes above :func:`order_key` in the value space the packing
    window already sorts: okey = bucket * 2^60 + h60(id).  bucket must
    be in [0, 8) — 7 * 2^60 + (2^60 - 1) is exactly int64 max."""
    return (
        bucket_col.cast("bigint") * F.lit(_BUCKET_SHIFT) + order_key(id_col)
    )


def sql_curriculum_okey(bucket_expr: str, id_expr: str) -> str:
    return (
        f"CAST({bucket_expr} AS BIGINT) * {_BUCKET_SHIFT}"
        f" + ({sql_order_key(id_expr)})"
    )


def shard_layout_from_lengths(
    base: DataFrame, seq_len: int = SEQ_LEN
) -> DataFrame:
    """Packing stage over per-doc facts (doc_id, shard, okey, n_tokens):
    within each shard, documents in (okey, doc_id) order lay end-to-end
    and cut into ``seq_len``-token sequences.  Split out from
    :func:`shard_layout` so the maintenance sink can repack ONLY touched
    shards from persisted lengths — the window partitions by shard, so
    feeding it a touched-shards-only frame recomputes exactly those."""
    w = (
        Window.partitionBy("shard")
        .orderBy("okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    first_seq = F.floor(start / seq_len)
    last_seq = F.floor((cum - 1) / seq_len)
    return base.select(
        "doc_id",
        "shard",
        "okey",
        "n_tokens",
        "dfp",
        start.cast("bigint").alias("start_offset"),
        first_seq.cast("bigint").alias("first_seq"),
        (last_seq - first_seq).cast("int").alias("n_crossings"),
    )


DOC_SALT = "sdoc:"


def doc_fp(text_col: Column) -> Column:
    """Content fingerprint carried in the layout so a maintainer can
    self-diff the shard state against a fresh corpus snapshot (the
    DatasetCardSink pattern) without the state storing any text."""
    return h60(text_col, DOC_SALT)


def sql_doc_fp(expr: str) -> str:
    return sql_h60(expr, DOC_SALT)


def shard_base(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = N_SHARDS,
    lengths: DataFrame | None = None,
    doc_sep: int = 0,
    order_col: Column | None = None,
) -> DataFrame:
    """Per-doc pure facts the layout derives from: id, shard, order
    key, token count, content fingerprint.  Everything downstream
    (packing, manifest) is a function of this frame alone — the
    property that makes the maintained form's per-doc work
    O(|delta|).

    ``lengths`` (id, n_tokens) overrides the default whitespace token
    count — the tokenizer-space seam (round-11 verdict item 3): pass
    operators/bpe.py bpe_token_lengths(...) to pack seq_len cuts in the
    SAME tokens the trainer consumes.  Inner join: a lengths frame is
    derived from the identical document set, and silently zero-filling
    a missing doc would mis-pack every later offset in its shard.

    ``doc_sep`` counts separator tokens a trainer appends per document
    (EOS / boundary markers): every document's n_tokens grows by it —
    including zero-content documents, which still emit their EOS, so
    with doc_sep > 0 nothing is skipped by the packing.  A pure per-row
    constant, so maintenance stays O(|delta|); it is a SEMANTIC packing
    parameter (every offset moves) and belongs in the state fingerprint
    (streaming/shards.py).

    ``order_col`` overrides the default hash shuffle order — the
    curriculum seam: any deterministic bigint expression over the row
    (e.g. a quality- or length-bucket composed above the hash,
    curriculum_okey) reorders packing without touching assignment or
    cut semantics."""
    c = F.col(id_col)
    okey = order_key(c) if order_col is None else order_col
    base = df.select(
        c.alias("doc_id"),
        shard_of(c, n_shards).alias("shard"),
        okey.cast("bigint").alias("okey"),
        (F.size(tokens(F.col(text_col))) + F.lit(doc_sep))
        .cast("bigint")
        .alias("n_tokens"),
        doc_fp(F.col(text_col)).alias("dfp"),
    )
    if lengths is None:
        return base
    return base.drop("n_tokens").join(
        lengths.select(
            F.col(id_col).alias("doc_id"),
            (F.col("n_tokens") + F.lit(doc_sep))
            .cast("bigint")
            .alias("n_tokens"),
        ),
        "doc_id",
    ).select("doc_id", "shard", "okey", "n_tokens", "dfp")


def shard_layout(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = N_SHARDS,
    seq_len: int = SEQ_LEN,
    doc_sep: int = 0,
    order_col: Column | None = None,
) -> DataFrame:
    """Full layout from raw documents: assignment + order + packing."""
    return shard_layout_from_lengths(
        shard_base(
            df, id_col, text_col, n_shards,
            doc_sep=doc_sep, order_col=order_col,
        ),
        seq_len,
    )


def _row_fp() -> Column:
    return h60(
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("n_tokens").cast("string"),
            F.col("start_offset").cast("string"),
        ),
        FP_SALT,
    )


def shard_manifest(layout: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Per-shard integrity manifest over a layout frame.  ``shard_fp``
    is an order-independent bit_xor of per-row hashes that COVER the
    packed offsets — two states with the same doc set but different
    packing disagree, so a trainer (or the oracle) can verify a served
    layout without reading the documents."""
    return layout.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.floor((F.sum("n_tokens") + seq_len - 1) / seq_len)
        .cast("bigint")
        .alias("n_seqs"),
        F.bit_xor(_row_fp()).alias("shard_fp"),
    )


def pack_efficiency(manifest: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Padding-waste monitor over a shard manifest: each shard's last
    sequence is padded to ``seq_len``, so capacity = n_seqs * seq_len,
    pad = capacity - n_tokens, fill = n_tokens / capacity.  With
    concat-and-cut packing waste is bounded by (seq_len - 1) tokens per
    SHARD (only the final cut pads), so fill drifting from ~1.0 is the
    signal that n_shards is oversized for the corpus — too many tails.
    Pure projection over the n_shards-row manifest frame."""
    cap = F.col("n_seqs") * seq_len
    return manifest.select(
        "shard",
        "n_docs",
        "n_tokens",
        "n_seqs",
        cap.cast("bigint").alias("capacity"),
        (cap - F.col("n_tokens")).cast("bigint").alias("pad_tokens"),
        F.round(F.col("n_tokens") / cap, 6).alias("fill_ratio"),
    )


EPOCH_ORDER_SALT = "seqorder:"


def epoch_sequence_order(manifest: DataFrame, epoch: int) -> DataFrame:
    """Inter-epoch SEQUENCE shuffle without repacking: each training
    epoch visits every packed sequence in a fresh pseudo-random order
    derived purely from (shard, seq_id, epoch) — the layout, offsets,
    and shard files never change, only the read schedule.  (shard,
    seq_id, epoch_pos): epoch_pos ranks h60(shard:seq:epoch) within the
    shard, ties impossible (the hash input is unique per row).

    Scale shape: the input is the n_shards-row manifest; F.sequence/
    explode generates seq ids JVM-side (narrow), then one window
    partitioned by shard — total rows = corpus_tokens / seq_len, tiny
    next to the corpus, and the shard partitioning matches how a
    trainer consumes the schedule (one shard's order per reader)."""
    seqs = manifest.select(
        "shard",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_seqs") - 1)
        ).alias("seq_id"),
    )
    okey = h60(
        F.concat_ws(
            ":",
            F.col("shard").cast("string"),
            F.col("seq_id").cast("string"),
            F.lit(str(epoch)),
        ),
        EPOCH_ORDER_SALT,
    )
    w = Window.partitionBy("shard").orderBy(okey, "seq_id")
    return seqs.select(
        "shard",
        "seq_id",
        F.row_number().over(w).cast("bigint").alias("epoch_pos"),
    )


def sql_epoch_sequence_order(
    manifest_sql: str, epoch: int
) -> str:
    """DuckDB twin of :func:`epoch_sequence_order` over a manifest
    subquery."""
    okey = sql_h60(
        "CAST(shard AS VARCHAR) || ':' || CAST(s AS VARCHAR)"
        f" || ':' || '{epoch}'",
        EPOCH_ORDER_SALT,
    )
    return f"""
WITH man AS ({manifest_sql}), seqs AS (
  SELECT shard, CAST(s AS BIGINT) AS seq_id, {okey} AS okey
  FROM man, UNNEST(range(0, n_seqs)) AS t(s)
)
SELECT shard, seq_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY okey, seq_id) AS BIGINT)
         AS epoch_pos
FROM seqs
"""


def shard_sequences(layout: DataFrame, seq_len: int = SEQ_LEN) -> DataFrame:
    """Expand the layout into per-(sequence, document) spans: which
    token range of which document fills each training sequence.  A
    document spanning k boundaries contributes k+1 rows — generated
    with F.sequence/explode (narrow, JVM-side), never a join against a
    sequence table.  ``tok_start`` is the document-local offset of the
    span; ``seq_off`` is where it lands inside the sequence — together
    they are the recipe a loader executes to assemble sequence bytes
    from document bytes."""
    seqs = F.sequence(
        F.col("first_seq"), F.col("first_seq") + F.col("n_crossings")
    )
    # a zero-token document (possible in BPE space for empty text)
    # occupies no sequence; without the filter its first/last seq
    # arithmetic inverts and F.sequence would emit bogus spans
    e = layout.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_offset",
        F.explode(seqs).alias("seq_id"),
    )
    span_lo = F.greatest(F.col("start_offset"), F.col("seq_id") * seq_len)
    span_hi = F.least(
        F.col("start_offset") + F.col("n_tokens"),
        (F.col("seq_id") + 1) * seq_len,
    )
    return e.select(
        "shard",
        "seq_id",
        "doc_id",
        (span_lo - F.col("start_offset")).cast("bigint").alias("tok_start"),
        (span_hi - span_lo).cast("bigint").alias("tok_len"),
        (span_lo - F.col("seq_id") * seq_len).cast("bigint").alias("seq_off"),
    )


def sequence_stream(spans: DataFrame, pieces: DataFrame) -> DataFrame:
    """Assemble the ACTUAL training sequences from the span recipe
    (shard_sequences) and per-document token pieces
    (operators/bpe.py bpe_encode_doc_arrow): each (shard, seq_id) row
    carries the seq_len-token slice of the corpus a trainer feeds the
    model — the terminal artifact of the whole pipeline.

    All JVM after the encode: spans join pieces on doc_id, each span
    slices its document's pieces (F.slice — no re-tokenization), and
    the per-sequence parts reassemble with sort_array over
    (seq_off, part) structs so collect_list's arbitrary order cannot
    leak in.  One shuffle on (shard, seq_id); output rows =
    total_tokens / seq_len, tiny relative to the corpus."""
    parts = spans.join(pieces.select("doc_id", "pieces"), "doc_id").select(
        "shard",
        "seq_id",
        F.struct(
            F.col("seq_off"),
            F.slice(
                F.col("pieces"),
                (F.col("tok_start") + 1).cast("int"),
                F.col("tok_len").cast("int"),
            ).alias("part"),
        ).alias("p"),
    )
    ordered = F.sort_array(F.collect_list("p"))
    return parts.groupBy("shard", "seq_id").agg(
        F.flatten(
            F.transform(ordered, lambda s: s["part"])
        ).alias("tokens"),
        # where each document starts inside the sequence — the offsets
        # a trainer needs for a block-diagonal attention mask, free
        # from the same sorted parts (no extra shuffle or column)
        F.transform(ordered, lambda s: s["seq_off"]).alias("doc_bounds"),
    )


# -- DuckDB twins ----------------------------------------------------------


def sql_shard_layout(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = N_SHARDS,
    seq_len: int = SEQ_LEN,
    lengths_sql: str | None = None,
    doc_sep: int = 0,
    order_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`shard_layout` (tokens = whitespace split,
    same as operators/text.py tokens).  ``lengths_sql``, when given, is
    a subquery selecting (doc_id, n_tokens) that overrides the token
    count — the twin of shard_base's lengths seam.  ``doc_sep`` and
    ``order_sql`` twin the separator-token and curriculum seams."""
    if lengths_sql is None:
        n_tokens = (
            f"CAST(len(string_split({text_col}, ' ')) + {doc_sep} AS BIGINT)"
        )
        joins = ""
    else:
        n_tokens = f"CAST(_lens.n_tokens + {doc_sep} AS BIGINT)"
        joins = f" JOIN ({lengths_sql}) AS _lens ON _lens.doc_id = _t.{id_col}"
    okey = (
        sql_order_key(f"_t.{id_col}") if order_sql is None else order_sql
    )
    return f"""
WITH base AS (
  SELECT _t.{id_col} AS doc_id,
         {sql_shard_of(f'_t.{id_col}', n_shards)} AS shard,
         CAST({okey} AS BIGINT) AS okey,
         {n_tokens} AS n_tokens,
         {sql_doc_fp(text_col)} AS dfp
  FROM {table} AS _t{joins}
), packed AS (
  SELECT doc_id, shard, okey, n_tokens, dfp,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY okey, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM base
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, okey, n_tokens, dfp,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST(FLOOR((cum - n_tokens) / {seq_len}) AS BIGINT) AS first_seq,
       CAST(FLOOR((cum - 1) / {seq_len})
            - FLOOR((cum - n_tokens) / {seq_len}) AS INT) AS n_crossings
FROM packed
"""


def sql_shard_sequences(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = N_SHARDS,
    seq_len: int = SEQ_LEN,
    lengths_sql: str | None = None,
    doc_sep: int = 0,
    order_sql: str | None = None,
) -> str:
    """DuckDB twin of :func:`shard_sequences` over a raw table."""
    layout = sql_shard_layout(
        table, id_col, text_col, n_shards, seq_len, lengths_sql,
        doc_sep, order_sql,
    )
    return f"""
WITH layout AS ({layout}), e AS (
  SELECT doc_id, shard, n_tokens, start_offset, CAST(s AS BIGINT) AS seq_id
  FROM layout, UNNEST(range(first_seq, first_seq + n_crossings + 1)) AS t(s)
  WHERE n_tokens > 0
)
SELECT shard, seq_id, doc_id,
       CAST(GREATEST(start_offset, seq_id * {seq_len})
            - start_offset AS BIGINT) AS tok_start,
       CAST(LEAST(start_offset + n_tokens, (seq_id + 1) * {seq_len})
            - GREATEST(start_offset, seq_id * {seq_len}) AS BIGINT)
         AS tok_len,
       CAST(GREATEST(start_offset, seq_id * {seq_len})
            - seq_id * {seq_len} AS BIGINT) AS seq_off
FROM e
"""


def sql_shard_manifest(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = N_SHARDS,
    seq_len: int = SEQ_LEN,
    lengths_sql: str | None = None,
    doc_sep: int = 0,
    order_sql: str | None = None,
) -> str:
    layout = sql_shard_layout(
        table, id_col, text_col, n_shards, seq_len, lengths_sql,
        doc_sep, order_sql,
    )
    fp_expr = sql_h60(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR)"
        " || ':' || CAST(start_offset AS VARCHAR)",
        FP_SALT,
    )
    return f"""
WITH layout AS ({layout})
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(FLOOR((SUM(n_tokens) + {seq_len} - 1) / {seq_len}) AS BIGINT)
         AS n_seqs,
       CAST(bit_xor({fp_expr}) AS BIGINT) AS shard_fp
FROM layout
GROUP BY shard
"""
