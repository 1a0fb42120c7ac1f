"""Corpus-trained n-gram language-model scoring: the perplexity-filter
signal of LLM data curation (CCNet's KenLM gate, Gopher/RefinedWeb
quality rules) reduced to its relational core — a smoothed bigram model
trained on the corpus itself, scoring every document's mean negative
log-likelihood.  High-NLL docs are boilerplate/garbled/outlier text;
low-NLL docs are fluent under the corpus distribution.

Scale shape: bigrams are built ARRAY-side (zip the token array against
its own 1-shift, one explode — zero exchanges; round 8 replaced a
posexplode + per-doc lead window that paid a shuffle to rediscover
adjacency the array already encodes); two keyed count aggregations
(bigram and unigram tables, both vocabulary-sized, both
partial-aggregated map-side before their shuffles); scoring is one
join per table plus a broadcast vocabulary scalar.  Zero Python
anywhere.

Determinism: counts are exact integers; the single ln() per bigram runs
on identical doubles in Spark and DuckDB; per-doc sums fold through the
decimal(24,12) cast (queries/_util.py discipline) and the final NLL
rounds to 6 dp, absorbing 1-ulp libm divergence — the same treatment
BM25 and PMI get.

Add-k smoothing (k = 0.5): p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V),
so unseen continuations stay finite and the score is defined for every
document with at least one bigram (single-token docs have no bigram and
are not scored — the caller's length gate already handles them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(24,12)"
SMOOTH_K = 0.5


def _doc_bigrams(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc, w1, w2) adjacent-token pairs, built ARRAY-side: zip the
    token array against its own 1-shift (the q_pmi_bigrams kernel) and
    explode once.  Round 8: this replaces a posexplode + per-doc lead
    window — adjacency is already explicit in the array, so paying a
    shuffle + sort to rediscover it was pure waste; the whole bigram
    build now stays inside whole-stage codegen with zero exchanges.

    Deliberately NOT widened (optimization round 15): an interleaved
    same-session A/B of ensure_min_parallelism here measured the widen
    a consistent ~30% LOSS at bench scale (doc_nll 1.6 s unwidened vs
    2.1-2.5 s widened, 5 reps each) — the round-robin repartition's
    exchange + sortBeforeRepartition costs more than the single-task
    explode it parallelizes, and the bigram frame feeds two subtrees so
    the exchange runs twice.  At real scale the scan is already wide
    and the guard would no-op anyway."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    # single-token and empty docs have no bigram: clamp the slice length
    # (slice rejects negative lengths)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return docs.select(
        F.col(id_col), F.explode(grams).alias("g")
    ).select(id_col, "g.w1", "g.w2")


def _model_tables(
    bg: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(c12, c1, vocab-size scalar) from one exploded-bigram frame.

    Optimization round 15 (guide §2.3 "aggregate before you shuffle"):
    c(w1) = Σ_w2 c12(w1, w2) is an exact identity over the c12 table
    (every bigram contributes exactly one to its w1's count), so c1
    derives from the VOCABULARY-sized c12 aggregate instead of a second
    corpus-wide aggregation of the exploded bigrams — the c1 branch's
    exchange shrinks from bigram-sized to c12-sized.  An A/B with c12
    additionally persisted measured a net LOSS at bench scale (+0.5 s
    on q_lm_perplexity: the cache-write barrier serializes stages the
    scheduler otherwise overlaps, guide §2.6/§5), so the three tables
    stay lazy; doc_nll below avoids the multi-consumption entirely by
    folding c1 into the c12 lookup with a window."""
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # unigram continuation counts: c(w1) = number of bigrams starting w1,
    # so probabilities normalize exactly over the observed vocabulary
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = c12.select("w2").distinct().agg(F.count(F.lit(1)).alias("v"))
    return c12, c1, vocab


def doc_nll(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = SMOOTH_K,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus bigram
    model: (doc_id, n_bigrams, nll) — nll rounded to 6 dp, monotone with
    perplexity (ppl = e^nll).  Docs with no bigram are absent.

    Plan shape (optimization round 15, guide §2.3/§2.4): ONE bigram
    lookup table carries both counts — c12 from the keyed aggregation,
    c1 attached by a window over the (vocabulary-sized) c12 partitioned
    on w1 — so scoring is a single equi-join instead of two, and the
    exploded bigrams are aggregated twice (c12 lookup, vocab scalar)
    rather than three times.  c1-via-window is the identity
    c(w1) = Σ_w2 c12(w1, w2): exact integers, so the smoothed
    log-probability operands are bit-identical to the three-table
    formulation (pinned in tests/test_opt_r15.py)."""
    from pyspark.sql.window import Window

    bg = _doc_bigrams(docs, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    lookup = c12.withColumn(
        "c1", F.sum("c12").over(Window.partitionBy("w1"))
    )
    vocab = c12.select("w2").distinct().agg(F.count(F.lit(1)).alias("v"))

    logprob = F.log(
        (F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))
    )
    return (
        bg.join(lookup, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), logprob.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -(F.sum(F.col("lp").cast(DEC)).cast("double"))
                / F.count(F.lit(1)),
                6,
            ).alias("nll"),
        )
    )


def bigram_model(
    train: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the smoothed bigram model once and return its three tables
    (c12, c1, vocab-size scalar) so they can be FROZEN — persisted and
    reused to score later documents without retraining.  This is the
    CCNet deployment shape (a fixed reference LM scores every incoming
    shard) and the incremental-funnel shape (the maintained drop-reason
    report scores arrivals under the bootstrap model, the same
    frozen-parameter stance as SemDeDupIngestSink's centroids)."""
    return _model_tables(_doc_bigrams(train, id_col, text_col))


def doc_nll_frozen(
    docs: DataFrame,
    c12: DataFrame,
    c1: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = SMOOTH_K,
) -> DataFrame:
    """Score documents under a FROZEN bigram model (the tables from
    `bigram_model`): identical to doc_nll when `docs` is the training
    corpus, but defined for unseen text too — bigrams absent from the
    model take c12=0 (and unseen left-words c1=0) through the same
    add-k smoothing, so p = k / (0 + k·V) = 1/V at worst and every
    score stays finite.  LEFT joins + coalesce keep the plan two keyed
    hash joins plus a broadcast scalar; zero Python."""
    bg = _doc_bigrams(docs, id_col, text_col)
    logprob = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("v"))
    )
    return (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), logprob.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                -(F.sum(F.col("lp").cast(DEC)).cast("double"))
                / F.count(F.lit(1)),
                6,
            ).alias("nll"),
        )
    )


def sql_doc_nll_frozen(
    score_table: str, train_table: str, k: float = SMOOTH_K
) -> str:
    """DuckDB twin of doc_nll_frozen: train on one table expression,
    score another, LEFT JOIN + COALESCE smoothing — bit-identical
    operand doubles before the rounded decimal fold."""
    return f"""
WITH ttoks AS (
  SELECT doc_id, t.pos, t.w1 FROM (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS w1
    FROM {train_table}
  ) t WHERE t.w1 <> ''
),
tbg AS (
  SELECT doc_id, w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM ttoks
),
tbg2 AS (SELECT w1, w2 FROM tbg WHERE w2 IS NOT NULL),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM tbg2 GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM tbg2 GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT w2) AS v FROM tbg2),
stoks AS (
  SELECT doc_id, t.pos, t.w1 FROM (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS w1
    FROM {score_table}
  ) t WHERE t.w1 <> ''
),
sbg AS (
  SELECT doc_id, w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM stoks
),
sbg2 AS (SELECT doc_id, w1, w2 FROM sbg WHERE w2 IS NOT NULL),
scored AS (
  SELECT sbg2.doc_id,
         ln((COALESCE(c12, 0) + {k}) / (COALESCE(c1, 0) + {k} * v)) AS lp
  FROM sbg2
  LEFT JOIN c12 USING (w1, w2)
  LEFT JOIN c1 USING (w1), vocab
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(-CAST(SUM(CAST(lp AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*), 6)
         AS nll
FROM scored GROUP BY 1
"""


def sql_doc_nll(table: str, k: float = SMOOTH_K) -> str:
    """DuckDB twin — identical expression shape, bigrams via LEAD."""
    return f"""
WITH toks AS (
  SELECT doc_id, t.pos, t.w1 FROM (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS w1
    FROM {table}
  ) t WHERE t.w1 <> ''
),
bg AS (
  SELECT doc_id, w1, LEAD(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg2 GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg2 GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT w2) AS v FROM bg2),
scored AS (
  SELECT bg2.doc_id,
         ln((c12 + {k}) / (c1 + {k} * v)) AS lp
  FROM bg2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1), vocab
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(-CAST(SUM(CAST(lp AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*), 6)
         AS nll
FROM scored GROUP BY 1
"""
