"""Sparse keyword retrieval over the document corpus: BM25 scoring and
TF-IDF document vectors — the standard lexical-retrieval half of a
training-data curation stack (keyword mining, targeted decontamination,
query-based corpus audits) beside the dense-ANN half in similarity.py.

Scale shape (the part that matters at 100 TB):
  - one explode of the corpus into (doc, term) pairs, re-used for term
    frequencies, document lengths, and document frequencies — all
    partial-aggregated map-side before their shuffles;
  - the query's term list prunes the exploded pairs BEFORE the heavy
    join (`isin` over a literal list — pushed into the scan of the
    pair frame), so scoring cost is ∝ postings of the query terms, not
    corpus size — exactly an inverted-index probe expressed
    relationally;
  - corpus-level scalars (N, avgdl) ride as 1-row broadcasts, never
    through the driver;
  - everything is built-in column expressions: zero Python in the plan.

Determinism: BM25's per-(doc,term) contribution is a fixed-shape double
expression evaluated identically by Spark and DuckDB (integer tf/df/dl
inputs make the operand doubles bit-identical); per-doc sums fold
decimal-cast (queries/_util.py pattern) and the final score rounds to 6
dp, absorbing the 1-ulp `ln` divergence between libm builds — the same
treatment the ANN queries give cosine similarity.

The reference has no retrieval surface (its text search is trigram
LIKE, schema.py:294-297 — operators/text.py); this module is part of
the engine's beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEC = "decimal(24,12)"


def _pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term) pairs with per-doc positions collapsed: tf per pair,
    dl per doc (computed once from the same tokenization)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    return toks


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under Okapi BM25
    (Robertson/Sparck Jones; the Lucene-style +1 idf form, which never
    goes negative).

    Only documents containing at least one query term are scored or
    ranked — the relational analogue of walking the query terms'
    postings lists.  Returns (doc_id, score, rn), deterministically
    tie-broken by doc_id.
    """
    toks = _pairs(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))

    # corpus scalars as 1-row broadcast frames (never via the driver)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    avgdl = dl.agg(
        (
            F.sum(F.col("dl").cast("bigint")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl")
    )

    # df only for the query's terms: the isin prunes before the groupBy
    qtf = tf.filter(F.col("term").isin(terms))
    df_ = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.col("avgdl"))
    )
    contrib = idf * ((F.col("tf") * F.lit(k1 + 1.0)) / norm)

    scored = (
        qtf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .select(F.col(id_col), contrib.alias("contrib"))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("contrib").cast(DEC)).cast("double"), 6
            ).alias("score")
        )
    )
    # top-k via orderBy+limit (physical TakeOrderedAndProject — per-
    # partition heaps + a k-row merge, never a single-partition global
    # sort); the row_number window then runs over just those k rows.
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rn", F.row_number().over(w)).select(
        id_col, "score", "rn"
    )


def sql_bm25_topk(
    table: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_topk — identical expression shape so the
    operand doubles match bit-for-bit before the rounded sum."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}
),
toks_ne AS (SELECT * FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks_ne GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks_ne GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM {table}),
ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
qtf AS (SELECT * FROM tf WHERE term IN ({term_list})),
dfq AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY 1),
contrib AS (
  SELECT qtf.doc_id,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * ((tf * {k1 + 1.0}) / (tf + {k1} * ({1.0 - b} + {b} * (dl / avgdl))))
           AS contrib
  FROM qtf JOIN dfq USING (term) JOIN dl USING (doc_id), nd, ad
),
scored AS (
  SELECT doc_id,
         ROUND(CAST(SUM(CAST(contrib AS DECIMAL(24,12))) AS DOUBLE), 6)
           AS score
  FROM contrib GROUP BY 1
)
SELECT doc_id, score, rn FROM (
  SELECT doc_id, score,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def tfidf_top_terms(
    docs: DataFrame,
    per_doc: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Each document's `per_doc` most characteristic terms by TF-IDF
    (ltc-style: (1+ln tf) · ln(N/df), rounded to 6 dp) — the corpus
    summarization / keyword-mining primitive.  One explode, two keyed
    aggregations, one broadcast scalar; ranking is a per-doc window
    (keyed — never a global sort)."""
    toks = _pairs(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    weight = F.round(
        (F.lit(1.0) + F.log(F.col("tf").cast("double")))
        * F.log(F.col("n_docs") / F.col("df")),
        6,
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(F.col(id_col), "term", weight.alias("tfidf"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_doc)
        .select(id_col, "term", "tfidf", "rn")
    )


def sql_tfidf_top_terms(table: str, per_doc: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}
),
toks_ne AS (SELECT * FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks_ne GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM {table}),
wtd AS (
  SELECT doc_id, term,
         ROUND((1.0 + ln(CAST(tf AS DOUBLE))) * ln(n_docs / df), 6)
           AS tfidf
  FROM tf JOIN dfq USING (term), nd
)
SELECT doc_id, term, tfidf, rn FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rn
  FROM wtd
) WHERE rn <= {per_doc}
"""
