"""BPE vocabulary induction (operators/vocab.py).

The distributed trainer is pinned MERGE-FOR-MERGE against a pure-Python
reference BPE on fixture data — the strongest available check for an
iterated argmax that no SQL oracle can express (the per-iteration merge
decision feeds the next iteration's counts).
"""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from vcf_pg_loader_spark.operators import vocab as V


def reference_bpe(texts, n_merges, min_count=2):
    """Greedy left-to-right BPE on a word-frequency dict: count desc,
    lexicographic (a, b) tie-break — the exact spec train_bpe claims."""
    wc = collections.Counter(w for t in texts for w in t.split() if w)
    syms = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: collections.Counter = collections.Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        best_cnt = max(pc.values())
        if best_cnt < min_count:
            break
        pair = min(p for p, c in pc.items() if c == best_cnt)
        merges.append(pair)
        a, b = pair
        for w, s in syms.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return merges, syms, wc


def _texts(spark, sf_dir):
    return [
        r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .limit(300)
        .collect()
    ]


class TestTrainBPE:
    def test_merges_match_reference(self, spark, sf_dir):
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .limit(300)
        )
        texts = _texts(spark, sf_dir)
        got = V.train_bpe(docs, n_merges=24)
        want, _, _ = reference_bpe(texts, 24)
        assert got == want
        assert len(got) > 5  # the corpus supports real merges

    def test_vocab_counts_match_reference(self, spark, sf_dir):
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .limit(300)
        )
        texts = _texts(spark, sf_dir)
        merges = V.train_bpe(docs, n_merges=12)
        vocab = {
            r.token: r.cnt for r in V.bpe_vocab(docs, merges).collect()
        }
        _, syms, wc = reference_bpe(texts, 12)
        want: collections.Counter = collections.Counter()
        for w, c in wc.items():
            for s in syms[w]:
                want[s] += c
        assert vocab == dict(want)

    def test_apply_bpe_lossless(self, spark):
        df = spark.createDataFrame(
            [(1, "low lower lowest"), (2, "new newer newest")],
            "doc_id int, text string",
        )
        merges = V.train_bpe(df, n_merges=6, min_pair_count=1)
        out = V.apply_bpe(df, merges).collect()
        for r in out:
            # concatenating the BPE tokens reconstructs the words
            assert "".join(r.bpe_tokens) == r.text.replace(" ", "")

    def test_arrow_encoder_equals_expression_path(self, spark, sf_dir):
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .limit(200)
        )
        merges = V.train_bpe(docs, n_merges=20)
        assert len(merges) >= 10
        expr = {
            r.doc_id: r.bpe_tokens
            for r in V.apply_bpe(docs, merges).collect()
        }
        arrow = {
            r.doc_id: r.bpe_tokens
            for r in V.apply_bpe_arrow(docs, merges).collect()
        }
        assert expr == arrow

    def test_early_stop_on_min_count(self, spark):
        df = spark.createDataFrame(
            [(1, "ab cd ef")], "doc_id int, text string"
        )
        # every pair is a hapax: with min_pair_count=2 nothing merges
        assert V.train_bpe(df, n_merges=5, min_pair_count=2) == []

    def test_merge_fold_is_greedy_left_to_right(self, spark):
        df = spark.createDataFrame([(1,)], "doc_id int").select(
            F.lit("aaa aaaa").alias("text")
        )
        syms = V.to_symbol_table(V.word_counts(df)).select(
            V.merge_pair_expr(F.col("syms"), "a", "a").alias("m")
        )
        got = sorted(tuple(r.m) for r in syms.collect())
        assert got == [("aa", "a"), ("aa", "aa")]
