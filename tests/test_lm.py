"""Bigram-LM scoring (operators/lm.py): fluent-under-the-corpus text
scores lower NLL than garbled text, bigram accounting is exact, and
unscorable docs (no bigram) are absent rather than null."""

from __future__ import annotations

from vcf_pg_loader_spark.operators.lm import doc_nll


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestDocNLL:
    def test_fluent_beats_garbled(self, spark):
        common = "the quick brown fox jumps over the lazy dog"
        rows = [(i, common) for i in range(20)]
        rows.append((100, common))  # fluent: every bigram seen 21 times
        rows.append((101, "zq xv jk wp mn bg td lr cs fh"))  # all-unseen
        out = {r.doc_id: r.nll for r in doc_nll(_df(spark, rows)).collect()}
        assert out[100] < out[101]
        # the garbled doc's bigrams each occur once in a large vocab:
        # clearly worse than the 21-fold repeated phrase
        assert out[101] - out[100] > 1.0

    def test_bigram_counts_and_unscorable_docs(self, spark):
        rows = [(1, "a b c d"), (2, "solo"), (3, ""), (4, "x y")]
        out = {r.doc_id: r.n_bigrams for r in doc_nll(_df(spark, rows)).collect()}
        assert out == {1: 3, 4: 1}  # docs 2 and 3 have no bigram

    def test_no_python_in_plan(self, spark):
        rows = [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(50)]
        plan = (
            doc_nll(_df(spark, rows))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan and "Arrow" not in plan
        # bigrams are built array-side (round 8): adjacency never pays
        # an exchange, so no window may partition by the document id.
        # The one allowed window is the VOCABULARY-sized c1 lookup
        # (partitioned by w1 — optimization round 15: c(w1) = Σ_w2
        # c12(w1, w2) attached over the c12 aggregate, replacing a
        # second corpus-wide bigram aggregation).
        assert "windowspecdefinition(doc_id" not in plan
        assert "windowspecdefinition(w1" in plan
        assert "Sort" not in plan.split("HashAggregate")[-1]
