"""Round-9 operator tests: unified contamination report (planted
exact / paraphrase / url-only hits — VERDICT r8 #6), per-doc BPE token
counts feeding the packing path (VERDICT r8 #5)."""

import pytest
from pyspark.sql import functions as F


class TestContaminationReport:
    def _frames(self, spark):
        # Eval doc 100 carries the leaked text; eval doc 101 the URL.
        eval_docs = spark.createDataFrame(
            [
                (100, "the quick brown fox jumps over the lazy dog"),
                (101, "completely unrelated benchmark prompt here now"),
            ],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                # exact leak: same text as eval 100 -> many shared 3-grams
                (1, "the quick brown fox jumps over the lazy dog"),
                # paraphrase: zero shared 3-grams, near-identical vector
                (2, "speedy auburn vulpine leaps above sleepy canine"),
                # url-only: unique text, unique vector, shared page
                (3, "totally different words about weather patterns"),
                # clean
                (4, "unremarkable clean document nothing shared anywhere"),
            ],
            "doc_id long, text string",
        )
        corpus_emb = spark.createDataFrame(
            [
                (1, [0.0, 1.0]),
                (2, [1.0, 0.05]),
                (3, [0.0, -1.0]),
                (4, [-1.0, 0.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        # Both eval vectors point along +x: orthogonal (or opposite) to
        # every corpus vector except doc 2's near-copy [1.0, 0.05].
        eval_emb = spark.createDataFrame(
            [(100, [1.0, 0.0]), (101, [1.0, 0.0])],
            "eval_id long, embedding array<float>",
        )
        corpus_urls = spark.createDataFrame(
            [
                (1, "https://a.example.com/one?id=1"),
                (2, "https://b.example.com/two?id=2"),
                (3, "HTTPS://WWW.Example.com:443/page?id=5&utm_source=x"),
                (4, "https://d.example.com/four?id=4"),
            ],
            "doc_id long, url string",
        )
        eval_urls = spark.createDataFrame(
            [
                (100, "https://eval.example.com/q100?id=100"),
                (101, "https://example.com/page/?id=5"),
            ],
            "doc_id long, url string",
        )
        return eval_docs, corpus, corpus_emb, eval_emb, corpus_urls, eval_urls

    def test_three_way_flags(self, spark):
        from drune_spark.operators.dedup import contamination_report

        (eval_docs, corpus, corpus_emb, eval_emb,
         corpus_urls, eval_urls) = self._frames(spark)
        rep = {
            r["doc_id"]: r
            for r in contamination_report(
                corpus, eval_docs, corpus_emb, eval_emb,
                corpus_urls, eval_urls,
                k=3, min_shared=2, threshold=0.4,
            ).collect()
        }
        assert len(rep) == 4  # every corpus doc gets a row
        assert (rep[1]["ngram_hit"], rep[1]["semantic_hit"],
                rep[1]["url_hit"]) == (True, False, False)
        assert rep[1]["n_shared_ngrams"] >= 2
        assert (rep[2]["ngram_hit"], rep[2]["semantic_hit"],
                rep[2]["url_hit"]) == (False, True, False)
        assert (rep[3]["ngram_hit"], rep[3]["semantic_hit"],
                rep[3]["url_hit"]) == (False, False, True)
        assert (rep[4]["ngram_hit"], rep[4]["semantic_hit"],
                rep[4]["url_hit"]) == (False, False, False)
        assert [rep[i]["contaminated"] for i in (1, 2, 3, 4)] == [
            True, True, True, False,
        ]

    def test_doc_without_embedding_cannot_fire_semantic(self, spark):
        from drune_spark.operators.dedup import contamination_report

        (eval_docs, corpus, corpus_emb, eval_emb,
         corpus_urls, eval_urls) = self._frames(spark)
        rep = {
            r["doc_id"]: r
            for r in contamination_report(
                corpus, eval_docs,
                corpus_emb.filter("vec_id <> 2"), eval_emb,
                corpus_urls, eval_urls,
                k=3, min_shared=2, threshold=0.4,
            ).collect()
        }
        assert rep[2]["semantic_hit"] is False
        assert rep[2]["contaminated"] is False


class TestBpeTokenCounts:
    def test_counts_match_replace_chain(self, spark):
        from drune_spark.operators.bpe import bpe_token_counts

        docs = spark.createDataFrame(
            [
                (1, "low low lowest"),
                (2, "o l d"),
            ],
            "doc_id long, text string",
        )
        # 'l o' -> 'lo': low -> [lo, w] (2), lowest -> [lo, w, e, s, t]
        # (5); single letters untouched (1 each).
        got = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_token_counts(docs, [("l o", "lo")]).collect()
        }
        assert got == {1: 2 + 2 + 5, 2: 3}

    def test_no_merges_counts_chars(self, spark):
        from drune_spark.operators.bpe import bpe_token_counts

        docs = spark.createDataFrame(
            [(1, "ab cde")], "doc_id long, text string"
        )
        got = bpe_token_counts(docs, []).collect()
        assert got[0]["n_bpe_tokens"] == 5
