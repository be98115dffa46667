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


class TestPackEfficiency:
    def test_fill_waste_overflow(self, spark):
        # Pre-packed assignment: group 0 has seq 0 = 10+3 tokens
        # (overflow past budget 10), seq 1 = 4 tokens; group 1 has
        # seq 0 = 10 exactly.
        packed = spark.createDataFrame(
            [
                (1, 10, 0, 0),
                (2, 3, 0, 0),
                (3, 4, 0, 1),
                (4, 10, 1, 0),
            ],
            "doc_id long, n_tokens long, pack_group int, seq_id int",
        )
        from drune_spark.operators.packing import pack_efficiency

        out = {
            r["pack_group"]: r
            for r in pack_efficiency(packed, budget=10).collect()
        }
        g0 = out[0]
        assert (g0["n_seqs"], g0["n_docs"], g0["sum_tokens"]) == (2, 3, 17)
        assert g0["n_overflow"] == 1
        # fill = (min(13,10) + min(4,10)) / 20, waste = (0 + 6) / 20
        assert g0["fill_ppm"] == 700_000
        assert g0["waste_ppm"] == 300_000
        assert g0["fill_ppm"] + g0["waste_ppm"] == 1_000_000
        g1 = out[1]
        assert g1["fill_ppm"] == 1_000_000 and g1["waste_ppm"] == 0
        assert g1["n_overflow"] == 0

    def test_inexact_division_complement(self, spark):
        # 3 seqs, budget 10, fills 9/10/10: fill = 29e6 div 30 =
        # 966_666; waste is the EXACT complement (33_334), not an
        # independent floor (which would read 33_333 and leak 1 ppm).
        packed = spark.createDataFrame(
            [(1, 9, 0, 0), (2, 10, 0, 1), (3, 10, 0, 2)],
            "doc_id long, n_tokens long, pack_group int, seq_id int",
        )
        from drune_spark.operators.packing import pack_efficiency

        r = pack_efficiency(packed, budget=10).collect()[0]
        assert r["fill_ppm"] == 966_666
        assert r["waste_ppm"] == 33_334
        assert r["fill_ppm"] + r["waste_ppm"] == 1_000_000

    def test_budget_guard(self, spark):
        packed = spark.createDataFrame(
            [(1, 10, 0, 0)],
            "doc_id long, n_tokens long, pack_group int, seq_id int",
        )
        from drune_spark.operators.packing import pack_efficiency

        with pytest.raises(ValueError, match="budget"):
            pack_efficiency(packed, budget=0)


class TestPackMaskAudit:
    def test_cross_pair_math(self, spark):
        # seq (0,0): docs of 3 and 2 tokens -> T=5, ss=13,
        # cross = (25-13)/2 = 6 = 3*2; pairs = (25-5)/2 = 10.
        # seq (0,1): single doc -> zero leakage.
        packed = spark.createDataFrame(
            [(1, 3, 0, 0), (2, 2, 0, 0), (3, 7, 0, 1)],
            "doc_id long, n_tokens long, pack_group int, seq_id int",
        )
        from drune_spark.operators.packing import pack_mask_audit

        out = {(r["pack_group"], r["seq_id"]): r
               for r in pack_mask_audit(packed).collect()}
        s0 = out[(0, 0)]
        assert (s0["n_docs"], s0["total_tokens"]) == (2, 5)
        assert s0["cross_pairs"] == 6
        assert s0["leak_ppm"] == 12 * 1_000_000 // 20
        s1 = out[(0, 1)]
        assert s1["cross_pairs"] == 0 and s1["leak_ppm"] == 0

    def test_single_token_sequence_no_div0(self, spark):
        packed = spark.createDataFrame(
            [(1, 1, 0, 0)],
            "doc_id long, n_tokens long, pack_group int, seq_id int",
        )
        from drune_spark.operators.packing import pack_mask_audit

        r = pack_mask_audit(packed).collect()[0]
        assert r["cross_pairs"] == 0 and r["leak_ppm"] == 0


class TestClusterSplit:
    def test_near_dups_share_split(self, spark):
        from drune_spark.operators.dedup import cluster_split

        docs = spark.createDataFrame(
            [(i,) for i in range(1, 9)], "doc_id long"
        )
        # Clusters: {1,2,3} (chained pairs), {4,5}; 6-8 singletons.
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
        )
        rows = cluster_split(
            docs, pairs, "doc_id",
            fractions={"train": 0.8, "test": 0.2}, salt="t1",
        ).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert len(by_id) == 8  # singletons get rows too
        assert len({by_id[i]["split"] for i in (1, 2, 3)}) == 1
        assert len({by_id[i]["cluster_id"] for i in (1, 2, 3)}) == 1
        assert by_id[4]["split"] == by_id[5]["split"]
        assert all(r["split"] in ("train", "test") for r in rows)

    def test_fraction_holdout_and_guard(self, spark):
        from drune_spark.operators.dedup import cluster_split

        docs = spark.createDataFrame([(i,) for i in range(20)],
                                     "doc_id long")
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        rows = cluster_split(
            docs, pairs, "doc_id", fractions={"train": 0.5}, salt="t2"
        ).collect()
        splits = {r["split"] for r in rows}
        assert None in splits and "train" in splits  # holdout stays NULL
        with pytest.raises(ValueError, match="fractions"):
            cluster_split(docs, pairs, "doc_id",
                          fractions={"a": 0.9, "b": 0.2})


class TestChatOps:
    def _turns(self, spark):
        return spark.createDataFrame(
            [
                # conv 1: clean user/assistant alternation
                (1, 0, "user", 5),
                (1, 1, "assistant", 7),
                (1, 2, "user", 3),
                (1, 3, "assistant", 4),
                # conv 2: assistant-first, a repeat, an empty turn,
                # trailing user
                (2, 0, "assistant", 6),
                (2, 1, "assistant", 2),
                (2, 2, "user", 0),
            ],
            "conv_id long, turn_idx long, role string, n_tokens long",
        )

    def test_lint_flags(self, spark):
        from drune_spark.operators.chat import chat_lint

        out = {r["conv_id"]: r for r in chat_lint(self._turns(spark)).collect()}
        c1 = out[1]
        assert (c1["n_turns"], c1["n_user"], c1["n_assistant"]) == (4, 2, 2)
        assert c1["n_role_repeats"] == 0 and c1["n_empty"] == 0
        assert c1["starts_user"] and c1["ends_assistant"] and c1["ok"]
        c2 = out[2]
        assert c2["n_role_repeats"] == 1
        assert c2["n_empty"] == 1
        assert not c2["starts_user"] and not c2["ends_assistant"]
        assert not c2["ok"]

    def test_truncate_keeps_whole_turn_suffix(self, spark):
        from drune_spark.operators.chat import chat_truncate

        out = chat_truncate(self._turns(spark), budget=8).collect()
        kept = {(r["conv_id"], r["turn_idx"]): r["suffix_tokens"] for r in out}
        # conv 1 suffixes from newest: 4, 7, 14, 19 -> keep turns 3, 2
        assert kept == {
            (1, 3): 4, (1, 2): 7,
            # conv 2 suffixes: 0, 2, 8 -> all three fit in 8
            (2, 2): 0, (2, 1): 2, (2, 0): 8,
        }

    def test_truncate_oversized_newest_turn_drops_conv(self, spark):
        from drune_spark.operators.chat import chat_truncate

        turns = spark.createDataFrame(
            [(9, 0, "user", 3), (9, 1, "assistant", 100)],
            "conv_id long, turn_idx long, role string, n_tokens long",
        )
        assert chat_truncate(turns, budget=50).count() == 0
        with pytest.raises(ValueError, match="budget"):
            chat_truncate(turns, budget=0)


class TestChatLossMask:
    def test_accounting(self, spark):
        from drune_spark.operators.chat import chat_loss_mask

        turns = spark.createDataFrame(
            [
                (1, 0, "user", 5),
                (1, 1, "assistant", 7),
                (1, 2, "user", 3),
                (1, 3, "assistant", 4),
            ],
            "conv_id long, turn_idx long, role string, n_tokens long",
        )
        r = chat_loss_mask(turns).collect()[0]
        assert (r["n_turns"], r["context_tokens"],
                r["trainable_tokens"], r["total_tokens"]) == (4, 8, 11, 19)
        assert r["trainable_ppm"] == 11_000_000 // 19


class TestPreferencePairs:
    def test_pair_mining_and_ties(self, spark):
        from drune_spark.operators.preference import preference_pairs

        df = spark.createDataFrame(
            [
                # group 0: clear winner/loser
                (0, 10, 5), (0, 11, 9), (0, 12, 2),
                # group 1: all tied -> chosen lowest id, rejected highest
                (1, 20, 7), (1, 21, 7), (1, 22, 7),
                # group 2: singleton -> dropped
                (2, 30, 4),
            ],
            "grp long, cid long, score long",
        )
        out = {r["grp"]: r for r in
               preference_pairs(df, "grp", "cid", "score").collect()}
        assert set(out) == {0, 1}
        g0 = out[0]
        assert (g0["chosen_id"], g0["chosen_score"]) == (11, 9)
        assert (g0["rejected_id"], g0["rejected_score"]) == (12, 2)
        assert g0["margin"] == 7
        g1 = out[1]
        assert (g1["chosen_id"], g1["rejected_id"]) == (20, 22)
        assert g1["margin"] == 0
        assert g1["chosen_id"] != g1["rejected_id"]


class TestGroupAdvantage:
    def test_hand_computed(self, spark):
        from drune_spark.operators.preference import group_advantage

        df = spark.createDataFrame(
            [
                # group 0: scores 1, 3 -> m2 = 2*10 - 16 = 4, den = 2;
                # num = r*2 - 4 -> -2 / +2 -> adv -1000 / +1000
                (0, 1, 1), (0, 2, 3),
                # group 1: zero variance -> adv 0
                (1, 3, 5), (1, 4, 5),
            ],
            "grp long, cid long, score long",
        )
        out = {r["cid"]: r["adv_milli"] for r in
               group_advantage(df, "grp", "cid", "score").collect()}
        assert out == {1: -1000, 2: 1000, 3: 0, 4: 0}


class TestNeedleInsert:
    def test_exact_splice_positions(self, spark):
        import hashlib

        from drune_spark.operators.text_analysis import needle_insert

        docs = spark.createDataFrame(
            [
                (0, "a b c d"),    # depth 0%  -> needle first
                (2, "a b c d"),    # depth 50% -> after 2 tokens
                (4, "a b c d"),    # depth 100% -> needle last
                (5, "   "),        # whitespace-only -> excluded
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               needle_insert(docs, depth_levels=5).collect()}
        assert set(out) == {0, 2, 4}
        expect = {
            0: "NDL0 a b c d",
            2: "a b NDL2 c d",
            4: "a b c d NDL4",
        }
        for did, text in expect.items():
            r = out[did]
            assert r["n_tokens"] == 4
            assert r["fp"] == hashlib.md5(text.encode()).hexdigest()[:8]
        assert (out[0]["insert_pos"], out[2]["insert_pos"],
                out[4]["insert_pos"]) == (0, 2, 4)

    def test_depth_levels_guard(self, spark):
        from drune_spark.operators.text_analysis import needle_insert

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="depth_levels"):
            needle_insert(docs, depth_levels=1)


class TestTerminalPunct:
    def test_per_source_rates(self, spark):
        from drune_spark.operators.text_analysis import (
            terminal_punct_screen,
        )

        docs = spark.createDataFrame(
            [
                ("a", "ends well."),
                ("a", "ends badly"),
                ("a", "quoted end?"),
                ("b", "trailing spaces !   "),
            ],
            "source string, text string",
        )
        out = {r["source"]: r
               for r in terminal_punct_screen(docs).collect()}
        assert (out["a"]["n_docs"], out["a"]["n_clean"]) == (3, 2)
        assert out["a"]["clean_ppm"] == 2_000_000 // 3
        # rtrim before the last-char test: trailing whitespace is clean
        assert (out["b"]["n_clean"], out["b"]["clean_ppm"]) == (1, 1_000_000)


class TestRecencyWeights:
    def test_decay_buckets(self, spark):
        import datetime as dt

        from drune_spark.operators.sampling import recency_weights

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0 + dt.timedelta(days=6)),   # newest -> bucket 0, w 64
            (2, t0 + dt.timedelta(days=5)),   # 1 day old -> bucket 1, 32
            (3, t0),                          # oldest -> bucket 6, w 1
            (4, None),                        # NULL ts dropped
        ]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        out = {r["event_id"]: r for r in
               recency_weights(df, base=64, buckets=6).collect()}
        assert set(out) == {1, 2, 3}
        assert (out[1]["age_bucket"], out[1]["weight"]) == (0, 64)
        assert (out[2]["age_bucket"], out[2]["weight"]) == (1, 32)
        assert (out[3]["age_bucket"], out[3]["weight"]) == (6, 1)

    def test_param_guard(self, spark):
        from drune_spark.operators.sampling import recency_weights

        df = spark.createDataFrame([(1,)], "event_id long").withColumn(
            "ts", F.current_timestamp()
        )
        with pytest.raises(ValueError, match="recency_weights"):
            recency_weights(df, base=0)


class TestAudioClipping:
    def test_counts_match_python_replay(self, spark):
        from drune_spark.operators.multimodal import (
            audio_clipping,
            synth_samples,
            synthesize_audio,
        )

        docs = spark.createDataFrame([(3,), (10,)], "doc_id long")
        got = {
            r["media_id"]: r
            for r in audio_clipping(
                synthesize_audio(docs), gain_milli=20_000
            ).collect()
        }
        for did in (3, 10):
            _rate, arr = synth_samples(did)
            flat = [int(v) for row in arr for v in row]
            clipped = [
                j + 1 for j, v in enumerate(flat)
                if abs(v * 20_000) > 32_767_000
            ]
            r = got[did]
            assert r["n_samples"] == len(flat)
            assert r["n_clipped"] == len(clipped)
            assert r["clip_pos_sum"] == sum(clipped)
            assert r["clip_ppm"] == len(clipped) * 1_000_000 // len(flat)

    def test_no_gain_no_clipping(self, spark):
        from drune_spark.operators.multimodal import (
            audio_clipping,
            synthesize_audio,
        )

        docs = spark.createDataFrame([(1,)], "doc_id long")
        r = audio_clipping(
            synthesize_audio(docs), gain_milli=1_000
        ).collect()[0]
        # synth samples stay within ±2048 — unity gain never clips
        assert r["n_clipped"] == 0 and r["clip_pos_sum"] == 0
