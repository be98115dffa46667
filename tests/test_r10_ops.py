"""Round-10 operator tests: suffix-array-grade span dedup (VERDICT r9
#5 — planted known-overlap graph incl. within-doc repeats and
first-occurrence retention), baseline JPEG codec (VERDICT r9 #6 —
exact constant-block roundtrips, exact YCbCr color path, structural
gradient/noise bounds, progressive rejection), token-level
decontamination (VERDICT r9 #7 — the planted paraphrase-vs-token-exact
separation), and the whole-doc BPE token stream equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- jpegio


class TestJpegCodec:
    def test_constant_block_grayscale_exact(self):
        from drune_spark.operators.jpegio import decode_jpeg, encode_jpeg

        flat16 = np.full((8, 8), 16, dtype=np.int64)
        img = np.zeros((12, 20), dtype=np.uint8)
        for by in range(2):
            for bx in range(3):
                img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    2 * ((5 * bx + 3 * by + 7) % 64) + 64
                )
        dec = decode_jpeg(encode_jpeg(img, quant_luma=flat16))
        assert dec.shape == (12, 20, 1)
        assert np.array_equal(dec[..., 0], img)

    def test_synth_blocks_exact_for_every_dim_class(self):
        from drune_spark.operators.jpegio import decode_jpeg, encode_jpeg
        from drune_spark.operators.multimodal import synth_jpeg_blocks

        flat16 = np.full((8, 8), 16, dtype=np.int64)
        # ids 0..5 cover all (w, h) residue classes
        for did in range(6):
            img = synth_jpeg_blocks(did)
            dec = decode_jpeg(encode_jpeg(img, quant_luma=flat16))
            assert np.array_equal(dec, img), did

    def test_gradient_default_tables_bounded(self):
        from drune_spark.operators.jpegio import decode_jpeg, encode_jpeg

        g = (np.arange(48 * 64).reshape(48, 64) % 256).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(g))[..., 0].astype(int)
        # lossy but sane: smooth ramps stay within a tight band
        assert np.abs(dec - g.astype(int)).max() <= 12

    def test_noise_roundtrip_structurally_valid(self):
        from drune_spark.operators.jpegio import decode_jpeg, encode_jpeg

        rng = np.random.RandomState(7)
        noise = rng.randint(0, 256, (24, 40)).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(noise))
        # exercises dense AC symbols, ZRL and EOB paths; bound is the
        # worst-case quantization error of the Annex K luma table
        assert dec.shape == (24, 40, 1)
        assert np.abs(
            dec[..., 0].astype(int) - noise.astype(int)
        ).max() <= 128

    def test_ycbcr_color_path_exact_integer_conversion(self):
        from drune_spark.operators.jpegio import (
            decode_jpeg,
            encode_jpeg,
            ycbcr_to_rgb_int,
        )

        flat16 = np.full((8, 8), 16, dtype=np.int64)
        # even-valued constant planes -> DC-only, bit-exact YCbCr
        # recovery; decoded RGB must equal the documented fixed-point
        # conversion of those planes digit for digit
        ycc = np.zeros((16, 24, 3), dtype=np.uint8)
        ycc[..., 0] = 90
        ycc[..., 1] = 60
        ycc[..., 2] = 180
        dec = decode_jpeg(
            encode_jpeg(
                ycc, quant_luma=flat16, quant_chroma=flat16,
                from_ycbcr=True,
            )
        )
        want = ycbcr_to_rgb_int(ycc[..., 0], ycc[..., 1], ycc[..., 2])
        assert np.array_equal(dec, want)
        # and the fixed-point constants follow the documented formula
        assert want[0, 0, 0] == min(
            255, max(0, 90 + ((91881 * (180 - 128) + 32768) >> 16))
        )

    def test_420_subsampling_constant_chroma_exact(self):
        from drune_spark.operators.jpegio import (
            decode_jpeg,
            encode_jpeg,
            ycbcr_to_rgb_int,
        )

        flat16 = np.full((8, 8), 16, dtype=np.int64)
        # constant chroma survives box-average subsampling exactly;
        # per-16x16-constant even luma survives DC-only quantization
        ycc = np.zeros((20, 28, 3), dtype=np.uint8)
        ycc[..., 0] = 120
        ycc[:, :16, 0] = 84
        ycc[..., 1] = 100
        ycc[..., 2] = 140
        dec = decode_jpeg(
            encode_jpeg(
                ycc, quant_luma=flat16, quant_chroma=flat16,
                subsample=(2, 2), from_ycbcr=True,
            )
        )
        want = ycbcr_to_rgb_int(ycc[..., 0], ycc[..., 1], ycc[..., 2])
        assert dec.shape == (20, 28, 3)
        assert np.array_equal(dec, want)

    def test_progressive_rejected_loudly(self):
        from drune_spark.operators.jpegio import decode_jpeg, encode_jpeg

        data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC2  # masquerade as progressive
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(bytes(data))

    def test_sniff_dispatch(self):
        from drune_spark.operators.imageio import sniff_and_decode
        from drune_spark.operators.jpegio import encode_jpeg

        img = np.full((8, 8), 100, dtype=np.uint8)
        out = sniff_and_decode(encode_jpeg(img))
        assert out.shape == (8, 8, 1)


# --------------------------------------------------------- suffix_spans


class TestSuffixSpans:
    def _docs(self, spark):
        shared = " ".join(f"tok{i}" for i in range(40))
        rep = " ".join(f"rep{i}" for i in range(8))
        return spark.createDataFrame(
            [
                # doc 1: first occurrence of the 40-token run — KEPT
                (1, shared + " unique one tail here"),
                # doc 2: verbatim copy — CUT
                (2, "lead in words " + shared),
                # doc 3: internal repeat: the same 8-token run twice
                # with k=8 — second occurrence CUT (within-doc dup)
                (3, rep + " gap alpha beta gamma delta epsilon zeta "
                    + rep),
                # doc 4: clean
                (4, " ".join(f"solo{i}" for i in range(50))),
            ],
            "doc_id long, text string",
        )

    def test_planted_cross_doc_span(self, spark):
        from drune_spark.operators.dedup import suffix_spans

        out = suffix_spans(self._docs(spark), "text", "doc_id", k=8)
        rows = {(r.doc_id, r.span_start, r.span_end): r.span_tokens
                for r in out.collect()}
        # doc 2's copy starts at token 3 (after "lead in words"),
        # covers all 40 shared tokens: gram starts 3..35, span
        # [3, 35+7] = [3, 42], 40 tokens
        assert (2, 3, 42) in rows
        assert rows[(2, 3, 42)] == 40
        # doc 1 keeps its copy: no doc-1 span overlapping [0, 39]
        assert not any(d == 1 for d, s, e in rows)

    def test_within_doc_repeat_cut(self, spark):
        from drune_spark.operators.dedup import suffix_spans

        out = suffix_spans(self._docs(spark), "text", "doc_id", k=8)
        d3 = [r for r in out.collect() if r.doc_id == 3]
        # rep run is 8 tokens; second occurrence starts at token 15
        assert len(d3) == 1
        assert (d3[0].span_start, d3[0].span_end) == (15, 22)
        assert d3[0].span_tokens == 8

    def test_clean_doc_absent(self, spark):
        from drune_spark.operators.dedup import suffix_spans

        out = suffix_spans(self._docs(spark), "text", "doc_id", k=8)
        assert not [r for r in out.collect() if r.doc_id == 4]

    def test_k_guard(self, spark):
        from drune_spark.operators.dedup import suffix_spans

        with pytest.raises(ValueError):
            suffix_spans(self._docs(spark), "text", "doc_id", k=1)


# ------------------------------------------------- bpe_token_stream


class TestBpeTokenStream:
    MERGES = [("t h", "th"), ("th e", "the"), ("i n", "in")]

    def test_order_preserved(self, spark):
        from drune_spark.operators.bpe import bpe_token_stream

        df = spark.createDataFrame(
            [(1, "the thin cat")], "doc_id long, text string"
        )
        row = bpe_token_stream(df, self.MERGES).collect()[0]
        # 'the' -> the; 'thin' -> th i n -> th in; 'cat' -> c a t
        assert row.toks == ["the", "th", "in", "c", "a", "t"]

    def test_multiset_matches_bpe_apply(self, spark):
        from drune_spark.operators.bpe import bpe_apply, bpe_token_stream

        df = spark.createDataFrame(
            [
                (1, "the thin cat  sat   on\tthe mat"),
                (2, "in the beginning there was the token"),
            ],
            "doc_id long, text string",
        )
        hist = {
            (r.token, r.n_occurrences)
            for r in bpe_apply(df, self.MERGES).collect()
        }
        stream = (
            bpe_token_stream(df, self.MERGES)
            .select(F.explode("toks").alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert {(r.token, r.n) for r in stream.collect()} == hist


# ---------------------------------------------------- token_ngram_decon


class TestTokenDecon:
    MERGES = [("t h", "th"), ("th e", "the")]

    def test_verbatim_vs_paraphrase_separation(self, spark):
        from drune_spark.operators.dedup import token_ngram_decon

        leak = "alpha beta gamma delta epsilon zeta eta theta"
        train = spark.createDataFrame(
            [
                (1, "preface words " + leak + " closing remark"),
                (2, "unrelated training document about other things"),
            ],
            "doc_id long, text string",
        )
        eval_df = spark.createDataFrame(
            [
                # verbatim: shares the full 8-word run
                (100, leak),
                # paraphrase: same words, shuffled. With a shallow
                # (2-merge) BPE the stream is character-grain, so n
                # must exceed any single word's token run — n=13 spans
                # 2-3 words and only ORDER-preserving runs survive
                (101, "theta alpha delta beta zeta gamma eta epsilon"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in token_ngram_decon(
                train, eval_df, self.MERGES, n=13, min_shared=1
            ).collect()
        }
        assert out[100].contaminated == 1
        assert out[100].n_train_docs == 1
        assert out[101].contaminated == 0
        assert out[101].n_hit_grams == 0
        # report includes the clean doc (LEFT join semantics)
        assert set(out) == {100, 101}

    def test_short_eval_doc_zero_grams(self, spark):
        from drune_spark.operators.dedup import token_ngram_decon

        train = spark.createDataFrame(
            [(1, "some training text here")], "doc_id long, text string"
        )
        eval_df = spark.createDataFrame(
            [(100, "too short")], "doc_id long, text string"
        )
        row = token_ngram_decon(
            train, eval_df, self.MERGES, n=13
        ).collect()[0]
        assert row.n_token_grams == 0
        assert row.contaminated == 0

    def test_n_guard(self, spark):
        from drune_spark.operators.dedup import token_ngram_decon

        df = spark.createDataFrame(
            [(1, "x")], "doc_id long, text string"
        )
        with pytest.raises(ValueError):
            token_ngram_decon(df, df, self.MERGES, n=1)


# ------------------------------------------------------ watermark_detect


def _md5_u32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


class TestWatermarkDetect:
    def _forced(self, salt: str, n: int, want_green: bool) -> str:
        """Greedy sequential construction (fine in a test; the operator
        itself is position-parallel): pick each next token so the
        bigram hash parity matches."""
        toks = ["seed"]
        for i in range(n):
            for j in range(64):
                cand = f"c{i}x{j}"
                green = _md5_u32(f"{salt}:{toks[-1]}:{cand}") % 2 == 0
                if green == want_green:
                    toks.append(cand)
                    break
            else:
                raise AssertionError("no candidate with wanted parity")
        return " ".join(toks)

    def test_planted_watermark_flagged(self, spark):
        from drune_spark.operators.text_analysis import watermark_detect

        df = spark.createDataFrame(
            [
                (1, self._forced("wm1", 60, True)),   # all green
                (2, self._forced("wm1", 60, False)),  # all red
                (3, "one"),                           # unscorable
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in watermark_detect(df).collect()}
        assert out[1].flagged == 1 and out[1].n_green == 60
        assert out[2].flagged == 0 and out[2].n_green == 0
        assert out[1].green_ppm == 1_000_000
        assert 3 not in out  # < 2 tokens -> nothing to score

    def test_key_dependence(self, spark):
        from drune_spark.operators.text_analysis import watermark_detect

        # a sequence forced green under wm1 is ~half green under a
        # different key — detection requires the key
        df = spark.createDataFrame(
            [(1, self._forced("wm1", 60, True))],
            "doc_id long, text string",
        )
        row = watermark_detect(df, salt="otherkey").collect()[0]
        assert 10 <= row.n_green <= 50


# ------------------------------------------------------------- cdc_dedup


class TestCdcDedup:
    def _boundaries(self, text: str, window: int = 16):
        import hashlib

        return [
            p for p in range(window, len(text) + 1)
            if hashlib.md5(
                text[p - window:p].encode()
            ).hexdigest()[0] == "0"
        ]

    def _long_text(self, seed: int, n: int = 400) -> str:
        import hashlib

        # deterministic APERIODIC pseudo-text (a periodic formula here
        # creates real within-doc duplicate chunks and fails the
        # zero-dup assertions for the right reason)
        return "".join(
            chr(
                97
                + int(
                    hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:4],
                    16,
                )
                % 26
            )
            for i in range(n)
        )

    def test_shift_invariance_catches_prefixed_copy(self, spark):
        from drune_spark.operators.dedup import cdc_dedup
        from drune_spark.operators.packing import cdc_chunks

        a = self._long_text(1)
        # precondition: the body has interior boundaries to re-sync at
        assert len(self._boundaries(a)) >= 2
        df = spark.createDataFrame(
            [(1, a), (2, "XYZ PREFIX SHIFT " + a)],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in cdc_dedup(cdc_chunks(df, window=16)).collect()
        }
        # doc 1 is the first occurrence everywhere: zero dups
        assert out[1].n_dup_chunks == 0
        # doc 2: boundaries re-synchronize after the first unchanged
        # window, so every chunk past the first shared boundary
        # duplicates doc 1 — fixed-width blocking would miss ALL of
        # them (every window shifted by the prefix length)
        assert out[2].n_dup_chunks >= 1
        assert out[2].dup_chars > 0
        assert out[2].dup_ppm > 0

    def test_within_doc_repeat(self, spark):
        from drune_spark.operators.dedup import cdc_dedup
        from drune_spark.operators.packing import cdc_chunks

        s = self._long_text(2, 300)
        assert len(self._boundaries(s)) >= 2
        df = spark.createDataFrame(
            [(1, s + s)], "doc_id long, text string"
        )
        row = cdc_dedup(cdc_chunks(df, window=16)).collect()[0]
        # the second copy re-syncs onto the first's chunking:
        # occurrence-level dedup counts within-doc repeats
        assert row.n_dup_chunks >= 1
        assert row.total_chars == 2 * len(s)

    def test_no_false_dups_on_distinct_docs(self, spark):
        from drune_spark.operators.dedup import cdc_dedup
        from drune_spark.operators.packing import cdc_chunks

        df = spark.createDataFrame(
            [(1, self._long_text(3)), (2, self._long_text(4))],
            "doc_id long, text string",
        )
        rows = cdc_dedup(cdc_chunks(df, window=16)).collect()
        assert all(r.n_dup_chunks == 0 for r in rows)


# ---------------------------------------------------------- prefix_cache


class TestPrefixCacheAudit:
    def test_planted_lcp(self, spark):
        from drune_spark.operators.packing import prefix_cache_audit

        df = spark.createDataFrame(
            [
                (1, "s1", "alpha beta gamma delta"),
                (2, "s1", "alpha beta gamma epsilon"),
                (3, "s1", "alpha beta zeta"),
                (4, "s1", "omega"),
                (5, "s2", "alpha beta gamma delta"),  # other group
            ],
            "doc_id long, source string, text string",
        )
        out = {
            r.doc_id: r for r in prefix_cache_audit(df).collect()
        }
        # sorted s1 order: doc1, doc2, doc3, doc4
        assert out[1].hit_tokens == 0           # first in group
        assert out[2].hit_tokens == 3           # alpha beta gamma
        assert out[3].hit_tokens == 2           # alpha beta
        assert out[4].hit_tokens == 0           # omega shares nothing
        assert out[5].hit_tokens == 0           # alone in s2
        assert out[2].prompt_tokens == 4
        assert out[2].hit_ppm == 750_000

    def test_identical_prompts_full_hit(self, spark):
        from drune_spark.operators.packing import prefix_cache_audit

        df = spark.createDataFrame(
            [(i, "s", "same exact prompt text") for i in range(3)],
            "doc_id long, source string, text string",
        )
        rows = prefix_cache_audit(df).collect()
        assert sorted(r.hit_tokens for r in rows) == [0, 4, 4]

    def test_max_tokens_guard(self, spark):
        from drune_spark.operators.packing import prefix_cache_audit

        df = spark.createDataFrame(
            [(1, "s", "x")], "doc_id long, source string, text string"
        )
        with pytest.raises(ValueError):
            prefix_cache_audit(df, max_tokens=0)


# --------------------------------------------------------- bradley_terry


class TestBradleyTerry:
    def test_transitive_strengths_ordered(self, spark):
        from drune_spark.operators.preference import bradley_terry

        rows = (
            [(2, 1)] * 9 + [(1, 2)] * 1
            + [(1, 0)] * 9 + [(0, 1)] * 1
            + [(2, 0)] * 9 + [(0, 2)] * 1
        )
        df = spark.createDataFrame(rows, "winner long, loser long")
        out = {r.item: r for r in bradley_terry(df, n_rounds=8).collect()}
        assert out[2].rating > out[1].rating > out[0].rating
        assert out[2].n_wins == 18 and out[2].n_matches == 20
        # renormalized total: k * scale (floor slack < k)
        total = sum(r.rating for r in out.values())
        assert 3 * 1_000_000 - 3 <= total <= 3 * 1_000_000

    def test_deterministic(self, spark):
        from drune_spark.operators.preference import bradley_terry

        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (0, 1)], "winner long, loser long"
        )
        r1 = sorted(map(tuple, bradley_terry(df).collect()))
        r2 = sorted(map(tuple, bradley_terry(df).collect()))
        assert r1 == r2

    def test_overflow_guard(self, spark):
        from drune_spark.operators.preference import bradley_terry

        df = spark.createDataFrame([(0, 1)], "winner long, loser long")
        with pytest.raises(ValueError):
            bradley_terry(df, scale=10**10)


# --------------------------------------------------------- rand_response


class TestRandomizedResponse:
    def test_estimator_algebra_exact(self, spark):
        from drune_spark.operators.privacy import randomized_response

        rows = [(i, "g", i % 3 == 0) for i in range(40)]
        df = spark.createDataFrame(rows, "id long, grp string, s boolean")
        out = randomized_response(
            df, F.col("s"), "grp", "id", salt="t1", flip_denom=4
        ).collect()[0]
        # replicate flips independently
        n_rep = sum(
            1
            for i in range(40)
            if (i % 3 == 0) != (_md5_u32(f"t1:{i}") % 4 == 0)
        )
        assert out.n_reported == n_rep
        assert out.true_count == 14
        assert out.est_milli == (4 * n_rep - 40) * 1000 // 2
        assert out.abs_err_milli == abs(out.est_milli - 14_000)

    def test_flip_denom_guard(self, spark):
        from drune_spark.operators.privacy import randomized_response

        df = spark.createDataFrame(
            [(1, "g", True)], "id long, grp string, s boolean"
        )
        with pytest.raises(ValueError):
            randomized_response(df, F.col("s"), "grp", "id", flip_denom=2)


# --------------------------------------------------------- assortativity


class TestAssortativityComposition:
    def test_star_graph_negative(self, spark):
        from drune_spark.operators.stats import grouped_moments

        # star: hub degree 4, leaves degree 1 -> perfectly
        # disassortative (r = -1)
        edges = [(0, i) for i in range(1, 5)]
        sym = edges + [(b, a) for a, b in edges]
        deg = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}
        pairs = spark.createDataFrame(
            [("g", float(deg[a]), float(deg[b])) for a, b in sym],
            "graph string, x double, y double",
        )
        row = grouped_moments(
            pairs, "x", "y", ["graph"], scale_x=1, scale_y=1
        ).collect()[0]
        assert abs(row.corr + 1.0) < 1e-12


class TestWave3ReviewFixes:
    def test_bt_dominated_pair_no_crash(self, spark):
        from drune_spark.operators.preference import bradley_terry

        # items 1 and 2 are crushed by 0 — their ratings floor to 0
        # and the pair (1, 2) divisor hits the max(.., 1) guard
        rows = (
            [(0, 1)] * 1000 + [(0, 2)] * 1000 + [(1, 2)] * 1
        )
        df = spark.createDataFrame(rows, "winner long, loser long")
        out = {r.item: r for r in bradley_terry(df, n_rounds=4).collect()}
        assert out[0].rating > out[1].rating
        assert out[0].rating > out[2].rating

    def test_rand_response_null_sensitive_raises(self, spark):
        from drune_spark.operators.privacy import randomized_response

        df = spark.createDataFrame(
            [(1, "g", True), (2, "g", None)],
            "id long, grp string, s boolean",
        )
        out = randomized_response(df, F.col("s"), "grp", "id")
        with pytest.raises(Exception, match="NULL sensitive"):
            out.collect()

    def test_rand_response_inexact_denom_raises(self, spark):
        from drune_spark.operators.privacy import randomized_response

        df = spark.createDataFrame(
            [(1, "g", True)], "id long, grp string, s boolean"
        )
        with pytest.raises(ValueError, match="1000"):
            randomized_response(df, F.col("s"), "grp", "id", flip_denom=5)


# ------------------------------------------------------------- heaps_law


class TestHeapsLaw:
    def test_planted_growth_curve(self, spark):
        from drune_spark.operators.text_analysis import heaps_law

        # 4 docs x 4 tokens = 16 tokens; checkpoints at 4/8/12/16.
        # types first appear at global idx 0,1,2,3 | 4,5 | 8 | none new
        df = spark.createDataFrame(
            [
                (1, "a b c d"),
                (2, "e f a b"),
                (3, "g a b c"),
                (4, "a b c d"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.checkpoint: r
            for r in heaps_law(df, checkpoints=4).collect()
        }
        assert [out[k].prefix_tokens for k in (1, 2, 3, 4)] == [
            4, 8, 12, 16,
        ]
        assert [out[k].vocab_size for k in (1, 2, 3, 4)] == [4, 6, 7, 7]
        assert out[1].type_token_ppm == 1_000_000

    def test_monotone_on_corpus_sample(self, spark):
        from drune_spark.operators.text_analysis import heaps_law

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(50)
        rows = sorted(
            heaps_law(df, checkpoints=4).collect(),
            key=lambda r: r.checkpoint,
        )
        sizes = [r.vocab_size for r in rows]
        assert sizes == sorted(sizes)  # V(n) is nondecreasing

    def test_checkpoint_guard(self, spark):
        from drune_spark.operators.text_analysis import heaps_law

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            heaps_law(df, checkpoints=0)


# ------------------------------------------------------------- rq_encode


class TestRqEncode:
    def _emb(self, spark, n=20, dim=8):
        import math

        rows = []
        for i in range(n):
            # two clusters + per-id jitter
            base = 0.5 if i % 2 == 0 else -0.5
            vec = [
                base + 0.01 * ((i * 7 + j) % 5)
                for j in range(dim)
            ]
            rows.append((i, vec))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_monotone_refinement(self, spark):
        from drune_spark.operators.embeddings import rq_encode

        out = rq_encode(
            self._emb(spark), dim=8, codebook_size=4
        ).collect()
        assert len(out) == 20
        for r in out:
            assert r.err2 <= r.err1  # zero codeword guarantees it
        # seeds themselves reconstruct exactly at stage 1
        byid = {r.vec_id: r for r in out}
        for i in range(4):
            assert byid[i].err1 == 0 and byid[i].err2 == 0

    def test_codes_in_range_and_deterministic(self, spark):
        from drune_spark.operators.embeddings import rq_encode

        a = sorted(map(tuple, rq_encode(
            self._emb(spark), dim=8, codebook_size=4).collect()))
        b = sorted(map(tuple, rq_encode(
            self._emb(spark), dim=8, codebook_size=4).collect()))
        assert a == b
        for row in a:
            assert 0 <= row[1] < 4 and 0 <= row[2] < 4

    def test_small_corpus_guard(self, spark):
        from drune_spark.operators.embeddings import rq_encode

        df = self._emb(spark, n=5)
        with pytest.raises(ValueError):
            rq_encode(df, dim=8, codebook_size=4)


# --------------------------------------------------------- quantile_norm


class TestQuantileNormalize:
    def test_planted_mapping(self, spark):
        from drune_spark.operators.stats import quantile_normalize

        # group a: values 10, 20 (n=2); group b: 1, 2, 3, 4 (n=4);
        # pooled sorted: 1,2,3,4,10,20 (N=6)
        df = spark.createDataFrame(
            [
                (1, "a", 10), (2, "a", 20),
                (3, "b", 1), (4, "b", 2), (5, "b", 3), (6, "b", 4),
            ],
            "id long, grp string, v long",
        )
        out = {
            r.id: r.mapped_value
            for r in quantile_normalize(df, "v", "grp", "id").collect()
        }
        # a rank1: ceil(1*6/2)=3 -> pooled 3rd = 3; rank2: 6th = 20
        assert out[1] == 3 and out[2] == 20
        # b rank r: ceil(r*6/4) = 2,3,5,6 -> 2,3,10,20
        assert (out[3], out[4], out[5], out[6]) == (2, 3, 10, 20)

    def test_identical_groups_identity(self, spark):
        from drune_spark.operators.stats import quantile_normalize

        rows = [(i, "g" + str(i % 2), (i * 7) % 10) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, grp string, v long")
        out = quantile_normalize(df, "v", "grp", "id")
        # mapped distribution per group has the same multiset shape as
        # the pooled quantile targets; group sizes equal -> both groups
        # get identical mapped multisets
        rows = out.collect()
        g = {
            grp: sorted(
                r.mapped_value for r in rows if r.grp == grp
            )
            for grp in ("g0", "g1")
        }
        assert g["g0"] == g["g1"]


# ------------------------------------------------------------ span_scrub


class TestScrubSpans:
    def test_planted_splice_exact(self, spark):
        import hashlib

        from drune_spark.operators.dedup import scrub_spans

        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "x y z")],
            "doc_id long, text string",
        )
        spans = spark.createDataFrame(
            [(1, 1, 3, 3)],
            "doc_id long, span_start long, span_end long,"
            " span_tokens long",
        )
        out = {r.doc_id: r for r in
               scrub_spans(docs, spans).collect()}
        # doc 1: cut tokens 1..3 (b c d) -> "a e f"
        assert out[1].kept_tokens == 3 and out[1].cut_tokens == 3
        assert out[1].scrubbed_fp == hashlib.md5(b"a e f").hexdigest()
        # doc 2 untouched
        assert out[2].cut_tokens == 0
        assert out[2].scrubbed_fp == hashlib.md5(b"x y z").hexdigest()

    def test_full_coverage_empty_fp(self, spark):
        import hashlib

        from drune_spark.operators.dedup import scrub_spans

        docs = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        spans = spark.createDataFrame(
            [(1, 0, 1, 2)],
            "doc_id long, span_start long, span_end long,"
            " span_tokens long",
        )
        row = scrub_spans(docs, spans).collect()[0]
        assert row.kept_tokens == 0 and row.cut_tokens == 2
        assert row.scrubbed_fp == hashlib.md5(b"").hexdigest()

    def test_composes_with_suffix_spans(self, spark):
        from drune_spark.operators.dedup import scrub_spans, suffix_spans

        shared = " ".join(f"tok{i}" for i in range(40))
        docs = spark.createDataFrame(
            [(1, shared + " uniq tail"), (2, "lead words " + shared)],
            "doc_id long, text string",
        )
        spans = suffix_spans(docs, k=8)
        out = {r.doc_id: r for r in
               scrub_spans(docs, spans).collect()}
        # doc 1 keeps everything (first occurrence); doc 2 loses the
        # 40-token copy, keeps its 2 lead words
        assert out[1].cut_tokens == 0
        assert out[2].kept_tokens == 2 and out[2].cut_tokens == 40


# --------------------------------------------------------------- halving


class TestSuccessiveHalving:
    def test_planted_selection(self, spark):
        from drune_spark.operators.sampling import successive_halving

        # 4 arms; rewards constant per arm: a=400 > b=300 > c=200 > d=100
        rows = []
        rw = {"a": 400, "b": 300, "c": 200, "d": 100}
        for arm, r in rw.items():
            for j in range(10):
                rows.append((f"{arm}{j}", arm, r))
        df = spark.createDataFrame(rows, "id string, arm string, r long")
        out = successive_halving(
            df, "r", "arm", "id", base_budget=2, n_rounds=2
        ).collect()
        by = {(r["round"], r.arm): r for r in out}
        # round 1: 4 alive, keep ceil(4/2)=2 -> a, b survive
        assert by[(1, "a")].survived == 1
        assert by[(1, "b")].survived == 1
        assert by[(1, "c")].survived == 0
        assert by[(1, "d")].survived == 0
        # round 2: only a, b scored; keep ceil(2/2)=1 -> a
        assert (2, "c") not in by and (2, "d") not in by
        assert by[(2, "a")].survived == 1
        assert by[(2, "b")].survived == 0
        # budgets: round 1 cum=2 evals, round 2 cum=6
        assert by[(1, "a")].n_evals == 2
        assert by[(2, "a")].n_evals == 6
        # constant reward 400 -> mean_micro = (2*400)*1e6 div 2
        assert by[(1, "a")].mean_reward_micro == 400 * 1_000_000

    def test_scarce_arm_not_dropped_for_scarcity(self, spark):
        from drune_spark.operators.sampling import successive_halving

        rows = [("x1", "x", 500), ("y1", "y", 100), ("y2", "y", 100),
                ("y3", "y", 100), ("y4", "y", 100), ("y5", "y", 100),
                ("y6", "y", 100)]
        df = spark.createDataFrame(rows, "id string, arm string, r long")
        out = successive_halving(
            df, "r", "arm", "id", base_budget=2, n_rounds=2
        ).collect()
        by = {(r["round"], r.arm): r for r in out}
        # x has only 1 doc but wins on mean; scored on what it has
        assert by[(1, "x")].n_evals == 1
        assert by[(1, "x")].survived == 1

    def test_guards(self, spark):
        from drune_spark.operators.sampling import successive_halving

        df = spark.createDataFrame(
            [("a", "g", 1)], "id string, arm string, r long"
        )
        with pytest.raises(ValueError):
            successive_halving(df, "r", "arm", "id", base_budget=0)
