"""Deterministic hash sampling / splitting tests."""

from drune_spark.operators.sampling import (
    fraction_to_hex_threshold,
    sample_by_hash,
    split_by_hash,
)


class TestHashSampling:
    def test_threshold_encoding(self):
        assert fraction_to_hex_threshold(0.0) == "0000"
        # 'g' sorts above every hex digit -> admits all 4-char buckets
        assert fraction_to_hex_threshold(1.0) == "g"
        assert fraction_to_hex_threshold(0.1) == "199a"

    def test_sample_fraction_and_stability(self, spark):
        df = spark.range(20000).withColumnRenamed("id", "k")
        s1 = sample_by_hash(df, "k", 0.2)
        n = s1.count()
        assert abs(n / 20000 - 0.2) < 0.02
        # identical sample on rerun and at different parallelism
        s2 = sample_by_hash(df.repartition(13), "k", 0.2)
        assert {r.k for r in s1.collect()} == {r.k for r in s2.collect()}

    def test_different_salts_draw_different_samples(self, spark):
        df = spark.range(5000).withColumnRenamed("id", "k")
        a = {r.k for r in sample_by_hash(df, "k", 0.2, salt="a").collect()}
        b = {r.k for r in sample_by_hash(df, "k", 0.2, salt="b").collect()}
        overlap = len(a & b) / max(len(a), 1)
        assert 0.05 < overlap < 0.4  # ≈ independent 20% samples overlap ~20%

    def test_split_disjoint_and_complete(self, spark):
        df = spark.range(10000).withColumnRenamed("id", "k")
        splits = split_by_hash(df, "k",
                               {"train": 0.8, "val": 0.1, "test": 0.1})
        sets = {name: {r.k for r in part.collect()}
                for name, part in splits.items()}
        assert not (sets["train"] & sets["val"])
        assert not (sets["train"] & sets["test"])
        assert not (sets["val"] & sets["test"])
        assert len(sets["train"] | sets["val"] | sets["test"]) == 10000
        assert abs(len(sets["train"]) / 10000 - 0.8) < 0.02


class TestWeightedSample:
    def test_hand_computed_ticket_and_stability(self, spark):
        import hashlib
        from drune_spark.operators.sampling import weighted_sample
        df = spark.createDataFrame(
            [(i, (i % 3) + 1) for i in range(50)], "k long, w int"
        )

        def ticket(k, w, salt=""):
            return min(
                int(hashlib.md5(f"{salt}:{k}:{i}".encode())
                    .hexdigest()[:8], 16)
                for i in range(1, w + 1)
            )

        out = weighted_sample(df, "k", "w", 10).collect()
        expect = sorted(
            ((ticket(k, (k % 3) + 1), k) for k in range(50))
        )[:10]
        assert [(r.ticket, r.k) for r in out] == expect
        # identical at different parallelism
        out2 = weighted_sample(df.repartition(7), "k", "w", 10).collect()
        assert sorted((r.ticket, r.k) for r in out2) == expect

    def test_weight_bias(self, spark):
        """Rows with weight 8 must win far more often than weight 1."""
        from drune_spark.operators.sampling import weighted_sample
        df = spark.range(4000).selectExpr(
            "id AS k", "CASE WHEN id < 2000 THEN 8 ELSE 1 END AS w"
        )
        won = weighted_sample(df, "k", "w", 400).collect()
        heavy = sum(1 for r in won if r.k < 2000)
        assert heavy > 300  # expected ≈ 8/9 · 400 ≈ 355

    def test_nonpositive_weights_excluded(self, spark):
        from drune_spark.operators.sampling import weighted_sample
        df = spark.createDataFrame(
            [(1, 0), (2, 3), (3, 1)], "k long, w int"
        )
        ks = {r.k for r in weighted_sample(df, "k", "w", 10).collect()}
        assert ks == {2, 3}

    def test_plan_is_take_ordered(self, spark):
        from drune_spark.operators.sampling import weighted_sample
        df = spark.range(1000).selectExpr("id AS k", "2 AS w")
        plan = weighted_sample(df, "k", "w", 5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestCorpusMix:
    def test_mix_counts_and_determinism(self, spark):
        from drune_spark.operators.sampling import corpus_mix

        rows = [(i, "a" if i < 400 else "b") for i in range(800)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        out = corpus_mix(df, "source", "doc_id", {"a": 2.5, "b": 0.25})
        counts = {r.source: r["count"]
                  for r in out.groupBy("source").count().collect()}
        # a: 400*2 full copies + ~50% partial epoch; b: ~25% sample
        assert 950 <= counts["a"] <= 1050
        assert 70 <= counts["b"] <= 130
        # exact determinism across reruns
        first = sorted((r.doc_id, r.copy_id) for r in out.collect())
        again = sorted(
            (r.doc_id, r.copy_id)
            for r in corpus_mix(df, "source", "doc_id",
                                {"a": 2.5, "b": 0.25}).collect()
        )
        assert first == again

    def test_integer_weight_is_exact_copies(self, spark):
        from drune_spark.operators.sampling import corpus_mix

        df = spark.createDataFrame([(i, "s") for i in range(50)],
                                   ["doc_id", "source"])
        out = corpus_mix(df, "source", "doc_id", {"s": 3.0})
        assert out.count() == 150
        assert out.select("copy_id").distinct().count() == 3

    def test_zero_weight_drops_source(self, spark):
        from drune_spark.operators.sampling import corpus_mix

        df = spark.createDataFrame(
            [(1, "keep"), (2, "drop")], ["doc_id", "source"]
        )
        out = corpus_mix(df, "source", "doc_id", {"drop": 0.0},
                         default_weight=1.0)
        assert [r.doc_id for r in out.collect()] == [1]

    def test_mix_plan_is_narrow(self, spark):
        from drune_spark.operators.sampling import corpus_mix

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = corpus_mix(df, "source", "doc_id", {"src0": 2.0})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPacking:
    def test_chunks_cover_and_overlap(self, spark):
        from drune_spark.operators.packing import chunk_documents

        text = " ".join(f"w{i}" for i in range(70))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = sorted(
            chunk_documents(df, "text", "doc_id", chunk_size=32,
                            overlap=8).collect(),
            key=lambda r: r.chunk_id,
        )
        # 70 tokens, stride 24: starts 0/24/48 → 3 chunks, sizes 32/32/22
        assert [r.n_chunk_tokens for r in rows] == [32, 32, 22]
        c0, c1 = rows[0].chunk_text.split(), rows[1].chunk_text.split()
        assert c0[24:] == c1[:8]          # 8-token overlap
        assert c0[0] == "w0" and rows[2].chunk_text.split()[-1] == "w69"

    def test_short_doc_single_chunk(self, spark):
        from drune_spark.operators.packing import chunk_documents

        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        rows = chunk_documents(df, "text", "doc_id", chunk_size=32,
                               overlap=8).collect()
        assert len(rows) == 1
        assert rows[0].n_chunk_tokens == 3 and rows[0].chunk_text == "a b c"

    def test_chunk_plan_is_narrow(self, spark):
        from drune_spark.operators.packing import chunk_documents

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (chunk_documents(df, "text", "doc_id")._jdf
                .queryExecution().executedPlan().toString())
        assert "Exchange" not in plan

    def test_pack_respects_budget_overflow_bound(self, spark):
        from drune_spark.operators.packing import pack_sequences

        rows = [(i, 10 + (i * 7) % 90) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "n_toks"])
        out = pack_sequences(df, "n_toks", "doc_id", budget=200,
                             n_groups=4)
        seqs = (out.groupBy("pack_group", "seq_id")
                .agg({"n_tokens": "sum"})
                .withColumnRenamed("sum(n_tokens)", "total").collect())
        max_doc = max(n for _, n in rows)
        # contiguous fill: every sequence starts below budget and can
        # overflow by at most one document
        assert all(s.total < 200 + max_doc for s in seqs)
        # and packing is dense: a non-last sequence spans from the first
        # cumsum >= k*budget (< k*budget + max_doc) to at least
        # (k+1)*budget, so its total exceeds budget - max_doc
        by_group = {}
        for s in seqs:
            by_group.setdefault(s.pack_group, []).append(
                (s.seq_id, s.total))
        for g, pairs in by_group.items():
            pairs.sort()
            assert all(t > 200 - max_doc for _, t in pairs[:-1])
            # seq ids are contiguous from 0 (no empty sequences)
            assert [k for k, _ in pairs] == list(range(len(pairs)))

    def test_pack_deterministic(self, spark):
        from drune_spark.operators.packing import pack_sequences

        df = spark.createDataFrame([(i, 50) for i in range(100)],
                                   ["doc_id", "n_toks"])
        a = sorted((r.doc_id, r.pack_group, r.seq_id)
                   for r in pack_sequences(df, "n_toks", "doc_id").collect())
        b = sorted((r.doc_id, r.pack_group, r.seq_id)
                   for r in pack_sequences(df, "n_toks", "doc_id").collect())
        assert a == b


class TestUnimaxAlloc:
    def _run(self, spark, num, den):
        from drune_spark.operators.sampling import unimax_alloc

        rows = [("a", 10), ("b", 100), ("c", 100)]
        df = spark.createDataFrame(rows, ["source", "n_toks"])
        out = unimax_alloc(df, ["source"], "n_toks",
                           budget_num=num, budget_den=den, epoch_cap=1)
        return {r.source: (r.allocation, r.epochs_ppm)
                for r in out.collect()}

    def test_waterfill_caps_small_domain(self, spark):
        # total=210, budget=110: 'a' capped at 10, b/c split 100 evenly
        got = self._run(spark, 11, 21)
        assert got == {"a": (10, 1_000_000),
                       "b": (50, 500_000), "c": (50, 500_000)}

    def test_integer_remainder_goes_to_first_uncapped(self, spark):
        # budget=111: R=101 over 2 uncapped → 51 to 'b' (first in order)
        got = self._run(spark, 37, 70)
        assert got == {"a": (10, 1_000_000),
                       "b": (51, 510_000), "c": (50, 500_000)}

    def test_all_capped_when_budget_exceeds_caps(self, spark):
        got = self._run(spark, 2, 1)  # budget 420 > caps sum 210
        assert got == {"a": (10, 1_000_000),
                       "b": (100, 1_000_000), "c": (100, 1_000_000)}

    def test_allocation_sums_to_budget_when_unconstrained(self, spark):
        got = self._run(spark, 11, 21)
        assert sum(a for a, _ in got.values()) == 110


class TestCdcChunks:
    def test_chunks_tile_the_document(self, spark):
        from drune_spark.operators.packing import cdc_chunks

        text = "the quick brown fox jumps over the lazy dog " * 20
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = sorted(
            cdc_chunks(df).collect(), key=lambda r: r.start_pos
        )
        assert rows[0].start_pos == 1
        for a, b in zip(rows, rows[1:]):
            assert b.start_pos == a.start_pos + a.chunk_len
        assert rows[-1].start_pos + rows[-1].chunk_len - 1 == len(text)

    def test_short_doc_single_chunk(self, spark):
        from drune_spark.operators.packing import cdc_chunks

        df = spark.createDataFrame([(1, "tiny")], ["doc_id", "text"])
        rows = cdc_chunks(df).collect()
        assert len(rows) == 1
        assert (rows[0].start_pos, rows[0].chunk_len) == (1, 4)

    def test_shift_stability_under_prefix_insertion(self, spark):
        """The CDC property: prepending text re-synchronizes at the
        first unchanged window, so the tail chunks keep their md5
        identity — what fixed-size blocking cannot do."""
        from drune_spark.operators.packing import cdc_chunks

        base = "alpha bravo charlie delta echo foxtrot golf hotel " * 30
        edited = "INSERTED PREFIX >>> " + base
        df = spark.createDataFrame(
            [(1, base), (2, edited)], ["doc_id", "text"]
        )
        rows = cdc_chunks(df).collect()
        md5s = {1: set(), 2: set()}
        for r in rows:
            md5s[r.doc_id].add(r.chunk_md5)
        shared = md5s[1] & md5s[2]
        # all but the first chunk (and possibly the boundary-spanning
        # one) re-synchronize
        assert len(shared) >= len(md5s[1]) - 2
        assert len(shared) > 0
