"""Property-based tests (hypothesis) for core invariants.

Spark jobs are expensive per example, so example counts are small and
deadlines disabled; where possible a single Spark job covers many
generated cases at once (the levenshtein parity sweep).
"""

import random

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


def _uf_components(n_nodes, edges):
    """Pure-python union-find oracle: node -> min id in component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(members) for r, members in comp.items()
            for v in members}


class TestConnectedComponentsProperty:
    @settings(max_examples=6, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        max_size=18,
    ))
    def test_matches_union_find(self, spark, edges):
        from drune_spark.operators.dedup import connected_components

        edges = [(a, b) for a, b in edges if a != b]
        nodes = spark.createDataFrame(
            [(i,) for i in range(12)], ["doc_id"]
        )
        if edges:
            pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        else:
            pairs = spark.createDataFrame(
                [], "id_a bigint, id_b bigint"
            )
        got = {r.doc_id: r.cluster_id
               for r in connected_components(pairs, nodes).collect()}
        want = _uf_components(12, edges)
        assert got == want


class TestPackSequencesProperty:
    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.integers(1, 300), min_size=1, max_size=40))
    def test_overflow_bounded_by_one_document(self, spark, counts):
        from drune_spark.operators.packing import pack_sequences

        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(counts)], ["doc_id", "n"]
        )
        budget = 256
        out = pack_sequences(df, "n", "doc_id", budget=budget,
                             n_groups=4, salt="pp").collect()
        by_seq = {}
        for r in out:
            by_seq.setdefault((r.pack_group, r.seq_id), []).append(
                r.n_tokens
            )
        for toks in by_seq.values():
            # contiguous fill: total may overflow the budget by at
            # most the last document placed into the sequence
            assert sum(toks) <= budget + max(toks)
        # every doc packed exactly once
        assert sorted(r.doc_id for r in out) == list(range(len(counts)))


class TestLevenshteinParity:
    def test_spark_matches_python_dp_on_200_random_pairs(self, spark):
        """Spark's levenshtein (thresholded and not) must equal the
        classic DP — one Spark job covers all generated pairs."""
        rng = random.Random(8)
        words = ["hash", "join", "scan", "sort", "spill", "row"]

        def sentence():
            return " ".join(rng.choice(words)
                            for _ in range(rng.randint(1, 6)))

        def mutate(s):
            ops = rng.randint(0, 4)
            s = list(s)
            for _ in range(ops):
                if not s:
                    break
                i = rng.randrange(len(s))
                op = rng.choice("ids")
                if op == "i":
                    s.insert(i, rng.choice("abcxyz "))
                elif op == "d":
                    del s[i]
                else:
                    s[i] = rng.choice("abcxyz ")
            return "".join(s)

        def dp(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        pairs = []
        for i in range(200):
            a = sentence()
            b = mutate(a) if i % 2 else sentence()
            pairs.append((i, a, b))
        df = spark.createDataFrame(pairs, ["i", "a", "b"])
        got = {
            r.i: (r.d, r.dt)
            for r in df.select(
                "i",
                F.levenshtein("a", "b").alias("d"),
                F.levenshtein("a", "b", 4).alias("dt"),
            ).collect()
        }
        for i, a, b in pairs:
            want = dp(a, b)
            assert got[i][0] == want, (a, b)
            assert got[i][1] == (want if want <= 4 else -1), (a, b)
