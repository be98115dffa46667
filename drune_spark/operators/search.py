"""BM25 keyword retrieval over a document corpus — the text-search
query an analytics engine needs next to its dedup/quality ops.

Shape (one corpus pass for ANY number of queries):
- tokenize once; tf per (doc, term), doc length, corpus stats (N,
  Σdl) and per-term document frequencies all come from that pass.
- the per-doc feature row carries tf for the UNION of all query
  terms (conditional-aggregate pivot — terms are few, the row is
  narrow); corpus stats and the df row are broadcast cross joins.
- every query's score is evaluated from the same feature frame and
  fanned out with one explode(array(struct(...))) — no per-query
  rescan, no union of scans.
- top-k per query via the rank-limit-pushdown window ((score desc,
  doc_id) after rounding), the same Partial-below-Exchange plan
  pinned for ANN top-k in tests/test_plans.py.

At 100 TB: the only wide ops are the tf/dl aggregations (map-side
partial, keys are (doc, term)); queries/stats/dfs are broadcast;
scoring is codegen arithmetic. Nothing about the query count touches
the corpus scan count.

Determinism (oracle hash-match): a BM25 score is a float sum over a
query's terms, which is order-sensitive — so the scoring expression is
generated ONCE as SQL text (fixed term order, explicit casts, explicit
constant folds) by ``score_sql`` below, and that identical text runs
through Spark's ``F.expr`` AND inside the DuckDB oracle. Both engines
execute the same written FP op sequence; scores are rounded to 6
decimals and ranked with a doc_id tie-break, the same discipline as
the cosine queries. (``ln`` is the one libm call — worst case a 1-ulp
engine difference, orders below the rounding grain.)

No counterpart in /root/reference; driver-mandated LLM-data extension
(retrieval over the documents table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from drune_spark.functions.text import tokens


def collect_terms(queries: list[tuple[str, list[str]]]) -> list[str]:
    """Sorted union of all query terms — the global term index that
    tf_{i}/df_{i} columns are numbered by."""
    seen = set()
    for _, terms in queries:
        seen.update(terms)
    return sorted(seen)


def score_sql(
    term_idx: list[int], k1: float = 1.2, b: float = 0.75
) -> str:
    """The shared Spark/DuckDB BM25 scoring expression for one query,
    over columns n_docs, sum_dl, dl, tf_{i}, df_{i} (i = global term
    indices, in the query's term order). Lucene-style idf:
    ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive."""
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    parts = []
    for i in term_idx:
        idf = (
            f"ln((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0)"
        )
        tfd = f"CAST(tf_{i} AS DOUBLE)"
        denom = (
            f"({tfd} + {k1} * (1.0 - {b} + {b} * "
            f"CAST(dl AS DOUBLE) / {avgdl}))"
        )
        parts.append(
            f"CASE WHEN tf_{i} > 0 THEN {idf} * ({tfd} * {k1 + 1.0})"
            f" / {denom} ELSE 0.0 END"
        )
    return " + ".join(parts)


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per query by BM25. Returns (query_id, doc_id,
    rank, score); only docs containing at least one query term (score
    > 0) rank."""
    all_terms = collect_terms(queries)
    idx = {t: i for i, t in enumerate(all_terms)}

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    qterm_tf = tf.filter(F.col("w").isin(all_terms))
    dfs = qterm_tf.groupBy("w").agg(
        F.count(F.lit(1)).alias("df")
    )
    df_row = dfs.agg(
        *[
            F.max(F.when(F.col("w") == t, F.col("df"))).alias(f"df_{i}")
            for i, t in enumerate(all_terms)
        ]
    )
    features = (
        qterm_tf.groupBy("doc_id")
        .agg(
            *[
                F.max(F.when(F.col("w") == t, F.col("tf"))).alias(f"tf_{i}")
                for i, t in enumerate(all_terms)
            ]
        )
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(df_row))
    )
    scored = features.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(qid).alias("query_id"),
                        F.round(
                            F.expr(
                                score_sql([idx[t] for t in terms], k1, b)
                            ),
                            6,
                        ).alias("score"),
                    )
                    for qid, terms in queries
                ]
            )
        ).alias("__q"),
    ).select("doc_id", "__q.query_id", "__q.score")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.filter(F.col("score") > 0)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )


def bm25_oracle_sql(
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    toks_expr: str = "regexp_split_to_array(trim(lower(text)), '\\s+')",
) -> str:
    """DuckDB replay sharing ``score_sql``'s exact expression text."""
    all_terms = collect_terms(queries)
    idx = {t: i for i, t in enumerate(all_terms)}
    in_list = ", ".join(f"'{t}'" for t in all_terms)
    tf_cols = ",\n                       ".join(
        f"MAX(CASE WHEN w = '{t}' THEN tf END) AS tf_{i}"
        for i, t in enumerate(all_terms)
    )
    df_cols = ",\n                       ".join(
        f"MAX(CASE WHEN w = '{t}' THEN df END) AS df_{i}"
        for i, t in enumerate(all_terms)
    )
    branches = "\n                UNION ALL\n".join(
        f"""                SELECT doc_id, '{qid}' AS query_id,
                       round({score_sql([idx[t] for t in terms], k1, b)},
                             6) AS score
                FROM features"""
        for qid, terms in queries
    )
    return f"""
            WITH toks AS (
                SELECT doc_id, unnest({toks_expr}) AS w FROM documents
            ),
            tf AS (
                SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
                FROM toks GROUP BY doc_id, w
            ),
            dl AS (
                SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
                FROM toks GROUP BY doc_id
            ),
            stats AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(dl) AS BIGINT) AS sum_dl
                FROM dl
            ),
            qtf AS (SELECT * FROM tf WHERE w IN ({in_list})),
            dfs AS (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS df
                FROM qtf GROUP BY w
            ),
            df_row AS (
                SELECT {df_cols}
                FROM dfs
            ),
            features AS (
                SELECT t.*, dl.dl, stats.*, df_row.*
                FROM (
                    SELECT doc_id,
                       {tf_cols}
                    FROM qtf GROUP BY doc_id
                ) t
                JOIN dl USING (doc_id), stats, df_row
            ),
            scored AS (
{branches}
            ),
            ranked AS (
                SELECT query_id, doc_id, score,
                       CAST(row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY score DESC, doc_id ASC
                       ) AS INTEGER) AS rank
                FROM scored WHERE score > 0
            )
            SELECT query_id, doc_id, rank, score
            FROM ranked WHERE rank <= {k}
        """


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k_rrf: int = 60,
    out_k: int = 5,
) -> DataFrame:
    """Reciprocal-rank fusion of retrieval lists — the standard hybrid
    (keyword + vector) merge. Inputs share the schema (qid, doc_id,
    rank); output is (qid, doc_id, rrf_milli, fused_rank ≤ out_k).

    The textbook RRF score Σ 1/(k+rank) is a float sum whose value
    depends on addition order; as integer micro-points per list
    (10^6 div (k+rank), then an integer SUM) it is order-independent —
    same ranking, exact on any engine at any parallelism. One shuffle
    on (qid, doc_id), then the same rank-limit window discipline as the
    other top-k ops (TakeOrdered-class per-qid work, never a global
    sort)."""
    from functools import reduce

    both = reduce(DataFrame.unionAll, ranked_lists)
    scores = both.groupBy("qid", "doc_id").agg(
        F.expr(f"CAST(SUM(1000000 div ({k_rrf} + rank)) AS BIGINT)")
        .alias("rrf_milli")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("rrf_milli").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn(
            "fused_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rank") <= out_k)
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_terms: int = 200,
    postings_head: int = 32,
) -> DataFrame:
    """Build an inverted index: per term, its document frequency and
    the head of its sorted posting list — the layout a keyword-search
    engine (and the bm25 scorer above) reads instead of rescanning the
    corpus.

    One tokenize pass → distinct (term, doc) → one groupBy(term) that
    produces df AND the postings in the same aggregate. The posting
    arrays are built per-term from collect_list and made deterministic
    with sort_array, then truncated to ``postings_head`` ids and
    serialized — at 100 TB a term's full posting list is written as a
    bucketed/partitioned table keyed by term, and ``postings_head``
    is the per-term stats stripe kept hot; the shuffle here carries
    (term, doc_id) pairs, never documents. Top-``max_terms`` terms by
    (df desc, term) via TakeOrdered — no global sort.

    Returns (term, df_docs, postings) with postings a comma-joined
    sorted doc-id prefix.
    """
    from drune_spark.functions.text import tokens

    pairs = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.length("term") > 0)
        .distinct()
    )
    postings = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.concat_ws(
            ",",
            F.slice(
                F.sort_array(F.collect_list("doc_id")), 1, postings_head
            ),
        ).alias("postings"),
    )
    return (
        postings.filter(F.col("df_docs") >= min_df)
        .orderBy(F.col("df_docs").desc(), F.col("term").asc())
        .limit(max_terms)
    )


def first_relevant_rank(
    topk: DataFrame,
    relevant: DataFrame,
    queries: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Retrieval evaluation: per-query rank of the first RELEVANT doc
    in a (query_id, doc_id, rank) ranking, plus integer reciprocal
    rank (10⁶ div rank; 0 when nothing relevant ranked) — the MRR
    building block. Queries with no ranked relevant doc still emit a
    row (rank 0), so regressions can't hide by dropping queries.

    Cost: one equi-join between the k·|Q|-row ranking and the
    relevance table + a |Q|-cell MIN — evaluation never rescans the
    corpus.

    Returns (query_id, first_hit_rank, mrr_ppm).
    """
    first = (
        topk.join(relevant.select(query_col, doc_col),
                  [query_col, doc_col])
        .groupBy(query_col)
        .agg(F.min("rank").alias("r"))
    )
    return (
        queries.select(query_col).distinct()
        .join(first, query_col, "left")
        .select(
            query_col,
            F.coalesce(F.col("r"), F.lit(0)).cast("int")
            .alias("first_hit_rank"),
            F.expr("CASE WHEN r IS NULL THEN CAST(0 AS BIGINT) "
                   "ELSE 1000000 div r END").alias("mrr_ppm"),
        )
    )


def ndcg_at_k(
    topk: DataFrame,
    grades: DataFrame,
    queries: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
) -> DataFrame:
    """NDCG@k over a (query_id, doc_id, rank) ranking with GRADED
    relevance — the standard ranked-retrieval quality metric (the MRR
    sibling for non-binary relevance). Exact cross-engine arithmetic
    via integer-micro gains: each position contributes

        gain_micro = floor(grade · 10⁶ / log2(rank + 1))

    — ONE double op chain per row (log2 is bit-identical across
    engines; verified libm parity), floored to an integer so the
    aggregate is an ORDER-FREE integer SUM — no float-summation-order
    divergence (the maxsim integer-scaled-cosine trick). IDCG replays
    the same gain at the ideal rank (grade DESC, doc id ASC, top k);
    ndcg_ppm = dcg_micro · 10⁶ div idcg_micro.

    Cost: one equi-join between the k·|Q|-row ranking and the grade
    table, one |Q|·top-k window on the grade table — evaluation never
    rescans the corpus. Queries with nothing ranked still emit a row.

    Returns (query_id, dcg_micro, idcg_micro, ndcg_ppm).
    """
    gain = F.floor(
        F.col("grade") * 1000000.0 / F.log2(F.col("rank") + 1.0)
    ).cast("long")
    dcg = (
        topk.join(grades, [query_col, doc_col], "left")
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
        .withColumn("gain_micro", gain)
        .groupBy(query_col)
        .agg(F.sum("gain_micro").alias("dcg_micro"))
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("grade").desc(), F.col(doc_col).asc()
    )
    ideal = (
        grades.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("gain_micro", gain)
        .groupBy(query_col)
        .agg(F.sum("gain_micro").alias("idcg_micro"))
    )
    return (
        queries.select(query_col).distinct()
        .join(dcg, query_col, "left")
        .join(ideal, query_col, "left")
        .select(
            query_col,
            F.coalesce(F.col("dcg_micro"), F.lit(0)).alias("dcg_micro"),
            F.coalesce(F.col("idcg_micro"), F.lit(0))
            .alias("idcg_micro"),
            F.expr(
                "coalesce(dcg_micro, 0) * 1000000 "
                "div greatest(coalesce(idcg_micro, 0), 1)"
            ).alias("ndcg_ppm"),
        )
    )


def sparse_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_cos2_ppm: int = 250_000,
    max_term_df: int | None = None,
) -> DataFrame:
    """Sparse TF-vector cosine similarity between documents — the
    bag-of-words near-dup/topic-similarity measure that complements the
    dense-embedding paths (similarity.py) and set-based Jaccard
    (dedup.py): term frequencies weigh repeated vocabulary, so two docs
    drawing on the same word distribution score high even when their
    shingle sets differ.

    Exact integer math end-to-end: for docs A, B with tf vectors a, b,

        cos²(A, B) · 10⁶ = (a·b)² · 10⁶ div (|a|²·|b|²)

    — monotone in cosine (tf ≥ 0), so thresholding/ranking on
    ``cos2_ppm`` ≡ thresholding on cosine with zero FP anywhere.

    Scale notes: the term-cell self-join is the inverted-index candidate
    pattern (pairs share ≥ 1 term; shuffles carry (term, doc, tf) cells,
    never text); ``max_term_df`` caps hot terms exactly like
    ngram_jaccard_pairs' shingle cap — dropped terms leave BOTH the dot
    product and the norms, keeping the value a true cosine over the
    capped vocabulary. The dot-product aggregate is map-side partial on
    (id_a, id_b) cells.

    int64 headroom: ``dot²·10⁶`` stays in range for dot < 3·10⁶ —
    comfortably beyond any tokenized document; switch the ppm expression
    to DECIMAL(38) arithmetic if tf mass per pair ever approaches that.

    Returns (id_a, id_b, dot, norm2_a, norm2_b, cos2_ppm), id_a < id_b.
    """
    tf = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
                "term"
            ),
        )
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_term_df is not None:
        hot = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_term_df)
            .select("term")
        )
        tf = tf.join(F.broadcast(hot), "term", "left_anti")
    norms = tf.groupBy("doc").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("norm2")
    )
    # Explicit term-keyed width for the pair join (r10): the join INPUT
    # is tiny (term cells), so AQE's input-byte-based coalescing ran the
    # whole quadratic pair EXPANSION + partial aggregate on one task
    # (profiled ~4 s single-task at sf0.1). repartition(n, term) is a
    # user-specified width AQE keeps; both aliases share the one
    # exchange, and the explosion spreads over the term buckets.
    spark = df.sparkSession
    width = max(2, spark.sparkContext.defaultParallelism)
    tfw = tf.repartition(width, "term")
    dots = (
        tfw.alias("a")
        .join(
            tfw.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(
            F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b")
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    return (
        dots.join(norms.withColumnRenamed("doc", "id_a")
                       .withColumnRenamed("norm2", "norm2_a"), "id_a")
        .join(norms.withColumnRenamed("doc", "id_b")
                   .withColumnRenamed("norm2", "norm2_b"), "id_b")
        .withColumn(
            "cos2_ppm",
            F.expr("dot * dot * 1000000 div (norm2_a * norm2_b)"),
        )
        .filter(F.col("cos2_ppm") >= min_cos2_ppm)
        .select("id_a", "id_b", "dot", "norm2_a", "norm2_b", "cos2_ppm")
    )


def expansion_terms(
    docs: DataFrame,
    feedback: DataFrame,
    queries: list[tuple[str, list[str]]],
    m: int = 5,
    stopwords: tuple[str, ...] = (
        "the", "a", "and", "of", "to", "in", "is", "it",
    ),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM1-style): given
    each query's top-k retrieved docs (``feedback``: query_id, doc_id
    — typically ``bm25_topk`` output), rank candidate expansion terms
    by ``Σ_fb tf(t, d) · bits(N div df_t)`` — feedback-set term mass
    weighted by the integer log₂ surprisal of corpus rarity (the
    cross-engine ``length(conv(x, 10, 2))`` ≡ floor(log₂ x)+1
    primitive, so the whole weight is integer-exact). Original query
    terms and stopwords are excluded; ties break lexically.

    Cost: the corpus tokenization pass runs twice (feedback-mass join
    + corpus df) — both map-side-partial (doc, term) aggregates; the
    feedback side is k·|Q| rows and broadcasts. Nothing scales with
    query count.

    Returns (query_id, term, rank, weight_int), top ``m`` per query.
    """
    from pyspark.sql import Window

    from drune_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfs = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    fb_tf = (
        feedback.select("query_id", "doc_id")
        .join(tf, "doc_id")
        .groupBy("query_id", "w")
        .agg(F.sum("tf").alias("fb_tf"))
    )
    from drune_spark.functions.partitioning import local_frame
    excl = local_frame(
        docs.sparkSession,
        [(qid, t) for qid, terms in queries for t in terms],
        "query_id string, w string",
    )
    bits = F.expr(
        "length(conv(CAST(n_docs div df AS STRING), 10, 2))"
    ).cast("long")
    cand = (
        fb_tf.join(F.broadcast(excl), ["query_id", "w"], "left_anti")
        .filter(~F.col("w").isin(*stopwords))
        .join(dfs, "w")
        .crossJoin(F.broadcast(nd))
        .select(
            "query_id",
            F.col("w").alias("term"),
            (F.col("fb_tf") * bits).alias("weight_int"),
        )
    )
    rk = Window.partitionBy("query_id").orderBy(
        F.col("weight_int").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(rk))
        .filter(F.col("rank") <= m)
        .select("query_id", "term",
                F.col("rank").cast("int").alias("rank"), "weight_int")
    )


def hard_negative_mine(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    cos_thresh_micro: int = 250_000,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive/reranker training (the
    DPR/ANCE recipe): per query, run BM25 top-k, treat the rank-1 hit
    as the positive, and flag lower-ranked hits whose embedding cosine
    to the positive falls below a threshold — documents the lexical
    retriever surfaces but that are semantically FAR from the best
    answer. Exactly the pairs that teach a bi-encoder the most;
    random negatives (negative_pairs) are trivially separable.

    Plan shape: the BM25 stage is the shared bm25_topk pipeline (one
    corpus pass — the queries×k result is persisted because the
    positive and candidate branches both read it); everything after
    operates on queries×k rows — the positive's embedding broadcast
    per query, one cosine fold each.
    Cosines floored to integer micro before the threshold compare
    (engine-exact; same contract as the dedup/ANN family).

    Returns (query_id, doc_id, bm25_rank, cos_to_pos_micro, is_hard)
    for every non-positive ranked hit, is_hard ∈ {0, 1}. Hits without
    an embedding row are dropped (inner join), and a query whose
    rank-1 hit has no embedding contributes no rows — mining operates
    over the embedded subset only.

    No counterpart in /root/reference; driver-mandated training-data
    extension.
    """
    from drune_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )

    # topk feeds BOTH the positive branch (rank 1) and the candidate
    # branch (rank > 1) — persist the queries×k frame or the whole
    # BM25 corpus pipeline plans and runs twice (the r7
    # consume-once rule; two consumers share the lazy mark fine).
    # The mark is left in place (lazy; k×|queries| rows): library
    # callers making repeated calls outside bench.py's per-query
    # clearCache must spark.catalog.clearCache() (or unpersist the
    # result's lineage) themselves, or marks accumulate — the
    # documented marathon-OOM family.
    topk = bm25_topk(docs, queries, k=k, id_col=id_col).persist()
    emb = embeddings.select(
        F.col(emb_id_col).alias("__eid"),
        to_double_array(F.col(vec_col)).alias("__ev"),
    )
    pos = (
        topk.filter(F.col("rank") == 1)
        .join(emb, F.col("doc_id") == F.col("__eid"))
        .select("query_id", F.col("__ev").alias("pv"))
    )
    cand = (
        topk.filter(F.col("rank") > 1)
        .join(emb, F.col("doc_id") == F.col("__eid"))
        .join(F.broadcast(pos), "query_id")
        .select(
            "query_id",
            "doc_id",
            F.col("rank").alias("bm25_rank"),
            F.floor(
                cosine_similarity(F.col("__ev"), F.col("pv"))
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("cos_to_pos_micro"),
        )
    )
    return cand.select(
        "query_id",
        "doc_id",
        "bm25_rank",
        "cos_to_pos_micro",
        F.when(
            F.col("cos_to_pos_micro") < F.lit(int(cos_thresh_micro)), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("is_hard"),
    )
