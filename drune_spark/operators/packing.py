"""Document chunking and sequence packing (driver extension).

Training pipelines cut documents into model-window-sized chunks and pack
short documents together into fixed token budgets. Both are expressed as
narrow / group-local DataFrame ops:

- ``chunk_documents``: fixed-size token chunks with overlap via
  ``explode(sequence(...))`` + ``slice`` — narrow, no shuffle, linear.
- ``pack_sequences``: contiguous-fill packing — documents are routed to
  one of ``n_groups`` deterministic hash groups, ordered by id within
  the group, and assigned ``seq_id = floor(running_tokens / budget)``.
  One shuffle on the group key; the per-group window sorts only its
  group. A GLOBAL greedy pack is inherently sequential — the grouped
  form is the 100 TB layout (groups pack in parallel; each sequence may
  overflow the budget by at most one document, the standard contiguous
  "best-effort" packing trade-off). Deterministic: md5-based grouping,
  id ordering, integer arithmetic only.

No counterpart in /root/reference (native engine has no corpus-prep
ops); driver-mandated LLM-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from drune_spark.functions.hashes import md5_u32
from drune_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into whitespace-token chunks of
    ``chunk_size`` with ``overlap`` tokens of context between
    consecutive chunks (stride = chunk_size - overlap). Output:
    (id, chunk_id, n_chunk_tokens, chunk_text). Docs shorter than one
    chunk yield exactly one chunk."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    w = tokens(F.col(text_col))
    n = F.size(w)
    # chunks start at 0, stride, 2*stride, ... while start < n; a doc
    # with n <= chunk_size gets exactly one chunk.
    extra = F.when(
        n > chunk_size,
        F.ceil((n - F.lit(chunk_size)).cast("double") / F.lit(stride)),
    ).otherwise(F.lit(0)).cast("int")
    exploded = df.select(
        F.col(id_col),
        w.alias("__w"),
        F.explode(F.sequence(F.lit(0), extra)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("__w"), F.col("chunk_id") * stride + 1, chunk_size
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    id_col: str,
    budget: int = 512,
    n_groups: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Assign each document to a training sequence of ~``budget`` tokens
    by contiguous fill within deterministic hash groups. Output:
    (id, n_tokens, pack_group, seq_id) — all docs with the same
    (pack_group, seq_id) are concatenated downstream into one training
    sequence. seq_id = floor(tokens-before-this-doc / budget) within the
    group, so a sequence overflows the budget by at most one document.

    ``n_groups`` is the fill's parallelism AND its per-task state bound
    (each group is one window partition). Default derives from the data
    like semdedup's k — ``max(64, n // 4096)``, ≈≤4096 docs per group —
    so a fixed constant can't become the bottleneck at 100×; it is a
    deterministic function of the corpus (count, not cluster width), so
    defaulted output is reproducible across clusters. Callers pinning
    oracle-mirrored constants (the gates) pass n_groups explicitly."""
    if n_groups is None:
        n_groups = max(64, df.count() // 4096)
    group = F.pmod(
        md5_u32(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(n_groups),
    ).cast("int")
    win = (
        Window.partitionBy("pack_group")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.select(
        F.col(id_col),
        F.col(token_count_col).cast("long").alias("n_tokens"),
        group.alias("pack_group"),
    )
    running = F.sum("n_tokens").over(win) - F.col("n_tokens")
    return out.withColumn(
        "seq_id", F.floor(running / F.lit(budget)).cast("int")
    )


def pack_efficiency(
    packed: DataFrame,
    budget: int,
    group_col: str = "pack_group",
    seq_col: str = "seq_id",
    tok_col: str = "n_tokens",
) -> DataFrame:
    """Packing-efficiency audit — the dataset-card row for the packing
    stage: how full the training sequences actually are. Consumes a
    pack assignment (``pack_sequences``/``bpe_pack`` output) and
    reports per pack group: sequences built, docs packed, total
    tokens, overflowing sequences (the contract allows overflow by at
    most one document — this counts how often it happens), and fill /
    padding-waste rates in integer ppm of ``n_seqs · budget``
    (fill counts each sequence at most at budget; waste is the padding
    a fixed-length batch would burn). ``waste_ppm`` is defined as the
    exact complement ``10⁶ − fill_ppm`` (one floor division, one
    subtraction — two independent floors would leak 1 ppm whenever the
    division is inexact).

    One (group, seq) aggregate then one group aggregate — the audit
    costs two partial-aggregated shuffles over (group, seq, int) cells
    regardless of corpus size.
    """
    if budget < 1:
        raise ValueError("pack_efficiency needs budget >= 1")
    seqs = packed.groupBy(group_col, seq_col).agg(
        F.count(F.lit(1)).alias("__docs"),
        F.sum(tok_col).cast("long").alias("__s"),
    )
    b = int(budget)
    return (
        seqs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("__docs").cast("long").alias("n_docs"),
            F.sum("__s").cast("long").alias("sum_tokens"),
            F.sum((F.col("__s") > b).cast("long")).alias("n_overflow"),
            F.sum(F.least(F.col("__s"), F.lit(b))).cast("long")
             .alias("__fill"),
        )
        .select(
            group_col,
            "n_seqs",
            "n_docs",
            "sum_tokens",
            "n_overflow",
            F.expr(f"__fill * 1000000 div (n_seqs * {b})")
             .alias("fill_ppm"),
        )
        .withColumn("waste_ppm", F.lit(1_000_000) - F.col("fill_ppm"))
    )


def pack_mask_audit(
    packed: DataFrame,
    group_col: str = "pack_group",
    seq_col: str = "seq_id",
    tok_col: str = "n_tokens",
) -> DataFrame:
    """Cross-document attention-leakage audit for packed sequences:
    under FULL attention (no block-diagonal mask) every token pair
    drawn from two different documents in one sequence attends across
    a document boundary — the contamination the in-context-pretraining
    line measures before deciding whether the dataloader needs the
    per-document mask. Per sequence with doc token counts n₁..n_d and
    T = Σnᵢ:

        cross_pairs = Σ_{i<j} nᵢ·nⱼ = (T² − Σnᵢ²) div 2   (exact —
        the numerator is always even),
        leak_ppm    = (T² − Σnᵢ²)·10⁶ div max(T² − T, 1)  (share of
        all unordered token pairs that cross a boundary; the ÷2
        cancels).

    One (group, seq) aggregate over integer cells; T is bounded by
    budget + one overflow document, so every term stays far inside
    int64 at any corpus size.

    Returns (group_col, seq_col, n_docs, total_tokens, cross_pairs,
    leak_ppm).
    """
    seqs = packed.groupBy(group_col, seq_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok_col).cast("long").alias("__t"),
        # Square in int64: an IntegerType token count over ~46k tokens
        # would overflow int32 during the product (ANSI raises) — cast
        # BEFORE the multiply, matching the oracle's BIGINT arithmetic.
        F.sum(
            F.col(tok_col).cast("long") * F.col(tok_col).cast("long")
        ).alias("__ss"),
    )
    return seqs.select(
        group_col,
        seq_col,
        "n_docs",
        F.col("__t").alias("total_tokens"),
        F.expr("(__t * __t - __ss) div 2").alias("cross_pairs"),
        F.expr(
            "(__t * __t - __ss) * 1000000"
            " div greatest(__t * __t - __t, 1)"
        ).alias("leak_ppm"),
    )


def model_inputs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 40,
    seq_len: int = 32,
) -> DataFrame:
    """Model-input preparation — the last mile between a curated corpus
    and a training batch: map tokens to integer ids with a corpus-derived
    vocabulary (rank by frequency; 0 = PAD, 1 = UNK, real ids from 2),
    truncate to ``seq_len``, right-pad with PAD, and emit the attention
    counts. The id sequence is serialized as a comma string (the
    collect_set precedent: engine-portable value hashing for arrays).

    Determinism: vocabulary rank is (count desc, word asc) — a total
    order; sequence order is the document's token positions.

    Scale notes: the vocabulary is a top-V TakeOrdered over the
    token-count cells and is broadcast; documents explode to (doc, pos,
    token), map-side join to ids, and reassemble with one groupBy —
    shuffles carry (doc, pos, id) cells. Truncation happens at
    reassembly, so at most ``seq_len`` ids per doc reach the output.

    Returns (id_col, ids_str, n_real, n_pad).
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "word"
        ),
    )
    wc = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    vocab = (
        wc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= vocab_size)
        .select("word", (F.col("rk") + 1).alias("tok_id"))
    )
    ids = toks.join(F.broadcast(vocab), "word", "left").select(
        id_col, "pos", F.coalesce("tok_id", F.lit(1)).alias("tok_id")
    )
    seq = ids.groupBy(id_col).agg(
        F.slice(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok_id"))),
                lambda s: s["tok_id"],
            ),
            1,
            seq_len,
        ).alias("ids"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    n_real = F.least(F.col("n_tokens"), F.lit(seq_len)).cast("int")
    n_pad = (F.lit(seq_len) - n_real).cast("int")
    pad_expr = F.expr(
        f"repeat(',0', {int(seq_len)} - least(n_tokens, {int(seq_len)}))"
    )
    return seq.select(
        id_col,
        F.concat(
            F.concat_ws(",", F.transform("ids", lambda x: x.cast("string"))),
            pad_expr,
        ).alias("ids_str"),
        n_real.alias("n_real"),
        n_pad.alias("n_pad"),
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
) -> DataFrame:
    """Content-defined chunking (the storage-dedup primitive behind
    rsync/LBFS/restic): a chunk boundary falls after position p
    whenever the hash of the ``window``-char text window ending at p
    starts with hex '0' (P = 1/16 → expected chunk ≈ window + 16
    chars). Because boundaries depend on CONTENT, not offsets,
    inserting a prefix shifts positions but re-synchronizes at the
    first unchanged window — downstream chunks keep their identity
    (md5), which is the whole point: chunk-level dedup survives edits
    that would break fixed-size blocking. Boundary decisions are
    per-position INDEPENDENT (no min/max-size clamp), which is what
    makes the operator fully declarative — no sequential scan state.

    Pipeline: one explode over positions (boundary test inlined, JVM
    md5), boundary positions collect to a per-doc sorted int array
    (shuffle carries (doc, pos) ints, never text), then spans derive
    from the array and each chunk row carries its md5. Chunk ordinals
    count every span including a filtered empty tail, so ordinals are
    engine-independent.

    Scale notes: cost is one md5 per character — the honest CDC price
    (a production gear-hash would run incrementally per byte inside
    mapInPandas; same asymptotics, smaller constant). Text never
    shuffles: the boundary explode is scan-fused, chunks re-derive
    from the original row by position.

    Returns (id_col, chunk_no, start_pos, chunk_len, chunk_md5).
    """
    from drune_spark.functions.partitioning import fan_out

    L = F.length(F.col(text_col))
    idx = F.when(
        L >= window, F.sequence(F.lit(window), L)
    ).otherwise(F.expr("cast(array() as array<int>)"))
    # fan_out (r10): the boundary explode pays one md5 per CHARACTER
    # and the span side one md5 per chunk — both scan-fused, so with a
    # single-split parquet input the whole chunker ran on ONE core
    # (sf0.1: ~5.5M window hashes on one task). One narrow (id, text)
    # width shuffle feeds BOTH sides; no-op at production split counts.
    base = fan_out(df.select(F.col(id_col), F.col(text_col)))
    bounds = (
        base
        .select(
            id_col,
            F.explode(idx).alias("p"),
            F.col(text_col),
        )
        .filter(
            F.substring(
                F.md5(
                    F.substring(
                        F.col(text_col), F.col("p") - (window - 1),
                        F.lit(window),
                    )
                ),
                1, 1,
            ) == "0"
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("p")).alias("bs"))
    )
    j = base.join(
        bounds, id_col, "left"
    ).select(
        id_col,
        F.col(text_col),
        F.coalesce(F.col("bs"), F.expr("cast(array() as array<int>)"))
        .alias("bs"),
    )
    starts = F.concat(
        F.array(F.lit(1)),
        F.transform(F.col("bs"), lambda b: b + 1),
    )
    ends = F.concat(F.col("bs"), F.array(L.cast("int")))
    spans = j.select(
        id_col,
        F.col(text_col),
        F.posexplode(
            F.zip_with(
                starts, ends,
                lambda s, e: F.struct(s.alias("s"), e.alias("e")),
            # lambda-built struct drops field names — cast restores
            ).cast("array<struct<s:int,e:int>>")
        ).alias("chunk_no", "span"),
    )
    return spans.filter(
        F.col("span.s") <= F.col("span.e")
    ).select(
        id_col,
        F.col("chunk_no").cast("int").alias("chunk_no"),
        F.col("span.s").alias("start_pos"),
        (F.col("span.e") - F.col("span.s") + 1).alias("chunk_len"),
        F.md5(
            F.substring(
                F.col(text_col), F.col("span.s"),
                F.col("span.e") - F.col("span.s") + 1,
            )
        ).alias("chunk_md5"),
    )


def bin_pack_next_fit(
    df: DataFrame,
    token_count_col: str,
    id_col: str,
    budget: int = 512,
    n_groups: int | None = None,
    salt: str = "",
) -> DataFrame:
    """STRICT-budget next-fit sequence packing: within each
    deterministic hash shard, walk documents in id order and start a
    new bin whenever adding the next document would exceed ``budget``
    — bins never overflow (the hard constraint real training-sequence
    packing has), unlike ``pack_sequences``' cumulative-floor variant
    which admits one overflow document per sequence. A document larger
    than the budget gets a bin of its own.

    Next-fit is a sequential recurrence (bin boundary depends on every
    prior placement — not associative, no window aggregate expresses
    it), so it runs where that tier belongs: one Arrow batch per shard
    via applyInPandas, a bounded python-int loop, state never leaves
    the executor (the ewma_monitor discipline). All-integer, so the
    DuckDB oracle replays the identical recurrence as a per-shard
    recursive CTE.

    Scale shape: shards parallelize across executors and bound both
    the Arrow batch and the oracle's recursion depth; corpus text
    never enters — only (id, n_tokens) cells shuffle once on the
    shard key. ``n_groups`` defaults to ``max(8, n // 4096)`` (the
    pack_sequences derivation: ≈≤4096 docs per Arrow batch, shard
    count ∝ corpus — a fixed constant would cap parallelism at 100×;
    data-derived, so defaulted output is cluster-independent). Gates
    pin it explicitly for their oracles. Returns
    (id, pack_group, n_tokens, bin_id, fill) with fill = bin occupancy
    after placing the document.
    """
    import pandas as pd

    from drune_spark.functions.hashes import md5_u32

    if n_groups is None:
        n_groups = max(8, df.count() // 4096)

    group = F.pmod(
        md5_u32(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(n_groups),
    ).cast("int")
    cells = df.select(
        F.col(id_col),
        F.col(token_count_col).cast("long").alias("n_tokens"),
        group.alias("pack_group"),
    )
    out_schema = (
        f"{id_col} bigint, pack_group int, n_tokens bigint, "
        "bin_id bigint, fill bigint"
    )

    def _run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        bin_id, fill = 0, 0
        bins, fills = [], []
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                bin_id += 1
                fill = t
            else:
                fill += t
            bins.append(bin_id)
            fills.append(fill)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "pack_group": pdf["pack_group"].values,
                "n_tokens": pdf["n_tokens"].values,
                "bin_id": bins,
                "fill": fills,
            }
        )

    return cells.groupBy("pack_group").applyInPandas(_run, out_schema)


def fim_transform(
    df: DataFrame,
    text_col: str,
    id_col: str,
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-middle (FIM) training transform (Bavarian et al. 2022,
    arXiv:2207.14255 — the code-model pretraining reorder): for a
    deterministic half of the corpus, split the document at two
    hash-derived cut points and emit PSM order
    ``<PRE>prefix<SUF>suffix<MID>middle``; the rest pass through — the
    standard ~50% FIM rate. Everything is 1-based substring
    arithmetic on md5-derived cuts, so the DuckDB oracle reproduces
    every transformed byte.

    One narrow projection — no shuffle, no UDF, whole-stage codegen;
    at 100 TB this fuses into whatever scan feeds sequence packing.
    Returns (id, fim_applied, cut_lo, cut_hi, out_text).
    """
    applied, lo, hi, out_text = fim_exprs(text_col, id_col, salt)
    return df.select(
        F.col(id_col),
        applied.alias("fim_applied"),
        F.when(applied == 1, lo).otherwise(F.lit(0))
        .cast("long").alias("cut_lo"),
        F.when(applied == 1, hi).otherwise(F.lit(0))
        .cast("long").alias("cut_hi"),
        out_text.alias("out_text"),
    )


def fim_exprs(text_col: str, id_col: str, salt: str = "fim"):
    """The FIM column expressions (applied, cut_lo, cut_hi, out_text)
    as pure Columns, so pipeline steps can splice the transformed text
    in-place with withColumn — consuming their input ONCE — instead of
    joining fim_transform's output back on id (which re-evaluates the
    whole upstream chain per join branch: the self-referencing-DAG
    trap)."""
    n = F.length(F.col(text_col))
    h = lambda tag: md5_u32(  # noqa: E731 — tiny local expr builder
        F.concat(F.lit(f"{salt}{tag}:"), F.col(id_col).cast("string"))
    )
    applied = (
        (F.pmod(h("r"), F.lit(2)) == 0) & (n >= 2)
    ).cast("int")
    den = F.greatest(n - 1, F.lit(1))
    c1 = F.lit(1) + F.pmod(h("1"), den)
    c2 = F.lit(1) + F.pmod(h("2"), den)
    lo = F.least(c1, c2)
    hi = F.greatest(c1, c2)
    pre = F.substring(F.col(text_col), F.lit(1), lo)
    suf = F.substring(F.col(text_col), hi + 1, n)
    mid = F.substring(F.col(text_col), lo + 1, hi - lo)
    fim = F.concat(
        F.lit("<PRE>"), pre, F.lit("<SUF>"), suf, F.lit("<MID>"), mid
    )
    out_text = F.when(applied == 1, fim).otherwise(F.col(text_col))
    return applied, lo, hi, out_text


def span_corrupt_transform(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_len: int = 3,
    salt: str = "span1",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020, arXiv:1910.10683
    §3.1.4): mask two word spans per document with sentinels and emit
    the (input, target) pair — input keeps the surrounding words with
    ``<X0>``/``<X1>`` in place of the spans, target is the sentinel-
    delimited span contents. The denoising counterpart of the FIM
    reorder (packing.py fim_transform): FIM moves text, span
    corruption REMOVES it, which is what T5/UL2-class encoder-decoder
    pretraining consumes.

    Deterministic geometry: span 0 starts at an md5 draw inside the
    first word-half, span 1 inside the second half — disjoint by
    construction, no overlap/merge cases; docs under ``2·span_len + 2``
    words pass through unchanged (applied = 0). Pure narrow projection
    (split + slice + concat — whole-stage codegen, no shuffle, no
    UDF); at 100 TB this fuses into the packing scan like FIM does.

    Returns (id, applied, s0, s1, input_text, target_text).
    """
    applied, s0, s1, input_text, target_text = span_corrupt_exprs(
        text_col, id_col, span_len, salt
    )
    return df.select(
        F.col(id_col),
        applied.alias("applied"),
        F.when(applied == 1, s0).otherwise(0).cast("long").alias("s0"),
        F.when(applied == 1, s1).otherwise(0).cast("long").alias("s1"),
        F.when(applied == 1, input_text)
        .otherwise(F.col(text_col)).alias("input_text"),
        F.when(applied == 1, target_text)
        .otherwise(F.lit("")).alias("target_text"),
    )

def span_corrupt_exprs(
    text_col: str,
    id_col: str,
    span_len: int = 3,
    salt: str = "span1",
):
    """The span-corruption column expressions (applied, s0, s1,
    input_text, target_text) as pure Columns — the fim_exprs pattern:
    pipeline steps splice the corrupted text in place with withColumn,
    consuming their input exactly once."""
    L = int(span_len)
    w = tokens(F.col(text_col))
    nw = F.size(w)
    half = F.floor(nw / 2).cast("int")
    h = lambda tag: md5_u32(  # noqa: E731 — tiny local expr builder
        F.concat(F.lit(f"{salt}{tag}:"), F.col(id_col).cast("string"))
    )
    applied = (nw >= 2 * L + 2).cast("int")
    # greatest(…, 1) guards the pass-through rows (nw < 2L+2): CaseWhen
    # evaluates lazily in Spark, but the DuckDB mirror computes these
    # for every row, and % 0 must never occur on either side.
    s0 = F.lit(1) + F.pmod(h("a"), F.greatest(half - L + 1, F.lit(1)))
    s1 = half + 1 + F.pmod(
        h("b"), F.greatest(nw - half - L + 1, F.lit(1))
    )
    seg = lambda a, ln: F.array_join(  # noqa: E731
        F.slice(w, a, ln), " "
    )
    input_text = F.concat(
        seg(F.lit(1), s0 - 1), F.lit(" <X0> "),
        seg(s0 + L, s1 - s0 - L), F.lit(" <X1> "),
        seg(s1 + L, nw - s1 - L + 1),
    )
    target_text = F.concat(
        F.lit("<X0> "), seg(s0, F.lit(L)),
        F.lit(" <X1> "), seg(s1, F.lit(L)),
    )
    return applied, s0, s1, input_text, target_text


def similarity_pack(
    docs: DataFrame,
    emb: DataFrame,
    n_cells: int = 8,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Similarity-ordered sequence packing — the in-context-pretraining
    recipe (Shi et al. 2023, arXiv:2310.10638): instead of hash-random
    fill (``pack_sequences``), documents are grouped into coarse
    semantic cells (seed-cosine argmax — the shared
    ``similarity.seed_cell_assign`` primitive) and packed in
    decreasing-cohesion order within each cell, so each training
    sequence concatenates RELATED documents — the ordering that
    teaches long-context models to use cross-document context.

    All integer: cell + floored-micro cosine from the shared
    assignment, token counts via the whitespace token_count, sequence
    boundaries by ``tokens-before div budget`` over the
    (cos_micro DESC, id) window PARTITIONED BY CELL — n_cells
    independent window partitions, no global sort, same spill bound
    argument as pack_sequences' hash groups.

    Returns per (cell, seq_id): n_docs, sum_tokens, cohesion band
    (min/max cos_micro of members) — the per-sequence audit a curation
    pass reviews. Docs without an embedding row are dropped (inner
    join; the hard_negative_mine caveat).

    No counterpart in /root/reference; driver-mandated training-data
    extension.
    """
    from drune_spark.functions.text import token_count
    from drune_spark.operators.similarity import seed_cell_assign

    if budget < 1:
        raise ValueError("similarity_pack needs budget >= 1")
    cells = seed_cell_assign(
        emb, n_cells=n_cells, id_col=emb_id_col, vec_col=vec_col
    )
    toks = docs.select(
        F.col(id_col).alias("__id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    j = cells.join(
        toks, F.col(emb_id_col) == F.col("__id")
    ).select("__id", "cell", "cos_micro", "n_tokens")
    packed = j.select(
        "cell",
        "cos_micro",
        "n_tokens",
        F.expr(
            f"(sum(n_tokens) OVER (PARTITION BY cell "
            f"ORDER BY cos_micro DESC, __id ASC "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"- n_tokens) div {int(budget)}"
        ).alias("seq_id"),
    )
    return packed.groupBy("cell", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.min("cos_micro").alias("cos_min_micro"),
        F.max("cos_micro").alias("cos_max_micro"),
    )


def prefix_cache_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    max_tokens: int = 64,
) -> DataFrame:
    """Radix-tree prefix-cache hit audit — the serving-efficiency
    measurement behind vLLM-style automatic prefix caching: if each
    group's prompts are served in lexicographic order against a prefix
    trie, every prompt reuses exactly ``LCP(prompt, predecessor)``
    tokens of cached KV state (the classic identity: the sum of
    adjacent-sorted LCPs equals total trie-edge reuse). Reports
    per-prompt hit tokens and hit rate, the number that decides
    whether shared-prefix batching is worth deploying on a workload.

    Prompts are the first ``max_tokens`` whitespace tokens. LCP is
    computed order-free as ``count of i where the first-i-token joins
    of prompt and predecessor are equal`` (prefix equality is monotone
    in i, so the count IS the LCP — no early-exit fold, no interpreted
    HOF, identical in SQL). Sort windows are per group, bounded by
    group size; ties among identical texts are harmless (LCP with an
    identical text is full length regardless of tie order) but are
    still broken on the id for engine parity.

    Returns ``(id_col, group_col, prompt_tokens, hit_tokens,
    hit_ppm)`` — one row per prompt; the first prompt of each group
    hits 0.
    """
    from pyspark.sql import Window

    from drune_spark.functions.text import tokens

    if max_tokens < 1:
        raise ValueError("prefix_cache_audit needs max_tokens >= 1")
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.slice(tokens(F.col(text_col)), 1, int(max_tokens)).alias(
            "toks"
        ),
        F.col(text_col).alias("__txt"),
    )
    wg = Window.partitionBy(group_col).orderBy("__txt", id_col)
    lagged = base.select(
        F.col(id_col),
        F.col(group_col),
        "toks",
        F.lag("toks").over(wg).alias("ptoks"),
    )
    m = F.least(F.size("toks"), F.size("ptoks"))
    idx = F.when(
        F.col("ptoks").isNotNull() & (m >= 1),
        F.sequence(F.lit(1), m),
    ).otherwise(F.expr("cast(array() as array<int>)"))
    ex = lagged.select(
        F.col(id_col), F.explode(idx).alias("i"), "toks", "ptoks"
    )
    eq = (
        F.array_join(F.slice("toks", 1, F.col("i")), " ")
        == F.array_join(F.slice("ptoks", 1, F.col("i")), " ")
    )
    hits = ex.groupBy(id_col).agg(
        F.sum(eq.cast("long")).cast("long").alias("hit_tokens")
    )
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            group_col,
            F.size("toks").cast("long").alias("prompt_tokens"),
            F.coalesce("hit_tokens", F.lit(0)).cast("long").alias(
                "hit_tokens"
            ),
            F.expr(
                "coalesce(hit_tokens, 0) * 1000000"
                " div greatest(size(toks), 1)"
            ).alias("hit_ppm"),
        )
    )
