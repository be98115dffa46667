"""Embedding storage/transport operators (driver extension).

Symmetric int8 quantization for embedding columns — the standard 4×
storage/bandwidth reduction before ANN indexing. Pure JVM array
arithmetic (zip-free: transform + array_max), narrow, zero shuffle.

Rounding is spelled out as ``floor(x / scale + 0.5)`` (round half
toward +inf) instead of an engine ``round()`` builtin, so the exact
same FP op sequence runs in any engine — the DuckDB oracle reproduces
every quantized value bit-for-bit.

No counterpart in /root/reference; driver-mandated LLM-data extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from drune_spark.functions.vectors import cosine_similarity, to_double_array


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric quantization to ``bits``-bit signed ints:
    scale = max(|x|) / qmax, q_i = floor(x_i / scale + 0.5). Returns
    (id, scale, qvec). Dequantize with q_i * scale; all-zero vectors get
    scale 0 and zero codes."""
    qmax = (1 << (bits - 1)) - 1
    v = to_double_array(F.col(vec_col))
    # Stage scale as a materialized column: referencing the array_max
    # subtree inside the transform lambda would re-evaluate it per
    # element (interpreted-HOF trap — see functions/text.py header).
    staged = df.select(
        F.col(id_col),
        v.alias("__v"),
        (
            F.array_max(F.transform(v, lambda x: F.abs(x)))
            / F.lit(float(qmax))
        ).alias("scale"),
    )
    s = F.col("scale")
    qvec = F.when(
        s > 0,
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x / s + F.lit(0.5)).cast("int"),
        ),
    ).otherwise(F.transform(F.col("__v"), lambda x: F.lit(0)))
    return staged.select(F.col(id_col), s, qvec.alias("qvec"))


def gram_cells(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Uncentered covariance (Gram) matrix of a quantized embedding
    column as (a, b, c) integer cells: C[a][b] = Σ_rows q_a·q_b with
    q = floor(x·scale) — the corpus-level second-moment statistic
    behind anisotropy audits and PCA. Quantization goes through the
    proven float→double cast, a double multiply and floor, all
    bit-identical across engines, so the cell table is oracle-exact.

    Per-partition numpy computes the local XᵀX and emits ONE d×d cell
    grid per Arrow batch (mapInPandas) — the map-side combine that
    makes the shuffle carry dim²·partitions cells instead of dim²·rows
    (a double-posexplode would inflate rows 4096× before partial
    aggregation; the dense-matrix tier is exactly where built-in
    operators stop being the right tool). Entries stay in int64 while
    n·scale² < 2⁶³ (n < 9·10¹² at scale 1000).
    """
    import numpy as np
    import pandas as pd

    from drune_spark.functions.vectors import to_double_array

    vecs = df.select(to_double_array(F.col(vec_col)).alias("v"))

    def proc(batches):
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            q = np.floor(x * scale).astype(np.int64)
            acc += q.T @ q
            seen = True
        if seen:
            a, b = np.meshgrid(
                np.arange(dim, dtype=np.int64),
                np.arange(dim, dtype=np.int64),
                indexing="ij",
            )
            yield pd.DataFrame({
                "a": a.ravel(), "b": b.ravel(), "c": acc.ravel(),
            })

    cells = vecs.mapInPandas(proc, schema="a int, b int, c long")
    return cells.groupBy("a", "b").agg(F.sum("c").alias("c"))


def power_iteration_axis(
    spark,
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    rounds: int = 3,
    scale: int = 1000,
) -> DataFrame:
    """Dominant principal axis of the embedding Gram matrix by EXACT
    INTEGER power iteration — the anisotropy/drift audit (is the
    embedding space collapsing onto one direction?) computed without
    a single float in the iteration, so every engine replays it
    digit-for-digit: v₀ = scale·1 (all-ones), each round multiplies
    the integer cell matrix (``gram_cells``) and renormalizes to
    max-abs = scale with the shifted floor division
    ``(w·scale + scale·m) div m − scale`` (numerator nonnegative by
    |w| ≤ m, so engine division rules can't diverge).

    The Gram build is the only corpus-sized job; each round is a
    d²-cell join against a broadcast d-row vector plus a d-cell sum,
    with the updated vector fetched driver-side (64 rows — the
    k-centroid bounded-control-fetch discipline). Overflow envelope:
    |C·v| ≤ d·max|C|·scale — int64-safe while n·d·scale³ < 2⁶³
    (n < 1.4·10⁸ at d=64, scale=1000; rescale to centi beyond).

    Returns (round, dim_i, v) for every round — the full trajectory,
    convergence itself being part of the checked output.
    """
    from drune_spark.functions.vectors import lit_long_array

    # The cell table is dim² rows REGARDLESS of corpus size, so a
    # near-single-partition layout is scale-safe (not a local[32]
    # constant): 32 cached partitions of ~128 cells each cost ~0.4 s
    # of per-task overhead per round vs ~0.12 s coalesced (interleaved
    # A/B ×3, identical values). ~500k cells per partition keeps even
    # dim=1024 (1M cells) at a sane width.
    n_parts = max(1, (dim * dim) // 500_000)
    C = gram_cells(df, vec_col=vec_col, dim=dim, scale=scale) \
        .coalesce(n_parts).persist()
    v = [scale] * dim
    out_rows = []
    for r in range(1, rounds + 1):
        # JVM literal-array frame, NOT spark.createDataFrame: a local
        # python createDataFrame becomes a pickled RDD scanned by
        # defaultParallelism python tasks, each paying a ~250 ms worker
        # handshake (r10 profile: 0 CPU, 0 input, ~50 taskSec/query of
        # pure wait). range(1 partition) + posexplode of one literal
        # array stays entirely in the JVM.
        vf = spark.range(0, dim, 1, 1).select(
            F.col("id").cast("int").alias("b"),
            F.element_at(
                lit_long_array(v), (F.col("id") + 1).cast("int")
            ).alias("vb"),
        )
        w_rows = (
            C.join(F.broadcast(vf), "b")
            .groupBy("a")
            .agg(F.sum(F.col("c") * F.col("vb")).alias("w"))
            .collect()
        )
        w = [0] * dim
        for row in w_rows:
            w[row["a"]] = int(row["w"])
        m = max(abs(x) for x in w)
        if m == 0:
            m = 1
        v = [(x * scale + scale * m) // m - scale for x in w]
        out_rows.extend((r, i, int(v[i])) for i in range(dim))
    C.unpersist()
    # Same JVM-literal discipline for the trajectory output (row order
    # is round-major, exactly the old tuple order).
    vs = lit_long_array([t[2] for t in out_rows])
    return spark.range(0, len(out_rows), 1, 1).select(
        (F.lit(1) + F.expr(f"id div {int(dim)}")).cast("int")
        .alias("round"),
        F.pmod(F.col("id"), F.lit(dim)).cast("int").alias("dim_i"),
        F.element_at(vs, (F.col("id") + 1).cast("int"))
        .cast("long").alias("v"),
    )


def pq_codebook(
    v: DataFrame,
    n_subspaces: int,
    sub: int,
    codebook_size: int,
    id_col: str,
) -> DataFrame:
    """Shared per-subspace PQ codebook — subvectors of the
    ``codebook_size`` lowest-id vectors (the ivf_assign seed
    discipline). ONE definition consumed by pq_encode (write path),
    pq_adc_recall and ivf_pq_serve (serve paths): the (s, code) join
    keys of stored codes and ADC lookup tables derive from the same
    frame, so the seed rule can never silently drift between them.
    Input ``v`` must carry (id_col, v: array<double>).

    Returns (code, s, cwv) — n_subspaces · codebook_size rows,
    broadcast-sized.
    """
    seeds = (
        v.orderBy(F.col(id_col))
        .limit(codebook_size)
        .select(F.col(id_col).alias("code"), F.col("v").alias("cw"))
    )
    spaces = F.explode(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1))
    ).alias("s")
    return seeds.select("code", spaces, "cw").select(
        "code",
        "s",
        F.expr(f"slice(cw, s * {sub} + 1, {sub})").alias("cwv"),
    )


def pq_encode(
    corpus: DataFrame,
    dim: int = 64,
    n_subspaces: int = 4,
    codebook_size: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization (Jégou et al. 2011, "Product quantization
    for nearest neighbor search") — the vector-COMPRESSION tier this
    engine's ANN family needs at 100 TB (int8 quantization shrinks 4×;
    PQ shrinks dim·4 bytes → n_subspaces codes, here 256→4 bytes):
    the vector splits into ``n_subspaces`` contiguous subvectors, each
    assigned to its nearest codeword from a per-subspace codebook, and
    the code tuple plus per-vector reconstruction error is emitted —
    the layout an IVF-PQ index stores instead of raw floats.

    Codebooks are the subvectors of the ``codebook_size`` lowest-id
    vectors (the ivf_assign seed discipline — a k-means refinement
    would iterate exactly this assignment); assignment is the proven
    cosine fold on identically-sliced operands, argmax via
    ``min(struct(-sim, code))`` (map-side partial, no window sort,
    ties to the smaller code id); reconstruction error =
    floor(1e6·(1 − cos(concat(codewords), v))) — exact-integer micro,
    concatenation order is subspace order on both engines.

    Plan shape: codebooks are n_subspaces·codebook_size broadcast
    rows; the assignment stream carries (id, subspace, code) cells;
    reconstruction is n_subspaces more broadcast joins. The corpus is
    scanned once and never shuffles with its floats.

    Returns (id_col, code_0..code_{m-1}, err_micro) — one row per
    vector.
    """
    sub = dim // n_subspaces
    v = corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
    )
    spaces = F.explode(
        F.sequence(F.lit(0), F.lit(n_subspaces - 1))
    ).alias("s")
    subs = v.select(id_col, spaces, "v").select(
        id_col,
        "s",
        F.expr(f"slice(v, s * {sub} + 1, {sub})").alias("sv"),
    )
    book = pq_codebook(v, n_subspaces, sub, codebook_size, id_col)
    assigned = (
        subs.join(F.broadcast(book), "s")
        .select(
            id_col,
            "s",
            "code",
            cosine_similarity(F.col("sv"), F.col("cwv")).alias("sim"),
        )
        .groupBy(id_col, "s")
        .agg(
            F.min(
                F.struct((-F.col("sim")).alias("neg"), F.col("code"))
            ).alias("best")
        )
        .select(id_col, "s", F.col("best.code").alias("code"))
    )
    codes = assigned.groupBy(id_col).agg(
        *[
            F.max(
                F.when(F.col("s") == i, F.col("code"))
            ).cast("long").alias(f"code_{i}")
            for i in range(n_subspaces)
        ]
    )
    rec = codes
    for i in range(n_subspaces):
        bi = book.filter(F.col("s") == i).select(
            F.col("code").alias(f"code_{i}"), F.col("cwv").alias(f"p{i}")
        )
        rec = rec.join(F.broadcast(bi), f"code_{i}")
    recon = F.concat(*[F.col(f"p{i}") for i in range(n_subspaces)])
    out = (
        rec.join(v, id_col)
        .select(
            id_col,
            *[f"code_{i}" for i in range(n_subspaces)],
            F.greatest(
                F.lit(0).cast("long"),
                F.floor(
                    (F.lit(1.0) - cosine_similarity(recon, F.col("v")))
                    * F.lit(1000000.0)
                ).cast("long"),
            ).alias("err_micro"),
        )
        .orderBy(id_col)
    )
    return out


def pq_adc_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_subspaces: int = 4,
    codebook_size: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) search over PQ codes + recall@k vs
    the exact ranking — the eval that closes the pq_encode loop
    (encode is only worth its 64× compression if the code-space
    ranking still finds the true neighbors): per query, a lookup
    table of subspace partial scores cos(q_s, codeword) is built
    against the n_subspaces·codebook_size broadcast book, each
    corpus vector scores as the SUM of its codes' partials — floored
    to integer micro PER PARTIAL first, so the sum is order-free and
    engine-exact (a raw double SUM over an aggregate would depend on
    addition order) — and the ADC top-k is intersected with the exact
    cosine top-k.

    Scale shape: after encoding, search touches only (id, s, code)
    cells and a |queries|·m·k' lookup table — the raw floats are read
    once by the encode and never again; this is the IVF-PQ memory
    contract. Exact side reuses brute_force_topk (the audited
    baseline).

    Returns (query_id, n_hits) — |ADC top-k ∩ exact top-k| per query,
    ordered by query.
    """
    from pyspark.sql import Window

    from drune_spark.operators.similarity import brute_force_topk

    sub = dim // n_subspaces
    codes_wide = pq_encode(
        corpus, dim=dim, n_subspaces=n_subspaces,
        codebook_size=codebook_size, id_col=id_col, vec_col=vec_col,
    )
    code_cells = codes_wide.select(
        F.col(id_col).alias("cand"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("s"),
                    F.col(f"code_{i}").alias("code"),
                )
                for i in range(n_subspaces)
            ])
        ).alias("sc"),
    ).select("cand", F.col("sc.s").alias("s"), F.col("sc.code").alias("code"))
    v = corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
    )
    book = pq_codebook(v, n_subspaces, sub, codebook_size, id_col)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
    )
    parts = (
        q.crossJoin(F.broadcast(book))
        .select(
            "query_id", "s", "code",
            F.floor(
                cosine_similarity(
                    F.expr(f"slice(qv, s * {sub} + 1, {sub})"),
                    F.col("cwv"),
                ) * F.lit(1000000.0)
            ).cast("long").alias("part_micro"),
        )
    )
    scored = (
        code_cells.join(F.broadcast(parts), ["s", "code"])
        .filter(F.col("cand") != F.col("query_id"))
        .groupBy("query_id", "cand")
        .agg(F.sum("part_micro").alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_micro").desc(), F.col("cand").asc()
    )
    approx = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    ).select("query_id", F.col("cand").alias("neighbor_id"))
    exact = brute_force_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    ).select("query_id", "neighbor_id")
    hits = approx.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    return (
        q.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
        .orderBy("query_id")
    )


def ivf_pq_serve(
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_iters: int = 2,
    nprobe: int = 3,
    dim: int = 64,
    n_subspaces: int = 4,
    codebook_size: int = 8,
    query_mod: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The composed IVF-PQ serving path (VERDICT r7 #5) — the
    industry-standard 100 TB ANN layout, end to end: Lloyd-TRAINED
    coarse cells (kmeans.py ivf_train — integer-exact), the corpus
    PQ-encoded (pq_encode — 64× compression), each query probing its
    ``nprobe`` nearest trained cells and ADC-scoring ONLY the
    candidates living in probed cells, closed by the recall@k eval
    against the exact cosine ranking (the pq_adc_recall discipline).

    Queries are every ``query_mod``-th id of the corpus (the
    ann_pipeline shape — when run as a pipeline step the corpus is
    the SCREENED survivor set, so index, probes, and exact baseline
    all see survivors only).

    Scale shape: training is T corpus scans with k·dim driver-side
    integers (MLlib's control loop); cell probing is |Q|·k broadcast
    integer distances; the ADC scan touches (id, s, code) cells of
    probed cells only — candidates ∝ nprobe/k of the corpus instead
    of all of it, and the raw floats are read once by the encoder and
    never again. Exact re-rank of the full corpus exists ONLY in the
    recall eval (the audit, not the serving path).

    Determinism: cell assignment/probing are integer squared-L2 over
    quantized codes with (dist, cell) tie-break; ADC partials floor to
    integer micro BEFORE the order-free sum; top-k tie-breaks
    (score desc, id asc). A DuckDB oracle replays training, encoding,
    probing, and both rankings bit-for-bit.

    Returns (query_id, n_cand, n_hits): candidates ADC-scored and
    exact-top-k hits for each query, ordered by query.
    """
    from pyspark.sql import Window

    from drune_spark.operators.kmeans import (
        _best_cell,
        _sqdist,
        ivf_train,
        quantize_unsigned,
    )
    from drune_spark.operators.similarity import brute_force_topk

    sub = dim // n_subspaces
    trained = ivf_train(
        corpus, n_centroids=n_centroids, n_iters=n_iters, dim=dim,
        id_col=id_col, vec_col=vec_col, with_stats=False,
    ).collect()  # k rows of dim ints — bounded control fetch
    centroids = sorted(
        (int(r["centroid_id"]), [int(x) for x in r["centroid"]])
        for r in trained
    )

    qz = quantize_unsigned(corpus, vec_col, id_col)
    cellmap = qz.select(
        F.col(id_col).alias("cand"),
        _best_cell(centroids)["centroid_id"].alias("cell"),
    )

    is_query = F.pmod(F.col(id_col), F.lit(int(query_mod))) == 0
    qz_q = qz.filter(is_query).select(
        F.col(id_col).alias("query_id"), "qv"
    )
    cell_structs = F.array(
        *[
            F.struct(
                _sqdist(F.col("qv"), c).alias("dist"),
                F.lit(cid).cast("long").alias("cell"),
            )
            for cid, c in centroids
        ]
    ).cast("array<struct<dist:bigint,cell:bigint>>")
    wq = Window.partitionBy("query_id").orderBy(
        F.col("dc.dist").asc(), F.col("dc.cell").asc()
    )
    probes = (
        qz_q.select("query_id", F.explode(cell_structs).alias("dc"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("dc.cell").alias("cell"))
    )

    codes_wide = pq_encode(
        corpus, dim=dim, n_subspaces=n_subspaces,
        codebook_size=codebook_size, id_col=id_col, vec_col=vec_col,
    )
    code_cells = codes_wide.select(
        F.col(id_col).alias("cand"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("s"),
                    F.col(f"code_{i}").alias("code"),
                )
                for i in range(n_subspaces)
            ])
        ).alias("sc"),
    ).select("cand", F.col("sc.s").alias("s"), F.col("sc.code").alias("code"))

    v = corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
    )
    book = pq_codebook(v, n_subspaces, sub, codebook_size, id_col)
    queries = corpus.filter(is_query)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
    )
    parts = (
        q.crossJoin(F.broadcast(book))
        .select(
            "query_id", "s", "code",
            F.floor(
                cosine_similarity(
                    F.expr(f"slice(qv, s * {sub} + 1, {sub})"),
                    F.col("cwv"),
                ) * F.lit(1000000.0)
            ).cast("long").alias("part_micro"),
        )
    )

    cands = probes.join(cellmap, "cell").select("query_id", "cand")
    scored = (
        cands.join(code_cells, "cand")
        .join(F.broadcast(parts), ["query_id", "s", "code"])
        .filter(F.col("cand") != F.col("query_id"))
        .groupBy("query_id", "cand")
        .agg(F.sum("part_micro").alias("adc_micro"))
    )
    # Single-pass tail: both the top-k rank AND the candidate count
    # ride one query_id window shuffle — a separate n_cand aggregate
    # would consume `scored` twice and re-plan the whole ADC chain per
    # branch (the r7 self-referencing-step trap).
    wk = Window.partitionBy("query_id").orderBy(
        F.col("adc_micro").desc(), F.col("cand").asc()
    )
    wc = Window.partitionBy("query_id")
    ranked = (
        scored.withColumn("rk", F.row_number().over(wk))
        .withColumn("n_cand", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") <= k)
    )
    exact = brute_force_topk(
        corpus, queries.withColumnRenamed(id_col, "query_id"),
        k=k, id_col=id_col, vec_col=vec_col,
    ).select(
        F.col("query_id").alias("eq"),
        F.col("neighbor_id").alias("en"),
    )
    res = (
        ranked.join(
            exact,
            (ranked.query_id == F.col("eq"))
            & (ranked.cand == F.col("en")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.max("n_cand").cast("long").alias("n_cand"),
            F.sum(
                F.when(F.col("en").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_hits"),
        )
    )
    return (
        q.select("query_id")
        .join(res, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_cand", F.lit(0)).cast("long").alias("n_cand"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
        .orderBy("query_id")
    )


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: tuple[int, ...] = (8, 16, 32),
    full_dim: int = 64,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Matryoshka truncation eval (Kusupati et al. 2022,
    arXiv:2205.13147): per-query recall@k of cosine top-k computed on
    PREFIX-truncated embeddings (first ``m`` dims, renormalized by the
    cosine itself) against the full-dimension exact ranking — the
    audit that decides how far an MRL-trained embedding column can be
    truncated before retrieval quality drops, i.e. how much of the
    100 TB vector footprint (and ANN index) can be cut.

    One corpus×queries scan computes EVERY truncation level's cosine
    (explode of a per-pair struct array — no per-dim rescans), one
    window ranks all (query, dim) cells, and the hit test consumes the
    top-k frame exactly ONCE: pairs fold to their dim-membership set,
    a hit for dim m = {m, full_dim} both present (the
    self-referencing-DAG trap avoided — no topk-vs-topk join that
    would re-execute the scan per branch).

    Returns (query_id, dim, n_hits, recall_ppm), zero-filled from the
    queries × dims grid so empty truncations still report.
    """
    from drune_spark.functions.partitioning import fan_out

    all_dims = [int(m) for m in dims] + [int(full_dim)]
    # The cosine folds are interpreted HOF lambdas — CPU-bound per row.
    # A single-file corpus scan would run the whole scoring chain in
    # ONE task (measured 5-10s vs 3s at 3× the data on this box);
    # fan_out widens the scan to core count before the broadcast join.
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(F.col(vec_col)).alias("cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
    )
    per_pair = F.array(*[
        F.struct(
            F.lit(m).alias("dim"),
            cosine_similarity(
                F.slice("cv", 1, m), F.slice("qv", 1, m)
            ).alias("cosine"),
        )
        for m in all_dims
    ]).cast("array<struct<dim:int,cosine:double>>")  # HOF members drop
    # struct field names without the explicit cast (kmeans.py trap)
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                F.explode(per_pair).alias("s"))
        .select("query_id", "neighbor_id", "s.dim", "s.cosine")
    )
    from pyspark.sql import Window
    w = (
        Window.partitionBy("query_id", "dim")
        .orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    pair_dims = topk.groupBy("query_id", "neighbor_id").agg(
        F.collect_set("dim").alias("ds")
    )
    hits = (
        pair_dims
        .withColumn("in_full", F.array_contains("ds", full_dim))
        .select(
            "query_id", "in_full",
            F.explode(F.array_remove("ds", full_dim)).alias("dim"),
        )
        .groupBy("query_id", "dim")
        .agg(F.count_if("in_full").alias("n_hits"))
    )
    from drune_spark.functions.partitioning import local_frame
    dims_df = local_frame(
        queries.sparkSession, [(int(m),) for m in dims], "dim int"
    )
    grid = queries.select(F.col(query_id_col).alias("query_id")) \
        .distinct().crossJoin(F.broadcast(dims_df))
    return grid.join(hits, ["query_id", "dim"], "left").select(
        "query_id",
        "dim",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.expr(f"coalesce(n_hits, 0) * 1000000 div {int(k)}")
        .cast("long").alias("recall_ppm"),
    )


def ivf_cell_drift(
    base: DataFrame,
    batch: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN index staleness audit — the maintenance decision an
    incremental 100 TB vector store runs on every ingest: assign BOTH
    the existing index population and the newly-arrived batch to the
    index's OWN coarse cells (centroids derive from ``base`` only —
    the batch must not influence the structure it is measured
    against), then compare per-cell occupancy shares. Large
    ``drift_ppm`` = the new data lands where the index has little
    capacity → trigger recluster/retrain; near-zero = append in place.

    Costs one broadcast-centroid argmax per side (the verified
    ivf_assign shape: map-side min(struct) collapse, no window) and a
    16-cell aggregate. All share arithmetic is integer ppm.

    Returns (centroid_id, n_base, n_new, share_base_ppm,
    share_new_ppm, drift_ppm) for every cell, zero-filled.
    """
    from drune_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )

    centroids = (
        base.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            to_double_array(F.col(vec_col)).alias("centroid"),
        )
    )

    def assign(df: DataFrame) -> DataFrame:
        c = df.select(
            F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
        )
        scored = c.join(F.broadcast(centroids)).select(
            id_col,
            "centroid_id",
            cosine_similarity(F.col("v"), F.col("centroid")).alias("sim"),
        )
        best = scored.groupBy(id_col).agg(
            F.min(F.struct((-F.col("sim")).alias("ns"),
                           F.col("centroid_id").alias("cid"))).alias("b")
        )
        return best.select(id_col, F.col("b.cid").alias("centroid_id"))

    nb = assign(base).groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_base")
    )
    nn = assign(batch).groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    cells = centroids.select("centroid_id")
    tot = (
        cells.join(nb, "centroid_id", "left")
        .join(nn, "centroid_id", "left")
        .select(
            "centroid_id",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
    )
    t = tot.agg(
        F.sum("n_base").alias("tb"), F.sum("n_new").alias("tn")
    )
    return tot.crossJoin(F.broadcast(t)).select(
        "centroid_id",
        "n_base",
        "n_new",
        F.expr("n_base * 1000000 div tb").alias("share_base_ppm"),
        F.expr("CASE WHEN tn > 0 THEN n_new * 1000000 div tn"
               " ELSE 0 END").alias("share_new_ppm"),
        F.expr(
            "abs(CASE WHEN tn > 0 THEN n_new * 1000000 div tn ELSE 0 END"
            " - n_base * 1000000 div tb)"
        ).alias("drift_ppm"),
    )


def binary_quantize_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Binary-quantization retrieval with exact rerank — the modern
    two-stage serving trick (Lucene/Vespa "BQ + rescore"): each vector
    collapses to one sign bit per dimension packed into a BIGINT, the
    shortlist is the Hamming-nearest ``shortlist`` candidates (XOR +
    popcount — 64× less data than the float vectors, SIMD-friendly),
    and only the shortlist pays the exact float cosine.

    Signatures are built with the codegen-friendly explode(sequence) +
    element_at projection (the r5 HOF rule), folded per vector with
    ``bit_or`` aggregates — bit j set iff v[j] ≥ 0, packed as TWO
    32-bit halves (lo = dims 0-31, hi = dims 32-63): shifts stay ≤ 31
    so no engine's ``1 << 63`` overflow check fires (DuckDB raises on
    the sign bit) and every intermediate is positive. Hamming =
    popcount(xor(lo)) + popcount(xor(hi)). Ranking compares integer
    Hamming then floored-micro cosine with id tiebreaks — digit-exact
    in the DuckDB oracle.

    At 100 TB the signature column is computed once at ingest and the
    Hamming stage scans 8 bytes/vector; the exact stage touches only
    queries×shortlist rows. Returns (query_id, neighbor_id, rank,
    hamming, cos_micro), self-matches excluded.

    No counterpart in /root/reference; driver-mandated ANN extension.
    """
    from pyspark.sql import Window

    if dim > 64:
        # Spark's shiftleft wraps the shift amount mod 64, so dims
        # beyond two 32-bit halves would SILENTLY alias bits (DuckDB
        # raises instead) — fail loudly here.
        raise ValueError(
            f"binary_quantize_rerank packs at most 64 dims; got {dim}"
        )

    def sigs(df: DataFrame, src_id: str, out_id: str) -> DataFrame:
        return (
            df.select(
                F.col(src_id).alias(out_id),
                F.col(vec_col).alias("__v"),
                F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("j"),
            )
            .select(
                out_id,
                F.expr(
                    "CASE WHEN j < 32 AND element_at(__v, j + 1) >= 0 "
                    "THEN shiftleft(CAST(1 AS BIGINT), j) "
                    "ELSE CAST(0 AS BIGINT) END"
                ).alias("bl"),
                F.expr(
                    "CASE WHEN j >= 32 AND element_at(__v, j + 1) >= 0 "
                    "THEN shiftleft(CAST(1 AS BIGINT), j - 32) "
                    "ELSE CAST(0 AS BIGINT) END"
                ).alias("bh"),
            )
            .groupBy(out_id)
            .agg(
                F.bit_or("bl").alias("lo"), F.bit_or("bh").alias("hi")
            )
        )

    c_sig = sigs(corpus, id_col, "neighbor_id")
    q_sig = (
        sigs(queries, query_id_col, "query_id")
        .withColumnRenamed("lo", "qlo")
        .withColumnRenamed("hi", "qhi")
    )
    ham = (
        c_sig.join(
            F.broadcast(q_sig),
            F.col("neighbor_id") != F.col("query_id"),
        )
        .select(
            "query_id",
            "neighbor_id",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    wnd_h = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    short = (
        ham.withColumn("hrk", F.row_number().over(wnd_h))
        .filter(F.col("hrk") <= shortlist)
        .select("query_id", "neighbor_id", "hamming")
    )
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        to_double_array(F.col(vec_col)).alias("cv"),
    )
    qvec = queries.select(
        F.col(query_id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
    )
    rr = (
        short.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.floor(
                cosine_similarity(F.col("qv"), F.col("cv"))
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("cos_micro"),
        )
    )
    wnd_c = Window.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        rr.withColumn("rank", F.row_number().over(wnd_c))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank", "hamming", "cos_micro"
        )
    )


def rq_encode(
    corpus: DataFrame,
    dim: int = 64,
    codebook_size: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage residual quantization (Chen et al. 2010 RVQ; the
    additive-quantization sibling of ``pq_encode``'s product
    decomposition — PQ splits DIMENSIONS, RQ refines the WHOLE vector
    with a second codebook over stage-1 residuals, the layout behind
    RQ-VAE-style semantic ids).

    Deterministic, all-integer: vectors quantize to the unsigned
    lattice (kmeans.quantize_unsigned), stage-1 codebook = the
    ``codebook_size`` lowest-id quantized vectors (the pq/ivf seed
    discipline, codeword ordinal = id rank), stage-2 codebook = the
    ZERO vector (ordinal 0 — guarantees err2 <= err1, the monotone-
    refinement RQ property) plus the stage-1 residuals of the NEXT
    ``codebook_size − 1`` ids (their own assignment computed in the
    driver from the same collected frame — seeds' own residuals are
    identically zero and would degenerate the codebook). Assignment
    is exact integer squared L2 with (dist, ordinal) tie-break.

    Plan shape: ONE bounded control fetch (2k−1 rows) and two narrow
    aggregate BARRIERS keyed on the (unique) id — without them
    CollapseProject inlines each argmin struct into every downstream
    reference and the interpreted ``_sqdist``/``zip_with`` folds
    re-run ~18× per row (the r8 lsh_multiprobe trap); with them each
    stage's argmin evaluates exactly once per row and the corpus fans
    out across tasks (the single-file embeddings trap). The oracle
    replays seeds, residual codebook and both argmins in SQL.

    Returns (id_col, code1, code2, err1, err2): codebook ordinals and
    exact integer squared errors, err2 <= err1 always.
    """
    from drune_spark.functions.partitioning import fan_out
    from drune_spark.operators.kmeans import _sqdist, quantize_unsigned

    qz = quantize_unsigned(fan_out(corpus), vec_col, id_col)
    need = 2 * codebook_size - 1
    head = qz.orderBy(F.col(id_col)).limit(need).collect()
    if len(head) < need:
        raise ValueError(f"rq_encode needs >= {need} vectors")
    head_v = [[int(x) for x in r["qv"]] for r in head]
    if len(head_v[0]) != dim:
        # a dim mismatch silently truncates in python zip, NULL-pads
        # in Spark zip_with and NULL-indexes in the oracle — three
        # inconsistent behaviors; fail loudly instead
        raise ValueError(
            f"rq_encode: dim={dim} but vectors have "
            f"{len(head_v[0])} elements"
        )
    c1 = head_v[:codebook_size]

    def assign1(qv: list[int]) -> tuple[int, int]:
        best = None
        for j, c in enumerate(c1):
            d = sum((a - b) * (a - b) for a, b in zip(qv, c))
            if best is None or (d, j) < best:
                best = (d, j)
        return best[1], best[0]

    c2 = [[0] * dim] + [
        [
            a - b
            for a, b in zip(v, c1[assign1(v)[0]])
        ]
        for v in head_v[codebook_size:need]
    ]

    def argmin_struct(col, cents):
        arr = F.array(
            *[
                F.struct(
                    _sqdist(col, c).alias("dist"),
                    F.lit(j).cast("long").alias("code"),
                )
                for j, c in enumerate(cents)
            ]
        )
        return F.array_min(
            arr.cast("array<struct<dist:bigint,code:bigint>>")
        )

    # stage 1: ONE argmin site, then the aggregate barrier makes the
    # struct a real attribute (ids are unique — `first` is exact)
    s1 = qz.select(
        F.col(id_col), "qv",
        argmin_struct(F.col("qv"), c1).alias("__b1"),
    )
    g1 = s1.groupBy(id_col).agg(
        F.first("qv").alias("qv"), F.first("__b1").alias("__b1")
    )
    cw1_arr = F.array(
        *[F.lit(c).cast("array<bigint>") for c in c1]
    )
    resid = F.zip_with(
        F.col("qv"),
        F.element_at(cw1_arr, (F.col("__b1")["code"] + 1).cast("int")),
        lambda a, b: a - b,
    )
    # stage 2: again ONE argmin site over the residual, then a barrier
    s2 = g1.select(
        F.col(id_col),
        F.col("__b1")["code"].alias("code1"),
        F.col("__b1")["dist"].alias("err1"),
        argmin_struct(resid, c2).alias("__b2"),
    )
    g2 = s2.groupBy(id_col).agg(
        F.first("code1").alias("code1"),
        F.first("err1").alias("err1"),
        F.first("__b2").alias("__b2"),
    )
    return g2.select(
        F.col(id_col),
        "code1",
        F.col("__b2")["code"].alias("code2"),
        "err1",
        F.col("__b2")["dist"].alias("err2"),
    )
