"""Deduplication operators for large-scale text corpora (driver extension).

Four strategies, all DataFrame-native and shuffle-conscious:

- ``exact_dedup``: md5 fingerprint of normalized text → keep min-id doc
  per fingerprint. One groupBy shuffle on a 32-byte key; at 100 TB hash
  keys shuffle far cheaper than full rows, so we shuffle (id, fp) pairs
  only, then semi-join survivors back if full rows are needed.
- ``ngram_jaccard_pairs``: exact word-shingle Jaccard over all candidate
  pairs that share >= 1 shingle. Exact but O(sum bucket^2) — the
  correctness oracle for MinHash. Use at audit scale, not 100 TB.
- ``minhash_lsh_pairs``: MinHash signatures (deterministic (a*x+b) mod p
  permutations over xxhash64 shingle hashes) banded into LSH buckets;
  pairs sharing a band-bucket are candidates, optionally verified with
  their estimated Jaccard (signature agreement). This is the 100 TB
  path: cost is #docs × num_perm narrow work + one shuffle on band
  buckets; bucket skew is bounded because identical band-hash means
  near-identical docs.
- ``simhash_dedup``: 64-bit SimHash; near-dup = Hamming distance <= d.
  Banding on 4×16-bit chunks finds all pairs within distance 3 with one
  shuffle per chunk (pigeonhole), avoiding any O(n²) compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from drune_spark.functions.hashes import (
    MERSENNE_P,
    fingerprint_md5,
    make_coeffs,
    simhash64,
    word_shingles,
)
from drune_spark.functions.text import tokens


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One surviving (min id) doc per normalized-text fingerprint.
    Returns (id_col, fingerprint). Shuffles only (id, fp) pairs."""
    return (
        df.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, "fingerprint")
    )


def exact_dedup_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Full surviving rows after exact dedup: keep the min-id row per
    normalized-text fingerprint via ONE window pass — the input is
    consumed exactly once (the old groupBy + semi-join shape consumed
    it twice, re-running everything upstream per branch: the
    self-referencing-DAG trap, measured 2× the screen stage inside the
    llm_pipeline chain). Rows shuffle once, keyed by fingerprint;
    fingerprint groups are duplicate clusters (tiny), so window state
    is bounded. Values identical to the join shape."""
    from pyspark.sql import Window

    fp = fingerprint_md5(F.col(text_col))
    w = Window.partitionBy(fp)
    return (
        df.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    from drune_spark.functions.partitioning import fan_out
    df = fan_out(df)
    return df.select(
        F.col(id_col).alias("doc"),
        word_shingles(tokens(F.lower(F.col(text_col))), k).alias("shingles"),
    )


def shingle_cells(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """DISTINCT (doc, shingle-string) word-k-gram cells in the CODEGEN
    position-explode form — the one shingle builder every shingle
    consumer should share.

    ``word_shingles``' transform evaluates INTERPRETED and its lambda
    references the ``tokens(...)`` split expression, so HOF evaluation
    re-runs the whole tokenize per element_at reference — k× per
    shingle per doc (the r5 HOF rule). The r10 profile measured the
    decontaminate benchmark+corpus shingle builds at 65.6 + 23.9 task-
    seconds at sf0.1; this form is fully whole-stage-codegen (split
    runs once per row, each shingle is k array reads).

    Value parity with explode(word_shingles(...)): concat_ws over the
    same 1-based positions, and DISTINCT on (doc, shingle) ==
    per-doc array_distinct. Docs with < k tokens yield no rows in both
    forms. Returns columns (``doc``, ``shingle``).
    """
    from drune_spark.functions.partitioning import fan_out

    toks = tokens(F.lower(F.col(text_col)))
    base = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc"), toks.alias("__t")
    )
    nsh = F.size(F.col("__t")) - (k - 1)
    pos = base.select(
        "doc",
        "__t",
        F.explode(
            F.when(nsh >= 1, F.sequence(F.lit(1), nsh)).otherwise(
                F.expr("cast(array() as array<int>)")
            )
        ).alias("i"),
    )
    return pos.select(
        "doc",
        F.concat_ws(
            " ",
            *[F.element_at(F.col("__t"), F.col("i") + j) for j in range(k)],
        ).alias("shingle"),
    ).distinct()


def _grouped_doc_arrays(exploded: DataFrame) -> DataFrame:
    """The per-shingle sorted doc arrays — the driver fast path's only
    distributed step after the cell build (ONE exchange job). The
    shingle strings themselves never leave the executors (only the
    grouped id arrays move); ``sort_array`` ascending == numpy/python
    sort order == UTF8 binary order for string ids (UTF-8 byte order
    preserves codepoint order), so pair generation below sees Spark's
    exact ``a < b`` ordering."""
    return (
        exploded.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
        .select("ds")
    )


def _pair_counts(groups: list):
    """Independent pure-python reference of ``_pair_counts_arrow``
    (Counter + combinations over the same grouped arrays); exists so
    pytest can pin the vectorized implementation against a second,
    trivially-auditable derivation of the same integers."""
    from collections import Counter
    from itertools import combinations

    sizes: Counter = Counter()
    common: Counter = Counter()
    for row in groups:
        ds = row[0]
        sizes.update(ds)
        if len(ds) > 1:
            common.update(combinations(ds, 2))
    return sizes, common


def _pair_counts_arrow(gdf: DataFrame):
    """Vectorized exact pair-intersection counts + per-doc set sizes
    from the grouped doc arrays: one Arrow transfer (no Row pickling)
    and numpy pair generation — grouped by array length m, each group
    contributes its triu (i<j) index pairs, so per-pair counts and
    sizes are the SAME integers the distributed self-join + aggregates
    produce (measured: 0.14 s transfer + ~0.15 s counting vs 0.43 s
    collect + 0.58 s Counter at 260k cells / 1.13M candidate pairs).

    Returns (uniq, sizes, a_codes, b_codes, counts): uniq = sorted
    distinct doc ids (value order == Spark order, see
    ``_grouped_doc_arrays``), sizes[i] = |shingle set of uniq[i]|,
    and for every candidate pair counts[p] = |intersection| with
    uniq[a_codes[p]] < uniq[b_codes[p]]. Raises ``OverflowError`` on
    pair volumes past ``_PAIRS_DRIVER_MAX_PAIRS`` — callers decide the
    cutoff BEFORE transferring; this is the last-resort guard.
    """
    import numpy as np

    col = gdf.toArrow().column("ds").combine_chunks()
    offsets = np.asarray(col.offsets, dtype=np.int64)
    lens = np.diff(offsets)
    n_pairs = int((lens * (lens - 1) // 2).sum())
    if n_pairs > _PAIRS_DRIVER_MAX_PAIRS:
        raise OverflowError(
            f"candidate pair volume {n_pairs} exceeds the driver replay "
            f"cap {_PAIRS_DRIVER_MAX_PAIRS}"
        )
    flat = col.values.to_numpy(zero_copy_only=False)
    uniq, codes = np.unique(flat, return_inverse=True)
    codes = codes.astype(np.int64)
    sizes = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    n_u = max(1, len(uniq))
    if n_u >= 3_000_000_000:  # int64 pair-key packing bound (n_u² < 2⁶³)
        raise OverflowError(f"{n_u} distinct ids overflow int64 pair keys")
    keys_parts = []
    for m in np.unique(lens):
        if m < 2:
            continue
        starts = offsets[:-1][lens == m]
        iu, ju = np.triu_indices(int(m), k=1)
        a = codes[(starts[:, None] + iu[None, :]).ravel()]
        b = codes[(starts[:, None] + ju[None, :]).ravel()]
        keys_parts.append(a * n_u + b)
    if not keys_parts:
        z = np.empty(0, np.int64)
        return uniq, sizes, z, z, z
    keys = np.concatenate(keys_parts)
    uk, counts = np.unique(keys, return_counts=True)
    return uniq, sizes, uk // n_u, uk % n_u, counts.astype(np.int64)


_PAIRS_DRIVER_ID_TYPES = ("bigint", "int", "string")
# Candidate-pair cap for the driver replay (Σ m(m-1)/2 over shingle
# groups): 64M int64 pair keys ≈ 0.5 GB transient numpy — the same
# memory class as the grouped collect itself. Above it the distributed
# self-join runs instead (it spreads the pair expansion across tasks).
_PAIRS_DRIVER_MAX_PAIRS = 64_000_000


def _driver_pair_counts(
    exploded: DataFrame, n_cells: int, driver_cutoff: int | None
):
    """The shared driver-fast-path gate for the exact pair operators:
    returns ``(id_type, uniq, sizes, a_codes, b_codes, counts)`` when
    the pair computation should replay on the driver, or ``None`` when
    the distributed self-join should run (cell table above the cutoff,
    unsupported id type for the literal-frame return, or a pair volume
    past ``_PAIRS_DRIVER_MAX_PAIRS`` — estimated from the group sizes
    BEFORE any quadratic allocation). Genuine failures (MemoryError,
    numpy bugs) propagate loudly; nothing is silently retried."""
    if driver_cutoff is None:
        import os

        driver_cutoff = int(
            os.environ.get("SPARK_GRAFT_JACCARD_DRIVER_CELLS", "2000000")
        )
    if n_cells > driver_cutoff:
        return None
    id_type = exploded.schema["doc"].dataType.simpleString()
    if id_type not in _PAIRS_DRIVER_ID_TYPES:
        return None
    try:
        res = _pair_counts_arrow(_grouped_doc_arrays(exploded))
    except OverflowError:
        return None
    return (id_type, *res)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    driver_cutoff: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word k-gram shingle sets for every
    pair sharing at least one shingle. Returns (id_a, id_b, jaccard) with
    id_a < id_b. jaccard = |∩| / (|A| + |B| - |∩|) — integer counts, one
    final double division, so bit-identical to any SQL oracle.

    ``max_shingle_df`` caps hot shingles (standard in the dedup
    literature): a shingle shared by m docs contributes m² rows to the
    self-join, so one stopword trigram in 10^6 docs alone is 10^12 join
    rows. With the cap, shingles whose document frequency exceeds it are
    dropped from BOTH the intersection and the set sizes — jaccard stays
    a true Jaccard over the capped shingle universe — and the join cost
    is bounded by cap × |distinct shingles|. None = exact (audit scale
    only)."""
    # Codegen shingle build (no higher-order functions): HOF lambdas
    # evaluate INTERPRETED — word_shingles' transform costs ~1.4s/pass
    # at sf0.1 where the position-explode + per-row element_at form is
    # fully whole-stage-codegen'd (shared shingle_cells helper). The
    # per-doc array_distinct becomes a (doc, shingle) DISTINCT — one
    # extra exchange the self-join's shingle shuffle amortizes. Minhash
    # keeps the array/fold form (it needs per-doc arrays and is
    # shuffle-free by design).
    exploded = shingle_cells(df, text_col, id_col, k)
    if max_shingle_df is not None:
        # The hot set is tiny (only shingles above the cap) → broadcast
        # anti-join; the df count itself is one partial-aggregated
        # shuffle of (shingle, count), never rows.
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        exploded = exploded.join(
            F.broadcast(hot), on="shingle", how="left_anti"
        )
    # The (doc, shingle) cell frame is read FOUR times (both sides of
    # the intersection self-join + the per-doc sizes subtree, which
    # appears twice as a broadcast build). EAGER persist+count, not a
    # lazy mark: the two sizes broadcast exchanges execute as separate
    # concurrent jobs that race the unpopulated cache and each re-run
    # the whole shingle build (the r5 >=4-branch rule — A/B at sf0.1:
    # lazy 78-98 taskSec / 5.3-6.9 s wall vs eager 44-60 taskSec /
    # 3.0-3.6 s wall, r10). Residency is one invocation's cell set,
    # bounded by the caller's clearCache between queries.
    exploded = exploded.persist()
    n_cells = exploded.count()
    # Size-adaptive driver fast path (r10 — the connected_components /
    # k_truss pattern): the profiled cost of this family at bench scale
    # was ~25 sequential 32-task micro-jobs (sizes broadcast builds,
    # AQE stage materializations, cached-frame counts) of ~0.1-0.6 s
    # scheduling latency each, not compute. Below a CELL-count cutoff
    # (the exact row count the eager persist just measured — the same
    # broadcast-build memory class as the CC edge collect), ONE
    # grouped-collect job replaces the shingle self-join, the pair
    # aggregate and both sizes broadcast joins; pair counts, set sizes
    # and the jaccard division replay on the driver with the identical
    # integer arithmetic and ONE IEEE double division (exact ints
    # < 2^53 → correctly-rounded quotient on both engines, numpy
    # float64 == JVM double). Above the cutoff — or past the candidate
    # pair-volume cap — the distributed self-join below runs unchanged,
    # the production path at corpus scale. Env-tunable for cluster
    # memory (SPARK_GRAFT_JACCARD_DRIVER_CELLS, default 2M cells ≈
    # tens of MB of grouped id arrays).
    hit = _driver_pair_counts(exploded, n_cells, driver_cutoff)
    if hit is not None:
        id_type, uniq, sizes, ac, bc, counts = hit
        exploded.unpersist()
        rows = []
        if len(counts):
            j = counts / (sizes[ac] + sizes[bc] - counts)
            keep = j >= threshold
            rows = list(
                zip(
                    uniq[ac[keep]].tolist(),
                    uniq[bc[keep]].tolist(),
                    j[keep].tolist(),
                )
            )
        from drune_spark.functions.partitioning import local_frame

        return local_frame(
            df.sparkSession,
            rows,
            f"id_a {id_type}, id_b {id_type}, jaccard double",
        )
    # Sizes from the cells (shingles are array_distinct'd per doc).
    # Docs with zero shingles (< k tokens) drop out, but they cannot
    # share a shingle with anything, so no pair loses its size row.
    # LAZY persist: the executed DAG built this aggregate TWICE (the
    # id_a/id_b broadcast joins materialize as independent concurrent
    # broadcast-build jobs and AQE exchange reuse loses the race, each
    # re-scanning the 260k-cell cache). Two consumers dedupe fine at
    # plan time (r8: InMemoryRelation substitution happens during
    # planning) and the DAGScheduler shares the partial-agg shuffle
    # stage by shuffleId, so no eager count job is needed — the eager
    # variant's extra sequential job ate the win in the interleaved
    # A/B (lazy 1.98-2.57 s/pass vs none 2.01-3.25, eager 2.15-2.50).
    sizes = exploded.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_shingles")
    ).persist()
    inter = (
        exploded.alias("a")
        .join(exploded.alias("b"),
              (F.col("a.shingle") == F.col("b.shingle"))
              & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed("doc", "id_a")
                   .withColumnRenamed("n_shingles", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("doc", "id_b")
                   .withColumnRenamed("n_shingles", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# Word-op budget for the set-similarity driver replay: the all-pairs
# bitmask intersection costs n(n-1)/2 · ceil(V/64) uint64 AND+popcounts.
# 512M word-ops ≈ a few seconds of numpy — the same time class as ONE
# distributed shuffle round at that size. Above it (or above the cell
# cutoff / mask-matrix memory bound) the distributed PPJoin runs.
_SETSIM_DRIVER_MAX_WORDOPS = 512_000_000
_SETSIM_DRIVER_MAX_MASK_WORDS = 64_000_000  # n · ceil(V/64) ≤ 512 MB


def _popcount_u64(x):
    """Vectorized 64-bit SWAR popcount (numpy < 2 has no bitwise_count).
    Branch-free integer arithmetic — exact on every uint64 value
    (pinned against int.bit_count in pytest)."""
    import numpy as np

    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def _setsim_driver_pairs(tok: DataFrame, n_cells: int, t: int,
                         driver_cutoff: int | None):
    """Driver bitmask replay gate for ``prefix_filter_join``: returns the
    result pandas frame when the exact all-pairs computation should run
    on the driver, or ``None`` for the distributed PPJoin path.

    Why a bitmask, not the §20 per-token triu expansion: word tokens
    (unlike k-gram shingles) include stopword-class tokens shared by
    nearly every doc, so Σ df² explodes — the very problem the prefix
    filter exists to dodge. Packing each doc's distinct-token set into
    ceil(V/64) uint64 words makes every pair's |∩| one AND + popcount
    regardless of token frequency: cost is exactly n²/2 · W word-ops,
    estimated BEFORE any allocation. All arithmetic is int64 (sizes,
    intersections, the cross-multiplied threshold test, ppm floor-div
    on nonnegative operands == Spark ``div``), so the rows are the
    identical integers the distributed join produces. Pair order
    a < b comes from np.unique's sort: numeric order for int ids,
    UTF8-binary == codepoint order for strings — Spark's ``<`` on both.
    """
    import os

    if driver_cutoff is None:
        driver_cutoff = int(
            os.environ.get("SPARK_GRAFT_SETSIM_DRIVER_CELLS", "2000000")
        )
    if n_cells > driver_cutoff or n_cells == 0:
        return None
    id_type = tok.schema["doc"].dataType.simpleString()
    if id_type not in _PAIRS_DRIVER_ID_TYPES:
        return None
    import numpy as np
    import pandas as pd

    at = tok.toArrow()
    doc_col = at.column("doc").combine_chunks().to_numpy(
        zero_copy_only=False)
    tok_col = at.column("token").combine_chunks().to_numpy(
        zero_copy_only=False)
    uniq_docs, dcodes = np.unique(doc_col, return_inverse=True)
    uniq_toks, tcodes = np.unique(tok_col, return_inverse=True)
    n, v = len(uniq_docs), len(uniq_toks)
    w = (v + 63) // 64
    if n * w > _SETSIM_DRIVER_MAX_MASK_WORDS:
        return None
    if n * (n - 1) // 2 * w > _SETSIM_DRIVER_MAX_WORDOPS:
        return None
    # The distributed path COUNTS duplicate (doc, token) cells (a
    # repeated doc id contributes its cells once per row to sizes and
    # intersections); the bitmask OR would dedupe them. Cells are
    # distinct whenever doc ids are unique — anything else declines.
    if len(np.unique(dcodes.astype(np.int64) * np.int64(v)
                     + tcodes.astype(np.int64))) != n_cells:
        return None
    masks = np.zeros((n, w), dtype=np.uint64)
    tcodes = tcodes.astype(np.int64)
    np.bitwise_or.at(
        masks,
        (dcodes.astype(np.int64), tcodes >> 6),
        np.uint64(1) << (tcodes.astype(np.uint64) & np.uint64(63)),
    )
    sizes = _popcount_u64(masks).sum(axis=1).astype(np.int64)
    t64 = np.int64(t)
    parts_a, parts_b, parts_nc = [], [], []
    for i in range(n - 1):
        nc = _popcount_u64(masks[i] & masks[i + 1:]).sum(
            axis=1).astype(np.int64)
        # The distributed path only ever sees pairs sharing >= 1 prefix
        # token, so nc >= 1 is part of the contract (matters at t = 0);
        # the length filter is implied by the threshold test (nc <= min
        # and sa+sb-nc >= max => 100*min >= t*max) — pruning only.
        keep = (nc >= 1) & (
            100 * nc >= t64 * (sizes[i] + sizes[i + 1:] - nc)
        )
        if keep.any():
            idx = np.nonzero(keep)[0]
            parts_a.append(np.full(len(idx), i, dtype=np.int64))
            parts_b.append(idx + i + 1)
            parts_nc.append(nc[idx])
    if parts_a:
        ai = np.concatenate(parts_a)
        bi = np.concatenate(parts_b)
        nc = np.concatenate(parts_nc)
    else:
        ai = bi = nc = np.empty(0, dtype=np.int64)
    sa, sb = sizes[ai], sizes[bi]
    return pd.DataFrame({
        "a": uniq_docs[ai],
        "b": uniq_docs[bi],
        "size_a": sa,
        "size_b": sb,
        "n_common": nc,
        "jaccard_ppm": (1_000_000 * nc) // np.maximum(sa + sb - nc, 1),
    }), id_type


def prefix_filter_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_pct: int = 50,
    driver_cutoff: int | None = None,
) -> DataFrame:
    """Exact set-similarity self-join with PPJoin-style prefix filtering
    (Xiao et al., WWW'08): find all doc pairs whose word-SET Jaccard is
    ≥ threshold_pct/100, generating candidates only from each doc's
    RAREST tokens instead of all of them.

    Every doc's distinct tokens are globally ordered by (document
    frequency asc, token asc); a pair with Jaccard ≥ t must share at
    least one token among the first ``p = |x| − ceil(t·|x|) + 1`` tokens
    of each side (pigeonhole on the ≥ t·|x| overlap), so joining on
    prefix tokens alone is provably complete. Because prefixes hold the
    rarest tokens, join buckets are small by construction — the inverse
    of the hot-shingle problem ``ngram_jaccard_pairs`` has to cap: cost
    is Σ_prefix-token df² over RARE tokens, not over stopwords. A
    100·min(|x|,|y|) ≥ t·max(|x|,|y|) length filter prunes candidates
    before verification; verification joins the candidate pairs back to
    the token table (equi-join on id then (id, token)) and applies the
    exact integer cross-multiplied test 100·|∩| ≥ t·(|x|+|y|−|∩|).

    All-integer end to end (sizes, intersection, ppm Jaccard) → the
    DuckDB oracle replays the identical algorithm bit-for-bit.

    Returns (a, b, size_a, size_b, n_common, jaccard_ppm), a < b.
    """
    from drune_spark.functions.partitioning import fan_out
    t = int(threshold_pct)
    tok = (
        fan_out(df)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.array_distinct(tokens(F.lower(F.col(text_col))))
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    # The token table is read by FIVE branches (sizes, dfreq, the
    # ranked window, and both verification sides ta/tb) that
    # materialize through separate concurrent broadcast-build jobs —
    # the r5 >=4-branch rule: lazy marks race the unpopulated cache and
    # each re-runs the fan_out+tokenize+explode chain, and the
    # unpersisted cand below re-runs the prefix self-join per consumer.
    # EAGER persist+count (r10 interleaved A/B at sf0.1, tok+cand
    # persists together: plain 128-145 s/pass vs persisted 31-42 s).
    # Residency is one invocation's distinct (doc, token) set; callers
    # bound accumulation via clearCache (bench.py does).
    tok = tok.persist()
    n_cells = tok.count()
    # Size-adaptive driver fast path (r10, the §20 pattern): at bench
    # scale the verification join explodes — cand(a,b) ⋈ tokens(a)
    # materializes |cand| · avg|doc| rows (~1e9 at sf0.1, where 57% of
    # ALL pairs pass the 0.6 threshold: 7.1M result rows from 5000
    # docs) — 31-42 s/pass for integer work a bitmask replay does in
    # seconds. Below the cell cutoff (SPARK_GRAFT_SETSIM_DRIVER_CELLS)
    # and the mask/word-op budgets, collect the (doc, token) cells once
    # via Arrow and compute ALL pairs' exact |∩| as uint64 AND +
    # popcount; the result returns as ONE Arrow-backed local frame.
    # Above any bound the distributed PPJoin below runs unchanged —
    # the production path, whose prefix filter is what scales.
    hit = _setsim_driver_pairs(tok, n_cells, t, driver_cutoff)
    if hit is not None:
        pdf, id_type = hit
        tok.unpersist()
        spark = df.sparkSession
        # Arrow slices createDataFrame into maxRecordsPerBatch-row
        # partitions (10k default → 700+ micro-tasks at 7M result
        # rows); coalesce to core width — a narrow merge, no shuffle.
        return spark.createDataFrame(
            pdf,
            schema=(
                f"a {id_type}, b {id_type}, size_a bigint, "
                "size_b bigint, n_common bigint, jaccard_ppm bigint"
            ),
        ).coalesce(max(1, spark.sparkContext.defaultParallelism))
    sizes = tok.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tdf"))
    from pyspark.sql import Window
    ranked = (
        tok.join(dfreq, "token")
        .join(sizes, "doc")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("tdf", "token")
            ),
        )
    )
    pref = ranked.filter(
        F.col("rn") <= F.col("sz") - F.expr(f"({t} * sz + 99) div 100") + 1
    ).select("doc", "token", "sz")
    cand = (
        pref.alias("x")
        .join(pref.alias("y"),
              (F.col("x.token") == F.col("y.token"))
              & (F.col("x.doc") < F.col("y.doc")))
        .select(
            F.col("x.doc").alias("a"),
            F.col("y.doc").alias("b"),
            F.col("x.sz").alias("size_a"),
            F.col("y.sz").alias("size_b"),
        )
        .distinct()
        .filter(
            100 * F.least("size_a", "size_b")
            >= t * F.greatest("size_a", "size_b")
        )
    )
    # Two consumers (the intersection aggregate and the final
    # verification join) of one action: a LAZY mark is race-free here —
    # plan-time InMemoryRelation substitution dedupes both branches
    # (r8 note: CacheManager substitution happens during planning) and
    # avoids an extra eager count job.
    cand = cand.persist()
    ta = tok.select(F.col("doc").alias("a"), "token")
    tb = tok.select(F.col("doc").alias("b"), "token")
    inter = (
        cand.select("a", "b")
        .join(ta, "a")
        .join(tb, ["b", "token"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        cand.join(inter, ["a", "b"])
        .filter(
            100 * F.col("n_common")
            >= t * (F.col("size_a") + F.col("size_b") - F.col("n_common"))
        )
        .select(
            "a", "b", "size_a", "size_b", "n_common",
            F.expr(
                "1000000 * n_common div (size_a + size_b - n_common)"
            ).alias("jaccard_ppm"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    k: int = 3,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(doc, signature array<bigint>[num_perm]).

    Shuffle-free formulation: one ``F.aggregate`` fold over the doc's
    shingle-hash array with an array<bigint>[num_perm] accumulator —
    each shingle hash is permuted num_perm ways and ``least``-merged in
    place. The hash array is materialized once per doc (the naive
    per-permutation ``array_min(transform(...))`` recomputes the shingle
    hashing num_perm times → ~10× slower; an explode+groupBy agg adds a
    shuffle and 64 aggregation buffers → also slower). Entirely narrow:
    signatures are computed where the docs already live.
    """
    from drune_spark.functions.hashes import md5_u32

    coeffs = make_coeffs(num_perm, seed)
    sh = _doc_shingles(df, text_col, id_col, k)
    # portable=True swaps the shingle hash for md5_u32 so a SQL oracle
    # can reproduce the signatures bit-for-bit; xxhash64 stays the fast
    # default (one JVM call vs md5 + base conversion per shingle).
    shingle_hash = (
        md5_u32 if portable
        else (lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 32)))
    )
    hashes = sh.select(
        "doc", F.transform("shingles", shingle_hash).alias("h")
    )
    init = F.array_repeat(F.lit(MERSENNE_P).cast("long"), num_perm)

    def step(acc, x):
        vals = F.array(*[
            F.pmod(F.lit(a) * x + F.lit(b), F.lit(MERSENNE_P)) for a, b in coeffs
        ])
        return F.zip_with(acc, vals, lambda u, v: F.least(u, v))

    return hashes.select("doc", F.aggregate("h", init, step).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
    min_est_jaccard: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """LSH candidate pairs: docs agreeing on all rows of >= 1 band.

    Returns (id_a, id_b, est_jaccard) where est_jaccard is the fraction
    of the num_perm signature slots that agree. Scale path: one shuffle
    keyed on (band_id, band_hash); candidates deduped before the
    signature-compare join. ``portable=True`` uses md5-based shingle
    hashes (oracle-mirrorable; the band bucket stays xxhash64 — bucket
    equality ⟺ band-slice equality, which is what a SQL twin joins on).
    """
    rows_per_band = num_perm // bands
    # EAGER persist (r10): banding and the two signature joins below all
    # read this, and the signature-side joins run as CONCURRENT
    # broadcast-build jobs that race a lazy persist mark — each racer
    # re-ran the whole shingle+md5 fold lineage (interleaved A/B at
    # sf0.1 on the cross_source_dups shape: lazy 30.4/4.1/2.5 s/pass vs
    # eager 3.8/0.9/1.8 — the §14 incremental_dedup family). Left
    # cached after return on purpose (the result is lazy and still
    # reads it); LRU eviction is the long-lived-session backstop.
    sigs = minhash_signatures(
        df, text_col, id_col, num_perm, k, seed, portable
    ).persist()
    sigs.count()
    # The self-join carries only (doc, band, bucket) — 24 bytes/row —
    # never the 64-slot signatures; those join back onto the (much
    # smaller) deduped candidate set afterwards.
    banded = sigs.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band))
                     .alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")

    cands = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    paired = (
        cands
        .join(sigs.select(F.col("doc").alias("id_a"),
                          F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col("doc").alias("id_b"),
                          F.col("sig").alias("sig_b")), "id_b")
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)
    ).cast("double") / F.lit(num_perm)
    return (
        paired.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )


def connected_components(
    pairs: DataFrame,
    all_nodes: DataFrame,
    max_iterations: int | None = 20,
    driver_cutoff: int | None = None,
) -> DataFrame:
    """Dedup clustering: connected components over near-dup pairs via
    min-label propagation (HashMin). Returns (doc_id, cluster_id) where
    cluster_id = the minimum doc id in the component; singletons map to
    themselves.

    Iterative driver loop — each round is one neighbor-min join +
    aggregate FOLLOWED BY a pointer-jump (``label ← label(label)``,
    classic HashMin shortcutting): labels are node ids and reachability
    is transitive, so jumping preserves the invariant while roughly
    halving remaining distance-to-root each round. Convergence is
    O(log diameter) rounds instead of O(diameter) — the difference
    between 20 rounds covering diameter ~20 and diameter ~10⁶
    (deep-chain density graphs like dbscan's cosine components are the
    motivating case, VERDICT r5 weak #2). Deterministic: the fixpoint
    (min reachable id) is order-independent, so the shortcut changes
    round count, never the result — oracle hashes are untouched.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # Persisted: every propagation round AND its convergence-check action
    # read the edge list, and `pairs` is typically an expensive near-dup
    # join (the exact-Jaccard path cost 12s/query at sf0.1 before this —
    # each round re-ran the shingle self-join). Edges are pair-sized, far
    # smaller than the job that produced them; left cached for the
    # caller's actions (LRU eviction is the backstop, as with the LSH
    # signature persists above).
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # Width adaptation (round 8, the label_propagation lesson in
    # reverse): checkpointed/cached scans are NOT AQE-coalesced, so a
    # small edge list inherited 32 partitions and every round's stages
    # scheduled 32 near-empty tasks — at gate scale the loop was pure
    # task-scheduling overhead (dbscan's CC phase: 7.9s for 550 edges).
    # Scale the loop's width to the edge count; big graphs keep full
    # parallelism.
    m = both.count()
    spark = pairs.sparkSession
    # Size-adaptive driver fast path (r10): below the cutoff the whole
    # iterative loop is replaced by ONE bounded collect + union-find on
    # the driver — the same memory class as a broadcast-join build
    # (the edge list ALREADY had to be small enough to persist and to
    # broadcast labels against). The distributed HashMin loop costs
    # ~6 sequential jobs/round (neighbor-min broadcast build, stepped
    # checkpoint, pointer-jump build, observe checkpoint) at ~0.1 s of
    # driver latency each, so a 512-edge bench graph paid ~2 s of pure
    # job sequencing for microseconds of union-find work. Union by
    # min-root + path compression yields root = component min — the
    # identical fixpoint, order-independent, so oracle hashes are
    # untouched. Above the cutoff (production graphs) the distributed
    # loop runs unchanged; the threshold is on DIRECTED edge rows
    # (2|E|) and is env-tunable for cluster memory
    # (SPARK_GRAFT_CC_DRIVER_EDGES, default 200k rows ≈ a few MB).
    if driver_cutoff is None:
        import os

        driver_cutoff = int(
            os.environ.get("SPARK_GRAFT_CC_DRIVER_EDGES", "200000")
        )
    if m <= driver_cutoff:
        rows = both.collect()
        both.unpersist()
        parent: dict = {}

        def _find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for row in rows:
            ra, rb = _find(row[0]), _find(row[1])
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        from pyspark.sql.types import StructField, StructType

        node_type = both.schema["src"].dataType
        nontrivial = [
            (n, root)
            for n in {r[0] for r in rows}
            if (root := _find(n)) != n
        ]
        from drune_spark.functions.partitioning import local_frame
        small = local_frame(
            spark,
            nontrivial,
            StructType([
                StructField("node", node_type, False),
                StructField("label", node_type, False),
            ]),
        )
        return (
            all_nodes.select(
                F.col(all_nodes.columns[0]).alias("node")
            )
            .distinct()
            .join(F.broadcast(small), "node", "left")
            .select(
                F.col("node").alias("doc_id"),
                F.coalesce("label", "node").alias("cluster_id"),
            )
        )
    max_w = spark.sparkContext.defaultParallelism
    w = max(2, min(max_w, m // 100_000 + 1))
    if w < max_w:
        # Repartition FROM the still-cached frame, then swap persists:
        # rebuilding from `edges` would re-run the expensive upstream
        # pairs join a second time (the repartition's one materializing
        # action below reads the cache instead).
        wide = both
        both = wide.repartition(w).persist()
        both.count()
        wide.unpersist()
    labels = all_nodes.select(
        F.col(all_nodes.columns[0]).alias("node")
    ).distinct().withColumn("label", F.col("node")).persist()

    if max_iterations is None:
        # Principled cap (VERDICT r6 #6): with pointer-jumping, HashMin
        # converges in O(log n) rounds for ANY component diameter, so
        # ceil(log2(n))+2 is a guaranteed-sufficient bound — no
        # diameter-proportional driver loop can hide here. One count on
        # the (already persisted) node frame.
        import math

        n = labels.count()
        max_iterations = max(8, math.ceil(math.log2(n + 1)) + 2)

    # Convergence-check fusion (round 8): each round used to pay a
    # THIRD driver action — a separate changed-labels count job after
    # the two localCheckpoints. The count now rides the new_labels
    # checkpoint job as a Dataset.observe metric (zero extra actions).
    # A fully-fused single-action variant (stepped not checkpointed,
    # its two consumers recomputing the neighbor-min join in one job)
    # was A/B-measured SLOWER at gate scale (8-10s vs 5-8s over 3
    # trials) — the recomputed subtree costs more stages than the
    # barrier saves — so stepped stays checkpointed at every size.
    from pyspark.sql import Observation

    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            both.join(labels, both.src == labels.node)
            .groupBy("dst").agg(F.min("label").alias("nl"))
        )
        # localCheckpoint, not persist: persist caches DATA but the
        # logical plan still nests every prior round, so Catalyst
        # planning time grows superlinearly with rounds — on a long-
        # chain graph (dbscan's cosine components, diameter ~15+) the
        # 20-round loop spent MINUTES in the optimizer (784s gate).
        # localCheckpoint truncates lineage each round; planning
        # stays O(1) because `labels` is always a checkpointed leaf.
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.dst, "left")
            .select(
                labels.node,
                F.col("label").alias("prev"),
                F.least(F.col("label"), F.coalesce("nl", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        # Pointer jump: label ← min(label, label(label)). Every label IS
        # a node id (init label=node; mins over labels stay in the id
        # domain), so the self-join on label==node resolves each node's
        # current root one extra hop — O(diameter) → O(log diameter)
        # rounds.
        parent = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        obs = Observation()  # fresh per round — safe for re-execution
        new_labels = (
            stepped.join(parent, stepped.label == parent.pnode, "left")
            .select(
                stepped.node,
                F.col("prev"),
                F.least(
                    stepped.label, F.coalesce("plabel", stepped.label)
                ).alias("label"),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum((F.col("label") != F.col("prev")).cast("long")),
                    F.lit(0),
                ).alias("changed"),
            )
            .select("node", "label")
            .localCheckpoint()
        )
        changed = int(obs.get["changed"])
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # Labels are NOT a fixpoint: one component may carry several
        # cluster_ids. Surface it instead of silently returning split
        # components (round-1 advisory).
        import warnings
        warnings.warn(
            f"connected_components did not converge within "
            f"{max_iterations} iterations; labels may split components "
            f"(raise max_iterations for deep chains)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, simhash bigint). Narrow; 64 aggregate passes fused by codegen."""
    from drune_spark.functions.partitioning import fan_out
    df = fan_out(df)
    return df.select(
        F.col(id_col).alias("doc"),
        simhash64(tokens(F.lower(F.col(text_col)))).alias("simhash"),
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via 16-bit-chunk
    banding (any pair within distance 3 shares one of 4 exact chunks).
    Signatures are persisted — the chunk self-join reads them twice."""
    sigs = simhash_fingerprints(df, text_col, id_col).persist()
    chunks = sigs.select(
        "doc",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftrightunsigned("simhash", i * 16)
                     .bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("ck"),
    ).select("doc", "simhash", "ck.chunk", "ck.key")
    pairs = (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
             .alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def simhash_near_dup_pairs_portable(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Oracle-mirrorable SimHash near-dup pairs: signatures are md5-based
    bit arrays (``simhash_bits``) instead of xxhash64 bigints, so a SQL
    twin reproduces pairs AND hamming values exactly. Same plan shape as
    ``simhash_near_dup_pairs`` — 4×16-bit pigeonhole banding, one
    self-join on (chunk, key), signatures persisted. The xxhash64
    variant remains the fast path for production corpora."""
    from drune_spark.functions.hashes import simhash_bits
    from drune_spark.functions.partitioning import fan_out

    d = fan_out(df)
    sigs = d.select(
        F.col(id_col).alias("doc"),
        simhash_bits(tokens(F.lower(F.col(text_col)))).alias("bits"),
    ).persist()
    chunks = sigs.select(
        "doc",
        "bits",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.slice("bits", i * 16 + 1, 16).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("ck"),
    ).select("doc", "bits", "ck.chunk", "ck.key")
    return (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.size(
                F.filter(
                    F.zip_with(
                        F.col("a.bits"), F.col("b.bits"), lambda x, y: x != y
                    ),
                    lambda v: v,
                )
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    min_shared: int = 2,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    ``min_shared`` distinct word-k-gram shingles with ANY benchmark/eval
    document (the standard guard against test-set leakage into training
    data). Returns (id, n_shared, contaminated) for every corpus doc.

    Scale shape: both sides reduce to (id, 32-bit shingle hash) — the
    corpus text never shuffles. Benchmark suites are small → their
    distinct-shingle set broadcasts (set ``broadcast_benchmark=False``
    for a giant holdout, falling back to a shuffle join on the hash).
    The md5-based hash keeps the op engine-portable / oracle-checkable.
    """
    from drune_spark.functions.hashes import md5_u32

    def sh(df: DataFrame) -> DataFrame:
        # Codegen position-explode shingles (shared shingle_cells; the
        # word_shingles HOF form re-ran the tokenize per element
        # interpreted — measured 65.6 + 23.9 task-seconds for these two
        # builds at sf0.1, now ~2 s). md5 AFTER the distinct, exactly
        # like the old explode(word_shingles) → md5 order.
        return shingle_cells(df, text_col, id_col, k).select(
            F.col("doc").alias(id_col),
            md5_u32(F.col("shingle")).alias("__shingle"),
        )

    c = sh(corpus)
    b = sh(benchmark).select("__shingle").distinct()
    if broadcast_benchmark:
        b = F.broadcast(b)
    hits = (
        c.join(b, "__shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared)
            .alias("contaminated"),
        )
    )


def decontaminate_semantic(
    corpus: DataFrame,
    evalset: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """Embedding-space decontamination (the semantic complement of the
    n-gram ``decontaminate`` screen): flag corpus rows whose embedding
    cosine against ANY held-out eval vector clears ``threshold`` —
    PARAPHRASED benchmark leakage that shares no shingle with the eval
    text and therefore sails through the shingle-overlap screen. Per
    contaminated row, the best-matching eval id + cosine are returned
    (deterministic argmax: cosine desc, eval id asc).

    Scale shape: the eval set is benchmark-sized (thousands), so it
    broadcasts and the corpus scans ONCE past it — O(n·|eval|) fused
    in one stage, never corpus×corpus; the row_number argmax keeps the
    rank-limit pushdown (WindowGroupLimit). Same contract as the
    driver-verified gate `decontaminate_semantic` (round 5, promoted
    to an operator in r8 — VERDICT r7 #6).

    Returns (id_col, eval_id_col, cosine) — contaminated rows only.
    """
    from pyspark.sql import Window

    from drune_spark.functions.partitioning import fan_out
    from drune_spark.functions.vectors import (
        cosine_similarity,
        to_double_array,
    )

    ev = evalset.select(
        F.col(eval_id_col),
        to_double_array(F.col(vec_col)).alias("ev"),
    )
    # fan_out: sf-scale embeddings arrive as ONE parquet split, so the
    # O(n·|eval|) interpreted cosine scan ran on a single task (3.3 s
    # single-task stage inside contamination_report at sf0.1 — the r8
    # matryoshka lesson). No-op at production split counts; placement
    # cannot change per-pair cosines or the id-keyed argmax.
    c = fan_out(corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
    ))
    scored = (
        c.join(F.broadcast(ev))
        .select(
            id_col,
            eval_id_col,
            cosine_similarity(F.col("v"), F.col("ev")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cosine").desc(), F.col(eval_id_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, eval_id_col, "cosine")
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_emb: DataFrame,
    eval_emb: DataFrame,
    corpus_urls: DataFrame,
    eval_urls: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_shared: int = 2,
    threshold: float = 0.4,
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "eval_id",
    url_col: str = "url",
    keep_params: tuple[str, ...] = ("id",),
) -> DataFrame:
    """Unified contamination audit — the dataset-card row a real
    pipeline publishes per eval set. Combines the three independent
    decontamination signals on one per-corpus-doc grain:

    - ``ngram_hit``: >= ``min_shared`` distinct word-k-gram shingles
      shared with any benchmark doc (``decontaminate`` — exact/verbatim
      leakage);
    - ``semantic_hit``: embedding cosine >= ``threshold`` against any
      eval vector (``decontaminate_semantic`` — paraphrased leakage
      that shares no shingle). Corpus docs without an embedding row
      simply can't fire this signal (left join);
    - ``url_hit``: canonical URL (``canonical_url_expr``) collides
      with any eval doc's canonical URL — provenance-level leakage
      (the same page crawled into both splits) that needs neither
      shared text nor a vector.

    ``contaminated`` = any of the three. Scale shape: each signal is
    the already-audited operator's plan (broadcast benchmark shingle
    set / broadcast eval vectors / broadcast eval canonical-URL set);
    the combiner is two left joins on the id — corpus text never
    shuffles and nothing pairs corpus×corpus.
    """
    ngram = decontaminate(
        corpus, benchmark, text_col, id_col,
        k=k, min_shared=min_shared,
    ).select(
        id_col,
        F.col("n_shared").alias("n_shared_ngrams"),
        F.col("contaminated").alias("ngram_hit"),
    )
    sem = decontaminate_semantic(
        corpus_emb, eval_emb, threshold=threshold,
        id_col=emb_id_col, vec_col=vec_col, eval_id_col=eval_id_col,
    ).select(
        F.col(emb_id_col).alias("__sid"), F.lit(True).alias("semantic_hit")
    )
    eval_canon = F.broadcast(
        eval_urls.select(
            canonical_url_expr(F.col(url_col), keep_params).alias("__canon")
        ).distinct()
    )
    url_hits = (
        corpus_urls.select(
            F.col(id_col).alias("__uid"),
            canonical_url_expr(F.col(url_col), keep_params).alias("__canon"),
        )
        .join(eval_canon, "__canon")
        .select("__uid")
        .distinct()
        .withColumn("url_hit", F.lit(True))
    )
    return (
        ngram
        .join(sem, ngram[id_col] == sem["__sid"], "left")
        .join(url_hits, ngram[id_col] == url_hits["__uid"], "left")
        .select(
            id_col,
            "n_shared_ngrams",
            "ngram_hit",
            F.coalesce("semantic_hit", F.lit(False)).alias("semantic_hit"),
            F.coalesce("url_hit", F.lit(False)).alias("url_hit"),
            (
                F.col("ngram_hit")
                | F.coalesce("semantic_hit", F.lit(False))
                | F.coalesce("url_hit", F.lit(False))
            ).alias("contaminated"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document duplicated token spans — the distributed
    formulation of suffix-array exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").

    A monolithic suffix array is single-machine and memory-bound; the
    equivalent signal at cluster scale is per-POSITION k-gram matching:

    1. positional k-gram fingerprints ``(doc, pos, md5(gram))`` — narrow
       projection, no shuffle.
    2. document frequency per fingerprint: one groupBy shuffle carrying
       (fp, doc) pairs, never text.
    3. occurrences equi-join the ``df >= min_df`` fingerprint set (hash
       join on fp — there is NO pairwise doc-doc join anywhere, so hot
       spans cost O(occurrences), not O(occurrences²)).
    4. per-doc island merge: positions p < q chain into one covered span
       while ``q - p <= k``; a running-sum window assigns span ids.
       Windows are partitioned by doc — bounded by doc length, never
       global, so the pass survives any corpus size.

    Returns one row per document containing at least one duplicated
    span: ``(id, n_dup_spans, dup_tokens, max_span_tokens, total_tokens,
    dup_frac)`` where dup_tokens counts tokens covered by >=1 span of
    tokens whose k-gram appears in >= min_df distinct docs.

    The reference engine has no counterpart (native dedup uses one-node
    suffix automata); included because LLM training-data curation at
    100 TB needs the distributed form. md5 fingerprints keep the op
    engine-portable for the DuckDB oracle.
    """
    from pyspark.sql import Window

    from drune_spark.functions.partitioning import fan_out

    base = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc"),
        tokens(F.lower(F.col(text_col))).alias("w"),
    )
    n = F.size("w") - F.lit(k - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.expr("cast(array() as array<int>)")
    )
    grams = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(F.col("w"), i + j + 1) for j in range(k)]
            )
        ),
    )
    occ = base.select(
        "doc",
        F.size("w").alias("total_tokens"),
        F.posexplode(grams).alias("pos", "fp"),
    )
    freq = (
        occ.groupBy("fp")
        .agg(F.countDistinct("doc").alias("ndocs"))
        .filter(F.col("ndocs") >= min_df)
        .select("fp")
    )
    dup = occ.join(freq, "fp").select("doc", "total_tokens", "pos")
    w = Window.partitionBy("doc").orderBy("pos")
    marked = dup.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0),
    ).withColumn("span_id", F.sum("brk").over(w))
    spans = marked.groupBy("doc", "span_id").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + F.lit(k - 1)).alias("e"),
        F.max("total_tokens").alias("total_tokens"),
    )
    return (
        spans.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
            F.max(F.col("e") - F.col("s") + 1).alias("max_span_tokens"),
            F.max("total_tokens").alias("total_tokens"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_dup_spans",
            F.col("dup_tokens").cast("long").alias("dup_tokens"),
            F.col("max_span_tokens").cast("long").alias("max_span_tokens"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            (F.col("dup_tokens").cast("double") / F.col("total_tokens"))
            .alias("dup_frac"),
        )
    )


def minhash_lsh_pairs_recent(
    df: DataFrame,
    text_col: str,
    id_col: str,
    day_col: str,
    horizon_days: int = 7,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
    min_est_jaccard: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """Temporally-blocked LSH near-dup pairs: only pairs whose
    ``day_col`` values differ by at most ``horizon_days`` — the
    production "dedup against recent history" contract (a steady-state
    ingest pipeline never compares against the full corpus).

    The horizon becomes part of the BLOCKING key, not a post-filter:
    docs band on (band, bucket, week) with week = day div horizon, and
    the probe side fans out to weeks {w-1, w, w+1}, so a bucket's
    candidate set shrinks from all-history to a 3-window slice — at
    100 TB this is the difference between candidate volume growing
    with corpus AGE versus staying proportional to weekly INGEST. An
    exact |Δday| <= horizon residual filter then trims the corner
    pairs the coarse week grid admits. Same signature math as
    minhash_lsh_pairs (shuffle-free folds, pairs carry 24-byte keys).

    Returns (id_a, id_b, day_a, day_b, est_jaccard).
    """
    rows_per_band = num_perm // bands
    days = df.select(F.col(id_col).alias("doc"),
                     F.col(day_col).alias("day"))
    # Eager persist: same concurrent-broadcast-build race as
    # minhash_lsh_pairs (the two signature joins below) — see the A/B
    # evidence there.
    sigs = minhash_signatures(
        df, text_col, id_col, num_perm, k, seed, portable
    ).join(days, "doc").persist()
    sigs.count()
    week = F.expr(f"day div {int(horizon_days)}")

    def banded(fan_out: bool):
        weeks = (
            F.explode(F.array(week - 1, week, week + 1))
            if fan_out else week
        )
        return sigs.select(
            "doc", "day",
            weeks.alias("wk"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1,
                                    rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ])
            ).alias("bb"),
        ).select("doc", "day", "wk", "bb.band", "bb.bucket")

    cands = (
        banded(False).alias("a")
        .join(
            banded(True).alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.wk") == F.col("b.wk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .filter(
            F.abs(F.col("a.day") - F.col("b.day"))
            <= F.lit(int(horizon_days))
        )
        .select(
            F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"),
            F.col("a.day").alias("day_a"), F.col("b.day").alias("day_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    paired = (
        cands
        .join(sigs.select(F.col("doc").alias("id_a"),
                          F.col("sig").alias("sig_a")), "id_a")
        .join(sigs.select(F.col("doc").alias("id_b"),
                          F.col("sig").alias("sig_b")), "id_b")
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                 lambda v: v)
    ).cast("double") / F.lit(num_perm)
    return (
        paired.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_a", "id_b", "day_a", "day_b", "est_jaccard")
    )


def select_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    max_iterations: int = 20,
) -> DataFrame:
    """Canonical-document selection: after near-dup clustering, keep ONE
    survivor per connected component — highest ``quality_col``, ties to
    the LOWEST doc id — and report the cluster's size. This is the
    "which copy do we train on" step every dedup pipeline ends with.

    The survivor is picked with the integer-encoded argmax (the
    activity_streaks/grouped_mode pattern): enc = (q+1)·K − id with
    id < K = 2³³ and q < 2²⁹ (ids and quality scores both well inside
    their bounds here; (q+1)·K stays under 2⁶³ so ANSI mode can't
    overflow), so max(enc) simultaneously maximizes quality and
    minimizes id, and both survivor fields decode from ONE aggregate —
    no window, no join-back onto the cluster frame (which would
    re-execute the iterative labeling per branch: the
    self-referencing-DAG trap).

    Returns (cluster_id, n_members, survivor_id, survivor_quality).
    """
    K = 1 << 33
    labels = connected_components(pairs, docs.select(id_col),
                                  max_iterations)
    member_q = labels.join(
        docs.select(
            F.col(id_col),
            F.col(quality_col).cast("long").alias("q"),
        ),
        id_col,
    )
    enc = (F.col("q") + F.lit(1)) * F.lit(K) - F.col(id_col)
    agg = member_q.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(enc).alias("best"),
    )
    # id = ceil(best / K)·K − best; quality = ceil(best / K) − 1.
    best_q = F.expr(f"(best + {K - 1}) div {K}")
    return agg.select(
        "cluster_id",
        "n_members",
        (best_q * F.lit(K) - F.col("best")).alias("survivor_id"),
        (best_q - F.lit(1)).alias("survivor_quality"),
    )


def split_leakage_audit(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    max_iterations: int = 20,
) -> DataFrame:
    """Train/test contamination screen: near-dup CLUSTERS that straddle
    split boundaries. Doc-level splits are leakage-safe only if every
    near-dup cluster lands wholly in one split — a test doc whose
    near-duplicate sits in train is memorization, not generalization
    (the cross-split analog of the decontaminate gate).

    Emits one row per LEAKY cluster (distinct splits > 1) with per-split
    member counts; an empty result is the pass condition. Cost = the
    clustering plus one cells-sized aggregate; documents shuffle only
    by cluster label.

    Returns (cluster_id, n_members, n_splits, n_train, n_test).
    """
    labels = connected_components(pairs, docs.select(id_col),
                                  max_iterations)
    tagged = labels.join(
        docs.select(F.col(id_col), F.col(split_col)),
        id_col,
    )
    return (
        tagged.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct(split_col).alias("n_splits"),
            F.count_if(F.col(split_col) == "train").alias("n_train"),
            F.count_if(F.col(split_col) == "test").alias("n_test"),
        )
        .filter(F.col("n_splits") > 1)
    )


def cluster_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "",
    max_iterations: int | None = None,
) -> DataFrame:
    """Leak-free split assignment — the FIXER paired with
    ``split_leakage_audit``'s detector: the train/test draw hashes the
    near-dup CLUSTER id, not the doc id, so every member of a cluster
    inherits one draw and no cluster can straddle a boundary by
    construction (doc-level hashing leaks whenever near-duplicates
    hash apart — the memorization-as-generalization failure).
    ``max_iterations`` defaults to None — the derived O(log n)
    pointer-jump cap that GUARANTEES convergence — because a
    non-converged component would split into several cluster ids and
    could straddle after all, the exact leak this op exists to
    prevent.

    Same consecutive-md5-hex-range scheme as ``split_by_hash``
    (deterministic, engine-portable, exactly disjoint); fractions
    summing below 1 leave a NULL-split holdout. Cost = the clustering
    plus one row-local hash projection; documents shuffle only by
    cluster label.

    Returns (id_col, cluster_id, split).
    """
    from drune_spark.operators.sampling import (
        fraction_to_hex_threshold,
        hash_bucket,
    )

    fr = fractions or {"train": 0.8, "test": 0.2}
    if sum(fr.values()) > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {sum(fr.values())} > 1")
    labels = connected_components(pairs, docs.select(id_col),
                                  max_iterations)
    bucket = hash_bucket(F.col("cluster_id"), salt, 4)
    split = None
    lo = 0.0
    for name, frac in fr.items():
        lo += frac
        cond = bucket < F.lit(fraction_to_hex_threshold(lo, 4))
        split = (
            F.when(cond, F.lit(name))
            if split is None
            else split.when(cond, F.lit(name))
        )
    # connected_components hardcodes its output columns — restore the
    # caller's id name so id_col != 'doc_id' resolves.
    return labels.select(
        F.col("doc_id").alias(id_col), "cluster_id", split.alias("split")
    )


def canonical_url_expr(
    url: Column, keep_params: tuple[str, ...] = ("id",)
) -> Column:
    """The canonical-URL expression shared by ``canonical_url_dedup``
    and ``contamination_report``: host lowercased with ``www.``/default
    ports stripped, trailing slashes collapsed (empty path → ``/``),
    query reduced to the ``keep_params`` allowlist in allowlist order.
    Pure anchored-regex component extraction — row-local, fuses into
    the scan; each regex is mirrored verbatim in the DuckDB oracles."""
    scheme_host = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
    path_re = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(url, scheme_host, 1)),
            r"^www\.",
            "",
        ),
        r":(80|443)$",
        "",
    )
    raw_path = F.regexp_extract(url, path_re, 1)
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    parts = []
    for p in keep_params:
        v = F.regexp_extract(url, r"[?&]" + p + r"=([^&#]*)", 1)
        parts.append(F.when(v != "", F.concat(F.lit(p + "="), v)))
    qs = F.concat_ws("&", *parts) if parts else F.lit("")
    return F.concat(
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def canonical_url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    keep_params: tuple[str, ...] = ("id",),
) -> DataFrame:
    """URL-canonicalization dedup — the crawl-pipeline pre-pass that
    runs BEFORE any content dedup (Common-Crawl/C4-style ingest: the
    same page is fetched as http/https, with/without ``www.``, with
    tracking params, default ports, trailing slashes). Canonical form:

    - host lowercased, leading ``www.`` and default ports (``:80`` /
      ``:443``) stripped;
    - path with trailing slashes collapsed (empty path → ``/``);
    - query reduced to an ALLOWLIST of significant params
      (``keep_params``, in allowlist order) — the standard way to drop
      ``utm_*``/``ref``/session junk without enumerating it.

    Everything is anchored-regex component extraction (JVM
    ``regexp_extract``/``regexp_replace``; the oracle mirrors each
    regex verbatim in DuckDB — both engines' class/anchor/alternation
    semantics coincide on these patterns, same approach as the
    ``url_parse`` gate).

    Plan shape at 100 TB: canonicalization is row-local (fused into
    the scan); the dedup is one groupBy on the canonical string —
    URLs are short, so the shuffle carries (canonical, id) pairs,
    never page content. Returns (canonical_url, n_dups, keeper_id)
    with keeper = min id per group (deterministic survivor).
    """
    canonical = canonical_url_expr(F.col(url_col), keep_params)
    return (
        df.select(canonical.alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
    )


SEMDEDUP_TARGET_CLUSTER = 64


def semdedup(
    corpus: DataFrame,
    n_clusters: int | None = None,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and pruning within-cluster
    cosine near-duplicates. The reference engine has no embedding ops;
    this is part of the LLM-data mandate (embedding-cosine near-dup,
    scale path).

    Shape: (1) coarse k-means assignment (``ivf_assign`` — deterministic
    seed centroids standing in for trained centroids; ``kmeans.py``
    supplies the trained variant), (2) a *within-cluster* self-join
    scores candidate pairs, (3) a vector is pruned when a same-cluster
    neighbor with a smaller id is ``>= threshold`` similar (SemDeDup's
    keep-one-per-duplicate-set rule with the deterministic min-id
    survivor).

    Scale notes:
    - Clustering bounds the pair count to Σ|cluster|² instead of n² —
      the entire point of SemDeDup at 100 TB: with k clusters of
      balanced size the scored fraction is 1/k of brute force, and the
      self-join is an equi-join on ``centroid_id`` (hash/SMJ, never a
      cartesian — screened by tools/plan_audit.py).
    - **k must grow with n** or the bound degrades back toward n²: at
      fixed k the 1×→3× scale ratio measured 3.46 (super-linear) vs
      1.36 with k ∝ n (tools/scale_curve.py, VERDICT r5 #4). The
      default therefore DERIVES ``n_clusters`` from the corpus:
      ``k = max(4, n // SEMDEDUP_TARGET_CLUSTER)``, pinning the mean
      cluster size (64) and making expected pair count linear in n.
      The derivation is one COUNT(*) control fetch (bounded, 1 row),
      mirrored verbatim as a scalar subquery in the DuckDB oracle.
      Callers with trained k-means centroids pass ``n_clusters``
      explicitly and own the contract.
    - Only (id, vector, centroid_id) rows move; at scale the corpus
      would be written partitioned by ``centroid_id`` (the ivf_topk
      layout), making the self-join co-located / shuffle-free.
    - ``clustered`` feeds both sides of the self-join and the final
      keep-join: persisted to keep Spark from re-running the assignment
      per branch (the self-referencing-DAG re-execution trap; same
      rationale as the LSH signature persist above). Left persisted for
      the caller's action; LRU eviction is the backstop.

    Returns (id_col, centroid_id, kept ∈ {0,1}).
    """
    from drune_spark.functions.vectors import cosine_similarity, to_double_array
    from drune_spark.operators.similarity import ivf_assign

    if n_clusters is None:
        n_clusters = max(4, corpus.count() // SEMDEDUP_TARGET_CLUSTER)
    assign = ivf_assign(corpus, n_clusters, id_col=id_col, vec_col=vec_col)
    vecs = corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("v")
    )
    clustered = vecs.join(assign, id_col).persist()
    a, b = clustered.alias("a"), clustered.alias("b")
    pruned = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(cosine_similarity(F.col("a.v"), F.col("b.v")) >= threshold)
        .select(F.col(f"b.{id_col}").alias(id_col))
        .distinct()
        .withColumn("pruned", F.lit(1))
    )
    return clustered.join(pruned, id_col, "left").select(
        id_col,
        "centroid_id",
        F.when(F.col("pruned").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("kept"),
    )


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 20,
) -> DataFrame:
    """CCNet-style paragraph-level dedup (Wenzek et al. 2020,
    arXiv:1911.00359): drop duplicated paragraphs corpus-wide (keeping
    the first occurrence) and reassemble each document from its
    surviving segments. The testdata corpus has no paragraph breaks, so
    segmentation here is deterministic fixed-width word windows
    (``seg_words``); the dedup/reassembly machinery is delimiter-
    agnostic.

    Scale notes:
    - The groupBy shuffles (md5 fp, encoded position) cells — 48 bytes
      per segment — never segment text; survivors join back on fp.
    - First-occurrence survivor uses the integer-encoded argmin
      ``min(doc_id * 1024 + pos)`` (single partial-aggregated min, no
      window sort; pos < 1024 holds for any doc under ~20k words — the
      chunker upstream enforces far smaller docs).
    - Reassembly is one groupBy over kept segments with an in-memory
      ``array_sort`` per doc (bounded by doc length), then a left join
      back to the full doc list so fully-duplicated docs surface with
      ``n_kept = 0`` and an empty string (not a dropped row).

    Returns (id_col, n_segments, n_kept, clean_text).
    """
    toks = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("w")
    )
    toks = toks.withColumn(
        "n_segments", F.expr(f"(size(w) + {seg_words - 1}) div {seg_words}")
    )
    segs = toks.select(
        id_col,
        "n_segments",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_segments") - 1),
                lambda i: F.concat_ws(
                    " ", F.slice("w", i * seg_words + 1, seg_words)
                ),
            )
        ).alias("pos", "seg"),
    ).withColumn("fp", F.md5("seg"))
    surv = segs.groupBy("fp").agg(
        F.min(F.col(id_col) * 1024 + F.col("pos")).alias("code")
    )
    kept = segs.join(surv, "fp").filter(
        F.col(id_col) * 1024 + F.col("pos") == F.col("code")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )
    return (
        toks.select(id_col, "n_segments")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.col("n_segments").cast("long").alias("n_segments"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def incremental_minhash_dedup(
    new_df: DataFrame,
    existing_df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    seed: int = 42,
    min_est_jaccard: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """Ingest-time dedup: probe a NEW batch against the EXISTING corpus
    index instead of self-joining the whole corpus — the steady-state
    production shape (the corpus is indexed once; each arriving batch
    pays cost ∝ batch size, the same contract dedup_recent's temporal
    blocking gives the time dimension).

    Asymmetric plan: the batch's banded signature table is tiny next to
    the corpus index, so it BROADCASTS — the corpus-side band table is
    probed map-side with no shuffle of corpus rows at all (at 100 TB
    the band index is a bucketed table and this probe is a broadcast
    hash join against it). Candidates then pull both signatures for the
    exact-agreement estimate as in ``minhash_lsh_pairs``.

    Returns one verdict row per NEW doc: (id_col, n_matches, best_est,
    is_dup) — ``is_dup = 0`` rows are the novel documents that enter
    the corpus.
    """
    rows_per_band = num_perm // bands

    def _banded(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "doc",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1,
                                    rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ])
            ).alias("bb"),
        ).select("doc", "bb.band", "bb.bucket")

    # EAGER persists (r10): sigs_old feeds TWO stages of one job (the
    # band probe and the signature join) and sigs_new feeds two
    # concurrent broadcast builds — lazily-persisted, each consumer
    # re-ran the full minhash (portable md5 = the expensive path;
    # interleaved A/B at sf0.1: 39-77 taskSec lazy vs 27-42 eager,
    # eager 3/3 on task time). Residency = corpus signature rows
    # (~0.5% of text bytes); at production scale the corpus index is a
    # precomputed table, not an in-session frame (docstring above).
    sigs_new = minhash_signatures(
        new_df, text_col, id_col, num_perm, k, seed, portable
    ).persist()
    sigs_old = minhash_signatures(
        existing_df, text_col, id_col, num_perm, k, seed, portable
    ).persist()
    sigs_old.count()
    sigs_new.count()
    cands = (
        _banded(sigs_old)
        .join(
            F.broadcast(_banded(sigs_new).withColumnRenamed("doc", "new_doc")),
            ["band", "bucket"],
        )
        .select(F.col("new_doc"), F.col("doc").alias("old_doc"))
        .dropDuplicates(["new_doc", "old_doc"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_new", "sig_old", lambda x, y: x == y),
            lambda v: v,
        )
    ).cast("double") / F.lit(num_perm)
    matches = (
        cands.join(
            sigs_old.select(F.col("doc").alias("old_doc"),
                            F.col("sig").alias("sig_old")), "old_doc")
        .join(
            F.broadcast(sigs_new.select(F.col("doc").alias("new_doc"),
                                        F.col("sig").alias("sig_new"))),
            "new_doc")
        .withColumn("est", est)
        .filter(F.col("est") >= min_est_jaccard)
        .groupBy("new_doc")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.max("est").alias("best_est"),
        )
    )
    return (
        sigs_new.select(F.col("doc").alias(id_col))
        .join(matches.withColumnRenamed("new_doc", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            F.coalesce("best_est", F.lit(0.0)).alias("best_est"),
            F.when(F.col("n_matches").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_dup"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    min_containment_ppm: int = 800_000,
    max_shingle_df: int | None = None,
    driver_cutoff: int | None = None,
) -> DataFrame:
    """Broder CONTAINMENT near-dup pairs — the asymmetric companion to
    ``ngram_jaccard_pairs``: containment(A→B) = |A∩B| / |A|. Symmetric
    Jaccard misses a small document wholly embedded in a much larger
    one (the union term drowns the overlap); containment is exactly
    the sub-document-duplication screen (quote farms, boilerplate
    wrappers, doc-in-doc scrapes). Emits BOTH directions of every
    qualifying ordered pair, all-integer ppm.

    Same machinery as the Jaccard path (codegen shingle cells,
    persisted, hot-shingle cap available) — only the final normalizer
    changes, so the shuffle economics are identical: shingle-keyed
    self-join, cell-sized everything.

    Returns (id_a, id_b, n_common, size_a, containment_ppm) with
    containment measured A→B (id_a's shingles found in id_b);
    id_a != id_b, both directions emitted independently.
    """
    # The shared codegen shingle builder (one definition for every
    # shingle consumer — it also projects to (id, text) before its
    # fan_out, where this op's old inline copy shuffled all columns).
    exploded = shingle_cells(df, text_col, id_col, k)
    if max_shingle_df is not None:
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        exploded = exploded.join(
            F.broadcast(hot), on="shingle", how="left_anti"
        )
    # Eager, not lazy, for the same reason as ngram_jaccard_pairs: the
    # sizes broadcast builds race the cold cache as concurrent jobs.
    exploded = exploded.persist()
    n_cells = exploded.count()
    # Same size-adaptive driver fast path as ngram_jaccard_pairs (one
    # grouped-collect job replaces the self-join + sizes join); the
    # containment normalizer is all-integer (n_common·10⁶ div size_a,
    # both nonnegative, so int64 floor_divide == Spark div exactly,
    # and c·10⁶ ≤ cutoff·10⁶ < 2⁶³). Both directions of each unordered
    # pair are emitted, as in the join.
    hit = _driver_pair_counts(exploded, n_cells, driver_cutoff)
    if hit is not None:
        id_type, uniq, sizes, ac, bc, counts = hit
        exploded.unpersist()
        rows = []
        if len(counts):
            for xs, ys in ((ac, bc), (bc, ac)):
                ppm = counts * 1_000_000 // sizes[xs]
                keep = ppm >= min_containment_ppm
                rows.extend(
                    zip(
                        uniq[xs[keep]].tolist(),
                        uniq[ys[keep]].tolist(),
                        counts[keep].tolist(),
                        sizes[xs[keep]].tolist(),
                        ppm[keep].tolist(),
                    )
                )
        from drune_spark.functions.partitioning import local_frame

        return local_frame(
            df.sparkSession,
            rows,
            f"id_a {id_type}, id_b {id_type}, n_common bigint, "
            f"size_a bigint, containment_ppm bigint",
        )
    sizes = exploded.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    inter = (
        exploded.alias("a")
        .join(exploded.alias("b"),
              (F.col("a.shingle") == F.col("b.shingle"))
              & (F.col("a.doc") != F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc", "id_a")
                 .withColumnRenamed("n_shingles", "size_a"),
            "id_a",
        )
        .withColumn(
            "containment_ppm",
            F.expr("n_common * 1000000 div size_a"),
        )
        .filter(F.col("containment_ppm") >= min_containment_ppm)
        .select("id_a", "id_b", "n_common", "size_a", "containment_ppm")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local document-fingerprinting algorithm).
    Word ``k``-gram hashes per document; every window of ``w``
    consecutive hashes selects its MINIMUM hash (rightmost position on
    ties, per the paper), and the distinct selections are the
    fingerprint set. The winnowing guarantee: any match of at least
    ``w + k - 1`` consecutive words between two documents shares at
    least one fingerprint; expected density is 2/(w+1). Unlike MinHash
    (whole-document similarity) winnowing fingerprints are POSITIONAL —
    the primitive behind plagiarism/overlap detection at passage
    granularity.

    Documents with fewer than ``w`` grams (but >= k words) contribute
    their single rightmost-tie-broken global minimum (the final partial
    window), so every tokenizable doc gets >= 1 fingerprint.

    Plan shape at 100 TB: the gram build is the de-HOF position-explode
    (posexplode over a sequence + element_at — fully codegen, no
    interpreted lambdas); the rolling minimum is ONE window (shuffle
    keyed on doc id, w-row frame); tie-breaks use the integer-encoded
    argmin ``h * 2^20 + (2^20-1-pos)`` (h < 2^32, pos < 2^20 keeps the
    encoding < 2^52 — no per-window sort, no second pass). The only
    corpus-sized shuffle carries (id, pos, h) cells, never text.
    Portable md5-based gram hashes make the whole selection
    oracle-checkable hash-for-hash.

    Returns one row per selected fingerprint:
    (id_col, fp_pos INT, fp BIGINT, n_grams INT).
    """
    from drune_spark.functions.hashes import md5_u32

    if w < 2 or k < 1:
        raise ValueError(f"need w >= 2 and k >= 1 (got w={w}, k={k})")
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
    ).select(
        id_col,
        "__t",
        (F.size("__t") - F.lit(k - 1)).alias("n_grams"),
    ).filter(F.col("n_grams") >= 1)
    grams = toks.select(
        id_col,
        "n_grams",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n_grams") - 1)
        ).alias("pos", "__i"),
        F.col("__t"),
    ).select(
        id_col,
        "n_grams",
        "pos",
        md5_u32(
            F.concat_ws(
                " ",
                *[F.element_at(F.col("__t"), F.col("pos") + j + 1)
                  for j in range(k)],
            )
        ).alias("h"),
    )
    # Integer-encoded rightmost argmin: min over the window of
    # h*2^20 + (2^20-1-pos) picks the smallest hash and, on hash ties,
    # the LARGEST position — the paper's tie-break — in one window min.
    enc = grams.select(
        id_col,
        "n_grams",
        "pos",
        F.expr(f"h * {1 << 20} + ({(1 << 20) - 1} - pos)").alias("e"),
    )
    win = (
        f"min(e) OVER (PARTITION BY {id_col} ORDER BY pos "
        f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW)"
    )
    sel = (
        enc.select(
            id_col,
            "n_grams",
            "pos",
            F.expr(win).alias("me"),
        )
        .filter(
            (F.col("pos") >= w - 1) | (F.col("pos") == F.col("n_grams") - 1)
        )
        .select(
            id_col,
            "n_grams",
            F.expr(f"cast({(1 << 20) - 1} - (me % {1 << 20}) as int)")
            .alias("fp_pos"),
            F.expr(f"me div {1 << 20}").alias("fp"),
        )
        .distinct()
    )
    return sel.select(id_col, "fp_pos", "fp", "n_grams")


def source_marginals(
    df: DataFrame,
    text_col: str,
    source_col: str,
) -> DataFrame:
    """Per-source marginal-content contribution — the leave-one-out
    curation signal: for each source, how much of its content is
    EXCLUSIVE (fingerprints appearing in no other source) versus
    shared. Dropping a source loses exactly its exclusive mass, so
    ``exclusive_ppm`` ranks sources by irreplaceability before any
    mixing/pruning decision (the additive shortcut to per-source
    Shapley values for a unique-content metric).

    Two fingerprint-cell aggregates and one cell join — text reduces
    to md5 at the scan and never shuffles: (source, fp) distinct
    cells, fp → distinct-source counts, then per-source rollup. All
    integer, map-side partial throughout.

    Returns (source, n_docs, n_fps, n_exclusive, exclusive_ppm)
    ordered by source.
    """
    from drune_spark.functions.hashes import fingerprint_md5

    cells = df.select(
        F.col(source_col).alias("source"),
        fingerprint_md5(F.col(text_col)).alias("fp"),
    )
    docs = cells.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    sfp = cells.distinct()
    fpc = sfp.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    per = (
        sfp.join(fpc, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum(
                F.when(F.col("n_sources") == 1, 1).otherwise(0)
            ).cast("long").alias("n_exclusive"),
        )
    )
    return (
        docs.join(per, "source")
        .select(
            "source",
            "n_docs",
            "n_fps",
            "n_exclusive",
            F.expr(
                "(n_exclusive * 1000000) div n_fps"
            ).alias("exclusive_ppm"),
        )
        .orderBy("source")
    )


def soft_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "sd1",
    max_iterations: int | None = 20,
) -> DataFrame:
    """Cluster-size-weighted soft deduplication: instead of hard-keeping
    one survivor per near-dup cluster, every member is kept with
    probability 1/cluster_size (the RefinedWeb/FineWeb practice — the
    expected number of surviving copies per cluster is one, so training
    loss stops over-weighting duplicated content while the corpus keeps
    its topical distribution), except the canonical member (lowest id),
    which is ALWAYS kept so no cluster loses coverage to an unlucky
    draw.

    The draw is deterministic and oracle-mirrorable: member kept iff
    ``md5_u32(salt || id) % cluster_size == 0`` (DuckDB:
    ``('0x' || substr(md5(salt || id), 1, 8))::BIGINT % sz = 0``).

    One window over ``cluster_id`` supplies size and canonical id —
    NO join-back onto the labels frame, which would re-execute the
    iterative component labeling per branch (the self-referencing-DAG
    trap). At 100 TB: the window shuffles (id, cluster_id) pairs only,
    and the labeling itself is the O(log n) pointer-jump loop.

    Returns (id_col, cluster_id, cluster_size, kept 0/1).
    """
    from pyspark.sql import Window

    from drune_spark.functions.hashes import md5_u32

    labels = connected_components(pairs, docs.select(id_col),
                                  max_iterations)
    if id_col != "doc_id":  # CC's output id column is fixed
        labels = labels.withColumnRenamed("doc_id", id_col)
    w = Window.partitionBy("cluster_id")
    sized = labels.select(
        F.col(id_col),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        F.min(id_col).over(w).alias("_canon"),
    )
    draw = md5_u32(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return sized.select(
        id_col,
        "cluster_id",
        "cluster_size",
        (
            (F.col(id_col) == F.col("_canon"))
            | (draw % F.col("cluster_size") == 0)
        ).cast("int").alias("kept"),
    )


def edit_verified_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 5,
) -> DataFrame:
    """Edit-distance verification of near-dup candidates: join texts
    back onto a bounded (id_a, id_b) candidate frame — produced by any
    of the blocked generators (LSH banding, shingle Jaccard) — and keep
    pairs whose character levenshtein distance is ≤ ``max_dist``. This
    is the precision pass the estimate-based screens can't give: two
    docs can share most shingles yet differ by a large structural edit,
    and conversely a small in-word typo family is exactly what a tight
    edit bound certifies.

    Scale: the DP never runs on the corpus — only on candidate pairs
    (∝ near-dup rate, not n²), and Spark's banded
    ``levenshtein(l, r, threshold)`` caps the DP band at O(max_dist)
    per character instead of O(|b|) (returns −1 above the bound, which
    the filter drops). Shuffles are two hash joins keyed on doc ids.

    Returns (id_a, id_b, dist) with exact integer distances —
    cross-engine parity with any classic-DP ``levenshtein`` (DuckDB's
    matches Spark's value-for-value).
    """
    ta = docs.select(F.col(id_col).alias("id_a"),
                     F.col(text_col).alias("__ta"))
    tb = docs.select(F.col(id_col).alias("id_b"),
                     F.col(text_col).alias("__tb"))
    j = pairs.select("id_a", "id_b").join(ta, "id_a").join(tb, "id_b")
    d = F.levenshtein(F.col("__ta"), F.col("__tb"), int(max_dist))
    return (
        j.select("id_a", "id_b", d.alias("dist"))
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )


def suffix_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
) -> DataFrame:
    """Suffix-array-grade exact-substring dedup: maximal duplicated
    token spans with FIRST-OCCURRENCE retention — the removal plan of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): any ``k``-token substring occurring >= 2 times in the
    corpus is duplicated, and every occurrence except the globally
    first (lowest ``(doc, pos)``) is cut.

    This upgrades :func:`duplicate_spans` (the r03 stand-in) on three
    axes that make it suffix-array-equivalent for the "what do I
    remove" question:

    - **occurrence-level frequency** (not per-doc df): within-document
      repeats are duplicates too, exactly as two suffixes sharing a
      ``k``-prefix are in a suffix array;
    - **first-occurrence retention**: the canonical copy survives, so
      the output is an actionable removal plan, not just a report;
    - **span rows**: maximal cut runs ``[span_start, span_end]`` per
      doc (positions whose covered ranges overlap or touch merge),
      directly consumable by a splice step.

    Distributed shape (the reference engine's one-node suffix automaton
    has no cluster counterpart): positional ``k``-gram fingerprints →
    ONE window shuffle keyed on fingerprint (occurrence count + min
    occurrence key in the same pass — no groupBy+join-back double
    shuffle) → per-doc island merge (windows bounded by doc length).
    Shuffle volume ∝ shingles, never pairs; hot-gram skew is bounded
    because the partition key is the gram hash and the per-key payload
    is (doc, pos) longs, never text. md5 fingerprints keep the op
    engine-portable for the DuckDB oracle.

    Returns ``(id_col, span_start, span_end, span_tokens)`` — one row
    per maximal removal span, token positions 0-based inclusive.
    """
    from pyspark.sql import Window

    from drune_spark.functions.partitioning import fan_out

    if k < 2:
        raise ValueError("suffix_spans needs k >= 2")
    base = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc"),
        tokens(F.lower(F.col(text_col))).alias("w"),
    )
    n = F.size("w") - F.lit(k - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.expr("cast(array() as array<int>)")
    )
    pos_df = base.select("doc", "w", F.explode(idx).alias("pos"))
    # Gram via element_at projections (codegen), not a transform lambda
    # (interpreted HOF — the r5 ngram_diversity lesson).
    fp = F.md5(
        F.concat_ws(
            " ",
            *[
                F.element_at(F.col("w"), F.col("pos") + j + 1)
                for j in range(k)
            ],
        )
    )
    # Integer occurrence key: doc * 2^21 + pos. The in-codegen
    # assert_true guard (zero term of the consumed expression) throws
    # loudly if a doc ever exceeds 2^21 token positions instead of
    # silently corrupting the first-occurrence order.
    okey = (
        F.col("doc") * F.lit(1 << 21)
        + F.col("pos")
        + F.coalesce(
            F.assert_true(
                F.col("pos") < F.lit(1 << 21),
                F.lit("suffix_spans: doc exceeds 2^21 token positions"),
            ).cast("long"),
            F.lit(0),
        )
    )
    occ = pos_df.select("doc", "pos", fp.alias("fp"), okey.alias("okey"))
    wfp = Window.partitionBy("fp")
    marked = occ.select(
        "doc",
        "pos",
        F.count(F.lit(1)).over(wfp).alias("occ_n"),
        F.min("okey").over(wfp).alias("min_okey"),
        "okey",
    )
    cut = marked.filter(
        (F.col("occ_n") >= 2) & (F.col("okey") != F.col("min_okey"))
    ).select("doc", "pos")
    wd = Window.partitionBy("doc").orderBy("pos")
    spans = (
        cut.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(wd) > k, 1).otherwise(0),
        )
        .withColumn("span_id", F.sum("brk").over(wd))
        .groupBy("doc", "span_id")
        .agg(F.min("pos").alias("s"), F.max("pos").alias("e"))
    )
    return spans.select(
        F.col("doc").alias(id_col),
        F.col("s").cast("long").alias("span_start"),
        (F.col("e") + F.lit(k - 1)).cast("long").alias("span_end"),
        (F.col("e") - F.col("s") + F.lit(k)).cast("long").alias(
            "span_tokens"
        ),
    )


def token_ngram_decon(
    train: DataFrame,
    eval_df: DataFrame,
    merges: list[tuple[str, str]],
    n: int = 13,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-level decontamination — the eval-leakage standard (13-gram
    TOKENIZER-id overlap, as used by GPT-3/PaLM/Llama decon, Brown et
    al. 2020 app. C): an eval document is contaminated iff >=
    ``min_shared`` of its ``n``-gram windows over the learned-BPE token
    stream also occur anywhere in the training corpus.

    Char/word shingles (``contamination_report``) miss exactly the
    cases tokenizers normalize (whitespace runs, subword re-splits);
    conversely a paraphrase shares words but not long token runs —
    pytest plants both to prove the signals separate.

    Shape: :func:`~drune_spark.operators.bpe.bpe_token_stream` builds
    both streams (narrow, zero shuffle), gram fingerprints are md5 over
    the joined token window (codegen ``element_at`` projections, no
    HOF lambda), the train side dedupes to distinct ``(fp, doc)`` and
    the join is a hash join on the gram hash — shuffle ∝ shingles,
    never pairs; no text ever shuffles. Returns ONE row per eval doc
    (LEFT joins keep the zero-hit docs — a decon report must show the
    clean ones): ``(id_col, n_token_grams, n_hit_grams, n_train_docs,
    contaminated)``, all counts int64, flag int 0/1.
    """
    from drune_spark.functions.partitioning import fan_out

    from drune_spark.operators.bpe import bpe_token_stream

    if n < 2:
        raise ValueError("token_ngram_decon needs n >= 2")

    def grams(df: DataFrame) -> DataFrame:
        # fan_out BELOW the token stream, not above it: the per-merge
        # replace chain is the expensive per-row work (one whole-doc
        # scan per learned merge), and sf-scale documents arrive as ONE
        # parquet split — with the exchange above the chain it ran as a
        # single task (r10 profile: an 8 s 1-task broadcast-build job).
        # Only (id, text) is shuffled; placement can't change per-row
        # expressions. No-op at production split counts.
        toks = bpe_token_stream(
            fan_out(df.select(F.col(id_col), F.col(text_col))),
            merges, text_col, id_col,
        )
        sz = F.size("toks") - F.lit(n - 1)
        idx = F.when(sz >= 1, F.sequence(F.lit(0), sz - 1)).otherwise(
            F.expr("cast(array() as array<int>)")
        )
        pos_df = toks.select(F.col(id_col), "toks",
                             F.explode(idx).alias("pos"))
        fp = F.md5(
            F.concat_ws(
                " ",
                *[
                    F.element_at(F.col("toks"), F.col("pos") + j + 1)
                    for j in range(n)
                ],
            )
        )
        return pos_df.select(F.col(id_col), fp.alias("fp"))

    # The eval gram stream feeds TWO branches (per-doc totals and the
    # distinct-join hit counts) — eager persist so the tokenize + gram
    # build runs once, not per branch (eval side is gram-count-sized
    # and narrow: (id, fp) rows). The gram build itself deliberately
    # KEEPS the carry-the-array element_at form: an interleaved A/B
    # against a narrow posexplode + lead-window build measured the
    # carry form FASTER (1.3 vs 2.0 s/pass on the sf0.1 train side) —
    # generate + project fuse in whole-stage codegen, so the token
    # array is never copied per gram row and the window variant just
    # pays an extra doc-keyed shuffle+sort.
    ev = grams(eval_df).persist()
    ev.count()
    tr = grams(train).select(
        "fp", F.col(id_col).alias("__tdoc")
    ).distinct()
    hits = (
        ev.distinct()
        .join(tr, "fp")
        .groupBy(id_col)
        .agg(
            F.countDistinct("fp").alias("__nh"),
            F.countDistinct("__tdoc").alias("__nt"),
        )
    )
    totals = ev.groupBy(id_col).agg(F.count(F.lit(1)).alias("__ng"))
    return (
        eval_df.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__ng"), F.lit(0)).cast("long").alias(
                "n_token_grams"
            ),
            F.coalesce(F.col("__nh"), F.lit(0)).cast("long").alias(
                "n_hit_grams"
            ),
            F.coalesce(F.col("__nt"), F.lit(0)).cast("long").alias(
                "n_train_docs"
            ),
            (
                F.coalesce(F.col("__nh"), F.lit(0)) >= F.lit(min_shared)
            ).cast("int").alias("contaminated"),
        )
    )


def cdc_dedup(
    chunks: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "chunk_md5",
    ord_col: str = "chunk_no",
    len_col: str = "chunk_len",
) -> DataFrame:
    """Corpus-wide chunk dedup with FIRST-OCCURRENCE retention over a
    content-defined chunking (consumes ``packing.cdc_chunks`` output —
    one chunker definition, per the shared-helper rule). CDC boundaries
    re-synchronize after edits, so this catches shifted duplicates that
    fixed-width blocking (``segment_dedup``'s grain) misses — the
    rsync/LBFS/restic storage-dedup action, here as the corpus-prep
    measurement "how many bytes would chunk-level dedup reclaim".

    Dedup is occurrence-level (within-doc repeats count) with the
    ``suffix_spans`` discipline: ONE window shuffle keyed on the chunk
    fingerprint computes occurrence count + min occurrence key
    (doc·2²¹ + chunk ordinal) in one pass; every occurrence except the
    globally first is a dup. Shuffle ∝ chunks (≪ characters), payload
    is (fp, two longs) — text never shuffles.

    Returns per doc: ``(id_col, n_chunks, n_dup_chunks, dup_chars,
    total_chars, dup_ppm)``.
    """
    from pyspark.sql import Window

    # In-codegen domain guard (the suffix_spans discipline): an
    # out-of-range chunk ordinal would bleed into the doc field of the
    # occurrence key and silently corrupt first-occurrence order on
    # BOTH engines — throw loudly instead; free on the pass path.
    okey = (
        F.col(id_col) * F.lit(1 << 21)
        + F.col(ord_col)
        + F.coalesce(
            F.assert_true(
                F.col(ord_col) < F.lit(1 << 21),
                F.lit("cdc_dedup: doc exceeds 2^21 chunks"),
            ).cast("long"),
            F.lit(0),
        )
    )
    wfp = Window.partitionBy(fp_col)
    dd = chunks.select(
        F.col(id_col),
        F.col(len_col).cast("long").alias("__len"),
        (
            (F.count(F.lit(1)).over(wfp) >= 2)
            & (okey != F.min(okey).over(wfp))
        ).cast("long").alias("__dup"),
    )
    return (
        dd.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("__dup").cast("long").alias("n_dup_chunks"),
            F.sum(F.col("__dup") * F.col("__len")).cast("long").alias(
                "dup_chars"
            ),
            F.sum("__len").cast("long").alias("total_chars"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_dup_chunks",
            "dup_chars",
            "total_chars",
            F.expr(
                "dup_chars * 1000000 div greatest(total_chars, 1)"
            ).alias("dup_ppm"),
        )
    )


def scrub_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a span removal plan: splice the token ranges produced by
    :func:`suffix_spans` (or any ``(id, span_start, span_end)`` frame,
    0-based inclusive) OUT of each document — the action half of
    exact-substring dedup (Lee et al. 2022 cut the spans; reporting
    them is only half the job).

    Shape: tokens posexplode → equi-join on the doc id against the
    span frame (spans are rare — the join output is tokens × spans-
    per-doc, spans-per-doc ≈ 1) → a token survives iff NO span covers
    its position → per-doc reassembly via position-sorted structs
    (``collect_list`` order is shuffle-nondeterministic — the
    cdc_dedup array_sort discipline). Docs with no spans pass through
    unchanged (left join semantics).

    Returns ``(id_col, kept_tokens, cut_tokens, scrubbed_fp)`` —
    counts plus the md5 of the space-joined scrubbed text (the NIAH
    fingerprint discipline: the hash proves the EXACT splice without
    hauling full text through the gate compare).
    """
    from drune_spark.functions.partitioning import fan_out

    # persisted: the token stream is read by the keep-filter AND the
    # totals aggregate — without it the tokenize+posexplode subtree
    # re-executes per branch (the r7 self-referencing-step class)
    toks = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias(
            "pos", "word"
        ),
    ).persist()
    sp = spans.select(
        F.col(id_col).alias("sdoc"),
        F.col("span_start").alias("ss"),
        F.col("span_end").alias("se"),
    )
    # ONE left_anti with the range predicate expresses "no span covers
    # this token" directly — no covered-set materialization, no second
    # self-join (overlapping spans are fine: anti-join semantics)
    kept = toks.join(
        sp,
        (F.col("doc") == F.col("sdoc"))
        & (F.col("pos") >= F.col("ss"))
        & (F.col("pos") <= F.col("se")),
        "left_anti",
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "word"))),
        lambda s: s.getField("word"),
    )
    stats = kept.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("kept_tokens"),
        F.md5(F.array_join(ordered, " ")).alias("scrubbed_fp"),
    )
    totals = toks.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("__total")
    )
    return (
        totals.join(stats, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias(
                "kept_tokens"
            ),
            (F.col("__total") - F.coalesce("kept_tokens", F.lit(0)))
            .cast("long").alias("cut_tokens"),
            F.coalesce(
                "scrubbed_fp", F.md5(F.lit(""))
            ).alias("scrubbed_fp"),
        )
    )
