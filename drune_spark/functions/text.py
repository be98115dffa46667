"""Text-analysis column functions (driver-mandated extension ops).

All JVM-side built-ins — no Python UDFs in the hot path, so every one of
these stays inside whole-stage codegen and scales linearly with executor
count. Designed over the ``documents`` table (doc_id, text, lang, source,
n_chars) but generic to any string column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed marker-word profiles for heuristic language ID. Deterministic and
# oracle-reproducible; in a real corpus these would be the top character
# n-grams per language (textcat-style).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "la", "que", "de", "es"],
    "fr": ["le", "la", "et", "est", "les"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

# Small deterministic stopword list (subset of English function words that
# also appear in the synthetic vocab).
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"  # BPE-ish: words + single punct marks


def normalize_text(col: Column) -> Column:
    """Lowercase + collapse whitespace — canonical form for fingerprints."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization (array<string>).

    NOTE: Spark's split (like DuckDB's regexp_split_to_array — the
    oracle relies on the parity) yields ``['']`` for empty/whitespace-only
    input, not ``[]``. ``token_count`` corrects for it; ratio metrics
    over empty docs inherit the quirk and should be filtered upstream.
    """
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def regex_token_count(col: Column) -> Column:
    """BPE-ish tokenization: count of word + punctuation tokens."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0)))


def avg_token_length(col: Column) -> Column:
    # Σ token lengths == non-whitespace chars of the trimmed text —
    # integer-identical to the old aggregate() fold but stays inside
    # whole-stage codegen (HOF lambdas run interpreted, outside codegen
    # CSE — the r5 lesson; lang_scores has the same rewrite).
    total = F.length(F.regexp_replace(F.trim(col), r"\s+", ""))
    return total.cast("double") / F.size(tokens(col))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    # Occurrences of stopword m = size(toks) − size(array_remove(toks, m)),
    # summed — the lang_scores non-lambda idiom. Identical to the old
    # size(filter(toks, isin)): each token equals at most one stopword,
    # so per-word occurrence counts sum to the filtered-token count.
    sw = stopwords or STOPWORDS
    toks = tokens(F.lower(col))
    n = F.size(toks)
    hits: Column = F.lit(0)
    for m in sw:
        hits = hits + (n - F.size(F.array_remove(toks, m)))
    return hits.cast("double") / n


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[^\w\s]", "")
    return (F.length(col) - F.length(stripped)).cast("double") / F.length(col)


def quality_score(col: Column) -> Column:
    """Composite doc-quality heuristic in [0,1]: long-enough, low punct,
    sane stopword share. Pure column arithmetic — deterministic."""
    length_term = F.least(F.length(col).cast("double") / F.lit(200.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    sw = stopword_ratio(col)
    sw_term = F.lit(1.0) - F.least(F.abs(sw - F.lit(0.15)) * 2.0, F.lit(1.0))
    return (length_term + punct_term + sw_term) / F.lit(3.0)


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-word hit count per language over lowercased tokens.

    Occurrences of marker m = size(toks) − size(array_remove(toks, m)),
    summed per language — pure non-lambda array expressions, so the
    whole thing stays inside whole-stage codegen AND codegen CSE
    evaluates the split() once per row. (The previous
    size(filter(toks, isin)) form ran INTERPRETED — HOF lambdas sit
    outside codegen and CSE — re-splitting the text per language;
    measured 2.5s → ~1s on the sf0.1 confusion gate.) Values are
    identical: both count total occurrences, not distinct markers."""
    toks = tokens(F.lower(col))
    n = F.size(toks)
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        score = F.lit(0)
        for m in markers:
            score = score + (n - F.size(F.array_remove(toks, m)))
        out[lang] = score
    return out


def lang_id(col: Column) -> Column:
    """argmax over language marker scores; ties break by language code
    order (deterministic).

    ONE lexicographic ``greatest`` over (score, -code_index) structs —
    each score referenced exactly once. (The previous when-chain
    referenced the running best TWICE per step, doubling the
    expression tree per language: 2⁵ copies of the early scores,
    measured 3.8s vs 1.5s at sf0.1 for the identical result. Max on
    (score, -i) == strict-> chain keeping the earliest code on ties.)"""
    scores = lang_scores(col)
    langs = sorted(scores)
    entries = [
        F.struct(
            scores[lang].alias("s"),
            F.lit(-i).alias("ni"),
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    return F.greatest(*entries)["lang"]


# --------------------------------------------------------------------------
# Repetition metrics (Gopher/MassiveText-style quality heuristics)
# --------------------------------------------------------------------------
# All pure array higher-order functions, entirely JVM-side and narrow —
# no shuffle, fuses into the scan stage. Occurrence counting is
# sort + run-length fold: O(G log G) per document (G = token count) with
# each gram array built exactly ONCE. (The naive `transform(grams, g ->
# size(filter(grams, ...)))` is quadratic in comparisons AND — because
# higher-order functions evaluate interpreted, outside codegen — re-buildS
# the whole grams subtree per outer element: measured ~1000× slower at
# 5k docs. Don't go back to it.) Char fractions use token characters
# (separator spaces excluded) as the denominator, and integer arithmetic
# up to one final double division — bit-identical in any engine.
# Reference heuristics: Rae et al. 2021 (Gopher), app. A1.1 — thresholds
# adapted, not copied.


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams; empty array when the doc has < n
    tokens. (Guarded: Spark's sequence(1, k) counts DOWN for k < 1.)"""
    if n == 1:
        return toks
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(sz >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def token_char_count(toks: Column) -> Column:
    """Total characters across tokens (whitespace excluded)."""
    return F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))


def dup_token_frac(toks: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    (n - n_distinct) / n. 0 for empty docs."""
    n = F.size(toks)
    return F.when(
        n > 0,
        (n - F.size(F.array_distinct(toks))).cast("double") / n,
    ).otherwise(F.lit(0.0))


def _run_length_fold(grams: Column, overhead: int, mode: str) -> Column:
    """Fold array_sort(grams) tracking (prev, run, acc): equal grams are
    adjacent after the sort, so occurrence counts are run lengths.
    mode='max_cover': acc = max over grams of run_length * char_length.
    mode='dup_chars': acc = total char length of grams in runs >= 2
    (position-weighted). char_length = length(gram) - overhead (the
    joining spaces)."""
    clen = lambda x: F.length(x) - F.lit(overhead)  # noqa: E731

    def merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        if mode == "max_cover":
            out = F.greatest(acc["acc"], run * clen(x))
        else:
            out = acc["acc"] + F.when(run == 2, F.lit(2) * clen(x)) \
                                .when(run > 2, clen(x)).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"), run.alias("run"), out.alias("acc")
        )

    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"),
        F.lit(0).alias("acc"),
    )
    return F.aggregate(F.array_sort(grams), init, merge)["acc"]


def top_ngram_char_frac_of(
    grams: Column, chars: Column, overhead: int
) -> Column:
    """Fraction of token characters covered by the single most-covering
    n-gram (count * gram char length / total token chars), capped at 1.0
    since overlapping occurrences are position-counted. Defined as a max
    over grams of a number — no tie-break needed. Pass MATERIALIZED
    ``grams``/``chars`` columns (from a prior projection) so the arrays
    are built once per row, not once per reference."""
    best = _run_length_fold(grams, overhead, "max_cover")
    return F.when(
        (F.size(grams) > 0) & (chars > 0),
        F.least(best.cast("double") / chars, F.lit(1.0)),
    ).otherwise(F.lit(0.0))


def dup_ngram_char_frac_of(
    grams: Column, chars: Column, overhead: int
) -> Column:
    """Fraction of token characters sitting inside n-grams that occur
    more than once in the doc (position-weighted, capped at 1.0). Same
    materialized-column contract as ``top_ngram_char_frac_of``."""
    total = _run_length_fold(grams, overhead, "dup_chars")
    return F.when(
        (F.size(grams) > 0) & (chars > 0),
        F.least(total.cast("double") / chars, F.lit(1.0)),
    ).otherwise(F.lit(0.0))


def top_ngram_char_frac(toks: Column, n: int) -> Column:
    """Convenience form over a raw token column (builds the gram array
    inline — fine for single-metric use; batch callers should
    materialize, see operators/text_analysis.py)."""
    return top_ngram_char_frac_of(
        word_ngrams(toks, n), token_char_count(toks), n - 1
    )


def dup_ngram_char_frac(toks: Column, n: int) -> Column:
    """Convenience form — see ``top_ngram_char_frac``."""
    return dup_ngram_char_frac_of(
        word_ngrams(toks, n), token_char_count(toks), n - 1
    )
