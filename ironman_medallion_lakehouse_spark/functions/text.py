"""Text-analysis expressions for training-data pipelines.

Beyond-reference extension (BASELINE.json north star). Everything is
pure Column composition — language ID, quality scoring, token counting
and fingerprinting all run inside whole-stage codegen with zero Python
in the hot path (the difference between ~GB/s and ~MB/s per core at
100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small high-frequency stopword lists per language (public common-word
# lists). Used both for n-gram-free language ID (distinct-overlap
# scoring) and for stopword-ratio quality signals.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "dans", "que"],
    "es": ["el", "los", "las", "de", "y", "un", "una", "es", "en", "por"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "人"],
}

LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]  # deterministic tiebreak order


def word_array(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(t), r"\s+")


def stopword_score(text: Column | str, lang: str) -> Column:
    """Distinct-overlap count between the document's word set and the
    language's stopword list. Integer, deterministic."""
    ws = F.array_distinct(word_array(text))
    return F.size(
        F.array_intersect(ws, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
    )


def predicted_lang(text: Column | str) -> Column:
    """argmax over per-language stopword scores, ties broken by
    LANG_PRIORITY order; 'und' (undetermined) when all scores are 0."""
    scores = {lang: stopword_score(text, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        result = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(result)
    return result


def n_words(text: Column | str) -> Column:
    return F.size(word_array(text))


def n_distinct_words(text: Column | str) -> Column:
    return F.size(F.array_distinct(word_array(text)))


def avg_word_len(text: Column | str) -> Column:
    """Mean token length = non-space chars / token count (double
    division of ints — bit-deterministic)."""
    t = F.col(text) if isinstance(text, str) else text
    non_space = F.length(F.regexp_replace(t, r"\s+", ""))
    return non_space.cast("double") / n_words(text).cast("double")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    return stopword_score(text, lang).cast("double") / F.greatest(
        n_distinct_words(text), F.lit(1)
    ).cast("double")


def type_token_ratio(text: Column | str) -> Column:
    """Lexical diversity: distinct / total tokens."""
    return n_distinct_words(text).cast("double") / F.greatest(
        n_words(text), F.lit(1)
    ).cast("double")


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(word_array(text))


def regex_token_count(text: Column | str) -> Column:
    """BPE-ish pre-tokenizer count: runs of letters, runs of digits, or
    single non-alnum-non-space symbols (the GPT-2-style pre-split
    shape, simplified)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(t), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


def bag_fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct word set. Identical docs up to word order/repetition get
    identical fingerprints — a cheap near-dup key (one narrow pass)."""
    ws = F.array_sort(F.array_distinct(word_array(text)))
    return F.md5(F.concat_ws(" ", ws))


def alpha_word_ratio(text: Column | str) -> Column:
    """Fraction of whitespace tokens containing at least one ASCII
    letter — the Gopher-rules alphabetic-word signal (documents of
    mostly numbers/symbols are low-quality training text)."""
    ws = word_array(text)
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    return alpha.cast("double") / F.greatest(F.size(ws), F.lit(1)).cast("double")


def symbol_word_ratio(text: Column | str) -> Column:
    """(# of '#' chars + # of '...' runs) per whitespace token — the
    Gopher symbol-to-word ratio (hash-mark/ellipsis spam signal).
    Occurrence counts via length arithmetic (no regex engine in the
    loop): n('#') = len − len(replace); n('...') = (len − len(replace))
    / 3."""
    t = F.col(text) if isinstance(text, str) else text
    hashes = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    dots = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    return (hashes + dots).cast("double") / F.greatest(
        n_words(text), F.lit(1)
    ).cast("double")


def duplicate_line_fraction(text: Column | str) -> Column:
    """Fraction of lines that are repeats of an earlier line
    (1 − distinct/total over newline-split lines) — the Gopher
    duplicate-line repetition filter. 0.0 for single-line documents."""
    t = F.col(text) if isinstance(text, str) else text
    lines = F.split(t, "\n")
    n = F.size(lines)
    return F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / F.greatest(
        n, F.lit(1)
    ).cast("double")


def top_bigram_fraction(text: Column | str) -> Column:
    """Fraction of tokens covered by the single most frequent word
    bigram (2·count(top bigram) / n_words, the Gopher top-n-gram
    repetition signal, simplified to coverage by token count).

    Pure Column form: per row, count each DISTINCT bigram's occurrences
    with a filter scan — O(distinct·len) per document, fine for
    normal-length documents inside one codegen stage. For book-length
    outliers use the explode → groupBy(doc, bigram) → max form instead
    (one extra shuffle, strictly linear per row)."""
    ws = word_array(text)
    n = F.size(ws)
    grams = F.transform(
        F.sequence(F.lit(1), n - F.lit(1)),
        lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + F.lit(1))),
    )
    top = F.array_max(
        F.transform(
            F.array_distinct(grams),
            lambda b: F.size(F.filter(grams, lambda x: x == b)),
        )
    )
    return (
        F.when(n < 2, F.lit(0.0))
        .otherwise(F.lit(2.0) * top.cast("double") / n.cast("double"))
    )


# PII scrub patterns, applied in order (SSN before the phone pattern so
# ddd-dd-dddd is never half-eaten as a phone number). Patterns are
# written to the common Java-regex/RE2 subset (no lookaround) so the
# DuckDB oracle replays them verbatim.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_scrub(text: Column | str) -> Column:
    """Redact emails, SSN-shaped ids, IPv4 addresses and NANP-style
    phone numbers with typed placeholder tokens — the standard
    pre-training PII scrub pass. A chain of global regexp_replace
    calls, entirely inside codegen; at 100 TB this is a narrow
    map-only column rewrite with no shuffle."""
    out = F.col(text) if isinstance(text, str) else text
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def winnowing_fingerprints(
    text: Column | str, k: int = 8, window: int = 4
) -> Column:
    """Rolling-hash document fingerprints by winnowing (the MOSS
    scheme, Schleimer et al. 2003): hash every character k-gram of the
    whitespace-normalized lowercased text, slide a window of ``window``
    consecutive gram hashes, keep each window's minimum, return the
    distinct selected hashes.

    Guarantee: any shared substring of length ≥ k + window − 1 between
    two documents contributes at least one COMMON fingerprint, while
    the fingerprint density stays ~2/(window+1) of the grams — the
    standard partial-overlap/containment detector (order-sensitive,
    unlike ``bag_fingerprint``; substring-local, unlike MinHash which
    sketches whole-set resemblance).

    Pure Column composition — k-grams via substring over a sequence,
    window minima via array_min over slices — one codegen stage, no
    UDF, no shuffle. Texts shorter than k characters yield an empty
    array (CASE-guarded: Spark's ``sequence(1, 0)`` descends rather
    than being empty). Join fingerprints to pair documents:
    ``explode → equi-join on the hash → group pairs`` — same bucketed
    shape as LSH banding, never all-pairs."""
    t = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(norm) - F.lit(k - 1)),
        lambda i: F.md5(F.substring(norm, i, k)),
    )
    mins = F.transform(
        F.sequence(F.lit(1), F.size(grams) - F.lit(window - 1)),
        lambda j: F.array_min(F.slice(grams, j, window)),
    )
    empty = F.expr("cast(array() as array<string>)")
    return (
        F.when(F.length(norm) < k, empty)
        .when(F.size(grams) < window, F.array_distinct(F.array(F.array_min(grams))))
        .otherwise(F.array_distinct(mins))
    )
