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
