"""Text-analysis scalar functions for the training-data pipeline stage.

All functions are pure Spark built-ins (JVM-side, whole-stage codegen —
no Python in the hot path) and each has an exact DuckDB-SQL oracle twin in
``__spark_entry__.oracle_sql``. Regex patterns are restricted to the
dialect-intersection of Java regex (Spark) and RE2 (DuckDB): character
classes, +, no backrefs/lookaround.

The reference has no string functions at all (SURVEY.md section 2.7); this
module is part of the validator superset the north_star requires (caption
quality / language checks on the image+caption table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokens: runs of non-whitespace (whitespace tokenizer), and a BPE-ish
# word/number/punct split used by token_count_bpe.
WS_TOKEN_RE = r"[^ \t\n\r]+"
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r]"

# Tiny marker-word inventories for the n-gram/stopword language heuristic.
# Deterministic and SQL-mirrorable (counts of ' word ' substrings).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "und", "die", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "de", "la", "que", "los"],
}

FP_BASE = 257
FP_MOD = 1_000_000_007


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count — JVM regexp, no UDF."""
    return F.regexp_count(F.col(col) if isinstance(col, str) else col, F.lit(WS_TOKEN_RE))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: letter runs, single digits, single punct marks."""
    return F.regexp_count(F.col(col) if isinstance(col, str) else col, F.lit(BPE_TOKEN_RE))


def _marker_hits(c: Column, words: list[str]) -> Column:
    """Occurrences of any marker word as a whole token in lowercased text."""
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    total = F.lit(0)
    for w in words:
        # non-overlapping count of " word " — word boundaries by spaces;
        # matches the oracle's regexp_count with the same literal pattern.
        total = total + F.regexp_count(padded, F.lit(f" {w} "))
    return total


def lang_scores(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {lang: _marker_hits(c, words) for lang, words in LANG_MARKERS.items()}


def lang_id(col: Column | str) -> Column:
    """Argmax language with deterministic tiebreak (alphabetical; 'und' if 0).

    Chained CASE so Spark and the SQL oracle evaluate identically.
    """
    scores = lang_scores(col)
    langs = sorted(scores)  # fold order: strict > keeps the first max on ties
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        take = scores[lang] > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, scores[lang]).otherwise(best_score)
    return best


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality features.

    length, word count, punctuation count/ratio, stopword(en) ratio — all
    JVM expressions; ratios rounded to 6 places so the SQL oracle matches
    bit-for-bit despite double formatting differences.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_ws = token_count_ws(c)
    n_punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9 \t\n\r]"))
    n_stop = _marker_hits(c, LANG_MARKERS["en"])
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_ws, F.lit(1))
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_ws.cast("long").alias("n_words"),
        n_punct.cast("long").alias("n_punct"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic polynomial rolling hash of the text (document id).

    h = fold(h * 257 + ascii(ch) mod 1e9+7). Pure Spark ``aggregate`` over
    the character array — JVM-side, no UDF; intermediate values stay below
    2^63 (acc < 1e9+7, base 257). Oracle: DuckDB list_reduce with the same
    recurrence.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(FP_BASE) + F.ascii(ch)) % F.lit(FP_MOD),
    )
