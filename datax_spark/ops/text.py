"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting. Pure Catalyst expressions (whole-stage codegen);
designed so an independent SQL engine (DuckDB) can replicate results exactly
for the correctness oracle.

These are the per-record "transformer" analogs of the reference (SURVEY.md
§2.2) aimed at corpus curation: the reference's dx_* plugins rewrite single
columns; these derive per-document statistics/annotations at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny, fixed stopword lists for the n-gram/stopword language heuristic.
# (Deterministic + portable to the SQL oracle; not a general-purpose LID.)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "que", "para"),
}


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokens of lowercased text, empties removed."""
    return F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")


def token_count_expr(text_col: str = "text") -> Column:
    return F.size(tokens_expr(text_col))


def stopword_hits_expr(words: tuple[str, ...], text_col: str = "text") -> Column:
    """Number of tokens (with repeats) that are in ``words``."""
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_expr(text_col), lambda t: F.array_contains(wl, t)))


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language stopword-hit scores + argmax language guess.

    Ties break in fixed key order (en, fr, de, es) — deterministic.
    """
    out = df
    for lang, words in LANG_STOPWORDS.items():
        out = out.withColumn(f"score_{lang}", stopword_hits_expr(words, text_col))
    langs = list(LANG_STOPWORDS)
    best = F.col(f"score_{langs[0]}")
    guess = F.lit(langs[0])
    for lang in langs[1:]:
        c = F.col(f"score_{lang}")
        guess = F.when(c > best, F.lit(lang)).otherwise(guess)
        best = F.when(c > best, c).otherwise(best)
    return out.withColumn("lang_guess", F.when(best > 0, guess).otherwise(F.lit("und")))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, token stats, char-class ratios.

    All ratios are divisions of int counts — bit-identical across engines.
    """
    n_chars = F.length(F.col(text_col))
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(F.col(text_col), "[^.,;:!?'\"()-]", ""))
    n_space = F.length(F.regexp_replace(F.col(text_col), "[^ ]", ""))
    mean_tok = F.when(n_tokens > 0, (n_chars - n_space).cast("double") / n_tokens)
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        (n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        (n_digit.cast("double") / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        mean_tok.alias("mean_token_len"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score from the features (heuristic weights)."""
    feat = quality_features(df, text_col)
    len_ok = (F.col("n_chars_q") >= 50) & (F.col("n_chars_q") <= 10000)
    tok_ok = (F.col("mean_token_len") >= 2.0) & (F.col("mean_token_len") <= 12.0)
    score = (
        len_ok.cast("int") * 0.4
        + tok_ok.cast("int") * 0.2
        + F.least(F.col("alpha_ratio") * 0.5, F.lit(0.4))
    )
    return feat.withColumn("quality_score", F.round(score, 4))


def fingerprint_expr(text_col: str = "text") -> Column:
    """Normalized md5 fingerprint: lower, strip non-alnum to space, collapse
    whitespace, trim → md5 hex. The exact-dedup key."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "), " +", " "
        )
    )
    return F.md5(norm)


def rolling_hash_expr(text_col: str = "text", mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash of the raw bytes (document fingerprint that is
    order-sensitive, unlike the md5 of the normalized form). Computed with a
    vectorized fold over the char array — no per-row Python."""
    chars = F.split(F.col(text_col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * base + F.ascii(ch), F.lit(mod)),
    )
