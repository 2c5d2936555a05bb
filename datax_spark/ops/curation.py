"""Corpus-curation operators for training-data pipelines: deterministic
hash-based dataset splits, PII redaction, and vocabulary statistics.

All three are pure Catalyst expressions (whole-stage codegen, no Python in
the hot path) and are written so an independent SQL engine (DuckDB) can
replicate the results bit-for-bit for the correctness oracle:

- the split hash is ``md5(id || salt)`` compared as a fixed-width lowercase
  hex prefix (lexicographic == numeric for same-length hex), so any engine
  with an md5() produces the identical assignment — the property that makes
  a train/val/test split REPRODUCIBLE across the Spark pipeline, an ad-hoc
  DuckDB audit, and a re-run two years later;
- the PII patterns avoid constructs whose semantics differ between Java
  regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround, greedy
  leftmost-first everywhere.

Reference analog: the dx_* transformer plugins rewrite single columns per
record (SURVEY.md §2.2); these are the corpus-level curation siblings a
100-TB training-data pipeline needs (split → redact → count).

Scale notes: splits and redaction are map-only (no shuffle, prunes to the
id/text columns); ``vocab`` is one explode + one hash aggregation with
map-side combine — the same shape as a groupBy word count, which is the
canonical "scales linearly" Spark aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datax_spark.ops.text import tokens_expr

# Width of the md5 hex prefix used as the split hash: 5 hex chars = 20 bits
# = 1,048,576 distinct values — granular enough for per-mille fractions while
# keeping the threshold a short constant in the generated SQL.
_HEX_WIDTH = 5
_HEX_SPACE = 16 ** _HEX_WIDTH


def split_hash_expr(id_col: str = "doc_id", salt: str = "v1") -> Column:
    """Deterministic per-row split hash: first ``_HEX_WIDTH`` lowercase hex
    chars of ``md5(cast(id as string) || salt)``. Uniform over the id space,
    stable across engines and runs; change ``salt`` to draw a fresh split."""
    return F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, _HEX_WIDTH
    )


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, exclusive upper hex bound)] in declaration order; the
    last split absorbs rounding residue (bound 'fffff' + 1). Fractions must
    be positive and sum to ~1."""
    total = sum(fractions.values())
    if not fractions or abs(total - 1.0) > 1e-9 or min(fractions.values()) <= 0:
        raise ValueError(f"fractions must be positive and sum to 1, got {fractions}")
    out, cum = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        out.append((name, format(int(cum * _HEX_SPACE), f"0{_HEX_WIDTH}x")))
    out.append((names[-1], "g" * _HEX_WIDTH))  # 'g' > 'f': catch-all bound
    return out


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "v1",
    fractions: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic train/val/test assignment column.

    Rows are assigned by comparing the hex split hash against cumulative
    thresholds — membership depends ONLY on (id, salt), so late-arriving
    rows of a growing corpus keep every earlier row's assignment (unlike
    ``df.randomSplit``, which reshuffles membership whenever the partition
    layout changes), and a holdout set stays leak-free across re-runs.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = split_hash_expr(id_col, salt)
    expr = None
    for name, bound in split_thresholds(fractions):
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def split_hash_sql(id_col: str = "doc_id", salt: str = "v1") -> str:
    """The DuckDB-portable SQL twin of :func:`split_hash_expr`."""
    return f"substr(md5(CAST({id_col} AS VARCHAR) || '{salt}'), 1, {_HEX_WIDTH})"


def assign_split_sql(
    id_col: str = "doc_id",
    salt: str = "v1",
    fractions: dict[str, float] | None = None,
) -> str:
    """CASE expression replicating :func:`assign_split` in ANSI SQL."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = split_hash_sql(id_col, salt)
    arms = [
        f"WHEN {h} < '{bound}' THEN '{name}'"
        for name, bound in split_thresholds(fractions)
    ]
    return "CASE " + " ".join(arms) + " END"


# --- PII redaction -----------------------------------------------------------

# Patterns chosen for identical semantics under Java regex and RE2 (no
# backrefs/lookaround; character classes + bounded/greedy quantifiers only).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # local@domain.tld — the operational "does it look like an email" net
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # dotted quad (over-matches >255 octets on purpose: redaction favors recall)
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # international-ish phone: leading digit/+, then >=7 phone chars, end digit
    "phone": (r"\+?[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
}

# Application order matters (phone would otherwise eat IP octets); dict order
# above is the contract: emails first (may contain digits), then IPs (dots),
# then phones.
_PII_ORDER = ("email", "ipv4", "phone")


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_<kind>`` match-count columns (regexp_extract_all + size; one
    vectorized pass per pattern, no Python)."""
    out = df
    for kind in _PII_ORDER:
        pat, _ = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        )
    return out


def pii_redact(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Replace every PII match with its placeholder, in ``_PII_ORDER``.

    Counts are derived BEFORE redaction (a redacted email must not later be
    double-counted as a phone because of its digits — there are none left,
    but ordering the counts first keeps each count independent of the other
    patterns' rewrites)."""
    out = pii_counts(df, text_col)
    red = F.col(text_col)
    for kind in _PII_ORDER:
        pat, repl = PII_PATTERNS[kind]
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)


def pii_redact_sql(text_col: str = "text") -> str:
    """Nested regexp_replace(...) twin for DuckDB ('g' = replace-all, which
    is Spark's default)."""
    expr = text_col
    for kind in _PII_ORDER:
        pat, repl = PII_PATTERNS[kind]
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    return expr


def pii_count_sql(kind: str, text_col: str = "text") -> str:
    pat_sql = PII_PATTERNS[kind][0].replace("'", "''")
    return f"CAST(len(regexp_extract_all({text_col}, '{pat_sql}')) AS INTEGER)"


# --- text normalization + normalized exact dedup ------------------------------

def normalize_text_expr(text_col: str = "text") -> Column:
    """Canonical text form for normalization-robust exact dedup: casefold,
    fold punctuation/symbol runs to single spaces, collapse whitespace, trim.

    Deliberately ASCII-alnum-keyed (non-ASCII letters fold to spaces): the
    aggressive-but-deterministic canonicalization used before exact dedup of
    web text, portable bit-for-bit between Java regex and RE2/DuckDB. Unicode
    NFC folding needs an ICU UDF and is out of scope (documented non-goal —
    it is also engine-specific, which would break the oracle contract).
    """
    c = F.lower(F.col(text_col))
    c = F.regexp_replace(c, r"[^a-z0-9\s]+", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_text_sql(text_col: str = "text") -> str:
    """DuckDB twin of :func:`normalize_text_expr` ('g' = replace-all)."""
    return (f"trim(regexp_replace(regexp_replace(lower({text_col}), "
            f"'[^a-z0-9\\s]+', ' ', 'g'), '\\s+', ' ', 'g'))")


def normalized_dedup_groups(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Duplicate groups under the normalized form: (norm_hash, keeper,
    n_docs) for every group, keeper = min id (the canonical-keeper rule
    ops.dedup.exact_dedup uses). Catches the near-misses raw exact dedup
    leaves behind — casing, punctuation, and whitespace variants — while
    staying one map + one hash aggregation (no pairwise anything)."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text_expr(text_col)).alias("norm_hash"))
        .groupBy("norm_hash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_docs"))
    )


# --- vocabulary statistics ---------------------------------------------------

def vocab(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
          min_df: int = 2) -> DataFrame:
    """Corpus vocabulary with document and total frequencies.

    One explode + one aggregation: per-token ``doc_freq`` (distinct docs
    containing it) and ``total_freq`` (occurrences), filtered to tokens seen
    in >= ``min_df`` documents. The BPE/tokenizer-prep primitive: at corpus
    scale this is a word count — map-side combine keeps the shuffle at
    O(distinct tokens per partition), and the min_df filter bounds the
    result to the head of the Zipf curve.

    Thresholding on doc_freq (instead of top-k) keeps the result set-stable:
    no tie-break nondeterminism between engines.
    """
    toks = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.countDistinct(id_col).alias("doc_freq"),
            F.count("*").alias("total_freq"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )


# --- eval-set contamination check --------------------------------------------

def ngram_set_expr(n: int, text_col: str = "text") -> Column:
    """Distinct word ``n``-grams of the lowercased, whitespace-tokenized
    text, each gram a space-joined string. Documents with fewer than ``n``
    tokens yield an empty array (``F.sequence`` would otherwise count DOWN
    from 0 and fabricate grams)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    tk = tokens_expr(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tk) - n),
        lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)),
    )
    return F.when(F.size(tk) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train-vs-eval n-gram overlap (decontamination audit).

    The GPT-3-style contamination check: a training document is flagged when
    any of its word ``n``-grams also appears in the evaluation corpus
    (Brown et al. 2020 use 13-grams; smaller ``n`` = stricter). Returns one
    row per train doc that has >= 1 gram:
    ``(id, n_grams, n_hit, hit_ratio, contaminated)`` where ``n_grams``
    counts the doc's DISTINCT grams and ``n_hit`` how many of those occur
    anywhere in the eval set.

    Plan shape at 100 TB: the eval side is an eval *benchmark* — thousands
    of docs, so its distinct-gram set (exploded + deduped) broadcasts; the
    train side is explode (map-only, docs stay partition-local) -> broadcast
    left join -> groupBy(id), whose map-side partial aggregation collapses
    each doc back to one row before the only shuffle. Nothing O(corpus)
    ever crosses an exchange except one row per train doc.

    Reference analog: dx_filter drops records matching a regex
    (SURVEY.md #22); this is the corpus-level membership filter an LLM
    training pipeline runs before every training job.
    """
    from pyspark.sql.functions import broadcast

    eval_grams = (
        eval_df.select(F.explode(ngram_set_expr(n, text_col)).alias("ng"))
        .distinct()
    )
    flat = train.select(
        F.col(id_col), F.explode(ngram_set_expr(n, text_col)).alias("ng")
    )
    joined = flat.join(broadcast(eval_grams.withColumn("hit", F.lit(1))),
                       on="ng", how="left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("hit_ratio"),
            (F.col("n_hit") > 0).cast("int").alias("contaminated"),
        )
    )


# --- sequence packing (concat-and-chop) ---------------------------------------

def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_size: int = 100_000,
) -> DataFrame:
    """Assign each document its position in GPT-style packed training
    sequences: concatenate all docs' tokens in ascending ``id_col`` order
    into one virtual stream and chop it every ``budget`` tokens.

    Returns ``(id, n_tokens, start_offset, seq_id, end_seq_id,
    spans_boundary, n_seqs)`` — ``seq_id`` is the packed sequence the doc
    starts in, ``spans_boundary`` flags docs split across a chop point.

    The global running offset is a distributed prefix sum, NOT a
    single-partition global window (which would serialize the corpus
    through one task):

    1. ``block = floor(id / block_size)`` — a monotone function of the id,
       so block order == id order regardless of id density;
    2. per-block token totals -> driver (O(#blocks) rows, metadata-bounded)
       -> exclusive running offsets per block;
    3. within-block cumulative sum via a window partitioned BY BLOCK (each
       window fits one task), plus the broadcast block offset.

    One shuffle (the block window), one broadcast join; everything else is
    whole-stage codegen. ``block_size`` bounds rows per window task — at
    10^10 docs use ~10^5 blocks of ~10^5 docs. Requires a numeric id.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    base = df.select(
        F.col(id_col),
        F.floor(F.col(id_col) / block_size).alias("_blk"),
        F.size(tokens_expr(text_col)).alias("n_tokens"),
    )
    totals = (
        base.groupBy("_blk").agg(F.sum("n_tokens").alias("_tot"))
        .orderBy("_blk")
        .collect()
    )
    run, offsets = 0, []
    for r in totals:
        offsets.append((r["_blk"], run))
        run += r["_tot"]
    off_df = df.sparkSession.createDataFrame(offsets, "_blk bigint, _off bigint")
    w = Window.partitionBy("_blk").orderBy(id_col)
    cum = base.withColumn("_cum", F.sum("n_tokens").over(w))
    out = cum.join(broadcast(off_df), on="_blk").select(
        id_col,
        "n_tokens",
        (F.col("_off") + F.col("_cum") - F.col("n_tokens")).alias("start_offset"),
    )
    # integral `div`, not floor(x / b): the latter routes through double and
    # loses exactness past 2^53 — reachable by a 10^10-doc token stream
    seq = F.expr(f"start_offset div {budget}")
    # empty docs (0 tokens) occupy no stream space: end < start; pin their
    # end_seq to seq so they read as non-spanning members of the sequence
    # at their offset
    end_seq = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(start_offset + n_tokens - 1) div {budget}"),
    ).otherwise(seq)
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        seq.alias("seq_id"),
        end_seq.alias("end_seq_id"),
        (end_seq != seq).cast("int").alias("spans_boundary"),
        (end_seq - seq + 1).alias("n_seqs"),
    )
