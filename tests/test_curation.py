"""Unit tests for ops.curation: deterministic hash splits, PII redaction,
vocabulary statistics. The entry-oracle test proves DuckDB equivalence at
sf0.01; these pin the semantic contracts (membership stability, fraction
accuracy, redaction ordering) on crafted inputs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.ops.curation import (  # noqa: E402
    assign_split,
    normalized_dedup_groups,
    pii_redact,
    split_thresholds,
    vocab,
)


def test_split_thresholds_rejects_bad_fractions():
    with pytest.raises(ValueError):
        split_thresholds({"train": 0.5, "val": 0.4})  # sums to 0.9
    with pytest.raises(ValueError):
        split_thresholds({"train": 1.2, "val": -0.2})
    with pytest.raises(ValueError):
        split_thresholds({})


def test_split_thresholds_last_is_catchall():
    ts = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert [n for n, _ in ts] == ["train", "val", "test"]
    # last bound sorts above every hex string, so no row is unassigned
    assert ts[-1][1] > "fffff"


def test_assign_split_fractions_and_determinism(spark):
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    out = assign_split(df, "doc_id", salt="v1")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 20000
    # md5 is uniform: 80/10/10 within a loose tolerance at n=20k
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.02
    # deterministic: second evaluation identical
    again = {r["split"]: r["n"] for r in
             assign_split(df, "doc_id", salt="v1").groupBy("split").count()
             .withColumnRenamed("count", "n").collect()}
    assert again == counts


def test_assign_split_membership_stable_under_growth(spark):
    """The property randomSplit lacks: adding rows never reassigns old rows."""
    small = spark.range(1000).withColumnRenamed("id", "doc_id")
    big = spark.range(5000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in assign_split(small, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(big, "doc_id").collect()}
    assert all(b[k] == v for k, v in a.items())


def test_assign_split_salt_redraws(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in assign_split(df, salt="v1").collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(df, salt="v2").collect()}
    changed = sum(1 for k in a if a[k] != b[k])
    assert changed > 100  # a fresh salt is a genuinely different draw


def test_pii_redact_counts_and_order(spark):
    rows = [
        (1, "mail me at jo.doe+x@corp.example.org thanks"),
        (2, "server 192.168.0.1 then call +1 (415) 555-0199 ok"),
        (3, "no pii here at all"),
        (4, "a@b.io and c@d.co and 10.0.0.7"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 0, 0)
    assert "<EMAIL>" in got[1]["redacted"] and "@" not in got[1]["redacted"]
    # counts are per-pattern over the RAW text (documented): the dotted quad
    # also matches the phone pattern, so n_phone=2 — but redaction order
    # (email -> ip -> phone) keeps the OUTPUT masked as <IP> then <PHONE>
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 1, 2)
    assert "<IP>" in got[2]["redacted"] and "<PHONE>" in got[2]["redacted"]
    assert "192.168" not in got[2]["redacted"]
    assert got[3]["redacted"] == "no pii here at all"
    assert (got[4]["n_email"], got[4]["n_ipv4"]) == (2, 1)


def test_normalized_dedup_groups(spark):
    rows = [
        (1, "Hello, World!"),
        (2, "hello   world"),      # same after normalization
        (3, "HELLO WORLD."),       # same after normalization
        (4, "goodbye world"),      # distinct
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["keeper"]: r["n_docs"]
           for r in normalized_dedup_groups(df).collect()}
    assert got == {1: 3, 4: 1}  # keeper = min id, casing/punct/ws folded


def test_vocab_min_df_and_counts(spark):
    rows = [(i, "alpha beta " + ("gamma " if i % 2 == 0 else "")) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["token"]: (r["doc_freq"], r["total_freq"])
           for r in vocab(df, min_df=6).collect()}
    assert got["alpha"] == (10, 10)
    assert got["beta"] == (10, 10)
    assert "gamma" not in got  # doc_freq 5 < min_df 6


# --- ngram_contamination ------------------------------------------------------

def test_contamination_flags_overlap_and_counts_distinct(spark):
    from datax_spark.ops.curation import ngram_contamination

    train = spark.createDataFrame(
        [
            (1, "a b c d e"),            # contains eval gram "b c d"
            (2, "x y z w"),              # clean
            (3, "b c d b c d"),          # repeated hit gram -> distinct count
            (4, "a b"),                  # < n tokens: no grams, dropped
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, "q b c d r")], "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in ngram_contamination(train, ev, n=3).collect()
    }
    assert set(got) == {1, 2, 3}  # doc 4 has no 3-grams
    assert got[1]["contaminated"] == 1 and got[1]["n_hit"] == 1
    assert got[2]["contaminated"] == 0 and got[2]["n_hit"] == 0
    # "b c d b c d" -> distinct grams {b c d, c d b, d b c}: one hits
    assert got[3]["n_grams"] == 3 and got[3]["n_hit"] == 1


def test_contamination_case_insensitive(spark):
    from datax_spark.ops.curation import ngram_contamination

    train = spark.createDataFrame([(1, "Foo BAR baz")], "doc_id long, text string")
    ev = spark.createDataFrame([(2, "foo bar BAZ")], "doc_id long, text string")
    [r] = ngram_contamination(train, ev, n=3).collect()
    assert r["contaminated"] == 1


def test_ngram_set_expr_rejects_bad_n():
    from datax_spark.ops.curation import ngram_set_expr

    with pytest.raises(ValueError):
        ngram_set_expr(0)


# --- pack_sequences -----------------------------------------------------------

def test_pack_sequences_offsets_and_boundaries(spark):
    from datax_spark.ops.curation import pack_sequences

    docs = spark.createDataFrame(
        [
            (10, "a b c"),        # 3 tokens, offset 0,  seq 0
            (20, "d e"),          # 2 tokens, offset 3,  seq 0 (ends at 4)
            (30, "f g h i"),      # 4 tokens, offset 5,  spans 0->1 (budget 6)
            (40, ""),             # 0 tokens, offset 9,  seq 1, non-spanning
            (50, "j k l m n o p"),# 7 tokens, offset 9,  spans 1->2
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(docs, budget=6, block_size=25).collect()
    }
    assert [rows[i]["start_offset"] for i in (10, 20, 30, 40, 50)] == [0, 3, 5, 9, 9]
    assert rows[30]["seq_id"] == 0 and rows[30]["end_seq_id"] == 1
    assert rows[30]["spans_boundary"] == 1 and rows[30]["n_seqs"] == 2
    assert rows[40]["n_tokens"] == 0 and rows[40]["spans_boundary"] == 0
    assert rows[40]["seq_id"] == rows[40]["end_seq_id"] == 1
    assert rows[50]["seq_id"] == 1 and rows[50]["end_seq_id"] == 2


def test_pack_sequences_block_size_invariant(spark):
    """The distributed block prefix sum must equal a global cumsum no matter
    where the block boundaries fall."""
    from datax_spark.ops.curation import pack_sequences

    docs = spark.createDataFrame(
        [(i * 13 + 1, " ".join(["w"] * ((i * 7) % 11 + 1))) for i in range(60)],
        "doc_id long, text string",
    )
    base = sorted(
        pack_sequences(docs, budget=16, block_size=10_000).collect(),
        key=lambda r: r["doc_id"],
    )
    for bs in (1, 7, 64):
        got = sorted(
            pack_sequences(docs, budget=16, block_size=bs).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [r.asDict() for r in got] == [r.asDict() for r in base], bs


def test_pack_sequences_rejects_bad_budget(spark):
    from datax_spark.ops.curation import pack_sequences

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
