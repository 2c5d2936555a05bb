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
