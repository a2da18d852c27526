"""Sequence packing invariants: full coverage, budget-exact fills,
boundary straddling, stratum isolation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from corkscrew_spark.operators import packing


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


def test_chunks_cover_every_token_exactly_once(spark):
    rows = [(i, " ".join(["tok"] * (7 + i * 3)), "a") for i in range(10)]
    out = packing.pack_sequences(_docs(spark, rows), "doc_id", "text",
                                 budget=16, stratify_col="src")
    per_doc = {r["doc_id"]: r["total"] for r in
               out.groupBy("doc_id").agg(F.sum("n_tokens").alias("total")).collect()}
    assert per_doc == {i: 7 + i * 3 for i in range(10)}


def test_non_final_sequences_fill_the_budget(spark):
    rows = [(i, " ".join(["w"] * 10), "a") for i in range(20)]  # 200 tokens
    out = packing.pack_sequences(_docs(spark, rows), "doc_id", "text",
                                 budget=64, stratify_col="src")
    fills = {r["seq_id"]: r["fill"] for r in
             out.groupBy("seq_id").agg(F.sum("n_tokens").alias("fill")).collect()}
    assert fills == {0: 64, 1: 64, 2: 64, 3: 8}


def test_straddling_doc_chunks_into_both_sequences(spark):
    rows = [(1, " ".join(["x"] * 10), "a"), (2, " ".join(["y"] * 10), "a")]
    out = packing.pack_sequences(_docs(spark, rows), "doc_id", "text",
                                 budget=16, stratify_col="src").collect()
    by = {(r["doc_id"], r["seq_id"]): (r["seq_offset"], r["n_tokens"]) for r in out}
    assert by[(1, 0)] == (0, 10)
    assert by[(2, 0)] == (10, 6)  # first 6 tokens finish seq 0
    assert by[(2, 1)] == (0, 4)   # remaining 4 open seq 1


def test_strata_pack_independently(spark):
    rows = [(1, "a b c", "s1"), (2, "d e f", "s2")]
    out = packing.pack_sequences(_docs(spark, rows), "doc_id", "text",
                                 budget=4, stratify_col="src").collect()
    assert {(r["stratum"], r["seq_id"], r["seq_offset"]) for r in out} == {
        ("s1", 0, 0), ("s2", 0, 0)
    }


def test_empty_and_invalid(spark):
    with pytest.raises(ValueError, match="budget"):
        packing.pack_sequences(_docs(spark, []), "doc_id", "text", 0, "src")
