"""Fuzzy (edit-distance) join: match dirty strings against a reference
corpus without an all-pairs scan.

Generalizes the reference's single-string Levenshtein suggestion UX
(internal/cli/suggestions.go; surfaced here as `levenshtein_suggest`)
into a set-to-set JOIN — the entity-resolution/dirty-data primitive.

Scale shape (Ed-Join-style asymmetric prefix filtering, Xiao et al.
VLDB'08, public algorithm):

* Every RIGHT string indexes ALL of its distinct q-grams — |right| × ~len
  posting rows, one shuffle on the gram key.
* Every LEFT (probe) string probes only its ``max_dist·q + 1`` globally
  RAREST grams: k edits destroy at most k·q grams, so two strings within
  edit distance k share at least |G_left| − k·q grams, and under any
  fixed total gram order at least one of the k·q+1 rarest left grams
  must hit the right side's full gram set. Probing rare grams keeps
  posting-list fan-out small — candidates come from shared-rare-key
  joins, never |left| × |right|.
* Probe strings too short to own k·q+1 grams fall back to a complete
  length-bucket block (edit distance ≥ length difference, so candidates
  live in [len−k, len+k] — 2k+1 equi-join keys).
* Survivors dedupe and verify with the JVM ``levenshtein`` built-in —
  blocking is provably complete, verification exact, so the result
  equals the brute-force cross join at a fraction of the pairs.

The q-gram dictionary is |alphabet|^q distinct rows at most (a few
thousand for q=2 text) — always broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_rows(df: DataFrame, id_col: str, s_col: str, out_id: str,
               out_s: str, q: int) -> DataFrame:
    """(id, string, distinct-q-gram array) per input row."""
    n = F.length(F.col(s_col))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - q + 1, F.lit(1))),
            lambda i: F.col(s_col).substr(i, F.lit(q)),
        )
    )
    return df.select(
        F.col(id_col).alias(out_id),
        F.col(s_col).alias(out_s),
        grams.alias("__grams"),
    )


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_id: str, left_str: str,
               right_id: str, right_str: str,
               max_dist: int = 2, q: int = 2) -> DataFrame:
    """All (left, right) pairs with levenshtein distance ≤ ``max_dist``.

    Returns (``left_id``, ``right_id``, distance) — exact: equal to the
    brute-force cross-join result (see module docstring for why the
    blocking loses no pairs).
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    prefix_n = max_dist * q + 1

    l = _gram_rows(left, left_id, left_str, "__lid", "__ls", q)
    r = _gram_rows(right, right_id, right_str, "__rid", "__rs", q)

    # Global gram order = (document frequency over the RIGHT side, gram).
    # Left grams unseen on the right sort rarest (df 0) — they spend a
    # probe slot but never break completeness: the order stays total and
    # right postings are unfiltered.
    gram_df = (
        r.select(F.explode("__grams").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    r_post = r.select("__rid", "__rs", F.explode("__grams").alias("gram"))

    l_long = l.filter(F.size("__grams") >= prefix_n)
    l_short = l.filter(F.size("__grams") < prefix_n)

    # Long probes: keep each probe's prefix_n rarest grams.
    l_probe = (
        l_long.select("__lid", "__ls", F.explode("__grams").alias("gram"))
        .join(F.broadcast(gram_df), "gram", "left")
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("__lid")
                .orderBy(F.coalesce("df", F.lit(0)), "gram")
            ),
        )
        .filter(F.col("__rk") <= prefix_n)
        .select("__lid", "__ls", "gram")
    )
    cand_long = l_probe.join(r_post, "gram").select(
        "__lid", "__ls", "__rid", "__rs"
    )

    # Short probes: complete length block (edit dist ≥ length difference).
    cand_short = (
        l_short.select(
            "__lid", "__ls",
            F.explode(
                F.sequence(
                    F.greatest(F.length("__ls") - max_dist, F.lit(0)),
                    F.length("__ls") + max_dist,
                )
            ).alias("__len"),
        )
        .join(
            r.select("__rid", "__rs", F.length("__rs").alias("__len")),
            "__len",
        )
        .select("__lid", "__ls", "__rid", "__rs")
    )

    return (
        cand_long.unionByName(cand_short)
        .filter(F.abs(F.length("__ls") - F.length("__rs")) <= max_dist)
        .distinct()
        .withColumn("distance", F.levenshtein("__ls", "__rs"))
        .filter(F.col("distance") <= max_dist)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("distance").cast("long").alias("distance"),
        )
    )
