"""BPE vocabulary learning over a distributed corpus.

Classic byte-pair-encoding merge learning (Sennrich, Haddow, Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016
— public algorithm): start from characters, repeatedly merge the
globally most frequent adjacent symbol pair. The tokenizer-training step
of an LLM data pipeline, here as a Spark-native iteration.

Scale shape — the corpus is touched ONCE:

* Word counting is the only corpus-sized job (split + explode +
  groupBy(word)); everything after runs on the DISTINCT-WORD table
  weighted by counts, which is orders of magnitude smaller than the
  corpus and independent of corpus size.
* Each merge round is one aggregation over that word table (explode
  adjacent pairs × word weight → top-1 pair with a deterministic
  (count desc, pair asc) tie-break — a 1-row collect), plus a map-only
  fold that applies the merge greedily left-to-right inside every
  word's symbol array.
* The word table is localCheckpointed every round, so the plan stays
  O(1) instead of nesting one fold per learned merge (same iterative
  discipline as operators/graph.py).

``_initial_symbols`` ends every word with the '</w>' boundary marker,
so learned merges never cross word boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over whitespace-split, non-empty tokens."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols plus the end-of-word marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _adjacent_pairs(syms: Column) -> Column:
    """All adjacent (left, right) symbol pairs (overlapping included —
    the statistic classic BPE maximizes)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("left"),
            F.element_at(syms, i + 1).alias("right"),
        ),
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of (left, right) into one symbol —
    an aggregate fold: append each symbol unless it completes the pair
    with the accumulator's tail, in which case the tail is replaced by
    the merged symbol (so a fresh merge never chains into the next
    occurrence, matching reference BPE on runs like 'aaa').
    try_element_at: the tail probe on the empty accumulator must yield
    NULL, not an ANSI out-of-bounds error."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(docs: DataFrame, text_col: str, num_merges: int = 10,
              ) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges; returns them in learned order.

    Deterministic: ties on pair count break lexicographically on
    (left, right). Stops early when no pair occurs twice.
    """
    words = (
        word_counts(docs, text_col)
        .select(_initial_symbols(F.col("word")).alias("syms"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            words.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"),
                         "n")
            .groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "left", "right")
            .first()
        )
        if top is None or top.cnt < 2:
            break
        merges.append((top.left, top.right))
        words = words.select(
            _merge_fold(F.col("syms"), top.left, top.right).alias("syms"),
            "n",
        ).localCheckpoint(eager=True)
    return merges


def apply_bpe(docs: DataFrame, id_col: str, text_col: str,
              merges: list[tuple[str, str]],
              out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize text with a learned merge list: per word, start from
    characters and apply every merge in learned order — a map-only fold
    chain, no shuffle (merge lists are small literals)."""
    words = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                     lambda w: w != "")

    def tokenize_word(w: Column) -> Column:
        syms = _initial_symbols(w)
        for left, right in merges:
            syms = _merge_fold(syms, left, right)
        return syms

    return docs.select(
        F.col(id_col),
        F.flatten(F.transform(words, tokenize_word)).alias(out_col),
    )
