"""Sequence packing: assign documents to fixed-token-budget training
sequences (concat-and-chunk, the GPT-style pretraining layout).

Documents are laid head-to-tail in a deterministic order inside each
stratum (shard/source/language); the resulting token stream is cut every
``budget`` tokens into sequences. A document whose span crosses a cut
contributes a chunk to BOTH sequences — exactly what a
concat-and-chunk tokenizer pipeline produces, and what makes the
operator a pure window + arithmetic problem instead of a sequential
bin-packer.

Scale shape: the running token offset is a window cumsum PARTITIONED BY
the stratum column — per-shard streams, never a global single-task sort
(packing a 100 TB corpus is always done per shard; the stratum column is
how the caller names the shards). The chunk explosion is
``sequence()`` + ``explode`` over at most
ceil(doc_tokens / budget) + 1 elements per document — map-side, no extra
shuffle beyond the one the window needs.

Everything is SQL-expressible, so the driver's DuckDB oracle replays the
identical computation (see plans/data_queries.py::pack_sequences).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def whitespace_tokens(text_col: str | Column) -> Column:
    """Whitespace token count — the cross-engine-stable proxy the text
    operators use (a real BPE count would ride the same plumbing)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.split(F.trim(col), r"\s+"))


def pack_sequences(docs: DataFrame, id_col: str, text_col: str, budget: int,
                   stratify_col: str, sep_tokens: int = 0) -> DataFrame:
    """One row per (document, sequence) chunk:

    (stratum, seq_id, doc_id, seq_offset, n_tokens): ``seq_offset`` is the
    chunk's first-token position inside the sequence and ``n_tokens`` the
    chunk length; sum(n_tokens) over a non-final seq_id == budget.
    Documents with zero tokens are dropped (nothing to pack).

    ``sep_tokens`` charges each document a trailing separator cost (the
    EOS/BOS tokens a real tokenizer inserts between concatenated docs);
    the separator rides inside the doc's span, so stream offsets stay a
    pure cumsum.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = Window.partitionBy("stratum").orderBy("doc_id")
    spans = (
        docs.select(
            F.col(stratify_col).alias("stratum"),
            F.col(id_col).alias("doc_id"),
            (whitespace_tokens(text_col) + sep_tokens).cast("long")
            .alias("tokens"),
        )
        .filter(F.col("tokens") > sep_tokens)
        .withColumn("end", F.sum("tokens").over(w))
        .withColumn("start", F.col("end") - F.col("tokens"))
    )
    b = F.lit(budget).cast("long")
    chunks = spans.withColumn(
        "seq_id",
        F.explode(
            F.sequence(F.floor(F.col("start") / b), F.floor((F.col("end") - 1) / b))
        ),
    )
    seq_start = F.col("seq_id") * b
    tok_begin = F.greatest(F.col("start"), seq_start)
    tok_end = F.least(F.col("end"), seq_start + b)
    return chunks.select(
        "stratum",
        "seq_id",
        "doc_id",
        (tok_begin - seq_start).cast("long").alias("seq_offset"),
        (tok_end - tok_begin).cast("long").alias("n_tokens"),
    )
