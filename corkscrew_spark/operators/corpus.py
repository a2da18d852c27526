"""Corpus-level text statistics and cleaning operators.

The CCNet/RefinedWeb family of corpus passes: line-level boilerplate
removal, self-trained unigram language-model scoring (the perplexity-
filter analog that needs no external model), and TF-IDF term salience.
Everything is built-in Column expressions — explode/agg/join/window —
so the plans stay JVM-side and shuffle only on the natural keys.

Beyond-reference training-data surface (SURVEY.md §8 "beyond-ref");
the reference engine has no corpus subsystem to cite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Line-level boilerplate removal (RefinedWeb / CCNet line dedup)
# ---------------------------------------------------------------------------

def doc_lines(docs: DataFrame, id_col: str, text_col: str,
              group_col: str) -> DataFrame:
    """(id, group, pos, line) — one row per physical line of each doc."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.posexplode(F.split(_c(text_col), "\n")).alias("pos", "line"),
    )


def boilerplate_lines(docs: DataFrame, id_col: str, text_col: str,
                      group_col: str, min_docs: int = 2) -> DataFrame:
    """Lines that repeat across >= ``min_docs`` distinct docs of the same
    group (site/domain/source) — navigation chrome, cookie banners,
    licence footers. Key = trimmed line; blank lines are never counted.

    Returns (grp, line_key, doc_freq). One shuffle: the groupBy on
    (grp, line_key) with map-side partial aggregation; at corpus scale
    the output is the distinct frequent-line set, orders of magnitude
    smaller than the line relation.
    """
    lines = doc_lines(docs, id_col, text_col, group_col)
    return (
        lines.select("id", "grp", F.trim("line").alias("line_key"))
        .filter(F.col("line_key") != "")
        .groupBy("grp", "line_key")
        .agg(F.count_distinct("id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
    )


def remove_boilerplate_lines(docs: DataFrame, id_col: str, text_col: str,
                             group_col: str, min_docs: int = 2,
                             out_col: str = "clean_text") -> DataFrame:
    """Strip boilerplate lines from every doc, preserving line order.

    Three shuffles, all on natural keys: the frequency agg, the
    lines⋈frequent-lines anti join on (grp, trimmed line), and the
    per-doc reassembly groupBy. A doc whose every line is boilerplate
    survives as ''. Line order is restored by sorting (pos, line)
    structs — array_sort orders on the leading pos field.
    """
    lines = doc_lines(docs, id_col, text_col, group_col)
    frequent = boilerplate_lines(docs, id_col, text_col, group_col, min_docs)
    kept = lines.join(
        frequent,
        (lines["grp"] == frequent["grp"])
        & (F.trim(lines["line"]) == frequent["line_key"]),
        "left_anti",
    )
    clean = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias(out_col)
    )
    return (
        docs.join(clean, docs[id_col] == clean["id"], "left")
        .drop("id")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("")))
    )


# ---------------------------------------------------------------------------
# Self-trained unigram LM scoring (perplexity-filter analog)
# ---------------------------------------------------------------------------

def doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) — one row per token occurrence, single-space model."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(_c(text_col)), " ")).alias("tok"),
    )


def unigram_logprob(docs: DataFrame, id_col: str, text_col: str,
                    round_to: int = 6) -> DataFrame:
    """Score each doc by the corpus's own unigram LM: mean negative log
    probability of its tokens (the CCNet perplexity-bucket filter with
    the KenLM swapped for a self-trained unigram model — no external
    artifact, fully engine-portable).

    High scores = improbable token mix (gibberish, rare-token spam);
    low = common/repetitive text. Plans: one agg for the vocab, a
    broadcast 1-row agg for the corpus size (no driver round-trip), a
    tok-keyed join (AQE auto-broadcasts small vocabularies), and the
    per-doc agg. Returns (id, n_tokens, avg_neg_logprob).
    """
    toks = doc_tokens(docs, id_col, text_col)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    total = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(-F.avg(F.log(F.col("tf") / F.col("n_total"))), round_to)
            .alias("avg_neg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF term salience
# ---------------------------------------------------------------------------

def tfidf_top_terms(docs: DataFrame, id_col: str, text_col: str,
                    k: int = 3, round_to: int = 6) -> DataFrame:
    """Top-``k`` TF-IDF terms per doc: tf(d,t) · ln(N/df(t)).

    Two aggs (term frequency per doc, document frequency per term), a
    broadcast 1-row doc count, and a per-doc window for the top-k —
    every shuffle is on a natural key and the window is partitioned by
    doc id, so no single-task funnels. Ties break on the term string.
    Returns (id, term, tfidf, rank).
    """
    tf = (
        doc_tokens(docs, id_col, text_col)
        .groupBy("id", F.col("tok").alias("term"))
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.col(id_col)).agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id", "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), round_to)
            .alias("tfidf"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Self-trained bigram LM scoring
# ---------------------------------------------------------------------------

def doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent lowercase token pair.

    Pair expansion is a map-side transform over index ranges (no join,
    no window); docs with fewer than two tokens contribute nothing.
    """
    toks = F.split(F.lower(_c(text_col)), " ")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(F.col("tl")) - 1),
        lambda i: F.struct(
            F.element_at(F.col("tl"), i).alias("w1"),
            F.element_at(F.col("tl"), i + 1).alias("w2"),
        ),
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("tl"))
        .filter(F.size("tl") >= 2)
        .select("id", F.explode(pairs).alias("p"))
        .select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_logprob(docs: DataFrame, id_col: str, text_col: str,
                   round_to: int = 6) -> DataFrame:
    """Mean negative log conditional bigram probability per doc under the
    corpus's own bigram LM: -avg(ln(c(w1,w2) / c(w1 ·))).

    The unigram scorer's natural next order: catches scrambled word
    salads unigram statistics miss. Two aggs on natural keys + two
    joins back to the pair stream — AQE broadcasts small vocabularies;
    at corpus scale both joins shuffle on token keys, never all-pairs.
    Returns (id, n_bigrams, avg_neg_logprob).
    """
    bg = doc_bigrams(docs, id_col, text_col)
    pair_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    prefix_counts = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    return (
        bg.join(pair_counts, ["w1", "w2"])
        .join(prefix_counts, ["w1"])
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg(F.log(F.col("c2") / F.col("c1"))), round_to)
            .alias("avg_neg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# Context-window chunking (training / RAG ingestion)
# ---------------------------------------------------------------------------

def chunk_documents(docs: DataFrame, id_col: str, text_col: str,
                    window: int = 128, stride: int = 96) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    context-window chunking pass of a training/RAG ingestion pipeline
    (window=stride gives disjoint chunks; stride < window overlaps by
    ``window - stride`` tokens so no span straddles a boundary unseen).

    Chunk starts are ``1, 1+stride, 2·stride+1, …`` over the whitespace
    token array, generated per-row with ``sequence`` + ``explode`` — a
    map-side row generator, linear in total tokens, no shuffle, no UDF.
    The final short chunk is kept (callers filter ``chunk_len`` if they
    need full windows only). Deterministic chunk ids ``(doc, ordinal)``.

    Returns (id, chunk_no, start_tok, chunk_len, chunk_text).
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.trim(_c(text_col)), r"\s+")
    # Start grid 1, 1+stride, … capped at n − window + stride: the largest
    # start whose chunk adds tokens the previous one did not cover. Every
    # token lands in some chunk (largest grid point ≥ n − window + 1);
    # docs shorter than one window produce exactly one chunk.
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - F.lit(window - stride), F.lit(1)),
        F.lit(stride),
    )
    return (
        docs.select(
            _c(id_col).alias("id"),
            toks.alias("t"),
            F.posexplode(starts).alias("chunk_no", "start_tok"),
        )
        .select(
            "id", "chunk_no", "start_tok",
            F.size(F.slice("t", F.col("start_tok"), F.lit(window)))
            .cast("long").alias("chunk_len"),
            F.array_join(F.slice("t", F.col("start_tok"), F.lit(window)), " ")
            .alias("chunk_text"),
        )
    )


# ---------------------------------------------------------------------------
# Inverted index + conjunctive term search
# ---------------------------------------------------------------------------

def build_inverted_index(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Term → document postings over the lowercased whitespace tokens:
    (term, doc_id, tf). The index build is explode + one groupBy on
    (term, doc) — the shape that scales to any corpus because postings
    shuffle on the term key and never materialize per-term lists in one
    task. Persist with warehouse.write_partitioned/bucketed on ``term``
    to make later lookups partition-pruned."""
    return (
        docs.select(
            _c(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.trim(_c(text_col))), r"\s+"))
            .alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def search_all_terms(index: DataFrame, terms: list[str]) -> DataFrame:
    """Conjunctive (AND) search over the inverted index: documents
    containing EVERY query term, ranked by summed term frequency.

    Plan: filter the postings to the |terms| query keys (an IN-list the
    scan prunes on), then ONE groupBy counting distinct matched terms —
    a doc qualifies iff it matched all of them. No join per term, no
    intersection loop: |terms|-way conjunction costs one shuffle on
    doc_id regardless of term count.

    Returns (doc_id, total_tf) for qualifying docs.
    """
    if not terms:
        raise ValueError("search_all_terms: need at least one term")
    uniq = sorted({t.lower() for t in terms})
    return (
        index.filter(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("__matched"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
        .filter(F.col("__matched") == len(uniq))
        .drop("__matched")
    )
