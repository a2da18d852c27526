"""learn_bpe/apply_bpe vs a faithful single-process reference."""

from __future__ import annotations

import collections

from corkscrew_spark.operators import bpe

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower newest"),
]


def _ref_learn(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Reference BPE (Sennrich-style) with the same tie-break."""
    wc = collections.Counter(w for t in texts for w in t.split())
    vocab = {tuple(list(w) + [bpe.END]): n for w, n in wc.items()}
    merges = []
    for _ in range(num_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_merges_match_reference(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = bpe.learn_bpe(df, "text", num_merges=8)
    want = _ref_learn([t for _, t in CORPUS], 8)
    assert got == want
    assert len(got) >= 5  # non-trivial vocabulary learned


def test_apply_matches_reference_tokenization(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    merges = bpe.learn_bpe(df, "text", num_merges=6)
    toks = {r.doc_id: r.bpe_tokens
            for r in bpe.apply_bpe(df, "doc_id", "text", merges).collect()}

    def ref_tokenize(text: str) -> list[str]:
        out_all: list[str] = []
        for w in text.split():
            syms = list(w) + [bpe.END]
            for a, b in merges:
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            out_all.extend(syms)
        return out_all

    for i, text in CORPUS:
        assert toks[i] == ref_tokenize(text), i


def test_greedy_run_semantics(spark):
    """'aaaa' under merge (a,a) must become [aa, aa], never chain."""
    df = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    merges = bpe.learn_bpe(df, "text", num_merges=1)
    assert merges == [("a", "a")]
    row = bpe.apply_bpe(df, "doc_id", "text", merges).first()
    assert row.bpe_tokens == ["aa", "aa", bpe.END, "aa", "aa", bpe.END]


def test_early_stop_on_unique_text(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    assert bpe.learn_bpe(df, "text", num_merges=5) == []
