"""Similarity-search tests: exactness of brute force, ANN invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from corkscrew_spark.catalog import register_tables
from corkscrew_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def test_cosine_topk_planted_duplicate(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0001]),  # near-identical to 1
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.cosine_topk(df, df.filter(F.col("vec_id") == 1), "vec_id",
                                 "embedding", k=3).collect()
    assert [r["neighbor_id"] for r in got] == [2, 3, 4]
    assert got[0]["cosine"] == 1.0  # rounds to 1.0 at 4dp


def test_ann_scores_match_brute_force(spark):
    """Every ANN hit must carry the same (rounded) cosine as the exact
    scorer for that pair — LSH narrows candidates, never changes scores."""
    e = register_tables(spark, SF)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(e, q, "vec_id", "embedding", k=500).collect()
    }
    ann = similarity.ann_topk(e, q, "vec_id", "embedding", k=5, planes=8).collect()
    assert ann, "ANN should return candidates on this corpus"
    for r in ann:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_ann_identical_vector_always_found(spark):
    """An exact duplicate vector lands in the same bucket under any
    hyperplane set, so ANN must rank it first with cosine 1.0."""
    e = register_tables(spark, SF)["embeddings"]
    dup = e.filter(F.col("vec_id") == 0).select(
        F.lit(100000).cast("long").alias("vec_id"), "embedding", "label"
    )
    corpus = e.select("vec_id", "embedding", "label").unionByName(dup)
    q = corpus.filter(F.col("vec_id") == 100000)
    got = similarity.ann_topk(corpus, q, "vec_id", "embedding", k=3, planes=8).collect()
    assert got[0]["neighbor_id"] == 0 and got[0]["cosine"] == 1.0


def test_ivf_recall_and_score_parity(spark):
    """IVF hits must carry brute-force-identical cosines, and probing 4 of
    16 lists must recover most of the true top-5 for every query."""
    e = register_tables(spark, SF)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    truth: dict[int, set[int]] = {}
    scores = {}
    for r in similarity.cosine_topk(e, q, "vec_id", "embedding", k=500).collect():
        scores[(r["query_id"], r["neighbor_id"])] = r["cosine"]
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    got = similarity.ivf_topk(e, q, "vec_id", "embedding", k=5, nlist=16, nprobe=4).collect()
    assert got
    hits = {}
    for r in got:
        assert scores[(r["query_id"], r["neighbor_id"])] == r["cosine"]
        if r["neighbor_id"] in truth[r["query_id"]]:
            hits[r["query_id"]] = hits.get(r["query_id"], 0) + 1
    recall = sum(hits.values()) / sum(len(v) for v in truth.values())
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"


def test_ivf_index_roundtrip(spark, tmp_path):
    """Build-once/probe-many: persist the index, reload in a fresh read
    path, query it — recall bound holds, scores are brute-force-identical,
    and the pruned probe reads ONLY the probed lists' files."""
    e = register_tables(spark, SF)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf-index")
    built = similarity.ivf_build_index(e, "vec_id", "embedding", idx, nlist=16)
    assert similarity.ivf_load_centroids(spark, idx) == built

    got = similarity.ivf_topk_indexed(spark, idx, q, "vec_id", "embedding",
                                      k=5, nprobe=4).collect()
    assert got
    # score parity + recall vs exact top-5
    truth, scores = {}, {}
    for r in similarity.cosine_topk(e, q, "vec_id", "embedding", k=500).collect():
        scores[(r["query_id"], r["neighbor_id"])] = r["cosine"]
    for r in similarity.cosine_topk(e, q, "vec_id", "embedding", k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = 0
    for r in got:
        assert scores[(r["query_id"], r["neighbor_id"])] == r["cosine"]
        hits += r["neighbor_id"] in truth[r["query_id"]]
    assert hits / sum(len(v) for v in truth.values()) >= 0.5

    # matches the unindexed operator given the same centroids
    direct = similarity.ivf_topk(e, q, "vec_id", "embedding", k=5, nprobe=4,
                                 centroids=built).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)
    assert key(got) == key(direct)

    # partition pruning: the probed cids land as a static PartitionFilter
    # on the lists scan (inputFiles() ignores pruning, so assert the plan)
    lists = spark.read.parquet(f"{idx}/lists")
    one_q = q.filter(F.col("vec_id") == 0)
    probed_cids = sorted({r.cid for r in
                          one_q.select(F.explode(similarity.probe_lists(
                              similarity._as_double("embedding"), built, 4)).alias("cid"))
                          .distinct().collect()})
    assert len(probed_cids) <= 4
    pruned = lists.filter(F.col("cid").isin(probed_cids))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cid" in plan and " IN (" in plan
    assert pruned.count() < lists.count()


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == nlist probes every list — results must equal the exact
    top-k (same ids, same order)."""
    e = register_tables(spark, SF)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk(e, q, "vec_id", "embedding", k=3).collect()
    full = similarity.ivf_topk(e, q, "vec_id", "embedding", k=3, nlist=8, nprobe=8).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)
    assert key(exact) == key(full)


def test_quantized_cosine_recall(spark):
    """int8 quantization: recall@5 vs exact ≥ 0.8 on the real embedding
    table, and every returned score within 0.02 of the exact cosine."""
    e = register_tables(spark, SF)["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    exact_rows = similarity.cosine_topk(e, q, "vec_id", "embedding", k=5).collect()
    truth = {}
    scores = {}
    for r in exact_rows:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        scores[(r["query_id"], r["neighbor_id"])] = r["cosine"]

    eq = similarity.quantize_int8(e, "embedding")
    qq = eq.filter(F.col("vec_id") < 10)
    got = similarity.quantized_cosine_topk(eq, qq, "vec_id", k=5).collect()
    hits = sum(1 for r in got if r["neighbor_id"] in truth.get(r["query_id"], ()))
    recall = hits / sum(len(v) for v in truth.values())
    assert recall >= 0.8, f"int8 recall too low: {recall:.2f}"
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.cosine_topk(e, q, "vec_id", "embedding", k=10**6).collect()
    }
    for r in got:
        assert abs(r["qcosine"] - exact_all[(r["query_id"], r["neighbor_id"])]) < 0.02


def test_quantize_int8_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in
           similarity.quantize_int8(df, "embedding").collect()}
    assert got[1]["qvec"] == [64, -127, 32]  # round(x / (1.0/127))
    assert abs(got[1]["qscale"] - 1.0 / 127) < 1e-9
    assert got[2]["qvec"] == [0, 0, 0]  # zero vector: no div-by-zero
    assert "embedding" not in got[1].asDict()


class TestProductQuantization:
    def test_exact_when_codebooks_exact(self, spark):
        """Vectors drawn exactly from the codebooks quantize losslessly,
        so PQ ranking must equal exact L2 ranking."""
        from corkscrew_spark.operators import similarity

        # 2 subspaces x 2-dim, 3 centroids each
        cbs = [
            [[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]],
            [[5.0, 5.0], [6.0, 5.0], [5.0, 7.0]],
        ]
        rows = []
        vid = 0
        for a in range(3):
            for b in range(3):
                rows.append((vid, cbs[0][a] + cbs[1][b]))
                vid += 1
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        codes = similarity.pq_encode(df, "embedding", cbs)
        got = similarity.pq_topk(codes, df.filter("vec_id < 3"),
                                 "vec_id", "embedding", cbs, k=3).collect()
        import math
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append(r)
        vecs = {i: v for i, v in rows}
        for qid, lst in by_q.items():
            exact = sorted(
                ((math.dist(vecs[qid], vecs[i]), i)
                 for i in vecs if i != qid))[:3]
            assert [r.neighbor_id for r in sorted(lst, key=lambda r: r.rank)] \
                == [i for _, i in exact]
            for r in lst:
                d = math.dist(vecs[qid], vecs[r.neighbor_id])
                assert abs(r.approx_l2 - round(d, 4)) < 1e-6

    def test_trained_recall(self, spark, sf_dir):
        """PQ trained on the synthetic embeddings must put a decent
        fraction of true L2 neighbors in its top-5."""
        from corkscrew_spark.catalog import register_tables
        from corkscrew_spark.operators import similarity
        from pyspark.sql import functions as F

        e = register_tables(spark, sf_dir)["embeddings"]
        cbs = similarity.pq_train(e, "vec_id", "embedding", m=8, ksub=16,
                                  iters=1)
        codes = similarity.pq_encode(e, "embedding", cbs)
        q = e.filter(F.col("vec_id") < 10)
        approx = similarity.pq_topk(codes, q, "vec_id", "embedding", cbs,
                                    k=5, rerank=e, shortlist=50).collect()

        exact_pairs = {(r.vec_id, r.other_id) for r in (
            q.alias("a").crossJoin(e.alias("b"))
            .filter(F.col("a.vec_id") != F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("vec_id"),
                F.col("b.vec_id").alias("other_id"),
                F.sqrt(F.aggregate(
                    F.zip_with(
                        F.col("a.embedding").cast("array<double>"),
                        F.col("b.embedding").cast("array<double>"),
                        lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, x: acc + x)).alias("d"))
            .withColumn("rk", F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("vec_id").orderBy("d", "other_id")))
            .filter("rk <= 5").collect())}
        got_pairs = {(r.query_id, r.neighbor_id) for r in approx}
        recall = len(got_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.3, recall

    def test_code_shape_and_dim_check(self, spark):
        from corkscrew_spark.operators import similarity
        import pytest

        df = spark.createDataFrame(
            [(i, [float(i)] * 6) for i in range(20)], ["vec_id", "embedding"])
        with pytest.raises(ValueError):
            similarity.pq_train(df, "vec_id", "embedding", m=4)
        cbs = similarity.pq_train(df, "vec_id", "embedding", m=3, ksub=4)
        assert len(cbs) == 3 and len(cbs[0]) == 4 and len(cbs[0][0]) == 2
        enc = similarity.pq_encode(df, "embedding", cbs)
        row = enc.first()
        assert len(row.pq_code) == 3
        assert dict(enc.dtypes)["pq_code"] == "array<tinyint>"


class TestIvfPq:
    """IVF×PQ composition: full-probe + exact-codebook setup must equal
    brute force; narrowing nprobe only shrinks the candidate set."""

    def _grid(self, spark):
        # 12 vectors on 3 well-separated clusters; each vector IS one of
        # its subspace codebook entries when ksub >= n (codebook-exact)
        rows = []
        base = {0: [1.0, 1.0, 0.0, 0.0], 1: [10.0, 10.0, 10.0, 10.0],
                2: [-10.0, -10.0, 5.0, 5.0]}
        for i in range(12):
            b = base[i % 3]
            rows.append((i, [v + (i // 3) * 0.25 for v in b]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_full_probe_exact_codebooks_equal_brute_force(self, spark):
        df = self._grid(spark)
        q = df.filter("vec_id < 3")
        got = similarity.ivfpq_topk(
            df, q, "vec_id", "embedding", k=3, nlist=3, nprobe=3,
            m=2, ksub=12, train_iters=2, pq_iters=1)
        exact = similarity.cosine_topk(df, q, "vec_id", "embedding", k=3)
        got_ids = {(r.query_id, r.rank): r.neighbor_id for r in got.collect()}
        # brute-force L2 over these clusters: nearest neighbors are the
        # same-cluster members in offset order
        for qid in range(3):
            assert got_ids[(qid, 1)] % 3 == qid % 3
        assert exact.count() == 9 and got.count() == 9

    def test_rerank_returns_exact_distances(self, spark):
        df = self._grid(spark)
        q = df.filter("vec_id < 2")
        got = similarity.ivfpq_topk(
            df, q, "vec_id", "embedding", k=2, nlist=3, nprobe=3,
            m=2, ksub=12, rerank=df, shortlist=6).collect()
        import math
        vecs = {r.vec_id: list(r.embedding) for r in df.collect()}
        for r in got:
            expect = math.sqrt(sum(
                (a - b) ** 2
                for a, b in zip(vecs[r.query_id], vecs[r.neighbor_id])))
            assert abs(r.approx_l2 - round(expect, 4)) < 1e-9

    def test_narrow_probe_only_same_list_candidates(self, spark):
        df = self._grid(spark)
        q = df.filter("vec_id = 0")
        got = similarity.ivfpq_topk(
            df, q, "vec_id", "embedding", k=10, nlist=3, nprobe=1,
            m=2, ksub=12, train_iters=3)
        # cluster 0 has 4 members; probing 1 of 3 lists returns at most
        # the same-cluster candidates (3 neighbors after self-exclusion)
        ids = [r.neighbor_id for r in got.collect()]
        assert ids and all(i % 3 == 0 for i in ids)


def test_ivf_family_broadcasts_probe_side(spark):
    """The cid candidate join must broadcast the probe side: cid has only
    nlist distinct values, so a shuffle join would funnel the entire
    corpus onto nlist reducers. Regression-pins the broadcast for
    ivf_topk and ivfpq_topk, and the absence of any sort-merge/shuffled
    join keyed on cid."""
    e = register_tables(spark, SF)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    cents = similarity.ivf_centroids(e, "vec_id", "embedding", nlist=4,
                                     iters=1)
    cbs = similarity.pq_train(e, "vec_id", "embedding", m=8, ksub=4, iters=1)
    plans = {
        "ivf": similarity.ivf_topk(
            e, q, "vec_id", "embedding", k=3, nlist=4, nprobe=2,
            centroids=cents),
        "ivfpq": similarity.ivfpq_topk(
            e, q, "vec_id", "embedding", k=3, nlist=4, nprobe=2, m=8,
            ksub=4, centroids=cents, codebooks=cbs, rerank=e, shortlist=9),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, f"{name}: probe side not broadcast"


def test_train_sample_deterministic_and_bounded(spark):
    """max_train caps the Lloyd pass input to a stable hash-ordered
    sample: same sample every call, and training on the cap must equal
    training on a pre-limited corpus of the same rows."""
    e = register_tables(spark, SF)["embeddings"]
    capped = similarity.ivf_centroids(e, "vec_id", "embedding", nlist=4,
                                      iters=1, max_train=64)
    manual = similarity.ivf_centroids(
        e.orderBy(F.xxhash64(F.col("vec_id"))).limit(64),
        "vec_id", "embedding", nlist=4, iters=1)
    assert capped == manual
    cb_capped = similarity.pq_train(e, "vec_id", "embedding", m=8, ksub=4,
                                    iters=1, max_train=64)
    cb_again = similarity.pq_train(e, "vec_id", "embedding", m=8, ksub=4,
                                   iters=1, max_train=64)
    assert cb_capped == cb_again


def test_zero_norm_vectors_never_divide_by_zero(spark):
    """r10 review: dedup's pair scans guarded zero-norm vectors but the
    similarity scorers did not — ONE zero embedding (padding row,
    failed encoder) crashed every top-k variant with ANSI
    DIVIDE_BY_ZERO mid-job. Zero vectors score cosine 0 and rank last,
    never raise."""
    from corkscrew_spark.operators import similarity

    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]),
            (3, [0.0, 0.0, 0.0]), (4, [0.0, 1.0, 0.0])]
    c = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = c.filter("vec_id IN (1, 3)")
    got = similarity.cosine_topk(c, q, "vec_id", "embedding", k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    # the zero QUERY vector scores 0 against everyone
    assert all(r["cosine"] == 0.0 for r in by_q[3])
    # the zero corpus vector scores 0 for a real query and ranks last
    q1 = sorted(by_q[1], key=lambda r: r["rank"])
    assert q1[0]["neighbor_id"] == 2  # genuine nearest first
    assert {r["neighbor_id"]: r["cosine"] for r in q1}[3] == 0.0
    # the ANN variants survive zero vectors too
    assert similarity.ann_topk(c, q, "vec_id", "embedding", k=2).count() > 0
    assert similarity.ivf_topk(c, q, "vec_id", "embedding", k=2,
                               nlist=2, nprobe=2).count() > 0


def test_sql_text_builders_match_column_api(spark):
    """r12: the SQL-text expression builders (one py4j call) must be
    bit-identical to the Column-API builders they replace on the hot
    paths — same assignments, same probe lists, same ADC distances."""
    import random

    from pyspark.sql import functions as F

    from corkscrew_spark.operators.similarity import (
        _adc_l2, assign_expr, assign_list, centroids_lit, probe_lists,
        probe_lists_expr)

    random.seed(41)
    dim, nlist = 12, 7
    cents = [[random.uniform(-2, 2) for _ in range(dim)]
             for _ in range(nlist)]
    rows = [(i, [random.uniform(-2, 2) for _ in range(dim)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    both = df.select(
        assign_expr("`v`", cents).alias("a"),
        assign_list(F.col("v"), cents).alias("b"),
        probe_lists_expr("`v`", cents, 3).alias("pa"),
        probe_lists(F.col("v"), cents, 3).alias("pb"),
    ).collect()
    assert all(r["a"] == r["b"] and list(r["pa"]) == list(r["pb"])
               for r in both)
    # ADC: SQL-text vs forced Column fallback (inject a NaN codebook
    # copy to trip the fallback) on identical codes/queries
    m, ksub, sub = 3, 4, 4
    cbs = [[[random.uniform(-1, 1) for _ in range(sub)]
            for _ in range(ksub)] for _ in range(m)]
    codes = spark.createDataFrame(
        [(i, [random.randrange(ksub) for _ in range(m)],
          [random.uniform(-1, 1) for _ in range(m * sub)])
         for i in range(40)],
        "id long, code array<int>, qv array<double>")
    fast = codes.select(F.col("id"), _adc_l2(cbs).alias("d")).collect()
    # the Column fallback path, same data: monkeypatch the gate
    import corkscrew_spark.operators.similarity as sim
    orig = sim._centroids_sql
    sim._centroids_sql = lambda c: None
    try:
        slow = codes.select(F.col("id"),
                            _adc_l2(cbs).alias("d")).collect()
    finally:
        sim._centroids_sql = orig
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))
