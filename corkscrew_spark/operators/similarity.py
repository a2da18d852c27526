"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (queries × corpus — fine
when the query set is small and the corpus is scanned once); the scale
path is hyperplane-LSH bucketing so candidate generation is a bucket
equi-join instead of a cross join.

Everything is built-in Column expressions (zip_with/aggregate fold for
the dot product) — no Python in the row path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def _safe_cos(dot: Column, na: Column, nb: Column) -> Column:
    """dot/(na·nb) with the zero-norm guard every scorer must share:
    a zero vector (padding row, failed encoder) is similar to nothing
    — cosine 0, not an ANSI DIVIDE_BY_ZERO mid-job (r10 review: the
    guard existed in dedup's pair scans but not here, so ONE zero
    embedding crashed every top-k variant under Spark 4's default
    ANSI mode). Same arithmetic order as before for non-zero rows."""
    return F.when((na == F.lit(0.0)) | (nb == F.lit(0.0)),
                  F.lit(0.0)).otherwise(dot / (na * nb))


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
                k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected to be small → broadcast; the corpus is scanned
    exactly once and never shuffled (the only shuffle is the per-query
    top-k window over |queries|×|corpus| scored rows, which AQE sizes).
    Ranking uses the ROUNDed score (4dp) with id tie-break so results are
    reproducible across platforms' float summation orders.

    Returns (query_id, neighbor_id, cosine, rank).
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_safe_cos(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(vec_col: str, planes: int = 12, dim: int = 64,
                      seed: int = 7) -> Column:
    """Deterministic random-hyperplane LSH bucket id (0 .. 2^planes-1).

    Plane p's component d is a pseudo-random value in (-1.0, 1.0) derived
    from xxhash64(seed, p, d) % 1000 / 1000 — Spark's % keeps the sign of
    the (possibly negative) hash, so components are symmetric around 0,
    which is all hyperplane LSH needs. Fully reproducible across
    runs/engines, no RNG state to ship. Bucket bit p = sign of
    dot(plane_p, vec).
    """
    vec = _as_double(vec_col)

    def plane_dot(p: int) -> Column:
        prods = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x * ((F.xxhash64(F.lit(seed), F.lit(p), d) % 1000) / 1000.0),
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bucket = bucket + F.when(plane_dot(p) > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def ann_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
             k: int = 5, planes: int = 8) -> DataFrame:
    """Approximate top-k: hyperplane-bucket equi-join for candidates, then
    exact cosine rank within the bucket.

    At 100 TB the bucket join shuffles each side once on a 64-bit key; the
    all-pairs work is confined to bucket-local candidates (expected
    |corpus| / 2^planes per bucket — pick `planes` so buckets fit memory).
    Recall can be raised by lowering `planes` or probing neighbor buckets;
    this baseline uses single-probe.
    """
    from pyspark.sql import Window

    bkt = hyperplane_bucket(vec_col, planes=planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"), bkt.alias("bucket")
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"), bkt.alias("bucket")
    ).withColumn("qn", _norm(F.col("qv")))
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_safe_cos(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantizer + probed exact search.
# Build-once / probe-many: ivf_build_index persists the trained centroids
# and the cid-partitioned inverted lists; ivf_topk_indexed probes the
# stored index without touching the raw corpus — the 100 TB usage pattern
# (index amortized over many query batches).
# ---------------------------------------------------------------------------

def ivf_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                  nlist: int = 16, iters: int = 2,
                  max_train: int | None = None) -> list[list[float]]:
    """Train a coarse quantizer: deterministic seeding + Lloyd refinement.

    Seeds are the `nlist` corpus vectors with the smallest xxhash64(id) —
    a stable pseudo-random sample, no RNG state. Each Lloyd iteration
    assigns every vector to its nearest centroid with a pure-codegen
    expression (centroids inlined as literals — no shuffle, no UDF), then
    recomputes means via posexplode + groupBy((cid, dim)) — the only
    shuffle, sized nlist×dim, trivially small at any corpus scale.

    ``max_train`` caps each Lloyd pass to (approximately) that many
    vectors via a deterministic xxhash64(id) threshold — the FAISS
    practice of training quantizers on a bounded sample so a 100 TB
    corpus trains in minutes, replayable with no RNG state. None = full
    corpus (exact legacy behavior).
    """
    train = _train_sample(corpus, id_col, max_train)
    sample = (
        train.select(_as_double(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(nlist)
        .collect()
    )
    centroids = [list(r.v) for r in sample]

    vecs = train.select(_as_double(vec_col).alias("v"))
    for _ in range(iters):
        assigned = vecs.withColumn("cid", assign_expr("`v`", centroids))
        means = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"), F.count("*").alias("n"))
            .collect()
        )
        for row in means:
            centroids[row.cid][row.pos] = row.m
    return centroids


def _train_sample(corpus: DataFrame, id_col: str,
                  max_train: int | None) -> DataFrame:
    """Deterministic bounded training sample: the ``max_train`` rows with
    the smallest xxhash64(id). TakeOrdered does partial top-k per
    partition, so the full corpus is scanned once but only max_train
    rows ever cross the wire — no RNG state, same sample every run."""
    if max_train is None:
        return corpus
    return corpus.orderBy(F.xxhash64(F.col(id_col))).limit(int(max_train))


def _dist_structs(vec: Column, cents: Column) -> Column:
    """(sqdist, cid) structs of ``vec`` against a 2-D centroid array
    COLUMN — one transform over the centroid list instead of one
    expression subtree per centroid, which keeps Catalyst analysis and
    codegen time flat as nlist/ksub grow (a per-centroid expression
    forest made PQ/IVF planning dominate small-job wall time)."""
    d = F.zip_with(
        F.transform(
            cents,
            lambda c: F.aggregate(
                F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        ),
        F.sequence(F.lit(0), F.size(cents) - 1),
        lambda dist, i: F.struct(dist.alias("d"), i.alias("cid")),
    )
    return d


def centroids_lit(centroids: list[list[float]]) -> Column:
    """Centroid list as ONE 2-D array literal, built in ONE py4j call.

    A per-value ``F.array(F.lit(...))`` tree costs Catalyst one node per
    float — at nlist=16 x dim=64 that is ~1k expression nodes per call
    site, and ADC repeats it per subspace; analysis/codegen of those
    trees dominated small-job wall time. ``F.lit(nested_list)`` fixed
    the Catalyst side but PySpark still lowers a list literal through
    one JVM call PER ELEMENT — an r12 profile of ``ann_ivfpq_topk``
    showed ~24k py4j round-trips (~3.3 s of socket latency, 2/3 of the
    query's warm wall) almost all under ``centroids_lit``. Rendering
    the same values as one SQL ``array(array(…D,…))`` string moves the
    whole literal across the bridge in a single ``expr`` call; ``repr``
    round-trips every finite IEEE double, so the parsed literal is
    bit-identical to the old one."""
    vals = [[float(x) for x in c] for c in centroids]
    if not vals or not vals[0] or not all(
            math.isfinite(x) for c in vals for x in c):
        return F.lit(vals)  # empty/non-finite: the slow, general path
    inner = ",".join(
        "array(" + ",".join(f"{x!r}D" for x in c) + ")" for c in vals)
    return F.expr(f"array({inner})")


def assign_col(vec: Column, cents: Column) -> Column:
    """Nearest-centroid id against a centroid-array Column:
    array_min over (distance, cid) structs — lexicographic min gives the
    closest list, cid tie-break keeps it deterministic."""
    return F.array_min(_dist_structs(vec, cents)).getField("cid")


def assign_list(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id for a Python centroid list (inlined literal)."""
    return assign_col(vec, centroids_lit(centroids))


# -- SQL-text twins of the expression builders above ------------------------
#
# The Column-API builders are correct but construction-heavy: every
# higher-order function (transform/zip_with/aggregate) and every literal
# element is its own py4j round-trip, and an r12 cProfile of
# ann_ivfpq_topk showed the BUILD phase (driver-side expression
# construction, not execution) at ~2/3 of warm wall — ~24k bridge calls.
# Rendering the identical expression as ONE SQL string hands the whole
# tree to the JVM parser in a single call. The parsed plan is the same
# expression node-for-node (same lambdas, same struct comparator, same
# tie-breaks), so results are bit-identical — pinned by
# tests/test_similarity.py::test_sql_text_builders_match_column_api.

def _sqlf(x: float) -> str:
    return f"{float(x)!r}D"  # repr round-trips every finite double


def _centroids_sql(centroids: list[list[float]]) -> str | None:
    """The centroid list as a SQL array(array(…)) literal, or None when
    the values need the general Column path (empty / non-finite)."""
    vals = [[float(x) for x in c] for c in centroids]
    if not vals or not vals[0] or not all(
            math.isfinite(x) for c in vals for x in c):
        return None
    return "array(" + ",".join(
        "array(" + ",".join(_sqlf(x) for x in c) + ")"
        for c in vals) + ")"


def _dist_structs_sql(vec_sql: str, cents_sql: str) -> str:
    """SQL text of ``_dist_structs`` (same lambdas, same field order)."""
    return (
        f"zip_with(transform({cents_sql}, c -> "
        f"aggregate(zip_with({vec_sql}, c, (x, y) -> (x - y) * (x - y)),"
        " 0.0D, (acc, x) -> acc + x)), "
        f"sequence(0, size({cents_sql}) - 1), "
        "(d, i) -> named_struct('d', d, 'cid', i))")


def assign_expr(vec_sql: str, centroids: list[list[float]]) -> Column:
    """``assign_list`` built in one py4j call from a vec SQL fragment
    (e.g. ``"`cv`"`` or a slice/transform expression string)."""
    cents_sql = _centroids_sql(centroids)
    if cents_sql is None:
        return assign_list(F.expr(vec_sql), centroids)
    return F.expr(
        f"array_min({_dist_structs_sql(vec_sql, cents_sql)}).cid")


def probe_lists_expr(vec_sql: str, centroids: list[list[float]],
                     nprobe: int) -> Column:
    """``probe_lists`` built in one py4j call."""
    cents_sql = _centroids_sql(centroids)
    if cents_sql is None:
        return probe_lists(F.expr(vec_sql), centroids, nprobe)
    return F.expr(
        f"transform(slice(array_sort("
        f"{_dist_structs_sql(vec_sql, cents_sql)}), 1, {int(nprobe)}), "
        "s -> s.cid)")


def _as_double_sql(vec_col: str) -> str:
    return f"transform(`{vec_col}`, x -> cast(x as double))"


def assign_pandas(df: DataFrame, vec_col: str,
                  centroids: list[list[float]],
                  out_col: str = "cid") -> DataFrame:
    """Nearest-centroid assignment as a vectorized Arrow pass
    (``mapInPandas`` + one numpy GEMM per batch) — the scale path when
    ``nlist`` GROWS with the corpus. The expression-tree assignment
    (``assign_list``) evaluates nlist × dim interpreted terms PER ROW,
    so with nlist ∝ n (constant cluster size) the assignment pass is
    O(n²·dim/const) — measured 4.8× wall at a 2× scale step. Here the
    argmin over ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖² is one (batch × nlist)
    BLAS product; same nearest-centroid ids (shared-arithmetic ties
    break toward the lower cid, matching assign_col's < comparison
    order). Centroid lists up to a few thousand × dim travel inside
    the serialized closure — kilobytes to low MB."""
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = np.asarray(centroids, dtype="float64")
    cnorm = (cents * cents).sum(axis=1)
    # a FRESH StructType: StructType.add mutates in place, and
    # df.schema hands back the live object — appending to it would
    # corrupt the input frame's own column list
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, IntegerType())])

    def _assign(batches):
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            # argmin over -2x·c + ‖c‖² (‖x‖² is constant per row);
            # np.argmin takes the FIRST minimum -> lowest cid on ties,
            # same as the expression comparator
            d = m @ (-2.0 * cents.T) + cnorm
            pdf = pdf.copy()
            pdf[out_col] = np.argmin(d, axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(_assign, schema)


def probe_lists(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """The `nprobe` nearest centroid ids, closest first."""
    pairs = _dist_structs(vec, centroids_lit(centroids))
    return F.transform(
        F.slice(F.array_sort(pairs), 1, nprobe), lambda s: s.getField("cid")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
             k: int = 5, nlist: int = 16, nprobe: int = 4,
             centroids: list[list[float]] | None = None,
             train_iters: int = 2, broadcast: bool = True) -> DataFrame:
    """IVF approximate top-k: assign the corpus to inverted lists once,
    probe the `nprobe` closest lists per query, exact cosine inside.

    Scale shape: corpus assignment is a map-only pass (centroid literals
    live in the codegen'd expression), and the probe side
    (|queries|·nprobe rows) is BROADCAST, so the corpus never shuffles —
    a plain join on `cid` would funnel everything onto nlist reducers.
    Probed work is nprobe/nlist of brute force; the only shuffle is the
    per-query top-k window over the candidate set.

    Recall improves with nprobe (== brute force when nprobe == nlist).
    ``broadcast=False`` falls back to a shuffle join for query sets too
    large to broadcast (mirrors ivf_topk_indexed's prune=False escape
    hatch) — slower (the corpus funnels onto nlist reducers) but never
    driver/executor-OOM. Returns (query_id, neighbor_id, cosine, rank).
    """
    from pyspark.sql import Window

    if centroids is None:
        centroids = ivf_centroids(corpus, id_col, vec_col, nlist=nlist,
                                  iters=train_iters)

    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
        .withColumn("cid", assign_expr("`cv`", centroids))
        .withColumn("cn", _norm(F.col("cv")))
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
        .withColumn("cid", F.explode(probe_lists_expr("`qv`", centroids, nprobe)))
        .withColumn("qn", _norm(F.col("qv")))
    )
    # each corpus row lives in exactly one list and probe cids are
    # distinct, so (query_id, neighbor_id) pairs cannot duplicate — no
    # dedup shuffle needed after the join
    scored = (
        c.join(F.broadcast(q) if broadcast else q, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_safe_cos(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_build_index(corpus: DataFrame, id_col: str, vec_col: str, index_dir: str,
                    nlist: int = 16, train_iters: int = 2) -> list[list[float]]:
    """Train + persist an IVF index under ``index_dir``:

    * ``centroids/``  — (cid, centroid array<double>), the coarse quantizer;
    * ``lists/``      — the corpus assigned to inverted lists, WRITTEN
      PARTITIONED BY cid with the norm precomputed, so probing nprobe
      lists later is a partition-pruned scan of nprobe/nlist of the data
      (the other lists' files are never opened).

    Returns the trained centroids (also reloadable via
    ``ivf_load_centroids``)."""
    spark = corpus.sparkSession
    centroids = ivf_centroids(corpus, id_col, vec_col, nlist=nlist, iters=train_iters)
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cid int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    (
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("cv"))
        .withColumn("cid", assign_expr("`cv`", centroids))
        .withColumn("cn", _norm(F.col("cv")))
        .write.mode("overwrite").partitionBy("cid")
        .parquet(f"{index_dir}/lists")
    )
    return centroids


def ivf_load_centroids(spark, index_dir: str) -> list[list[float]]:
    rows = spark.read.parquet(f"{index_dir}/centroids").orderBy("cid").collect()
    return [list(r.centroid) for r in rows]


def ivf_topk_indexed(spark, index_dir: str, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 5, nprobe: int = 4,
                     prune: bool = True) -> DataFrame:
    """Probe a persisted IVF index (see ivf_build_index) — build once,
    probe many, without touching the raw corpus.

    With ``prune=True`` (the query-serving path) the probed cids are
    collected first — |queries|×nprobe values, tiny — and pushed as a
    literal ``cid IN (...)`` partition filter, so the scan statically
    prunes to the probed lists. With ``prune=False`` the probe is a plain
    join and pruning is left to dynamic partition pruning — use when the
    query set itself is huge. In the prune path the (small) probe side
    is also broadcast so the pruned lists never shuffle on the
    nlist-ary cid key; the huge-query path keeps a plain join."""
    from pyspark.sql import Window

    centroids = ivf_load_centroids(spark, index_dir)
    nprobe = min(nprobe, len(centroids))
    lists = spark.read.parquet(f"{index_dir}/lists")
    q = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
        .withColumn("cid", F.explode(probe_lists_expr("`qv`", centroids, nprobe)))
        .withColumn("qn", _norm(F.col("qv")))
    )
    if prune:
        probed = sorted({r.cid for r in q.select("cid").distinct().collect()})
        lists = lists.filter(F.col("cid").isin(probed))
        q = F.broadcast(q)
    scored = (
        lists.join(q, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_safe_cos(_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Scalar int8 quantization — the memory-compression path
# ---------------------------------------------------------------------------

def quantize_int8(df: DataFrame, vec_col: str, qvec_col: str = "qvec",
                  scale_col: str = "qscale") -> DataFrame:
    """Per-vector symmetric int8 quantization: q_i = round(x_i / scale),
    scale = max|x| / 127. Stores array<tinyint> + one float — 4× smaller
    than float32 (8× vs double), which is what lets a 100 TB embedding
    corpus fit executor memory / page cache during ANN scans. Map-only,
    pure Column expressions; the original vector column is dropped.

    Dequantized dot products recover cosine to ~1e-2 absolute error on
    unit-scale embeddings (recall bound asserted in tests); rerank the
    shortlist against full-precision vectors when exact order matters.
    """
    v = _as_double(vec_col)
    scale = (
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
        / F.lit(127.0)
    )
    df = df.withColumn(scale_col, scale.cast("float"))
    qvec = F.when(
        F.col(scale_col) > 0,
        F.transform(v, lambda x: F.round(x / F.col(scale_col)).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return df.withColumn(qvec_col, qvec).drop(vec_col)


def quantized_cosine_topk(corpus_q: DataFrame, queries_q: DataFrame,
                          id_col: str, k: int = 5,
                          qvec_col: str = "qvec",
                          scale_col: str = "qscale") -> DataFrame:
    """Top-k cosine over int8-quantized vectors (both sides already
    through quantize_int8). dot(x, y) ≈ sx·sy·Σ qx_i·qy_i and norms
    likewise, so the scale factors cancel in the cosine — the score is
    computed entirely from the tinyint arrays, integer multiplies in
    whole-stage codegen. Same broadcast-queries/scan-corpus-once shape
    and deterministic (rounded score, id tie-break) ranking as
    cosine_topk.

    Returns (query_id, neighbor_id, qcosine, rank).
    """
    from pyspark.sql import Window

    def _inorm(col: Column) -> Column:
        # cast BEFORE squaring: tinyint*tinyint overflows under ANSI
        return F.sqrt(F.aggregate(
            col, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double")))

    c = corpus_q.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(qvec_col).alias("cq"),
    ).withColumn("cn", _inorm(F.col("cq")))
    q = queries_q.select(
        F.col(id_col).alias("query_id"),
        F.col(qvec_col).alias("qq"),
    ).withColumn("qn", _inorm(F.col("qq")))
    idot = F.aggregate(
        F.zip_with(F.col("qq"), F.col("cq"),
                   lambda x, y: (x.cast("int") * y.cast("int"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(_safe_cos(idot, F.col("qn"), F.col("cn")), 4).alias("qcosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — m-subspace codebooks, asymmetric distance.
# Public technique: Jegou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011.
# ---------------------------------------------------------------------------

def pq_train(corpus: DataFrame, id_col: str, vec_col: str,
             m: int = 8, ksub: int = 16, iters: int = 1,
             max_train: int | None = None) -> list[list[list[float]]]:
    """Train per-subspace codebooks: split dim into ``m`` equal blocks,
    k-means each block to ``ksub`` centroids.

    Returns ``codebooks[s][j]`` = centroid ``j`` of subspace ``s``.

    Scale shape: ALL subspaces train in one pass per Lloyd iteration —
    each vector explodes to its m (subspace, subvector) rows, assignment
    is a pure-codegen literal expression (m*ksub small sqdists behind a
    subspace when-chain), and mean recomputation is ONE
    groupBy((s, cid, pos)) job of m*ksub*subdim output rows. Driver
    round-trips: 1 seed collect + ``iters`` mean collects, independent
    of corpus size. ``max_train`` bounds each pass to a deterministic
    hash-ordered sample (see ivf_centroids); None = full corpus.
    """
    dim = corpus.select(F.size(_as_double(vec_col)).alias("d")).first().d
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    train = _train_sample(corpus, id_col, max_train)

    # Deterministic seeds: the ksub corpus vectors with smallest
    # xxhash64(id), sliced per subspace (same pattern as ivf_centroids).
    seeds = (
        train.select(_as_double(vec_col).alias("v"),
                     F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(ksub)
        .collect()
    )
    codebooks = [
        [list(r.v[s * sub:(s + 1) * sub]) for r in seeds]
        for s in range(m)
    ]

    subvecs = train.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("s"),
                    F.slice(_as_double(vec_col), s * sub + 1, sub).alias("sv"),
                )
                for s in range(m)
            ])
        ).alias("e")
    ).select("e.s", "e.sv")

    for _ in range(iters):
        # one 3-D literal (m x ksub x sub) indexed by the subspace tag —
        # a single assignment expression for every subspace at once
        cb3 = F.array(*[centroids_lit(cb) for cb in codebooks])
        cid = assign_col(F.col("sv"), F.element_at(cb3, F.col("s") + 1))
        means = (
            subvecs.withColumn("cid", cid)
            .select("s", "cid", F.posexplode("sv").alias("pos", "val"))
            .groupBy("s", "cid", "pos")
            .agg(F.avg("val").alias("mval"))
            .collect()
        )
        for row in means:
            codebooks[row.s][row.cid][row.pos] = row.mval
    return codebooks


def pq_encode(df: DataFrame, vec_col: str,
              codebooks: list[list[list[float]]],
              code_col: str = "pq_code") -> DataFrame:
    """Encode vectors to ``m`` codebook indices (array<tinyint> — dim
    doubles compress to m bytes, the memory footprint that lets a 100 TB
    embedding corpus live in executor page cache). Map-only codegen
    expression; drops the raw vector column.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if all(_centroids_sql(cb) is not None for cb in codebooks):
        # one py4j call for the whole m-subspace encode (r12 profile)
        vec_sql = _as_double_sql(vec_col)
        parts = []
        for s in range(m):
            sub_vec = f"slice({vec_sql}, {s * sub + 1}, {sub})"
            structs = _dist_structs_sql(sub_vec,
                                        _centroids_sql(codebooks[s]))
            parts.append(
                f"cast(array_min({structs}).cid as tinyint)")
        codes = F.expr("array(" + ",".join(parts) + ")")
    else:
        codes = F.array(*[
            assign_list(F.slice(_as_double(vec_col), s * sub + 1, sub),
                        codebooks[s]).cast("tinyint")
            for s in range(m)
        ])
    return df.withColumn(code_col, codes).drop(vec_col)


def _adc_l2(codebooks: list[list[list[float]]],
            code_col: str = "code", qv_col: str = "qv") -> Column:
    """Asymmetric-distance expression: L2 between the full-precision
    query (``qv_col``) and a PQ-coded row (``code_col``) — m codebook
    lookups + m small sqdists, all whole-stage codegen. Shared by
    pq_topk and ivfpq_topk so distance/rounding semantics can't drift."""
    sub = len(codebooks[0][0])
    if all(_centroids_sql(cb) is not None for cb in codebooks):
        terms = " + ".join(
            f"aggregate(zip_with(slice(`{qv_col}`, {s * sub + 1}, {sub}),"
            f" element_at({_centroids_sql(cb)},"
            f" cast(`{code_col}`[{s}] as int) + 1),"
            " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
            for s, cb in enumerate(codebooks))
        return F.expr(f"round(sqrt({terms}), 4)")
    total = None
    for s, cb in enumerate(codebooks):
        cent = F.element_at(centroids_lit(cb),
                            F.col(code_col)[s].cast("int") + 1)
        qs = F.slice(F.col(qv_col), s * sub + 1, sub)
        term = F.aggregate(
            F.zip_with(qs, cent, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        total = term if total is None else total + term
    return F.round(F.sqrt(total), 4)


def _exact_rerank(scored: DataFrame, rerank: DataFrame, queries: DataFrame,
                  id_col: str, vec_col: str, k: int,
                  shortlist: int | None) -> DataFrame:
    """The production two-stage tail: shortlist the approximate pass's
    top candidates per query (default 10·k), re-score exactly from the
    full-precision corpus, return the exact top-k. |queries|·shortlist
    exact distances — fixed work regardless of corpus size. Shared by
    pq_topk and ivfpq_topk."""
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("approx_l2", "neighbor_id")
    n_short = shortlist if shortlist is not None else 10 * k
    short = (
        scored.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= n_short)
        .select("query_id", "neighbor_id")
    )
    full = rerank.select(F.col(id_col).alias("neighbor_id"),
                         _as_double(vec_col).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("qv"))
    exact = (
        short.join(full, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "neighbor_id",
            F.round(
                F.sqrt(F.aggregate(
                    F.zip_with(F.col("qv"), F.col("nv"),
                               lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, x: acc + x)),
                4,
            ).alias("approx_l2"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy("approx_l2", "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def pq_topk(corpus_codes: DataFrame, queries: DataFrame, id_col: str,
            vec_col: str, codebooks: list[list[list[float]]], k: int = 5,
            code_col: str = "pq_code", rerank: DataFrame | None = None,
            shortlist: int | None = None) -> DataFrame:
    """Asymmetric-distance top-k: full-precision queries against the
    PQ-encoded corpus. approx_l2 = sqrt(sum_s ||q_s - codebook[s][code_s]||^2)
    — per corpus row this is m array lookups + m small sqdists, all
    whole-stage codegen, no decode materialization.

    Same contract as cosine_topk: the query set is the SMALL side
    (broadcast); the encoded corpus streams once. Deterministic ranking
    via (rounded distance, neighbor id). Returns
    (query_id, neighbor_id, approx_l2, rank).

    ``rerank``: the production two-stage pattern — pass the
    full-precision corpus (``id_col``, ``vec_col``) and the PQ pass only
    SHORTLISTS ``shortlist`` (default 10·k) candidates per query; exact
    L2 re-scores the |queries|·shortlist survivors. The expensive exact
    math touches a fixed small row set no matter the corpus size, which
    is what makes coarse codebooks usable on isotropic embeddings.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
    )
    c = corpus_codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(code_col).alias("code"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                _adc_l2(codebooks).alias("approx_l2"))
    )
    if rerank is not None:
        return _exact_rerank(scored, rerank, queries, id_col, vec_col, k,
                             shortlist)
    w = Window.partitionBy("query_id").orderBy("approx_l2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
               vec_col: str, k: int = 5, nlist: int = 16, nprobe: int = 4,
               m: int = 8, ksub: int = 16,
               centroids: list[list[float]] | None = None,
               codebooks: list[list[list[float]]] | None = None,
               train_iters: int = 2, pq_iters: int = 1,
               rerank: DataFrame | None = None,
               shortlist: int | None = None,
               broadcast: bool = True) -> DataFrame:
    """IVF × PQ approximate top-k — the production large-scale ANN
    composition (FAISS's IVFPQ, a public design): the coarse quantizer
    routes each query to its ``nprobe`` closest inverted lists (bounding
    candidates to ~nprobe/nlist of the corpus), PQ asymmetric distance
    scores the candidates without ever decoding them, and an optional
    exact-L2 rerank re-scores a per-query shortlist from the
    full-precision vectors.

    Plan shape at 100 TB: the corpus side is map-only (cid assignment +
    m-byte PQ encode, both codegen literals — the encoded corpus is ~32×
    smaller than float32 and is the only thing shuffled); the candidate
    join shuffles on ``cid``; the ADC expression is m array lookups + m
    small sqdists per candidate, whole-stage codegen; the rerank joins
    |queries|·shortlist rows back to full vectors — fixed work
    regardless of corpus size. ``broadcast=False`` falls back to a
    shuffle join when the query set is too large to broadcast (the
    corpus then funnels onto nlist reducers — slow, but bounded).
    Returns (query_id, neighbor_id, approx_l2, rank).
    """
    from pyspark.sql import Window

    if centroids is None:
        centroids = ivf_centroids(corpus, id_col, vec_col, nlist=nlist,
                                  iters=train_iters)
    if codebooks is None:
        codebooks = pq_train(corpus, id_col, vec_col, m=m, ksub=ksub,
                             iters=pq_iters)
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("cv"))
        .withColumn("cid", assign_expr("`cv`", centroids))
    )
    c = pq_encode(c, "cv", codebooks, code_col="code")
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("qv"))
        .withColumn("cid",
                    F.explode(probe_lists(F.col("qv"), centroids, nprobe)))
    )
    # each corpus row lives in exactly one list and probe cids are
    # distinct, so (query_id, neighbor_id) pairs cannot duplicate.
    # Broadcast the probe side: a shuffle join on cid has only nlist
    # distinct keys, which would funnel the whole encoded corpus onto
    # nlist reducers; broadcasting keeps the corpus map-only.
    scored = (
        c.join(F.broadcast(q) if broadcast else q, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                _adc_l2(codebooks).alias("approx_l2"))
    )
    if rerank is not None:
        return _exact_rerank(scored, rerank, queries, id_col, vec_col, k,
                             shortlist)
    w = Window.partitionBy("query_id").orderBy("approx_l2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
