"""fuzzy_join: blocked edit-distance join must equal brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from corkscrew_spark.operators.fuzzy import fuzzy_join

RIGHT = [
    (1, "goldenrod lavender"),
    (2, "goldenrod lavendar"),   # 1 sub from 1
    (3, "golden lavender"),      # 3 edits from 1
    (4, "midnight blue"),
    (5, "midnightblue"),         # 1 del from 4
    (6, "red"),
    (7, "reed"),                 # 1 ins from 6
    (8, "rd"),                   # short (< q*k+1 grams)
    (9, "navy"),
    (10, "wavy"),
]
LEFT = [
    (101, "goldenrod lavender"),
    (102, "midnight blu"),
    (103, "re"),                 # short probe
    (104, "completely unrelated string"),
    (105, "navy"),
]


def _brute(spark, k):
    l = spark.createDataFrame(LEFT, ["lid", "ls"])
    r = spark.createDataFrame(RIGHT, ["rid", "rs"])
    return {
        (row.lid, row.rid, row.d)
        for row in l.crossJoin(r)
        .withColumn("d", F.levenshtein("ls", "rs"))
        .filter(F.col("d") <= k)
        .select("lid", "rid", F.col("d").cast("long").alias("d"))
        .collect()
    }


def _blocked(spark, k):
    l = spark.createDataFrame(LEFT, ["lid", "ls"])
    r = spark.createDataFrame(RIGHT, ["rid", "rs"])
    return {
        (row.lid, row.rid, row.distance)
        for row in fuzzy_join(l, r, "lid", "ls", "rid", "rs",
                              max_dist=k).collect()
    }


def test_matches_brute_force_k1(spark):
    assert _blocked(spark, 1) == _brute(spark, 1)


def test_matches_brute_force_k2(spark):
    got = _blocked(spark, 2)
    assert got == _brute(spark, 2)
    # sanity: known pairs present
    assert (101, 1, 0) in got and (101, 2, 1) in got
    assert (103, 6, 1) in got and (103, 8, 1) in got  # short-string path
    assert not any(lid == 104 for lid, _, _ in got)


def test_rejects_bad_max_dist(spark):
    l = spark.createDataFrame(LEFT, ["lid", "ls"])
    try:
        fuzzy_join(l, l, "lid", "ls", "lid", "ls", max_dist=0)
    except ValueError:
        return
    raise AssertionError("max_dist=0 should raise")


def test_self_join_equals_two_sided(spark):
    """fuzzy_self_join must equal fuzzy_join(df, df) exactly — same
    ordered pair set, self-pairs included (the single-gram-index
    specialization resolve_entities rides)."""
    from corkscrew_spark.operators.fuzzy import fuzzy_self_join

    rows = RIGHT + [(100 + i, s) for i, s in
                    (enumerate(ls for _, ls in LEFT))]
    df = spark.createDataFrame(rows, ["rid", "rs"])
    for k, q in ((1, 3), (2, 2)):
        two = {
            (r.a, r.b, r.distance)
            for r in fuzzy_join(
                df.select(F.col("rid").alias("a"), F.col("rs").alias("as_")),
                df.select(F.col("rid").alias("b"), F.col("rs").alias("bs_")),
                "a", "as_", "b", "bs_", max_dist=k, q=q).collect()
        }
        one = {
            (r.rid_a, r.rid_b, r.distance)
            for r in fuzzy_self_join(df, "rid", "rs",
                                     max_dist=k, q=q).collect()
        }
        assert one == two
        assert all((i, i, 0) in one for i, _ in rows)  # self-pairs kept
