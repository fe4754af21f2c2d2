"""Deterministic sampling (operators/sampling.py): reproducibility
across repartitionings, uniformity, stability of hash_split under
corpus growth, salt independence, and the WindowGroupLimit plan."""

from pyspark.sql import functions as F

from more_pattern_extraction_spark.operators.sampling import (
    hash_split,
    sample_per_group,
)


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.col("id"), F.lit(4)).alias("grp"),
    )


def test_sample_reproducible_across_partitioning(spark):
    df = _corpus(spark)
    a = sorted(
        (r.grp, r.doc_id)
        for r in sample_per_group(df, "grp", 5, "doc_id").collect()
    )
    b = sorted(
        (r.grp, r.doc_id)
        for r in sample_per_group(df.repartition(13), "grp", 5, "doc_id").collect()
    )
    assert a == b and len(a) == 20


def test_salt_changes_the_draw(spark):
    df = _corpus(spark)
    a = {r.doc_id for r in sample_per_group(df, "grp", 5, "doc_id").collect()}
    b = {
        r.doc_id
        for r in sample_per_group(df, "grp", 5, "doc_id", salt="redraw").collect()
    }
    assert a != b


def test_hash_split_fractions_and_stability(spark):
    df = _corpus(spark, 4000)
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(df, "doc_id", fr)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # hash-binomial tolerance: ±4 sigma
    for label, w in fr.items():
        sd = (4000 * w * (1 - w)) ** 0.5
        assert abs(counts[label] - 4000 * w) < 4 * sd, (label, counts)

    # growth stability: assignments of the first 2000 docs are unchanged
    # when 2000 more arrive — the eval-contamination guarantee
    small = {
        r.doc_id: r.split
        for r in hash_split(_corpus(spark, 2000), "doc_id", fr).collect()
    }
    big = {r.doc_id: r.split for r in out.collect()}
    assert all(big[d] == s for d, s in small.items())


def test_sample_rides_window_group_limit(spark):
    plan = (
        sample_per_group(_corpus(spark), "grp", 5, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
