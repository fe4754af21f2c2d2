"""End-to-end pipeline: cold run, no-op resume, and interrupted-resume ==
cold-run equivalence (north rule: per-partition checkpoint/lineage/metrics)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from more_pattern_extraction_spark.plans.pipeline import run_pipeline
from more_pattern_extraction_spark.sources import catalog as CAT


@pytest.fixture()
def out(tmp_path):
    return str(tmp_path / "out")


def _table_digest(spark, root, name):
    df = CAT.read_table(spark, root, name)
    cols = [c for c in df.columns if c not in ("tier",)]
    return (
        df.select(
            F.sum(
                F.pmod(
                    F.xxhash64(*[F.col(c).cast("string") for c in sorted(cols)]),
                    F.lit(1_000_000_007),
                )
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )


def test_cold_run_and_noop_resume(spark, transcripts, out):
    m1 = run_pipeline(spark, transcripts, out, input_snapshot="snapA", n_buckets=8)
    assert m1["units_done"] > 0 and m1["turns"] > 0
    for t in ["rollup_1m", "distinct_1m", "rollup_1m_filled", "chunks_1m", "rollup_1h", "rollup_1d"]:
        assert CAT.read_table(spark, out, t).count() > 0, t
    d1 = _table_digest(spark, out, "rollup_1m")

    m2 = run_pipeline(spark, transcripts, out, input_snapshot="snapA", n_buckets=8)
    assert m2["units_done"] == 0 and m2["units_skipped"] == m1["units_total"]
    d2 = _table_digest(spark, out, "rollup_1m")
    assert d1 == d2  # tables untouched

    # lineage + metrics tables populated
    store_metrics = spark.read.parquet(f"{out}/metrics")
    assert store_metrics.count() == 2
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.count() > 0
    assert set(lineage.columns) >= {"conv_bucket", "ts_bucket", "rows_out", "content_hash"}


def test_distinct_partials_serve_global_sketch(spark, transcripts, out):
    """The persisted distinct_1m PARTIALS (per conv_bucket) must recover
    the GLOBAL per-bucket sketch at any tier via kmv_cascade — the merge
    identity is what lets the pipeline store unit-local rows (repairable
    per unit) and still answer global distinct-count queries exactly."""
    from more_pattern_extraction_spark.operators import distinct as DK

    run_pipeline(spark, transcripts, out, input_snapshot="snapK", n_buckets=8)
    partials = CAT.read_table(spark, out, "distinct_1m")
    for tier in ("1m", "1h"):
        served = (
            DK.kmv_cascade(
                partials.select("bucket_start", "conv_kmv"), tier, from_tier="1m"
            )
            .orderBy("bucket_start")
            .collect()
        )
        direct = (
            DK.kmv_from_raw(transcripts, tier).orderBy("bucket_start").collect()
        )
        assert served == direct and len(served) > 0, tier


def test_interrupted_resume_equals_cold(spark, transcripts, out, tmp_path):
    cold_root = str(tmp_path / "cold")
    run_pipeline(spark, transcripts, cold_root, input_snapshot="snapB", n_buckets=8)

    # simulate an interrupted run: only the first day completed
    day1 = transcripts.filter(F.col("ts") < "2024-01-02")
    m_part = run_pipeline(spark, transcripts.filter(F.col("ts") < "2024-01-02"),
                          out, input_snapshot="snapB", n_buckets=8)
    assert m_part["units_done"] > 0
    # resume with the FULL input under the same snapshot: only the
    # remaining (conv_bucket, day) units are recomputed
    m_res = run_pipeline(spark, transcripts, out, input_snapshot="snapB", n_buckets=8)
    assert 0 < m_res["units_done"] < m_res["units_total"]
    assert m_res["units_done"] + m_res["units_skipped"] == m_res["units_total"]

    for t in ["rollup_1m", "rollup_1h", "rollup_1d"]:
        a, b = _table_digest(spark, out, t), _table_digest(spark, cold_root, t)
        assert a == b, t


def test_new_snapshot_recomputes(spark, transcripts, out):
    m1 = run_pipeline(spark, transcripts, out, input_snapshot="s1", n_buckets=8)
    m2 = run_pipeline(spark, transcripts, out, input_snapshot="s2", n_buckets=8)
    assert m2["units_done"] == m1["units_done"]  # new snapshot = fresh work


def test_retention(spark, transcripts, out):
    run_pipeline(
        spark, transcripts, out, input_snapshot="s3", n_buckets=8,
        retention={"1m": "2024-01-02 00:00:00"},
    )
    r1m = CAT.read_table(spark, out, "rollup_1m")
    assert r1m.filter("bucket_start < timestamp '2024-01-02'").count() == 0
    assert r1m.count() > 0


def test_pattern_stage_tables(spark, transcripts, out):
    """The optional pattern stage persists MP / discord / regime tables
    derived from the gap-filled grid (north star: pattern extraction as
    continuous aggregates)."""
    from more_pattern_extraction_spark.plans.pipeline import run_pattern_stage

    run_pipeline(spark, transcripts, out, input_snapshot="s4", n_buckets=8)
    m = run_pattern_stage(spark, out, n_buckets=8, m=16, window="day", k=2)
    assert m["mp_rows"] > 0 and m["discord_rows"] > 0
    mp = CAT.read_table(spark, out, "mp_day")
    assert {"conv_id", "pos", "mp", "pi", "win"} <= set(mp.columns)
    disc = CAT.read_table(spark, out, "discords")
    # window-local extraction: discord positions are window-local and every
    # (conv, win) emits at most k rows
    per = disc.groupBy("conv_id", "win").count().agg(F.max("count")).collect()[0][0]
    assert per <= 2
    reg = CAT.read_table(spark, out, "regimes")
    assert reg.count() >= 0 and {"conv_id", "win", "L", "regime_pos", "cac"} <= set(reg.columns)


def test_tier_sketch_p95_merge_identity_end_to_end(spark, transcripts, out):
    """Persisted tiers carry the mergeable latency sketch (VERDICT r04 #3):
    the 1h tier's sketch — merged from the STORED 1m maps through
    checkpoint/write/read, never rescanning raw — must equal building the
    sketch directly from raw turns at 1h, bin-for-bin, and so must its
    derived p95/count."""
    from more_pattern_extraction_spark.operators import rollup as R
    from more_pattern_extraction_spark.operators import sketch as SK

    run_pipeline(spark, transcripts, out, input_snapshot="s_sk", n_buckets=8)

    for tier in ("1m", "1h", "1d"):
        t = CAT.read_table(spark, out, f"rollup_{tier}")
        assert {"latency_sketch", "latency_cnt_sketch", "latency_p95_sketch"} <= set(t.columns), tier

    stored_1h = CAT.read_table(spark, out, "rollup_1h").select(
        "conv_id", "bucket_start", "latency_sketch",
        "latency_cnt_sketch", "latency_p95_sketch",
    ).filter(F.col("latency_sketch").isNotNull())
    direct_1h = SK.sketch_quantile(
        SK.sketch_from_raw(R.turn_features(transcripts), "1h")
    )
    # exact map equality + exact p95/count equality (merge identity is
    # bit-for-bit: binning is per-value, merge is integer sums)
    joined = stored_1h.alias("s").join(
        direct_1h.alias("d"), ["conv_id", "bucket_start"], "full"
    )
    n = joined.count()
    assert n == direct_1h.count() == stored_1h.count()
    ents = lambda side: F.array_sort(F.map_entries(F.col(f"{side}.latency_sketch")))
    bad = joined.filter(
        (ents("s") != ents("d"))  # maps aren't comparable; sorted entries are
        | (F.col("s.latency_cnt_sketch") != F.col("d.latency_cnt_sketch"))
        | (F.col("s.latency_p95_sketch") != F.col("d.latency_p95_sketch"))
        | F.col("s.latency_sketch").isNull() | F.col("d.latency_sketch").isNull()
    ).count()
    assert bad == 0
