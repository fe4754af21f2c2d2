"""stats operators (A4/A5/A9), readers (S6/S7), subspace (W12), and the
Structured-Streaming rollup (stream result == batch rollup)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from more_pattern_extraction_spark.functions.kernels import subspace_kernel
from more_pattern_extraction_spark.operators import stats as ST


def test_regression_scores_match_numpy(spark):
    rng = np.random.default_rng(31)
    y = rng.normal(50, 10, 500)
    p = y + rng.normal(0, 2, 500)
    df = spark.createDataFrame(pd.DataFrame({"y": y, "p": p}))
    r = ST.regression_scores(df, "y", "p").collect()[0]
    ss_res = ((y - p) ** 2).sum()
    ss_tot = ((y - y.mean()) ** 2).sum()
    np.testing.assert_allclose(r.r2, 1 - ss_res / ss_tot, rtol=1e-6)
    np.testing.assert_allclose(r.mae, np.abs(y - p).mean(), rtol=1e-9)
    np.testing.assert_allclose(r.me, (y - p).mean(), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(r.mape, np.abs(y - p).mean() / y.mean(), rtol=1e-9)
    np.testing.assert_allclose(r.mpe, (y - p).mean() / y.mean(), rtol=1e-6, atol=1e-9)


def test_classification_scores(spark):
    # hand-built confusion: tp=3 fp=1 fn=2 tn=4
    rows = [(1, 1)] * 3 + [(0, 1)] * 1 + [(1, 0)] * 2 + [(0, 0)] * 4
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["actual", "pred"]))
    r = ST.classification_scores(df, "actual", "pred").collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (3, 1, 2, 4)
    prec, rec = 3 / 4, 3 / 5
    np.testing.assert_allclose(r.f1, 2 * prec * rec / (prec + rec))
    np.testing.assert_allclose(r.accuracy, 0.7)
    np.testing.assert_allclose(r.hamming_loss, 0.3)
    np.testing.assert_allclose(r.jaccard, 3 / 6)
    np.testing.assert_allclose(r.balanced_accuracy, (rec + 4 / 5) / 2)
    pe = (4 * 5 + 6 * 5) / 100
    np.testing.assert_allclose(r.cohen_kappa, (0.7 - pe) / (1 - pe))


def test_multi_corr_matches_numpy(spark):
    rng = np.random.default_rng(32)
    x1, x2 = rng.normal(0, 1, 400), rng.normal(0, 1, 400)
    y = 2 * x1 - x2 + rng.normal(0, 0.5, 400)
    df = spark.createDataFrame(pd.DataFrame({"y": y, "x1": x1, "x2": x2}))
    got = ST.multi_corr(df, "y", ["x1", "x2"])
    corr = np.corrcoef(np.c_[y, x1, x2].T)
    exp = corr[1:, 0] @ np.linalg.inv(corr[1:, 1:]) @ corr[1:, 0]
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_top_deviations(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"seg": range(6), "mpe": [0.5, -0.9, 0.1, -0.3, 0.0, -2.0]})
    )
    got = [r.seg for r in ST.top_deviations(df, "mpe", n=2).collect()]
    assert got == [5, 1]


def test_subspace_kernel():
    rng = np.random.default_rng(33)
    n, m = 200, 20
    base = np.sin(np.arange(n) * 0.3)
    ts = np.vstack([
        base + rng.normal(0, 0.01, n),     # dim 0: shares the motif
        rng.normal(0, 1, n),               # dim 1: noise
        base + rng.normal(0, 0.01, n),     # dim 2: shares the motif
    ])
    # plant motif at 40 and 120 in dims 0,2
    s = subspace_kernel(ts, m, 40, 120, k=1)
    assert set(s) == {0, 2}
    s_inc = subspace_kernel(ts, m, 40, 120, k=1, include=[1])
    assert s_inc[0] == 1


def test_ragged_csv_reader(spark, tmp_path):
    from more_pattern_extraction_spark.sources.readers import parse_ragged_csv

    p = tmp_path / "ragged.csv"
    p.write_text(
        "a,2024-01-01,1.5,2.5,3.5\n"
        "b,2024-01-02,4.0,-9999,6.0,7.0\n"
        "c,2024-01-03,9.0\n"
    )
    df = parse_ragged_csv(spark, str(p), meta_cols=2).orderBy("meta_0")
    rows = df.collect()
    assert [r.curve_len for r in rows] == [3, 4, 1]
    assert rows[1].curve[1] is None  # sentinel → NULL
    assert rows[0].curve == [1.5, 2.5, 3.5]


def test_streaming_rollup_matches_batch(spark, transcripts, tmp_path):
    from more_pattern_extraction_spark.streaming.rollup_stream import (
        run_stream_to_memory,
    )

    src = str(tmp_path / "stream_src")
    transcripts.write.mode("overwrite").parquet(src)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    run_stream_to_memory(spark, src, schema, query_name="t_stream")
    got = (
        spark.sql("select conv_id, bucket_start, turn_cnt, tool_call_cnt from t_stream")
        .orderBy("conv_id", "bucket_start")
        .toPandas()
    )
    exp = (
        transcripts.groupBy(
            "conv_id", F.date_trunc("minute", "ts").alias("bucket_start")
        )
        .agg(
            F.count(F.lit(1)).alias("turn_cnt"),
            F.sum(F.col("tool").isNotNull().cast("int")).alias("tool_call_cnt"),
        )
        .orderBy("conv_id", "bucket_start")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fit_polynomial_models_matches_numpy(spark):
    """Grouped normal-equation fit == np.polyfit (α=0) and == the manual
    ridge solution (α>0), per group."""
    from more_pattern_extraction_spark.operators.deviation import fit_polynomial_models

    rng = np.random.default_rng(11)
    frames = []
    for g in ("a", "b"):
        x = rng.uniform(-3, 3, 120)
        y = 2.0 + 0.5 * x - 0.8 * x**2 + 0.1 * x**3 + rng.normal(0, 0.3, 120)
        frames.append(pd.DataFrame({"event_id": g, "x": x, "y": y}))
    pdf = pd.concat(frames, ignore_index=True)
    df = spark.createDataFrame(pdf)

    got = {r.event_id: np.array(r.coefs)
           for r in fit_polynomial_models(df, "y", "x", degree=3).collect()}
    for g in ("a", "b"):
        sub = pdf[pdf.event_id == g]
        exp = np.polyfit(sub.x, sub.y, 3)[::-1]  # increasing powers
        np.testing.assert_allclose(got[g], exp, rtol=1e-8)

    alpha = 2.5
    got_r = {r.event_id: np.array(r.coefs)
             for r in fit_polynomial_models(df, "y", "x", degree=2, alpha=alpha).collect()}
    for g in ("a", "b"):
        sub = pdf[pdf.event_id == g]
        V = np.vander(sub.x, 3, increasing=True)
        exp = np.linalg.solve(V.T @ V + alpha * np.eye(3), V.T @ sub.y)
        np.testing.assert_allclose(got_r[g], exp, rtol=1e-8)


def test_poly2_relational_matches_numpy(spark):
    """The pure-Catalyst Cramer quadratic equals np.polyfit."""
    from more_pattern_extraction_spark.operators.deviation import _poly2_fit_relational

    rng = np.random.default_rng(12)
    x = rng.uniform(-5, 5, 200)
    y = 1.0 - 2.0 * x + 0.3 * x**2 + rng.normal(0, 0.5, 200)
    df = spark.createDataFrame(pd.DataFrame({"event_id": "e", "x": x, "y": y}))
    row = _poly2_fit_relational(df, "y", "x", "event_id").collect()[0]
    exp = np.polyfit(x, y, 2)[::-1]
    np.testing.assert_allclose([row.c0, row.c1, row.c2], exp, rtol=1e-7)


def _dtw_ref(a, b):
    """Plain recursive-definition DTW for cross-checking the kernel."""
    import functools

    @functools.lru_cache(None)
    def d(i, j):
        c = abs(a[i] - b[j])
        if i == 0 and j == 0:
            return c
        opts = []
        if i > 0:
            opts.append(d(i - 1, j))
        if j > 0:
            opts.append(d(i, j - 1))
        if i > 0 and j > 0:
            opts.append(d(i - 1, j - 1))
        return c + min(opts)

    return d(len(a) - 1, len(b) - 1)


def test_dtw_distance_matches_reference_dp():
    from more_pattern_extraction_spark.functions.kernels import dtw_distance

    rng = np.random.default_rng(4)
    for _ in range(20):
        a = tuple(rng.integers(0, 200, rng.integers(1, 6)).tolist())
        b = tuple(rng.integers(0, 200, rng.integers(1, 6)).tolist())
        assert dtw_distance(np.array(a), np.array(b)) == _dtw_ref(a, b)
    # the 2x2 closed form used by the SQL oracle: d = |a1-b1| + |a2-b2|
    for _ in range(50):
        a = rng.integers(0, 500, 2); a.sort()
        b = rng.integers(0, 500, 2); b.sort()
        assert dtw_distance(a, b) == abs(a[0] - b[0]) + abs(a[1] - b[1])


def test_rank_L_sweep_prefers_matching_L(spark):
    """Regimes exactly at the label positions must rank first."""
    from more_pattern_extraction_spark.operators.segmentation import rank_L_sweep

    fl = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c"] * 4,
                "L": [10, 10, 20, 20],
                "regime_pos": [50, 150, 70, 130],
                "cac": 0.5,
            }
        )
    )
    labels = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["c", "c"], "label_pos": [50, 150]})
    )
    out = rank_L_sweep(fl, labels).toPandas().sort_values("rank")
    assert out.iloc[0].L == 10 and out.iloc[0].dtw_dist == 0.0
    assert out.iloc[0].norm_dist == 0.0 and out.iloc[1].norm_dist == 1.0


def test_nn_stats_counts_and_majority(spark):
    from more_pattern_extraction_spark.operators.motifs import nn_stats

    # mask: positions 0..9 flagged, 10..29 not
    mask = spark.createDataFrame(
        pd.DataFrame({"conv_id": "c", "pos": range(30), "flag": [True] * 10 + [False] * 20})
    )
    # m=3: neighbor at 2 → [2,4] inside true; 15 → false; 8 → [8,10] spans
    nbrs = spark.createDataFrame(
        pd.DataFrame({"conv_id": "c", "neighbor_pos": [2, 15, 8, 20]})
    )
    row = nn_stats(nbrs, mask, m=3, maj_other="normal").collect()[0]
    assert (row.cls1_count, row.cls2_count, row.spanning_both) == (1, 2, 1)
    # norm1 = 1/(10/20) = 2, norm2 = 2 → tie → 'None', no match
    assert row.majority == "None" and row.matching_maj is False


def test_streaming_locf_state_survives_microbatches(spark, tmp_path):
    """The LOCF carry value crosses micro-batch boundaries: batch 2 opens
    with NULLs that must inherit batch 1's last observation."""
    import os
    import time as _time

    from more_pattern_extraction_spark.streaming.stateful_gapfill import streaming_locf

    src = tmp_path / "locf_src"
    src.mkdir()
    b1 = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3 + ["c2"] * 2,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02",
                 "2024-01-01 00:00", "2024-01-01 00:01"]
            ),
            "value": [1.0, None, 3.0, 7.0, None],
        }
    )
    b2 = pd.DataFrame(
        {
            "conv_id": ["c1"] * 2 + ["c2"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:03", "2024-01-01 00:04", "2024-01-01 00:02"]
            ),
            "value": [None, 5.0, None],
        }
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))
    _time.sleep(1.1)  # distinct mtimes → deterministic file order
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "f2"))
    files = sorted(str(p) for p in src.glob("*/**/*.parquet"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(src.glob("f*/*.parquet"))):
        os.system(f"cp {f} {flat}/{i:02d}.parquet")
        os.utime(f"{flat}/{i:02d}.parquet", (1700000000 + i * 10, 1700000000 + i * 10))
    stream = (
        spark.readStream.schema("conv_id string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    q = (
        streaming_locf(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("locf_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from locf_stream")
        .toPandas()
        .sort_values(["conv_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(got) == 8
    c1 = got[got.conv_id == "c1"].value_locf.tolist()
    c2 = got[got.conv_id == "c2"].value_locf.tolist()
    # c1: [1, locf 1, 3 | batch2: locf 3 (carried!), 5]
    assert c1 == [1.0, 1.0, 3.0, 3.0, 5.0]
    # c2: [7, locf 7 | batch2: locf 7 (carried!)]
    assert c2 == [7.0, 7.0, 7.0]


def test_results_csv_roundtrip(spark, tmp_path):
    """S8 result sink: scored frames written as CSV round-trip through the
    S7 loader (values + timestamps preserved)."""
    from more_pattern_extraction_spark.sources.readers import (
        load_timeseries_csv,
        write_results_csv,
    )

    pdf = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:01.123456", "2024-01-02 12:00:00.000000",
                 "2024-01-03 23:59:59.000001"]
            ),
            "score": [1.5, -2.25, 0.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "results_csv")
    write_results_csv(df, out, single_file=True)
    back = (
        load_timeseries_csv(spark, [out], ts_col="ts")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert back["conv_id"].tolist() == ["a", "b", "c"]
    assert back["score"].tolist() == [1.5, -2.25, 0.0]
    assert (
        back["ts"].astype("datetime64[us]") == pdf["ts"].astype("datetime64[us]")
    ).all()


def test_streaming_locf_multichunk_batch_sorted_once(spark, tmp_path):
    """A group whose micro-batch rows span MULTIPLE Arrow chunks must be
    filled in event-time order, not chunk-arrival order: rows are written
    ts-DESCENDING and maxRecordsPerBatch=4 forces 3 chunks of the single
    12-row group, so per-chunk filling would emit NULLs/late carries.
    (Regression test for the round-2 advisory.)"""
    from more_pattern_extraction_spark.streaming.stateful_gapfill import streaming_locf

    ts = pd.date_range("2024-01-01", periods=12, freq="1min")
    vals = [10.0] + [None] * 5 + [20.0] + [None] * 5
    pdf = pd.DataFrame({"conv_id": "c1", "ts": ts, "value": vals})
    pdf = pdf.iloc[::-1].reset_index(drop=True)  # descending arrival order
    src = tmp_path / "mc_src"
    src.mkdir()
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(src / "f1"))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        stream = (
            spark.readStream.schema("conv_id string, ts timestamp, value double")
            .parquet(str(src / "f1"))
        )
        q = (
            streaming_locf(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("locf_mc")
            .option("checkpointLocation", str(tmp_path / "mc_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = (
        spark.sql("select * from locf_mc")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert got.value_locf.tolist() == [10.0] * 6 + [20.0] * 6


def test_streaming_sketch_entries_match_batch(spark, transcripts, tmp_path):
    """Streaming sketch (one watermarked stateful agg producing sparse
    (conv, bucket, bin, cnt) entries) packed batch-side must equal
    sketch_from_raw on the same turns — the mergeable-sketch contract
    carried into Structured Streaming."""
    from more_pattern_extraction_spark.operators import rollup as R
    from more_pattern_extraction_spark.operators import sketch as SK
    from more_pattern_extraction_spark.streaming.rollup_stream import (
        streaming_sketch_entries_1m,
    )

    feats = R.turn_features(transcripts)
    src = str(tmp_path / "sk_stream_src")
    feats.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "latency"
    ).write.mode("overwrite").parquet(src)
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp, latency double")
    stream = spark.readStream.schema(schema).parquet(src)
    entries = streaming_sketch_entries_1m(stream)
    q = (
        entries.writeStream.outputMode("complete")
        .format("memory").queryName("sk_stream").trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = SK.pack_entries(spark.sql("select * from sk_stream"))
    exp = SK.sketch_from_raw(feats, "1m")
    j = got.alias("g").join(exp.alias("e"), ["conv_id", "bucket_start"], "full")
    ents = lambda side: F.array_sort(
        F.map_entries(F.col(f"{side}.latency_sketch")))
    n = j.count()
    assert n == exp.count() == got.count() and n > 0
    assert j.filter(
        (ents("g") != ents("e"))
        | F.col("g.latency_sketch").isNull() | F.col("e.latency_sketch").isNull()
    ).count() == 0


def test_stream_tier_epoch_commit_late_drop_and_replay(spark, tmp_path):
    """stream_rollup_to_table: epoch-dir commit protocol — finalized
    groups land exactly once, the later-than-watermark row is dropped
    (repair's job, plans/repair.py), and a full replay (fresh stream
    checkpoint over committed epoch dirs) changes nothing."""
    import glob
    import os
    import shutil

    from more_pattern_extraction_spark.streaming.rollup_stream import (
        read_stream_tier,
        stream_rollup_to_table,
    )

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    rows0 = [  # batch 0: day-1 traffic; max ts 10:01:10
        ("a", 0, "user", "t", None, "2024-01-01 10:00:05"),
        ("a", 1, "assistant", "t", "search", "2024-01-01 10:00:30"),
        ("a", 2, "user", "t", None, "2024-01-01 10:01:10"),
        ("b", 0, "user", "t", None, "2024-01-01 10:00:20"),
    ]
    rows1 = [  # batch 1: day-2 traffic; finalizes + evicts day-1 state
        ("a", 4, "user", "t", None, "2024-01-02 09:30:10"),
        ("b", 1, "assistant", "t", "code", "2024-01-02 09:30:40"),
    ]
    late = ("a", 3, "user", "late", None, "2024-01-01 10:00:50")
    sentinel = [  # batch 2: flush row + a late day-1 turn whose window
        # state was evicted in batch 1 → guaranteed watermark drop (a
        # same-batch late row would still find live state and merge)
        ("zz", 0, "user", "flush", None, "2024-01-05 00:00:00"),
        late,
    ]

    src = str(tmp_path / "src")
    os.makedirs(src)
    raw_schema = schema.replace("ts timestamp", "ts string")
    for i, rows in enumerate([rows0, rows1, sentinel]):
        df = spark.createDataFrame(rows, raw_schema).withColumn(
            "ts", F.col("ts").cast("timestamp"))
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.move(part, os.path.join(src, f"f{i}.parquet"))  # mtime order = i

    out = str(tmp_path / "tier")
    stream_rollup_to_table(
        spark, src, schema, out, watermark="0 seconds", n_buckets=4,
        checkpoint_dir=str(tmp_path / "cp1"), max_files_per_trigger=1,
    )

    got = read_stream_tier(spark, out, "rollup_1m_stream")
    assert "epoch" not in got.columns
    with_epoch = spark.read.parquet(f"{out}/rollup_1m_stream")
    n_epochs = with_epoch.select("epoch").distinct().count()
    assert n_epochs >= 2  # finalized groups emitted across multiple epochs

    # expected: everything except the dropped late row and the
    # never-finalized sentinel window
    exp_rows = rows0 + rows1
    exp = (
        spark.createDataFrame(exp_rows, raw_schema)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("conv_id", F.date_trunc("minute", "ts").alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("turn_cnt"),
             F.sum(F.col("tool").isNotNull().cast("int")).alias("tool_call_cnt"))
    )
    got_n = got.select("conv_id", "bucket_start", "turn_cnt", "tool_call_cnt")
    assert got_n.exceptAll(exp).count() == 0 and exp.exceptAll(got_n).count() == 0
    # the late row was DROPPED, not merged: its minute keeps count 2
    assert got.filter(
        (F.col("conv_id") == "a")
        & (F.col("bucket_start") == "2024-01-01 10:00:00")
    ).head()["turn_cnt"] == 2
    # each group exactly once across epochs (append-mode disjointness)
    assert got.groupBy("conv_id", "bucket_start").count().filter("count > 1").count() == 0

    # replay: fresh stream checkpoint reprocesses every file; every epoch
    # dir already exists → all skipped, tier bit-unchanged
    files_before = {
        (p, os.stat(p).st_mtime_ns)
        for p in glob.glob(f"{out}/rollup_1m_stream/**/*.parquet", recursive=True)
    }
    stream_rollup_to_table(
        spark, src, schema, out, watermark="0 seconds", n_buckets=4,
        checkpoint_dir=str(tmp_path / "cp2"), max_files_per_trigger=1,
    )
    files_after = {
        (p, os.stat(p).st_mtime_ns)
        for p in glob.glob(f"{out}/rollup_1m_stream/**/*.parquet", recursive=True)
    }
    assert files_before == files_after


def test_stream_tier_compaction_crash_safe(spark, transcripts, tmp_path):
    """compact_stream_tier: epochs merge into one generation with the
    tier unchanged; the crash window (generation committed, source dirs
    not yet deleted) neither double-counts on read nor re-admits a
    replayed absorbed epoch; a rerun finishes the deletes."""
    import glob
    import os
    import shutil

    from more_pattern_extraction_spark.streaming.rollup_stream import (
        compact_stream_tier,
        read_stream_tier,
        stream_rollup_to_table,
    )

    # three files in chronological order, so the watermark advances per
    # batch and finalized groups spread across several epochs
    src = str(tmp_path / "src")
    os.makedirs(src)
    tq = transcripts.withColumn("_tsd", F.col("ts").cast("double"))
    q1, q2 = tq.approxQuantile("_tsd", [0.33, 0.66], 0.0)
    slices = [tq.filter(F.col("_tsd") <= q1).drop("_tsd"),
              tq.filter((F.col("_tsd") > q1) & (F.col("_tsd") <= q2)).drop("_tsd"),
              tq.filter(F.col("_tsd") > q2).drop("_tsd")]
    for i, sl in enumerate(slices):
        stage = str(tmp_path / f"cstage{i}")
        sl.coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.move(glob.glob(f"{stage}/part-*.parquet")[0],
                    os.path.join(src, f"f{i}.parquet"))
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = str(tmp_path / "tier")
    stream_rollup_to_table(
        spark, src, schema, out, watermark="0 seconds", n_buckets=4,
        checkpoint_dir=str(tmp_path / "cp1"), max_files_per_trigger=1,
    )
    table = f"{out}/rollup_1m_stream"
    epochs_before = sorted(e for e in os.listdir(table) if e.startswith("epoch="))
    assert len(epochs_before) >= 2

    def digest(df):
        cols = sorted(df.columns)
        return df.select(
            F.sum(F.pmod(F.xxhash64(*[F.col(c).cast("string") for c in cols]),
                         F.lit(1_000_000_007))).alias("h"),
            F.count(F.lit(1)).alias("n")).collect()[0]

    d0 = digest(read_stream_tier(spark, out, "rollup_1m_stream"))
    files0 = len(glob.glob(f"{table}/**/*.parquet", recursive=True))

    # keep a copy of one source epoch to simulate the crash window later
    victim = epochs_before[0]
    shutil.copytree(f"{table}/{victim}", str(tmp_path / "victim_copy"))

    st = compact_stream_tier(spark, out, "rollup_1m_stream")
    assert st["compacted"] == len(epochs_before) and st["generation"] == -1
    left = sorted(e for e in os.listdir(table) if e.startswith("epoch="))
    assert left == ["epoch=-1"]
    assert digest(read_stream_tier(spark, out, "rollup_1m_stream")) == d0
    files1 = len(glob.glob(f"{table}/**/*.parquet", recursive=True))
    assert files1 < files0  # the point of the exercise

    # crash window: an absorbed epoch dir re-appears alongside the
    # committed generation — the manifest keeps it invisible
    shutil.copytree(str(tmp_path / "victim_copy"), f"{table}/{victim}")
    assert digest(read_stream_tier(spark, out, "rollup_1m_stream")) == d0

    # a replay of that absorbed epoch id is treated as committed:
    # fresh stream checkpoint over the same source writes nothing new
    gen_files = {
        (p, os.stat(p).st_mtime_ns)
        for p in glob.glob(f"{table}/epoch=-1/**/*.parquet", recursive=True)
    }
    stream_rollup_to_table(
        spark, src, schema, out, watermark="0 seconds", n_buckets=4,
        checkpoint_dir=str(tmp_path / "cp2"), max_files_per_trigger=1,
    )
    assert {
        (p, os.stat(p).st_mtime_ns)
        for p in glob.glob(f"{table}/epoch=-1/**/*.parquet", recursive=True)
    } == gen_files
    assert digest(read_stream_tier(spark, out, "rollup_1m_stream")) == d0

    # rerunning the compaction finishes the crashed delete (stale dir
    # removed, nothing new to compact)
    st2 = compact_stream_tier(spark, out, "rollup_1m_stream")
    assert st2["compacted"] == 0
    assert not os.path.exists(f"{table}/{victim}")
    assert digest(read_stream_tier(spark, out, "rollup_1m_stream")) == d0


def test_streaming_kmv_entries_match_batch(spark, transcripts, tmp_path):
    """Streaming KMV entries (one watermarked distinct-pair agg) packed
    batch-side must equal kmv_from_raw on the same turns — the KMV merge
    identity carried into Structured Streaming."""
    from more_pattern_extraction_spark.operators import distinct as DK
    from more_pattern_extraction_spark.streaming.rollup_stream import (
        streaming_kmv_entries_1m,
    )

    src = str(tmp_path / "kmv_stream_src")
    transcripts.select("conv_id", "ts").write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("conv_id string, ts timestamp").parquet(src)
    q = (
        streaming_kmv_entries_1m(stream)
        .writeStream.outputMode("complete")
        .format("memory").queryName("kmv_stream").trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    k = 8
    got = (
        DK._pack_topk(spark.sql("select * from kmv_stream"), k)
        .orderBy("bucket_start").collect()
    )
    exp = DK.kmv_from_raw(transcripts, "1m", k).orderBy("bucket_start").collect()
    assert len(got) == len(exp) > 0
    assert got == exp
