"""Mergeable log-histogram quantile sketch (operators/sketch.py).

Contracts under test (VERDICT r03 "next round" #4):
  * merge identity — cascading 1m sketches to 1h/1d equals building the
    sketch from raw at that tier, EXACTLY (map equality);
  * error bound — the sketch p95 is within the documented √r−1 relative
    bound of the exact discrete p95 over raw latencies at every tier;
  * attach — the sketch column rides alongside the rollup tier frame.
"""

import math

import pytest
from pyspark.sql import functions as F

from more_pattern_extraction_spark.operators import rollup as R
from more_pattern_extraction_spark.operators import sketch as SK


@pytest.fixture(scope="module")
def feats(transcripts):
    df = R.turn_features(transcripts)
    df.cache().count()
    return df


def _maps(df):
    return {
        (r.conv_id, r.bucket_start): sorted(r.latency_sketch.items())
        for r in df.collect()
    }


def test_merge_identity_1h(feats):
    via_cascade = _maps(SK.sketch_cascade(SK.sketch_from_raw(feats, "1m"), "1h"))
    direct = _maps(SK.sketch_from_raw(feats, "1h"))
    assert via_cascade == direct


def test_merge_identity_1d_two_hops(feats):
    two_hops = _maps(
        SK.sketch_cascade(
            SK.sketch_cascade(SK.sketch_from_raw(feats, "1m"), "1h"), "1d"
        )
    )
    direct = _maps(SK.sketch_from_raw(feats, "1d"))
    assert two_hops == direct


@pytest.mark.parametrize("tier,q", [("1h", 0.95), ("1d", 0.95), ("1d", 0.5)])
def test_quantile_error_bound(feats, tier, q):
    est = {
        (r.conv_id, r.bucket_start): (r.latency_cnt_sketch, r.latency_p95_sketch)
        for r in SK.sketch_quantile(SK.sketch_from_raw(feats, tier), q).collect()
    }
    exact = (
        feats.filter(F.col("latency").isNotNull())
        .groupBy("conv_id", F.date_trunc(R.TIERS[tier], "ts").alias("bucket_start"))
        .agg(F.sort_array(F.collect_list("latency")).alias("vals"))
        .collect()
    )
    assert len(exact) == len(est) and len(exact) > 15
    checked = 0
    for r in exact:
        n = len(r.vals)
        cnt, got = est[(r.conv_id, r.bucket_start)]
        assert cnt == n
        true_q = r.vals[max(1, math.ceil(q * n)) - 1]
        if true_q > SK.LO:
            assert abs(got - true_q) / true_q <= SK.REL_ERR_BOUND + 1e-12
            checked += 1
        else:
            assert abs(got - true_q) <= SK.LO  # underflow bin: absolute bound
    assert checked > 15


def test_attach_alongside_rollup(feats):
    r1h = R.cascade(R.rollup_from_raw(feats, "1m"), "1h")
    sk1h = SK.sketch_cascade(SK.sketch_from_raw(feats, "1m"), "1h")
    out = SK.attach_sketch_p95(r1h, sk1h)
    rows = out.collect()
    assert {"latency_p95", "latency_p95_sketch", "latency_cnt_sketch"} <= set(
        out.columns
    )
    # every bucket with latencies carries a sketch p95, and the sketch
    # count matches the exact rollup count
    for r in rows:
        if r.latency_cnt and r.latency_cnt > 0:
            assert r.latency_cnt_sketch == r.latency_cnt
            assert r.latency_p95_sketch is not None
