"""Codec round-trip properties (encode∘decode == identity, SURVEY §5.2)
including hypothesis-driven adversarial arrays, plus the Spark chunk
operator round trip."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from more_pattern_extraction_spark.functions.encode import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=200))
@settings(max_examples=100, deadline=None)
def test_dod_roundtrip_property(xs):
    ts = np.array(xs, dtype=np.int64)
    assert (decode_dod(encode_dod(ts), len(ts)) == ts).all()


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=200
    )
)
@settings(max_examples=100, deadline=None)
def test_gorilla_roundtrip_property(xs):
    v = np.array(xs, dtype=np.float64)
    got = decode_gorilla(encode_gorilla(v), len(v))
    assert (v.view(np.uint64) == got.view(np.uint64)).all()  # bit-exact


def test_dod_compresses_regular_grid():
    ts = np.arange(1440, dtype=np.int64) * 60_000_000_000  # 1 day of 1m ns
    assert len(encode_dod(ts)) < 1440 * 8 / 20  # >20x on regular grids


def test_gorilla_compresses_constant_and_slow_series():
    assert len(encode_gorilla(np.repeat(3.25, 1440))) < 1440 * 8 / 50
    slow = np.repeat([1.0, 1.5, 2.0], 480)
    assert len(encode_gorilla(slow)) < 1440 * 8 / 10


def test_chunk_roundtrip_spark(spark, transcripts):
    from more_pattern_extraction_spark.operators import chunks as C
    from more_pattern_extraction_spark.operators import rollup as R

    r1m = R.rollup_from_raw(R.turn_features(transcripts), "1m")
    enc = C.encode_chunks(r1m, ["latency_avg", "latency_sum"], "1m")
    dec = C.decode_chunks(enc)
    got = (
        dec.filter("feature = 'latency_avg'")
        .select("conv_id", "bucket_start", "value")
        .orderBy("conv_id", "bucket_start")
        .toPandas()
    )
    exp = (
        r1m.select("conv_id", "bucket_start", "latency_avg")
        .orderBy("conv_id", "bucket_start")
        .toPandas()
    )
    assert len(got) == len(exp)
    assert (got["conv_id"].values == exp["conv_id"].values).all()
    assert (
        got["bucket_start"].values.astype("datetime64[ns]")
        == exp["bucket_start"].values.astype("datetime64[ns]")
    ).all()
    gv = got["value"].to_numpy(dtype="float64", na_value=np.nan)
    ev = exp["latency_avg"].to_numpy(dtype="float64", na_value=np.nan)
    assert (gv.view(np.uint64) == ev.view(np.uint64)).all()  # bit-exact


def test_chunk_sizes_bounded(spark, transcripts):
    from more_pattern_extraction_spark.operators import chunks as C
    from more_pattern_extraction_spark.operators import rollup as R

    r1m = R.rollup_from_raw(R.turn_features(transcripts), "1m")
    enc = C.encode_chunks(r1m, ["latency_avg"], "1m").toPandas()
    assert (enc["n"] <= 1440).all()  # one day of 1m buckets max
    assert (enc["tier"] == "1m").all()
