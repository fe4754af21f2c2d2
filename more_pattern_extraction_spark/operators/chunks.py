"""Per-partition chunk structs: DoD-encoded bucket timestamps + Gorilla-
XOR-encoded feature streams (BASELINE.json north rule; FIXTURES.md §4).

Replaces the reference's npz/h5 artifact store (``modules/io.py:39-129``)
with queryable chunk rows:

    (conv_id string, ts_bucket timestamp, tier string, feature string,
     n int, first_ts timestamp, first_value double,
     ts_dod binary, values_gorilla binary)

one row per (conversation, chunk window, feature).  Encode is a grouped
pandas UDF over ``(conv_id, ts_bucket)`` — the same partitioning the
rollup already produced, so at scale the shuffle is a re-use, not a new
one.  Decode is ``mapInPandas`` (each chunk row is independent → no
shuffle at all; Arrow batches amortize the Python hop).

Scale notes: a 1m-tier chunk covering 1 day is ≤1440 points — thousands of
chunks per executor core, each encoded in ~100 µs.  Hot conversations are
already split by ``ts_bucket`` so no salting is needed here; skew handling
for raw-turn UDFs lives in plans/partitioning.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from more_pattern_extraction_spark.functions.encode import (
    decode_dod,
    decode_gorilla,
    encode_dod,
    encode_gorilla,
)

CHUNK_SCHEMA = (
    "conv_id string, ts_bucket timestamp, tier string, feature string, "
    "n int, first_ts timestamp, first_value double, "
    "ts_dod binary, values_gorilla binary"
)

DECODE_SCHEMA = (
    "conv_id string, feature string, bucket_start timestamp, value double"
)

_CHUNK_UNIT = {"1m": "day", "1h": "month", "1d": "year"}


def encode_chunks(
    rollup: DataFrame,
    features: list[str],
    tier: str = "1m",
    chunk_unit: str | None = None,
) -> DataFrame:
    """Encode a tier's rollup rows into chunk structs.

    ``chunk_unit`` defaults to one day of 1m buckets / one month of 1h
    buckets / one year of 1d buckets (≤1440 points per chunk each way).
    """
    unit = chunk_unit or _CHUNK_UNIT[tier]
    feats = list(features)

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start")
        ts = pdf["bucket_start"].astype("datetime64[ns]").astype("int64").to_numpy()  # epoch ns
        ts_dod = encode_dod(ts)
        rows = []
        for f in feats:
            vals = pdf[f].to_numpy(dtype="float64", na_value=float("nan"))
            rows.append(
                {
                    "conv_id": pdf["conv_id"].iloc[0],
                    "ts_bucket": pdf["ts_bucket"].iloc[0],
                    "tier": tier,
                    "feature": f,
                    "n": len(pdf),
                    "first_ts": pdf["bucket_start"].iloc[0],
                    "first_value": float(vals[0]) if len(vals) else None,
                    "ts_dod": ts_dod,
                    "values_gorilla": encode_gorilla(vals),
                }
            )
        return pd.DataFrame(rows)

    keyed = rollup.withColumn("ts_bucket", F.date_trunc(unit, "bucket_start"))
    return keyed.groupBy("conv_id", "ts_bucket").applyInPandas(enc, CHUNK_SCHEMA)


def decode_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse of encode_chunks → (conv_id, feature, bucket_start, value).

    mapInPandas: chunk rows decode independently, preserving whatever
    partitioning the chunk table has (no shuffle)."""

    def dec(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                ts = decode_dod(bytes(r.ts_dod), r.n)
                vals = decode_gorilla(bytes(r.values_gorilla), r.n)
                out.append(
                    pd.DataFrame(
                        {
                            "conv_id": r.conv_id,
                            "feature": r.feature,
                            "bucket_start": pd.to_datetime(ts, unit="ns"),
                            "value": vals,
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return chunks.mapInPandas(dec, DECODE_SCHEMA)
