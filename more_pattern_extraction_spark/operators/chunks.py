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

    # group by conv_id ONLY: applyInPandas pays one JVM↔Python Arrow round
    # trip per group (~5-10 ms); with (conv, day) keys that overhead
    # dominates (thousands of tiny groups).  The per-chunk split happens
    # inside pandas.  A conversation's whole tier-grid must fit one task —
    # for 1m tiers that is 1440 rows/day; genuinely hot multi-year convs
    # would sub-key on a coarser ts window first (plans/partitioning).
    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_start")
        rows = []
        for (conv, tsb), g in pdf.groupby(["conv_id", "ts_bucket"], sort=False):
            ts = g["bucket_start"].astype("datetime64[ns]").astype("int64").to_numpy()
            ts_dod = encode_dod(ts)
            for f in feats:
                vals = g[f].to_numpy(dtype="float64", na_value=float("nan"))
                rows.append(
                    (conv, tsb, tier, f, len(g), g["bucket_start"].iloc[0],
                     float(vals[0]) if len(vals) else None, ts_dod,
                     encode_gorilla(vals))
                )
        return pd.DataFrame(
            rows,
            columns=["conv_id", "ts_bucket", "tier", "feature", "n",
                     "first_ts", "first_value", "ts_dod", "values_gorilla"],
        )

    keyed = rollup.withColumn("ts_bucket", F.date_trunc(unit, "bucket_start"))
    return keyed.groupBy("conv_id").applyInPandas(enc, CHUNK_SCHEMA)


def decode_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse of encode_chunks → (conv_id, feature, bucket_start, value).

    mapInPandas: chunk rows decode independently, preserving whatever
    partitioning the chunk table has (no shuffle)."""

    def dec(batches):
        import numpy as np

        for pdf in batches:
            # bulk-build one frame per Arrow batch (a per-chunk-row
            # DataFrame + concat costs ~5 ms/row — 50x slower)
            ts_parts, val_parts, convs, feats_ = [], [], [], []
            for r in pdf.itertuples(index=False):
                ts_parts.append(decode_dod(bytes(r.ts_dod), r.n))
                val_parts.append(decode_gorilla(bytes(r.values_gorilla), r.n))
                convs.append(r.conv_id)
                feats_.append(r.feature)
            if ts_parts:
                ns = [len(t) for t in ts_parts]
                yield pd.DataFrame(
                    {
                        "conv_id": np.repeat(np.array(convs, dtype=object), ns),
                        "feature": np.repeat(np.array(feats_, dtype=object), ns),
                        "bucket_start": pd.to_datetime(
                            np.concatenate(ts_parts), unit="ns"
                        ),
                        "value": np.concatenate(val_parts),
                    }
                )

    return chunks.mapInPandas(dec, DECODE_SCHEMA)
