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

    Physical plan: repartition by ``(conv_id, ts_bucket)`` — a hot
    multi-year conversation spreads across many tasks instead of pinning
    one — then ``sortWithinPartitions`` so chunk groups arrive contiguous,
    and a single ``mapInPandas`` encodes EVERY chunk of an Arrow batch in
    one vectorized numpy pass (functions/encode.encode_*_many; the
    per-group Python overhead of grouped UDFs dominated before).  Arrow
    batches can split a chunk group, so the trailing partial group of each
    batch is carried into the next and flushed at end-of-partition.
    """
    unit = chunk_unit or _CHUNK_UNIT[tier]
    feats = list(features)

    def _encode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from more_pattern_extraction_spark.functions.encode import (
            encode_dod_many,
            encode_gorilla_many,
        )

        conv = pdf["conv_id"].to_numpy(dtype=object)
        tsb = pdf["ts_bucket"].to_numpy()
        new = np.ones(len(pdf), dtype=bool)
        new[1:] = (conv[1:] != conv[:-1]) | (tsb[1:] != tsb[:-1])
        chunk_ids = np.cumsum(new) - 1
        n_chunks = int(chunk_ids[-1]) + 1
        first_idx = np.flatnonzero(new)
        n_per = np.bincount(chunk_ids, minlength=n_chunks)

        ts = pdf["bucket_start"].astype("datetime64[ns]").astype("int64").to_numpy()
        ts_dod = encode_dod_many(ts, chunk_ids, n_chunks)
        parts = []
        for f in feats:
            vals = pdf[f].to_numpy(dtype="float64", na_value=float("nan"))
            parts.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[first_idx],
                        "ts_bucket": tsb[first_idx],
                        "tier": tier,
                        "feature": f,
                        "n": n_per.astype("int32"),
                        "first_ts": pdf["bucket_start"].to_numpy()[first_idx],
                        "first_value": vals[first_idx],
                        "ts_dod": ts_dod,
                        "values_gorilla": encode_gorilla_many(vals, chunk_ids, n_chunks),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def enc_iter(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the trailing (conv, ts_bucket) group — it may
            # continue in the next Arrow batch of this partition
            last_conv = pdf["conv_id"].iloc[-1]
            last_tsb = pdf["ts_bucket"].iloc[-1]
            tail = (pdf["conv_id"] == last_conv) & (pdf["ts_bucket"] == last_tsb)
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield _encode_batch(body)
        if carry is not None and len(carry):
            yield _encode_batch(carry)

    # Project to exactly the columns the encoder touches BEFORE the
    # exchange and the Python boundary: mapInPandas is opaque to Catalyst,
    # so without this every rollup column is shuffled and shipped through
    # Arrow (guide §2.3/§4.1; measured ~30 % of the encode wall at sf0.1).
    keyed = (
        rollup.select("conv_id", "bucket_start", *feats)
        .withColumn("ts_bucket", F.date_trunc(unit, "bucket_start"))
        .repartition("conv_id", "ts_bucket")
        .sortWithinPartitions("conv_id", "ts_bucket", "bucket_start")
    )
    return keyed.mapInPandas(enc_iter, CHUNK_SCHEMA)


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
