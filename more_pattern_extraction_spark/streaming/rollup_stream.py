"""Structured-Streaming variant of the tier-1 rollup (SURVEY §2.9: the
reference is batch-only; this is the optional streaming path for live
transcript feeds).

``readStream`` over a transcript source → watermarked 1-minute tumbling
windows → the same exact partials the batch rollup carries (so the batch
cascade and chunk encoder work unchanged on streaming output), written via
``foreachBatch`` into the same partitioned layout (exactly-once per
micro-batch epoch: the sink dedupes on epoch id via dynamic partition
overwrite of the epoch's touched partitions).

Late turns: ``withWatermark(ts, delay)`` holds per-(conv, minute) state
open for `delay`; later-than-watermark turns are dropped from the stream
tier and reconciled by ``plans.repair.repair_late_turns`` — the batch
repair recomputes ONLY the (conv_bucket, ts_day) partitions a late turn
can reach (the classic lambda repair; bit-equal to a cold rerun,
tests/test_repair.py).

Inter-turn latency (a lag over the conversation) is not computable with a
bounded-state stream window without event reordering; the streaming tier
rolls up the *arrival-time-computable* features (turn/tool counts, value
aggregates when the payload carries a latency column) — the batch tier
remains the source of truth for lag-derived features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_rollup_1m(
    stream: DataFrame,
    watermark: str = "10 minutes",
    latency_col: str | None = None,
) -> DataFrame:
    """Watermarked 1-minute rollup of a streaming transcript DataFrame."""
    aggs = [
        F.count(F.lit(1)).alias("turn_cnt"),
        F.sum(F.col("tool").isNotNull().cast("int")).alias("tool_call_cnt"),
    ]
    if latency_col:
        aggs += [
            F.sum(latency_col).alias("latency_sum"),
            F.count(latency_col).alias("latency_cnt"),
            F.min(latency_col).alias("latency_min"),
            F.max(latency_col).alias("latency_max"),
        ]
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.window("ts", "1 minute").alias("win"))
        .agg(*aggs)
        .select("conv_id", F.col("win.start").alias("bucket_start"), *[
            c for c in ["turn_cnt", "tool_call_cnt", "latency_sum",
                        "latency_cnt", "latency_min", "latency_max"]
            if latency_col or c in ("turn_cnt", "tool_call_cnt")
        ])
    )


def run_stream_to_memory(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    query_name: str = "rollup_stream",
    watermark: str = "10 minutes",
    latency_col: str | None = None,
    output_mode: str = "complete",
):
    """Drive a parquet-directory stream to completion synchronously
    (memory sink; the smoke-test harness).  Returns the query handle;
    results in ``spark.sql(f"select * from {query_name}")``.

    Default ``complete`` mode so windows inside the final watermark delay
    are visible too; the production path is append + foreachBatch, where
    those windows flush on the next micro-batch."""
    stream = (
        spark.readStream.schema(schema).parquet(source_dir)
    )
    agg = streaming_rollup_1m(stream, watermark, latency_col)
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_sketch_entries_1m(
    stream: DataFrame,
    watermark: str = "10 minutes",
    latency_col: str = "latency",
) -> DataFrame:
    """Streaming build of the mergeable latency sketch (operators/sketch):
    per-(conv, minute, log-bin) counts as ONE watermarked stateful
    aggregation — the sparse-entry form of the sketch map.

    The packed ``map<int,bigint>`` shape needs a second aggregation,
    which streaming append mode does not allow to chain; but the sketch
    is mergeable precisely so that this doesn't matter: entry rows sum
    by (conv, bucket, bin) across micro-batches/sinks, and
    ``operators.sketch.pack_entries`` (batch side, e.g. inside the
    foreachBatch sink or the downstream tier cascade) restores the map
    column exactly equal to ``sketch_from_raw`` on the same data
    (stream==batch pytest).  State per key is one int64 — bounded by
    watermark horizon × active (conv, bin) combinations (≤ 512 bins)."""
    from more_pattern_extraction_spark.operators.sketch import bin_expr

    return (
        stream.withWatermark("ts", watermark)
        .filter(F.col(latency_col).isNotNull())
        .groupBy(
            "conv_id",
            F.window("ts", "1 minute").alias("win"),
            bin_expr(latency_col).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "conv_id", F.col("win.start").alias("bucket_start"), "bin", "cnt"
        )
    )
