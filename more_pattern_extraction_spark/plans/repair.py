"""Incremental late-data repair (the "lambda repair" the streaming tier
defers to, streaming/rollup_stream.py module docstring): turns that
arrive after the stream watermark dropped them are reconciled into the
BATCH tier tables by recomputing only the partitions their values can
reach — not the table.

Why a bounded unit set is provable
----------------------------------
Every derived row a late turn can change lies in the day interval
``[prev_day, next_day]`` of its conversation, where prev/next are the
nearest days (in the MERGED raw) with any turn for that conversation:

* 1m rollup partials + sketch: day-local aggregates — the late turn's
  own day; plus the lag-latency of its successor turn, which by the
  stable-ordering invariant (turn_idx and ts co-monotone per
  conversation) lives in ``[late_day, next_day]``.
* LOCF: carries the last value forward until the NEXT real point —
  every pure-gap grid day in ``[late_day, next_day]`` changes, nothing
  after the next anchor does.
* limit-k interpolation: filled positions take both run anchors as
  inputs; a late turn splits one gap run in two, so changed positions
  are confined to the runs it touches — days in ``[prev_day, next_day]``.
* grid extension (late turn before the old min / after the old max
  bucket): the new spine days are exactly ``[late_day, next_day]`` /
  ``[prev_day, late_day]``.
* chunks (one struct per conv-day at 1m) and the 1h/1d cascades
  (day-aligned tiers) are day-local re-aggregations of the above.

Physical scope: tier partitions are ``(conv_bucket, ts_day)`` dirs, so
an affected partition is rewritten WHOLE — the recompute therefore reads
the merged raw pruned to the affected ``conv_bucket``s (whole
conversations: the lag spine, gap-fill bounds, and LOCF carries need a
conversation's full history, and conv_bucket is a stored partition
column so the scan prunes), then filters every write down to the
affected ``(conv_bucket, ts_day)`` units.  Dynamic partition overwrite
swaps just those dirs — the same atomic-per-partition commit the normal
pipeline uses.  At 10^12 turns the cost is
O(affected buckets' conversations) + O(affected partitions rewritten),
not O(table).

Checkpoint semantics: the repair certifies the WHOLE table at the new
(merged) snapshot without a data scan — units completed under
``prior_snapshot`` are carried forward (pure checkpoint-table
arithmetic), affected units are committed fresh, and a follow-up
``run_pipeline(resume=True)`` at the merged snapshot is a no-op
(tests/test_repair.py).  Lineage rows for the rewritten units are
recorded under job ``late_repair``.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from more_pattern_extraction_spark.operators import chunks as CH
from more_pattern_extraction_spark.operators import gapfill as G
from more_pattern_extraction_spark.operators import rollup as R
from more_pattern_extraction_spark.operators import sketch as SK
from more_pattern_extraction_spark.plans.checkpoint import CheckpointStore, content_hash
from more_pattern_extraction_spark.sources import catalog as CAT

JOB = "late_repair"
_PIPELINE_JOB = "rollup_pipeline"


def affected_units(
    merged_turns: DataFrame, late_turns: DataFrame, n_buckets: int
) -> DataFrame:
    """``(conv_bucket, ts_day)`` units a set of late turns can reach.

    For each late (conv, day): the closed day interval
    [prev present day, next present day] of that conversation in the
    MERGED raw (see module docstring for why values cannot escape it),
    exploded to days.  Pure relational — present-day list per affected
    conversation, a tiny per-conv-day window for prev/next, one
    ``sequence`` explode bounded by the data's real gap lengths.
    """
    late_days = (
        CAT.with_layout_cols(late_turns, n_buckets)
        .select("conv_id", "conv_bucket", "ts_day")
        .distinct()
    )
    # whole conversations of the affected conversations only — their
    # present-day lists; join on conv_id keeps this narrow
    merged_days = (
        CAT.with_layout_cols(merged_turns, n_buckets)
        .join(F.broadcast(late_days.select("conv_id").distinct()), "conv_id")
        .select("conv_id", "conv_bucket", "ts_day")
        .distinct()
    )
    w = Window.partitionBy("conv_id").orderBy("ts_day")
    spans = (
        merged_days.withColumn("prev_day", F.lag("ts_day").over(w))
        .withColumn("next_day", F.lead("ts_day").over(w))
        # one more present day upward: the late turn changes its SUCCESSOR
        # turn's lag latency, and when that successor is the last non-null
        # anchor of next_day, LOCF carries (and interpolation anchored on
        # it) propagate the changed value through the pure-gap run BEYOND
        # next_day, up to the following anchor.  Anchor values after the
        # successor are unchanged, so nothing escapes the next-NEXT
        # present day (ADVICE r06 #1; tests/test_repair.py covers the
        # single-anchor-day + multi-day-gap shape).
        .withColumn("next2_day", F.lead("ts_day", 2).over(w))
        .join(late_days.select("conv_id", "ts_day"), ["conv_id", "ts_day"])
    )
    return (
        spans.select(
            "conv_bucket",
            F.explode(
                F.sequence(
                    F.coalesce("prev_day", "ts_day"),
                    F.coalesce("next2_day", "next_day", "ts_day"),
                    F.expr("interval 1 day"),
                )
            ).alias("ts_day"),
        )
        .distinct()
    )


def scoped_raw(merged_turns: DataFrame, buckets: list[int], n_buckets: int) -> DataFrame:
    """Whole conversations of the affected buckets.  On a cataloged
    transcript table conv_bucket is a STORED partition column — filter
    it before recomputing layout cols, so the scan partition-prunes (a
    filter on the recomputed ``pmod(xxhash64(..))`` expression would not
    reach the file index; PLANS.md §repair shows the pruned scan +
    tests/test_plans.py pins it).  On a raw frame without the column
    it's a pushed predicate instead."""
    if "conv_bucket" in merged_turns.columns:
        src = merged_turns.filter(F.col("conv_bucket").isin(buckets))
    else:
        src = merged_turns
    return CAT.with_layout_cols(src, n_buckets).filter(
        F.col("conv_bucket").isin(buckets)
    )


def _only_units(df: DataFrame, units: DataFrame) -> DataFrame:
    """Restrict a layout-columned frame to the affected units (broadcast
    semi-join on the partition key — the write then overwrites exactly
    those partition dirs)."""
    return df.join(F.broadcast(units), ["conv_bucket", "ts_day"], "left_semi")


def repair_late_turns(
    spark: SparkSession,
    merged_turns: DataFrame,
    late_turns: DataFrame,
    out_root: str,
    input_snapshot: str,
    prior_snapshot: str | None = None,
    n_buckets: int = 32,
    latency_col: str | None = None,
    retention: dict[str, str] | None = None,
) -> dict:
    """Reconcile late-arriving turns into the tier tables in place.

    ``merged_turns`` must be the raw table WITH the late turns applied
    (on a real ingest the transcript table already contains them — this
    is the same frame a cold rerun would read); ``late_turns`` is just
    the late subset, used only to bound the recompute.  After the
    repair, every tier table is bit-identical to a cold full run on
    ``merged_turns`` (tests/test_repair.py proves it per table) and the
    checkpoint table certifies ``input_snapshot`` completely.

    ``retention`` (same shape as ``run_pipeline``'s, tier → horizon):
    units older than the 1m horizon are NOT written back — without the
    filter a repair would resurrect partitions retention already dropped
    (the recompute reads raw, which still has the turns).  They are
    counted in ``units_skipped_retention``.  Two honest consequences of
    cascading retention, by design: (a) a coarse-tier row whose finer
    source days were dropped is left untouched (stale-by-policy — it
    cannot be recomputed tier-consistently without the finer rows, and
    dynamic overwrite only replaces partitions the cascade actually
    emits); (b) gap-fill values just inside the horizon whose
    interpolation anchors fell outside it are recomputed from the
    RETAINED 1m tier, i.e. they match a cold run on the retained data,
    not a cold run on all-time data — the same thing any engine must
    choose once source rows are deleted by policy.
    """
    t0 = time.time()
    cp = CheckpointStore(spark, out_root)

    all_units = affected_units(merged_turns, late_turns, n_buckets).cache()
    n_all_units = all_units.count()
    hor_1m = (retention or {}).get("1m")
    units = all_units
    if hor_1m:
        units = all_units.filter(
            F.col("ts_day") >= F.lit(hor_1m[:10]).cast("date")
        ).cache()
    n_units = units.count()
    if n_units == 0:  # everything outside the retention horizon
        # still certify the merged snapshot: carry the prior snapshot's
        # completed units forward under input_snapshot (the same
        # arithmetic as the normal path with an empty repaired set) —
        # otherwise a follow-up run_pipeline(resume=True) at the merged
        # snapshot would recompute every unit from raw instead of
        # no-opping (ADVICE r06 #3)
        n_carried = 0
        if prior_snapshot is not None:
            carried = (
                cp.completed(_PIPELINE_JOB, "1m")
                .filter(F.col("input_snapshot") == prior_snapshot)
                .select("conv_bucket", "ts_bucket")
            )
            n_carried = carried.count()
            cp.commit(carried, _PIPELINE_JOB, "1m", input_snapshot)
        m = {
            "wall_s": time.time() - t0,
            "late_turns": float(late_turns.count()),
            "units_repaired": 0.0,
            "units_carried": float(n_carried),
            "units_skipped_retention": float(n_all_units),
            "buckets_touched": 0.0,
        }
        cp.record_metrics(JOB, **m)
        units.unpersist()
        all_units.unpersist()
        return m

    buckets = [r[0] for r in units.select("conv_bucket").distinct().collect()]

    scoped = scoped_raw(merged_turns, buckets, n_buckets)
    n_late = late_turns.count()

    feats = R.turn_features(scoped.drop("conv_bucket", "ts_day"), latency_col=latency_col)
    feats = CAT.with_layout_cols(feats, n_buckets)

    # --- 1m tier (+ sketch), affected partitions only ----------------------
    r1m = SK.attach_sketch_p95(
        R.rollup_from_raw(feats, "1m"),
        SK.sketch_from_raw(feats, "1m"),
        keep_sketch=True,
    )
    r1m = CAT.with_layout_cols(r1m, n_buckets)
    CAT.write_partitioned(
        _only_units(r1m, units), out_root, "rollup_1m",
        sort_cols=("conv_id", "bucket_start"),
    )

    # read-back: unaffected days of the affected buckets keep their old
    # (value-identical) rows; downstream stages see one consistent table
    base = CAT.read_table(spark, out_root, "rollup_1m").filter(
        F.col("conv_bucket").isin(buckets)
    )

    # --- KMV distinct partials: unit-local by construction -----------------
    # each (conv_bucket, minute) partial depends only on its own unit's
    # rows, so the repair scope is exactly the affected units — no
    # spillover interval.  Built from the repaired tier read-back (one
    # row per pair already — same reason as the pipeline's build path)
    from more_pattern_extraction_spark.operators import distinct as DK

    kmv1m = DK.kmv_from_rollup(
        base.select("conv_bucket", "bucket_start", "conv_id"),
        part_cols=("conv_bucket",),
    )
    kmv1m = kmv1m.withColumn("ts_day", F.col("bucket_start").cast("date"))
    CAT.write_partitioned(
        _only_units(kmv1m, units), out_root, "distinct_1m",
        sort_cols=("bucket_start",),
    )

    # --- gap-fill: needs whole conversations; write affected days ----------
    filled = G.gap_fill_rollup(base, "1m")
    filled = CAT.with_layout_cols(filled, n_buckets)
    CAT.write_partitioned(
        _only_units(filled, units), out_root, "rollup_1m_filled",
        sort_cols=("conv_id", "bucket_start"),
    )

    # --- chunks: one struct per conv-day → day-local recompute -------------
    chunks = CH.encode_chunks(base, ["latency_avg", "latency_sum"], "1m")
    chunks = chunks.withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    ).withColumn("ts_day", F.col("ts_bucket").cast("date"))
    CAT.write_partitioned(
        _only_units(chunks, units), out_root, "chunks_1m",
        sort_cols=("conv_id", "ts_bucket"),
    )

    # --- cascades: day-aligned tiers → re-aggregate affected days only -----
    sk_cols = ["conv_id", "bucket_start", "latency_sketch"]
    base_aff = _only_units(base, units)
    def _within_horizon(df: DataFrame, tier: str) -> DataFrame:
        hor = (retention or {}).get(tier)
        if not hor:
            return df
        return df.filter(F.col("ts_day") >= F.lit(hor[:10]).cast("date"))

    r1h = SK.attach_sketch_p95(
        R.cascade(base_aff, "1h", from_tier="1m"),
        SK.sketch_cascade(base_aff.select(*sk_cols), "1h"),
        keep_sketch=True,
    )
    CAT.write_partitioned(
        _within_horizon(CAT.with_layout_cols(r1h, n_buckets), "1h"),
        out_root, "rollup_1h",
        sort_cols=("conv_id", "bucket_start"),
    )
    base_h_aff = _only_units(
        CAT.read_table(spark, out_root, "rollup_1h").filter(
            F.col("conv_bucket").isin(buckets)
        ),
        units,
    )
    r1d = SK.attach_sketch_p95(
        R.cascade(base_h_aff, "1d", from_tier="1h"),
        SK.sketch_cascade(base_h_aff.select(*sk_cols), "1d"),
        keep_sketch=True,
    )
    CAT.write_partitioned(
        _within_horizon(CAT.with_layout_cols(r1d, n_buckets), "1d"),
        out_root, "rollup_1d",
        sort_cols=("conv_id", "bucket_start"),
    )

    # --- checkpoint: certify the merged snapshot without a data scan -------
    repaired_units = units.select(
        "conv_bucket", F.col("ts_day").cast("timestamp").alias("ts_bucket")
    )
    n_carried = 0
    if prior_snapshot is not None:
        carried = (
            cp.completed(_PIPELINE_JOB, "1m")
            .filter(F.col("input_snapshot") == prior_snapshot)
            .select("conv_bucket", "ts_bucket")
            .join(repaired_units, ["conv_bucket", "ts_bucket"], "left_anti")
        )
        n_carried = carried.count()
        cp.commit(carried, _PIPELINE_JOB, "1m", input_snapshot)
    cp.commit(repaired_units, _PIPELINE_JOB, "1m", input_snapshot)

    lineage = content_hash(
        _only_units(
            CAT.read_table(spark, out_root, "rollup_1m"), units
        ).withColumn("ts_bucket", F.col("ts_day").cast("timestamp")),
        ["conv_id", "bucket_start", "turn_cnt", "latency_cnt"],
    )
    cp.record_lineage(JOB, "1m", input_snapshot, lineage)

    m = {
        "wall_s": time.time() - t0,
        "late_turns": float(n_late),
        "units_repaired": float(n_units),
        "units_carried": float(n_carried),
        "units_skipped_retention": float(n_all_units - n_units),
        "buckets_touched": float(len(buckets)),
    }
    cp.record_metrics(JOB, **m)
    units.unpersist()
    all_units.unpersist()
    return m


def repair_pattern_stage(
    spark: SparkSession,
    merged_turns: DataFrame,
    late_turns: DataFrame,
    out_root: str,
    n_buckets: int = 32,
    m: int = 120,
    window: str = "week",
    k: int = 2,
) -> dict:
    """Extend a late-data repair to the pattern tables (``mp_{window}``,
    ``discords``, ``regimes`` — ``run_pattern_stage``'s outputs).  Call
    AFTER ``repair_late_turns`` on the same late set, so the filled tier
    this reads is already reconciled.

    Why the affected set is exact: the window-keyed matrix profile is
    WINDOW-LOCAL — each (conv, window) group is computed from that
    window's grid rows only (that is what bounds tasks for hot
    conversations) — and a late turn changes filled-grid rows only
    inside the affected day interval (module docstring).  So the pattern
    partitions that can change are exactly the (conv_bucket, window)
    pairs covering the affected (conv_bucket, ts_day) units; discords
    and regimes are per-(conv, window) reductions of the MP and inherit
    the same set.  The grid is RESTRICTED to those windows before the MP
    kernel runs (not filtered after), so the recompute cost is
    O(affected windows), and every output row lands in an affected
    partition — dynamic overwrite touches nothing else.
    """
    from more_pattern_extraction_spark.operators import matrix_profile as MP
    from more_pattern_extraction_spark.operators import motifs as MO
    from more_pattern_extraction_spark.operators import segmentation as SG

    t0 = time.time()
    units = affected_units(merged_turns, late_turns, n_buckets).cache()
    buckets = [r[0] for r in units.select("conv_bucket").distinct().collect()]
    wins = (
        units.select(
            "conv_bucket",
            F.date_trunc(window, F.col("ts_day").cast("timestamp")).alias("_win"),
        )
        .distinct()
        .cache()
    )
    n_wins = wins.count()

    filled = CAT.read_table(spark, out_root, "rollup_1m_filled").filter(
        F.col("conv_bucket").isin(buckets)
    )
    grid = (
        filled.select(
            "conv_id",
            "conv_bucket",
            "bucket_start",
            F.coalesce("latency_avg_filled", "latency_avg_locf", F.lit(0.0)).alias(
                "latency_avg_filled"
            ),
        )
        .withColumn("_win", F.date_trunc(window, "bucket_start"))
        .join(F.broadcast(wins), ["conv_bucket", "_win"], "left_semi")
        .select("conv_id", "bucket_start", "latency_avg_filled")
    )
    mp = MP.matrix_profile(grid, m, window=window)
    mp = mp.withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    ).withColumn("ts_day", F.col("win").cast("date"))
    CAT.write_partitioned(mp, out_root, f"mp_{window}")

    # window-local extractions from the re-read artifact, scoped to the
    # affected (bucket, window) pairs — same composite-key shape as
    # run_pattern_stage (plans/pipeline.py)
    mp_saved = (
        CAT.read_table(spark, out_root, f"mp_{window}")
        .filter(F.col("conv_bucket").isin(buckets))
        .withColumn("_win", F.col("win"))
        .join(F.broadcast(wins), ["conv_bucket", "_win"], "left_semi")
    )
    keyed = mp_saved.withColumn(
        "_ck", F.concat_ws("#", "conv_id", F.col("win").cast("string"))
    )
    disc = MO.top_k_discords(
        keyed.select(F.col("_ck").alias("conv_id"), "pos", "mp"), ez=int(m / 4), k=k
    ).select(
        F.split("conv_id", "#")[0].alias("conv_id"),
        F.split("conv_id", "#")[1].cast("timestamp").alias("win"),
        "discord_rank", "pos", "distance",
    )
    disc = disc.withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    ).withColumn("ts_day", F.col("win").cast("date"))
    CAT.write_partitioned(disc, out_root, "discords")

    regimes = SG.fluss_segments(
        keyed.select(F.col("_ck").alias("conv_id"), "pos", "pi"),
        L_values=[m], n_regimes=3, excl_factor=1,
    ).select(
        F.split("conv_id", "#")[0].alias("conv_id"),
        F.split("conv_id", "#")[1].cast("timestamp").alias("win"),
        "L", "regime_pos", "cac",
    )
    regimes = regimes.withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    ).withColumn("ts_day", F.col("win").cast("date"))
    CAT.write_partitioned(regimes, out_root, "regimes")

    out = {
        "pattern_repair_wall_s": time.time() - t0,
        "windows_repaired": float(n_wins),
        "buckets_touched": float(len(buckets)),
    }
    CheckpointStore(spark, out_root).record_metrics("late_repair_patterns", **out)
    units.unpersist()
    wins.unpersist()
    return out
