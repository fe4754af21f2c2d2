"""Catalog-seam contract test (VERDICT r02 #8 / r03 #3): the exact
write / read / snapshot / retention / resume sequence that
``plans/checkpoint.py`` and ``plans/pipeline.py`` depend on, run against
the Parquet fallback (``sources/catalog.py``).  The same assertions
define the contract the Iceberg branch must honor; the Iceberg leg runs
whenever the runtime jar is on the classpath (skipped in this sandbox —
no jar is obtainable offline).

Contract items:
  C1  write_partitioned → read_table round-trips rows exactly and lays
      out (conv_bucket, ts_day) partition directories.
  C2  dynamic partition overwrite touches ONLY the partitions present in
      the written frame (the Parquet stand-in for Iceberg's atomic
      partition-level commit).
  C3  snapshot_id is stable while the input is unchanged, changes when
      any file changes, and distinguishes different paths.
  C4  drop_partitions_before removes exactly the ts_day partitions
      before the horizon (metadata-only retention).
  C5  resume: pending_units anti-joins committed work per input
      snapshot; a new snapshot re-exposes all units; a resumed
      run equals a cold run (pipeline-level, kill-and-resume).
"""

import os

import pytest
from pyspark.sql import functions as F

from more_pattern_extraction_spark.plans.checkpoint import CheckpointStore
from more_pattern_extraction_spark.sources import catalog as CAT


@pytest.fixture()
def tiered(spark, transcripts, tmp_path):
    """A small layout-ready frame + its written table root."""
    df = CAT.with_layout_cols(
        transcripts.select("conv_id", "turn_idx", "role", "ts"), n_buckets=4
    )
    root = str(tmp_path)
    CAT.write_partitioned(df, root, "turns")
    return df, root


def test_c1_roundtrip_and_layout(spark, tiered):
    df, root = tiered
    back = CAT.read_table(spark, root, "turns")
    assert back.count() == df.count()
    # row-level equality (order-insensitive): anti-joins empty both ways
    cols = ["conv_id", "turn_idx", "role"]
    assert back.select(cols).exceptAll(df.select(cols)).count() == 0
    assert df.select(cols).exceptAll(back.select(cols)).count() == 0
    # physical layout: conv_bucket=<n>/ts_day=<d> directories exist
    base = CAT.table_path(root, "turns")
    cbs = [d for d in os.listdir(base) if d.startswith("conv_bucket=")]
    assert cbs, "no conv_bucket partition directories"
    inner = os.listdir(os.path.join(base, cbs[0]))
    assert any(d.startswith("ts_day=") for d in inner)


def test_c2_dynamic_overwrite_is_partition_scoped(spark, tiered):
    df, root = tiered
    # pick one (conv_bucket, ts_day) partition and overwrite it with a
    # single marker row; every other partition must survive untouched
    tgt = df.select("conv_bucket", "ts_day").first()
    marker = (
        df.filter(
            (F.col("conv_bucket") == tgt.conv_bucket)
            & (F.col("ts_day") == tgt.ts_day)
        )
        .limit(1)
        .withColumn("role", F.lit("OVERWRITTEN"))
    )
    before_other = (
        CAT.read_table(spark, root, "turns")
        .filter(
            ~((F.col("conv_bucket") == tgt.conv_bucket) & (F.col("ts_day") == tgt.ts_day))
        )
        .count()
    )
    CAT.write_partitioned(marker, root, "turns")
    after = CAT.read_table(spark, root, "turns")
    in_tgt = after.filter(
        (F.col("conv_bucket") == tgt.conv_bucket) & (F.col("ts_day") == tgt.ts_day)
    )
    assert in_tgt.count() == 1
    assert in_tgt.first().role == "OVERWRITTEN"
    assert (
        after.filter(
            ~((F.col("conv_bucket") == tgt.conv_bucket) & (F.col("ts_day") == tgt.ts_day))
        ).count()
        == before_other
    )


def test_c3_snapshot_id_semantics(spark, tiered, tmp_path):
    df, root = tiered
    path = CAT.table_path(root, "turns")
    s1 = CAT.snapshot_id(path)
    s2 = CAT.snapshot_id(path)
    assert s1 == s2, "snapshot must be stable on unchanged input"
    # appending to any partition must change the snapshot
    df.limit(1).write.mode("append").partitionBy("conv_bucket", "ts_day").parquet(path)
    assert CAT.snapshot_id(path) != s1
    # a different table is a different snapshot space
    other = str(tmp_path / "elsewhere")
    df.limit(5).write.mode("overwrite").partitionBy("conv_bucket", "ts_day").parquet(
        other
    )
    assert CAT.snapshot_id(other) != CAT.snapshot_id(path)


def test_c4_retention_drops_only_old_partitions(spark, tiered):
    df, root = tiered
    days = sorted(r.ts_day for r in df.select("ts_day").distinct().collect())
    assert len(days) >= 2, "fixture must span multiple days"
    horizon = str(days[1])
    n_keep = df.filter(F.col("ts_day") >= horizon).count()
    dropped = CAT.drop_partitions_before(root, "turns", horizon)
    assert dropped > 0
    back = CAT.read_table(spark, root, "turns")
    assert back.count() == n_keep
    assert back.filter(F.col("ts_day") < horizon).count() == 0
    # idempotent: second call drops nothing
    assert CAT.drop_partitions_before(root, "turns", horizon) == 0


def test_c5_checkpoint_resume_per_snapshot(spark, tiered, tmp_path):
    df, root = tiered
    cp = CheckpointStore(spark, str(tmp_path / "cp"))
    units = df.select(
        "conv_bucket", F.col("ts_day").cast("timestamp").alias("ts_bucket")
    ).distinct()
    snap = CAT.snapshot_id(CAT.table_path(root, "turns"))
    n = units.count()
    assert cp.pending_units(units, "job", "1m", snap).count() == n
    # commit half the units → only the other half is pending
    half = units.limit(n // 2)
    cp.commit(half, "job", "1m", snap)
    assert cp.pending_units(units, "job", "1m", snap).count() == n - n // 2
    # commit the rest → nothing pending (a resumed run does zero work)
    rest = units.join(half, ["conv_bucket", "ts_bucket"], "left_anti")
    cp.commit(rest, "job", "1m", snap)
    assert cp.pending_units(units, "job", "1m", snap).count() == 0
    # a NEW input snapshot re-exposes every unit: old checkpoints must
    # never mask new data (checkpoint.py pending_units contract)
    assert cp.pending_units(units, "job", "1m", snap + "_v2").count() == n
    # and other (job, tier) scopes are independent
    assert cp.pending_units(units, "job", "1h", snap).count() == n
    assert cp.pending_units(units, "other_job", "1m", snap).count() == n


@pytest.mark.skipif(
    True, reason="Iceberg runtime jar not obtainable offline in this sandbox"
)
def test_iceberg_branch_same_contract(spark, tiered):
    """When the Iceberg runtime jar is present (iceberg_available), the
    same C1-C5 sequence must hold with writeTo(...).append()/overwrite
    partitions, real snapshot ids from the table metadata, and
    expire_snapshots-based retention.  Kept as the executable contract
    statement; flip the skip when a jar lands on the classpath."""
    assert CAT.iceberg_available(spark)


def test_write_distribution_one_file_per_partition(spark, tiered, tmp_path):
    """The hash write distribution (Iceberg write.distribution-mode=hash
    for the Parquet seam) must produce exactly one data file per
    partition dir regardless of upstream task count — without it a
    partitioned write emits one file per (task, partition) pair and
    every incremental run multiplies the file count."""
    df0, _ = tiered
    root = str(tmp_path / "dist")
    # force many upstream tasks so the non-distributed shape would
    # scatter each partition across files
    df = df0.repartition(8)
    CAT.write_partitioned(df, root, "t", sort_cols=("conv_id", "ts"))
    base = CAT.table_path(root, "t")
    per_dir = {}
    for r, _, files in os.walk(base):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            per_dir[r] = n
    assert per_dir and all(n == 1 for n in per_dir.values()), per_dir
    got = CAT.read_table(spark, root, "t")
    assert got.count() == df0.count()


def test_compact_table_merges_small_files_preserving_content(spark, tiered, tmp_path):
    """compact_table (the rewrite_data_files maintenance job) must shrink
    the file count to one per partition and leave the table's content
    bit-identical."""
    df0, _ = tiered
    root = str(tmp_path / "frag")
    base = CAT.table_path(root, "t")
    # fragment on purpose: bypass the write distribution
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (df0.repartition(8).write.mode("overwrite")
     .partitionBy("conv_bucket", "ts_day").parquet(base))
    frag_files = CAT._count_data_files(base)
    n_parts = sum(
        1 for r, _, fs in os.walk(base)
        if any(f.endswith(".parquet") for f in fs)
    )
    assert frag_files > n_parts  # genuinely fragmented

    def digest(df):
        cols = sorted(df.columns)
        return df.select(
            F.sum(F.pmod(F.xxhash64(*[F.col(c).cast("string") for c in cols]),
                         F.lit(1_000_000_007))).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]

    before = digest(CAT.read_table(spark, root, "t"))
    stats = CAT.compact_table(spark, root, "t")
    assert stats["files_before"] == frag_files
    assert stats["files_after"] == n_parts
    assert digest(CAT.read_table(spark, root, "t")) == before


def test_sort_cols_survive_partitioned_write(spark, tiered, tmp_path):
    """sort_cols must order rows WITHIN each written file.  Regression:
    FileFormatWriter requires task rows ordered by the partitionBy
    columns and silently inserts its own sort — destroying a
    sortWithinPartitions that doesn't lead with them — so the r05 tier
    writes shipped insertion-ordered files while claiming (conv_id, ts)
    order (caught byte-identically in scripts/measure_write_trade.py)."""
    import pyarrow.parquet as pq

    df0, _ = tiered
    root = str(tmp_path / "sorted")
    CAT.write_partitioned(df0.repartition(8), root, "t",
                          sort_cols=("conv_id", "ts"))
    base = CAT.table_path(root, "t")
    n_files = 0
    for r, _, files in os.walk(base):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            n_files += 1
            t = pq.read_table(os.path.join(r, f), columns=["conv_id", "ts"])
            keys = list(zip(t.column("conv_id").to_pylist(),
                            t.column("ts").to_pylist()))
            assert keys == sorted(keys), f"unsorted rows in {r}/{f}"
    assert n_files > 0
