"""Storage-format seam (SURVEY §7.0): Iceberg when its runtime jar is on
the classpath, Parquet-with-Iceberg-layout otherwise (this sandbox).

Tables are partitioned by (conv_bucket, ts_day) — the Iceberg spec would
be ``bucket(N, conv_id), days(ts)``; the Parquet fallback materializes the
same two columns and relies on Catalyst partition pruning, so queries and
the checkpoint/retention logic are identical across backends.  Writes use
dynamic partition overwrite = the Parquet stand-in for Iceberg's atomic
partition-level commit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def table_path(root: str, name: str) -> str:
    return os.path.join(root, name)


def write_partitioned(
    df: DataFrame,
    root: str,
    name: str,
    partition_cols: tuple[str, ...] = ("conv_bucket", "ts_day"),
    mode: str = "overwrite",
    files_per_partition: int = 1,
    sort_cols: tuple[str, ...] = (),
    compression: str = "zstd",
) -> None:
    """Partitioned write with an explicit write distribution.

    Without a repartition, a partitioned write emits one file per
    (task, partition-dir) pair — up to tasks × partitions small files
    PER RUN, the classic 100 TB operational failure (every incremental
    run multiplies the file count; scans drown in open() overhead and
    the namenode/manifest in entries).  This is Iceberg's
    ``write.distribution-mode=hash`` recreated for the Parquet seam:
    hash-distribute on the partition columns so each partition dir is
    written by exactly one task → one file (``files_per_partition > 1``
    adds a deterministic conv_id salt for partitions too big for one
    file).  ``sort_cols`` additionally sorts within each task before
    writing — (conv_id, bucket_start) order keeps a conversation's
    buckets adjacent, which is what the DoD/Gorilla-style columnar
    encodings and range scans want."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    parts = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        parts.append(
            F.pmod(F.xxhash64("conv_id"), F.lit(files_per_partition)).cast("int")
        )
    out = df.repartition(*parts)
    if sort_cols:
        # the partition columns MUST lead the sort: FileFormatWriter
        # requires task rows ordered by the partitionBy columns and
        # silently inserts its own sort (destroying this one) when the
        # actual ordering doesn't have them as a prefix — measured in
        # scripts/measure_write_trade.py: without the prefix, sorted and
        # unsorted configs produced byte-identical (insertion-ordered)
        # files
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    (
        out.write.mode(mode)
        .option("compression", compression)  # zstd: ~30-50% smaller than
        # snappy at comparable scan speed — at 100 TB the default choice
        .partitionBy(*partition_cols)
        .parquet(table_path(root, name))
    )


def compact_table(
    spark: SparkSession,
    root: str,
    name: str,
    partition_cols: tuple[str, ...] = ("conv_bucket", "ts_day"),
    files_per_partition: int = 1,
    sort_cols: tuple[str, ...] = (),
) -> dict:
    """Small-file compaction for an already-fragmented table (the
    maintenance job Iceberg calls ``rewrite_data_files``): read every
    partition, rewrite with the hash write distribution, dynamic
    partition overwrite keeps the swap atomic per partition.  Returns
    {files_before, files_after, rows}."""
    base = table_path(root, name)
    before = _count_data_files(base)
    df = read_table(spark, root, name)
    rows = df.count()
    write_partitioned(
        df, root, name, partition_cols=partition_cols,
        files_per_partition=files_per_partition, sort_cols=sort_cols,
    )
    return {
        "files_before": before,
        "files_after": _count_data_files(base),
        "rows": rows,
    }


def _count_data_files(base: str) -> int:
    n = 0
    for root_, _, files in os.walk(base):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(root, name))


def snapshot_id(path: str) -> str:
    """Input snapshot surrogate for plain Parquet inputs: hash of the file
    listing + mtimes + sizes (an Iceberg catalog supplies a real snapshot
    id here)."""
    import hashlib

    h = hashlib.md5()
    if os.path.isdir(path):
        for root_, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                p = os.path.join(root_, f)
                st = os.stat(p)
                h.update(f"{p}:{st.st_mtime_ns}:{st.st_size}".encode())
    else:
        st = os.stat(path)
        h.update(f"{path}:{st.st_mtime_ns}:{st.st_size}".encode())
    return h.hexdigest()


def drop_partitions_before(root: str, name: str, horizon: str) -> int:
    """Retention as partition deletion: remove ts_day=<d> directories with
    d < horizon — the Parquet stand-in for Iceberg's metadata-only
    ``DELETE WHERE ts_day < horizon`` + snapshot expiry.  Returns the
    number of dropped partitions."""
    import shutil
    from datetime import date

    hor = date.fromisoformat(horizon[:10])
    base = table_path(root, name)
    dropped = 0
    if not os.path.isdir(base):
        return 0
    for cb in os.listdir(base):
        cb_path = os.path.join(base, cb)
        if not (os.path.isdir(cb_path) and cb.startswith("conv_bucket=")):
            continue
        for td in os.listdir(cb_path):
            if td.startswith("ts_day="):
                if date.fromisoformat(td.split("=", 1)[1]) < hor:
                    shutil.rmtree(os.path.join(cb_path, td))
                    dropped += 1
    if dropped:
        # this deletion happens behind Spark's back (plain filesystem, no
        # commit protocol) — invalidate any cached plans / file listings
        # over the path, or a persisted frame built on this table keeps
        # serving the dropped partitions for the rest of the session
        # (an Iceberg DELETE invalidates via its snapshot; this is the
        # Parquet-seam equivalent)
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.catalog.refreshByPath(base)
    return dropped


def with_layout_cols(df: DataFrame, n_buckets: int = 32) -> DataFrame:
    """Attach the physical layout columns (conv_bucket, ts_day)."""
    ts_col = "bucket_start" if "bucket_start" in df.columns else "ts"
    return df.withColumn(
        "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    ).withColumn("ts_day", F.date_trunc("day", F.col(ts_col)).cast("date"))
