"""CSV readers incl. the ragged instrument format (reference S6/S7:
``Threshold_0.992/genlib.py:270-312`` parse_csv — rows carrying variable-
length I-V curve arrays; notebook CSV loads with renames and multi-file
concat).

All JVM-side: ``spark.read.csv`` + split/slice into ArrayType columns,
sentinel → NULL via ``when`` — no Python parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_timeseries_csv(
    spark: SparkSession,
    paths: list[str],
    ts_col: str,
    renames: dict[str, str] | None = None,
    ts_format: str | None = None,
) -> DataFrame:
    """Notebook-style loader (S7): one or more CSVs unioned by name,
    timestamp parsed, columns renamed."""
    df = spark.read.csv(paths, header=True, inferSchema=True)
    if renames:
        df = df.withColumnsRenamed(renames)
    ts = (
        F.to_timestamp(F.col(ts_col), ts_format)
        if ts_format
        else F.to_timestamp(F.col(ts_col))
    )
    return df.withColumn("ts", ts).drop(ts_col) if ts_col != "ts" else df.withColumn("ts", ts)


def parse_ragged_csv(
    spark: SparkSession,
    path: str,
    meta_cols: int,
    sentinel: float = -9999.0,
    delimiter: str = ",",
) -> DataFrame:
    """Ragged-row parser (S6): each line = ``meta_cols`` fixed scalar
    fields followed by a variable-length numeric array (the I-V curve
    shape).  Reads lines as text, splits JVM-side, slices the head into
    typed meta columns and the tail into ``array<double>`` with the
    sentinel mapped to NULL — the reference's ``-9999 → NaN``
    (genlib.py:270-312).
    """
    lines = spark.read.text(path)
    toks = F.split(F.col("value"), delimiter)
    metas = [
        F.element_at(toks, i + 1).alias(f"meta_{i}") for i in range(meta_cols)
    ]
    tail = F.slice(toks, meta_cols + 1, F.size(toks) - meta_cols)
    curve = F.transform(
        tail,
        lambda x: F.when(
            x.cast("double") == sentinel, F.lit(None).cast("double")
        ).otherwise(x.cast("double")),
    )
    return lines.select(*metas, curve.alias("curve")).withColumn(
        "curve_len", F.size("curve")
    )


def write_results_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Result sink (reference S8: notebooks persist scored frames with
    ``to_csv``): header CSV, timestamps in ISO form so the file round-trips
    through load_timeseries_csv.  ``single_file`` coalesces to one part —
    ONLY for small result frames (it serializes the write); large results
    keep their partitioning."""
    out = df.coalesce(1) if single_file else df
    ts_cols = [f.name for f in df.schema.fields if f.dataType.typeName().startswith("timestamp")]
    for c in ts_cols:
        out = out.withColumn(c, F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    out.write.mode("overwrite").option("header", True).csv(path)
