"""Per-query isolation probe for the r07 optimization round (guide §1).

Runs each bench.py suite query in the SAME session shape as bench.py
(local[$SPARK_GRAFT_CPUS], shuffle_partitions=cpus), but:

  * times each query TWICE back-to-back (first = cold codegen/compile,
    second = steady state) so plan-overhead vs compute separates;
  * writes ``.explain("formatted")`` for each query to
    plans/r07/<query>_<tag>.txt (tag from argv, default "before");
  * labels jobs with setJobDescription so event logs are readable.

This file is measurement harness only — bench.py itself is frozen.

Usage: python scripts/bench_probe.py [tag] [query_filter ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2:])


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from more_pattern_extraction_spark.session import drain_checksum, get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_probe", cores=cpus, shuffle_partitions=cpus)

    from more_pattern_extraction_spark.operators import chunks as CH
    from more_pattern_extraction_spark.operators import dedup as DD
    from more_pattern_extraction_spark.operators import gapfill as G
    from more_pattern_extraction_spark.operators import matrix_profile as MP
    from more_pattern_extraction_spark.operators import rollup as R
    from more_pattern_extraction_spark.operators import sketch as SK
    from more_pattern_extraction_spark.operators import similarity_search as SS
    from more_pattern_extraction_spark.sources.transcripts import events_as_transcripts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.count()
    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(lambda it: it, "id long").count()
    turns = events_as_transcripts(spark, sf_dir)
    feats = R.turn_features(turns, latency_col="latency")
    r1m = R.rollup_from_raw(feats, "1m")
    day1 = r1m.filter(F.col("bucket_start") < "2024-01-03")
    series = turns.select(
        "conv_id", F.col("ts").alias("bucket_start"),
        F.col("latency").alias("latency_avg_filled"),
    ).na.drop(subset=["latency_avg_filled"])
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    series2 = series.withColumn(
        "f2",
        F.lag("latency_avg_filled").over(
            Window.partitionBy("conv_id").orderBy("bucket_start")
        ),
    ).na.drop(subset=["f2"])

    queries = {
        "rollup_1m": lambda: r1m,
        "rollup_cascade": lambda: R.cascade(R.cascade(r1m, "1h"), "1d"),
        "gapfill_2d": lambda: G.gap_fill_rollup(day1, "1m"),
        "chunks_roundtrip": lambda: CH.decode_chunks(
            CH.encode_chunks(r1m, ["latency_avg", "latency_sum"], "1m")
        ),
        "rollup_p95_sketch": lambda: SK.sketch_quantile(
            SK.sketch_cascade(SK.sketch_cascade(SK.sketch_from_raw(feats, "1m"), "1h"), "1d")
        ).drop("latency_sketch"),
        "matrix_profile": lambda: MP.matrix_profile(series, 16),
        "dedup_minhash_lsh": lambda: DD.minhash_lsh_pairs(
            docs, n_hashes=8, bands=4, threshold=0.5, max_bucket_width=4096
        ),
        "embedding_topk": lambda: SS.cosine_topk(emb, q, k=5),
        "embedding_topk_ivf": lambda: SS.cosine_topk_ivf(
            emb, q, k=5, n_centroids=8, n_probe=3,
            centroids=SS.train_ivf_centroids(emb, 8, sample_mod=10),
        ),
        "corrected_matrix_profile": lambda: MP.corrected_matrix_profile(series, 16),
        "matrix_profile_multidim": lambda: MP.matrix_profile_multidim(
            series2, 16, ["latency_avg_filled", "f2"]
        ),
    }

    out: dict[str, dict] = {}
    for name, thunk in queries.items():
        if ONLY and name not in ONLY:
            continue
        spark.sparkContext.setJobDescription(f"{name} build")
        t0 = time.time()
        df = thunk()          # plan build (may run eager probe jobs)
        t_build = time.time() - t0
        # plan dump
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"/root/repo/plans/r07/{name}_{TAG}.txt", "w") as f:
            f.write(plan)
        spark.sparkContext.setJobDescription(f"{name} run1")
        t0 = time.time()
        r1 = drain_checksum(df)
        t1 = time.time() - t0
        spark.sparkContext.setJobDescription(f"{name} run2")
        t0 = time.time()
        df2 = thunk()
        drain_checksum(df2)
        t2 = time.time() - t0
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas")
        out[name] = {
            "build_s": round(t_build, 3), "run1_s": round(t1, 3),
            "run2_s": round(t2, 3), "rows": r1.rows, "checksum": r1.checksum,
            "exchanges": n_exch, "python_nodes": n_py,
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"tag": TAG, "probe": out}))


if __name__ == "__main__":
    main()
