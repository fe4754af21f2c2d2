"""North-rule deployment shape: the job must run via ``spark-submit
--py-files mpe.zip`` (BASELINE.json north_star).  This packages the
package into a zip, launches a REAL spark-submit subprocess whose driver
imports the engine ONLY from that zip (cwd is a temp dir; PYTHONPATH is
scrubbed), runs the checkpointed pipeline on a tiny deterministic input,
and checks the persisted tier tables + resume metrics."""

import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _build_zip(tmp: Path) -> Path:
    zpath = tmp / "mpe.zip"
    pkg = REPO / "more_pattern_extraction_spark"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in pkg.rglob("*.py"):
            z.write(f, f.relative_to(REPO))
    return zpath


DRIVER = """
import json, sys
from pyspark.sql import SparkSession

import more_pattern_extraction_spark as mpe
assert "mpe.zip" in mpe.__file__, f"engine must come from the zip, got {mpe.__file__}"

from more_pattern_extraction_spark.plans.pipeline import run_pipeline
from more_pattern_extraction_spark.sources import catalog as CAT
from more_pattern_extraction_spark.sources.transcripts import generate_transcripts

spark = (SparkSession.builder.appName("submit_test")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
out = sys.argv[1]
t = generate_transcripts(spark, n_convs=4, base_turns=12, hot_convs=0, hot_mult=1)
m1 = run_pipeline(spark, t, out, input_snapshot="snapZ", n_buckets=4)
m2 = run_pipeline(spark, t, out, input_snapshot="snapZ", n_buckets=4)  # resume no-op
rows_1h = CAT.read_table(spark, out, "rollup_1h").count()
cols_1h = set(CAT.read_table(spark, out, "rollup_1h").columns)
print("RESULT " + json.dumps({
    "units_done": m1["units_done"], "resume_done": m2["units_done"],
    "rows_1h": rows_1h,
    "has_sketch": "latency_p95_sketch" in cols_1h,
}))
spark.stop()
"""


def test_pipeline_via_spark_submit(tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.environ.get("SPARK_HOME", ""), "bin", "spark-submit")
    if not spark_submit or not os.path.exists(spark_submit):
        # pip-installed pyspark ships it next to the python scripts dir
        cand = Path(sys.executable).parent / "spark-submit"
        if cand.exists():
            spark_submit = str(cand)
        else:
            pytest.skip("spark-submit launcher not found")

    zpath = _build_zip(tmp_path)
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    out_root = tmp_path / "out"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", str(zpath),
         str(driver), str(out_root)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
    import json

    res = json.loads(line[len("RESULT "):])
    assert res["units_done"] > 0
    assert res["resume_done"] == 0  # second run resumed to a no-op
    assert res["rows_1h"] > 0
    assert res["has_sketch"] is True
