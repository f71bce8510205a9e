"""End-to-end spark-submit --py-files smoke: packages the library, runs the
job entrypoint in a separate Spark JVM, resumes it, and checks the output
(north_rule: "run via spark-submit --py-files")."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_spark_submit_quality_filter(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = str(Path(pyspark.__file__).parent / "bin" / "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    # package the library (incl. dictionary bundle)
    zip_path = tmp_path / "openccnet_spark.zip"
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "package_pyfiles.py"), "--out", str(zip_path)],
        check=True,
    )

    # input: small deterministic transcripts parquet
    src = tmp_path / "in.parquet"
    gen = (
        "from pyspark.sql import SparkSession;"
        "from openccnet_spark.sources.transcripts import spark_transcripts;"
        "s=SparkSession.builder.master('local[4]').config('spark.ui.enabled','false').getOrCreate();"
        f"spark_transcripts(s, 20).write.parquet(r'{src}');s.stop()"
    )
    subprocess.run([sys.executable, "-c", gen], check=True, cwd=ROOT)

    out_dir = tmp_path / "out"
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable)
    cmd = [
        spark_submit,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", str(zip_path),
        str(ROOT / "jobs" / "run_quality_filter.py"),
        "--input", str(src),
        "--output", str(out_dir),
        "--config", "t2s",
        "--buckets", "8",
        "--run-id", "submit-test",
    ]
    import re

    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r1.returncode == 0, r1.stderr[-3000:]
    m1 = re.search(r"processed=(\d+) buckets, skipped=(\d+)", r1.stdout)
    # some of the 8 hash buckets may be empty with only 20 conversations
    assert m1 and int(m1.group(1)) >= 6 and int(m1.group(2)) == 0, r1.stdout

    # resume: everything done -> no-op
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=300)
    assert r2.returncode == 0, r2.stderr[-3000:]
    m2 = re.search(r"processed=(\d+) buckets, skipped=(\d+)", r2.stdout)
    assert m2 and int(m2.group(1)) == 0 and int(m2.group(2)) == int(m1.group(1)), r2.stdout

    # output sanity via duckdb (no Spark needed)
    import duckdb

    n = duckdb.sql(
        f"select count(*), count(distinct conv_id || '#' || turn_idx) from '{out_dir}/turns/*/*.parquet'"
    ).fetchone()
    assert n[0] == n[1] > 0
