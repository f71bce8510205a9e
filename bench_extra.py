#!/usr/bin/env python
"""Optimization-round profiling harness (bench.py stays FROZEN for the
driver; this file exists so the round's isolation numbers and plan dumps
are reproducible — guide §1.4 noop-sink methodology).

Usage:
    python bench_extra.py [query ...]          # time named queries (noop sink)
    python bench_extra.py --all                # every bench-listed query
    python bench_extra.py --family [mult]      # the dedup/similarity scale family
    python bench_extra.py --plans [query ...]  # dump .explain("formatted") to plans/r08/
    python bench_extra.py --reps N             # min over N reps (default 2)
    python bench_extra.py --suffix _after      # plan filename suffix

Prints one JSON line {"queries": {...}} like bench.py's per-query block.
Environment: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")


def _session():
    os.environ.setdefault("SPARK_HOME", "/opt/spark")
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("openccnet-bench-extra")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .getOrCreate()
    )


def _run_once(build) -> float:
    t0 = time.perf_counter()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    for h in getattr(df, "_persist_handles", ()):
        h.unpersist()
    return dt


def _timed(build, reps: int = 2) -> float:
    return min(_run_once(build) for _ in range(reps))


def _plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    args = sys.argv[1:]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    suffix = "_before"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]

    import __spark_entry__ as entry_mod

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    q = entry_mod.queries()

    if args and args[0] == "--plans":
        names = args[1:] or sorted(q)
        os.makedirs(PLANS_DIR, exist_ok=True)
        for name in names:
            try:
                df = q[name](spark, SF_DIR)
                txt = _plan_text(df)
                for h in getattr(df, "_persist_handles", ()):
                    h.unpersist()
            except Exception as exc:
                txt = f"PLAN FAILED: {exc}"
            with open(os.path.join(PLANS_DIR, f"{name}{suffix}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {name}{suffix}.txt", file=sys.stderr)
        spark.stop()
        return 0

    results: dict[str, float] = {}
    if args and args[0] == "--family":
        mult = int(args[1]) if len(args) > 1 else 6
        import bench as bench_mod

        for name, fn in bench_mod._scale_family_queries():
            spark.sparkContext.setJobDescription(f"{name}_x1")
            results[f"{name}_x1"] = round(_timed(lambda: fn(spark, SF_DIR, 1), reps), 3)
            spark.sparkContext.setJobDescription(f"{name}_x{mult}")
            results[f"{name}_x{mult}"] = round(
                _timed(lambda: fn(spark, SF_DIR, mult), reps), 3
            )
    else:
        if args and args[0] == "--all":
            import bench as bench_mod
            import re

            src = open(bench_mod.__file__).read()
            block = src[src.index("for name in (") : src.index("dt, st = _timed")]
            names = re.findall(r'"([a-z_0-9]+)"', block)
        else:
            names = args
        for name in names:
            spark.sparkContext.setJobDescription(name)
            results[name] = round(_timed(lambda: q[name](spark, SF_DIR), reps), 3)
            print(f"{name}: {results[name]}", file=sys.stderr)

    spark.stop()
    print(json.dumps({"queries": results, "sf_dir": SF_DIR, "reps": reps}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
