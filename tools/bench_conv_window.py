"""Focused timing window for the conversation + LM families.

The full bench takes ~15 minutes, so catching a steal-free window for
ONE noisy family by rerunning it is expensive; this tool times just the
conv_*/lm_* queries (plus conv_pack) with the bench's own min-over-reps
+ steal-stamp method and emits one JSON line in the bench artifact
style. Run it when /proc/stat steal looks quiet; a window with every
stamp under the bench's 5% noise threshold is the clean evidence
VERDICT r6 item 6 asks for.

Usage: python tools/bench_conv_window.py [> BENCH_local_rNN_conv.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the harness: _timed, session config)

QUERIES = (
    "conv_fold_tools",
    "conv_gate",
    "conv_dedup_exact",
    "conv_render",
    "conv_pack",
    "lm_train",
    "lm_score",
    "lm_score_lang",
    "lm_score_trigram",
    "lm_bucket",
)


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master(f"local[{bench.CPUS}]")
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    q = entry_mod.queries()
    times: dict[str, float] = {}
    steal: dict[str, float] = {}
    for name in QUERIES:
        dt, st = bench._timed(lambda: q[name](spark, bench.SF_DIR))
        times[name] = round(dt, 3)
        steal[name] = round(st, 2)
    out = {
        "metric": "conv_lm_focused_window",
        "sf": bench.SF_DIR,
        "cpus": bench.CPUS,
        "queries": times,
        "query_steal_pct": steal,
        "noisy_queries": sorted(k for k, v in steal.items() if v > 5.0),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
