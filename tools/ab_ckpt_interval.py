"""Solo A/B of the round-5 components checkpoint-interval knob:
reliable-mode connected components with checkpoint_interval=1 (the r04
every-round policy) vs =4 (the shipped r05 default), over the same
minhash-pair input the driver query uses. Interleaved A/B/A/B, min-time
per side, construction-inclusive timing (iteration runs during build).

Usage: python tools/ab_ckpt_interval.py [reps]   (default 4)
Prints one JSON line. Run on a quiet host — never concurrently with other
CPU work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from bench import _session  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(f"local[{cpus}]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    entry._ensure_workers(spark)

    from openccnet_spark.operators.components import connected_components
    from openccnet_spark.operators.dedup import minhash_near_duplicates

    def build(interval: int):
        stats: dict = {}
        handles: list = []
        pairs = minhash_near_duplicates(
            entry._mutant_docs(spark, sf_dir), persist=True, handles=handles
        )
        # handles=: the shipped driver path — mid-interval cached frames
        # released after materialization (leaving them leaked degrades
        # every later rep in the shared session, measured 2-4x)
        out = connected_components(
            pairs, reliable=True, checkpoint_interval=interval, stats=stats,
            handles=handles,
        )
        out._persist_handles = handles
        out._stats = stats
        return out

    def timed(interval: int):
        t0 = time.perf_counter()
        df = build(interval)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        for h in getattr(df, "_persist_handles", ()):
            h.unpersist()
        return dt, df._stats.get("rounds")

    timed(1), timed(4)  # warm both paths (scan cache, codegen, ckpt dir)
    ts = {1: [], 4: []}
    rounds = None
    for _ in range(reps):
        for interval in (1, 4):
            dt, rounds = timed(interval)
            ts[interval].append(dt)
    out = {
        "query": "dedup_components (reliable=True)",
        "sf_dir": sf_dir,
        "reps": reps,
        "rounds": rounds,
        "interval1_min_s": round(min(ts[1]), 3),
        "interval4_min_s": round(min(ts[4]), 3),
        "interval1_all": [round(t, 3) for t in ts[1]],
        "interval4_all": [round(t, 3) for t in ts[4]],
        "speedup_interval4": round(min(ts[1]) / min(ts[4]), 3),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
