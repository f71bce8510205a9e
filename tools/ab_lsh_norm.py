"""Solo A/B of the round-6 carried-norm optimization in
``lsh_near_duplicates``: the per-candidate-pair cosine as three 64-element
folds (dot + two inline norms — the r5 shape) vs one fold + precomputed
norms carried from the Arrow tagging stage (the shipped r6 shape).

Both variants run INTERLEAVED in ONE session (cross-process A/Bs on this
host are confounded by tenant-window drift — CLAUDE.md), min-time per
side, each rep stamped with hypervisor steal. The OLD variant is loaded
from git (``git show <rev>:openccnet_spark/operators/similarity.py``)
into a synthetic module under the real package so its relative imports
resolve; its nested mapInPandas closures cloudpickle by value, so workers
never need the synthetic module on disk.

Usage: python tools/ab_lsh_norm.py [reps] [old_rev]   (default 3, HEAD)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_MULT (x6).
Prints one JSON line. Run on a quiet host.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    _read_cpu_stat,
    _scaled_embeddings,
    _session,
    _steal_pct,
)


def _load_old(rev: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:openccnet_spark/operators/similarity.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = os.path.join(tempfile.mkdtemp(prefix="ab-lsh-old-"), "similarity_old.py")
    with open(path, "w") as f:
        f.write(src)
    # name the module under the real package so `from .dedup import ...`
    # resolves against the installed (current) dedup module
    spec = importlib.util.spec_from_file_location(
        "openccnet_spark.operators._similarity_ab_old", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    from pyspark.sql import functions as F

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    old_rev = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "6"))
    import openccnet_spark.operators.similarity as new_mod

    old_mod = _load_old(old_rev)
    spark = _session(f"local[{cpus}]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run(mod):
        emb = _scaled_embeddings(spark, sf_dir, mult)
        doubled = emb.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + 50_000_000)
        )
        handles: list = []
        s0 = _read_cpu_stat()
        t0 = time.perf_counter()
        out = mod.lsh_near_duplicates(
            doubled, threshold_milli=990, persist=True, handles=handles
        )
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        for h in handles:
            h.unpersist()
        return dt, _steal_pct(s0, _read_cpu_stat())

    run(new_mod)  # warm the session (scan caches, codegen) outside the A/B
    times = {"old": [], "new": []}
    steals = {"old": [], "new": []}
    for _ in range(reps):
        for key, mod in (("old", old_mod), ("new", new_mod)):
            dt, st = run(mod)
            times[key].append(round(dt, 3))
            steals[key].append(round(st, 2))
    best_old, best_new = min(times["old"]), min(times["new"])
    print(
        json.dumps(
            {
                "ab": "lsh_near_duplicates carried-norm verify",
                "sf_dir": sf_dir,
                "mult": mult,
                "old_rev": old_rev,
                "old_sec": best_old,
                "new_sec": best_new,
                "speedup": round(best_old / best_new, 3),
                "times": times,
                "steal_pct": steals,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
