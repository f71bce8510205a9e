"""Round-8 interleaved A/B: Phase-C LSH rewrite (compact tagging +
pair-first verify) vs the pre-round-8 module, in ONE session (cross-
process A/Bs on this host are confounded by tenant-window drift —
CLAUDE.md). Old module loaded from git under the real package name so
relative imports resolve; nested mapInPandas closures cloudpickle by
value, so workers never need it on disk.

Usage: python tools/ab_r08_lsh.py [reps] [old_rev] [which]
  which: lsh | ann | decon (default lsh)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_MULT.
Prints one JSON line per target.
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
    path = os.path.join(tempfile.mkdtemp(prefix="ab-r08-old-"), "similarity_old.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        "openccnet_spark.operators._similarity_r08_old", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    from pyspark.sql import functions as F

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    old_rev = sys.argv[2] if len(sys.argv) > 2 else "5727a0d"
    which = sys.argv[3] if len(sys.argv) > 3 else "lsh"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "6"))
    import openccnet_spark.operators.similarity as new_mod

    old_mod = _load_old(old_rev)
    spark = _session(f"local[{cpus}]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def doubled_emb():
        emb = _scaled_embeddings(spark, sf_dir, mult)
        return emb.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + 50_000_000)
        )

    def run_lsh(mod):
        handles: list = []
        out = mod.lsh_near_duplicates(
            doubled_emb(), threshold_milli=990, persist=True, handles=handles
        )
        out.write.format("noop").mode("overwrite").save()
        for h in handles:
            h.unpersist()

    def run_ann(mod):
        out = mod.lsh_ann_topk(
            _scaled_embeddings(spark, sf_dir, mult), query_ids=[0, 1, 2, 3, 4], k=5
        )
        out.write.format("noop").mode("overwrite").save()

    def run_decon(mod):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        corpus = emb.unionByName(emb.withColumn("vec_id", F.col("vec_id") + 100000))
        eval_df = emb.filter(F.col("vec_id") % 7 == 0)
        handles: list = []
        out = mod.semantic_decontaminate(
            corpus, eval_df, persist=True, handles=handles
        )
        out.write.format("noop").mode("overwrite").save()
        for h in handles:
            h.unpersist()

    runner = {"lsh": run_lsh, "ann": run_ann, "decon": run_decon}[which]
    runner(new_mod)  # warm the session outside the A/B
    times = {"old": [], "new": []}
    steals = {"old": [], "new": []}
    for _ in range(reps):
        for key, mod in (("old", old_mod), ("new", new_mod)):
            s0 = _read_cpu_stat()
            t0 = time.perf_counter()
            runner(mod)
            times[key].append(round(time.perf_counter() - t0, 3))
            steals[key].append(round(_steal_pct(s0, _read_cpu_stat()), 2))
    best_old, best_new = min(times["old"]), min(times["new"])
    print(
        json.dumps(
            {
                "ab": f"r08 phase-C {which}",
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
