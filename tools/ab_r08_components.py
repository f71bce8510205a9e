"""Round-8 interleaved A/B: observed-metrics convergence digest
(step_digest — digest folded into each round's checkpoint job) vs the
separate-digest-job module, in ONE session (cross-process A/Bs on this
host are confounded by tenant-window drift — CLAUDE.md). Old module
loaded from git under the real package name.

Usage: python tools/ab_r08_components.py [reps] [old_rev] [which]
  which: star | prop (default star)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_MULT.
Prints one JSON line.
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
    _scaled_mutant_docs,
    _session,
    _steal_pct,
)


def _load_old(rev: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:openccnet_spark/operators/components.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = os.path.join(tempfile.mkdtemp(prefix="ab-r08c-old-"), "components_old.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        "openccnet_spark.operators._components_r08c_old", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    old_rev = sys.argv[2] if len(sys.argv) > 2 else "a4b7758"
    which = sys.argv[3] if len(sys.argv) > 3 else "star"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "6"))
    import openccnet_spark.operators.components as new_mod
    from openccnet_spark.operators.dedup import minhash_near_duplicates

    old_mod = _load_old(old_rev)
    spark = _session(f"local[{cpus}]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run(mod, stats):
        # mirrors bench._scale_family_queries's components runner exactly
        handles: list = []
        pairs = minhash_near_duplicates(
            _scaled_mutant_docs(spark, sf_dir, mult), persist=True, handles=handles
        )
        if which == "star":
            out = mod.connected_components_star(
                pairs, reliable=True, checkpoint_interval=1, stats=stats
            )
        else:
            out = mod.connected_components(
                pairs, reliable=True, checkpoint_interval=4, stats=stats,
                handles=handles,
            )
        out.write.format("noop").mode("overwrite").save()
        for h in handles:
            h.unpersist()

    warm_stats: dict = {}
    run(new_mod, warm_stats)  # warm the session outside the A/B
    times = {"old": [], "new": []}
    steals = {"old": [], "new": []}
    rounds = {"old": None, "new": None}
    for _ in range(reps):
        for key, mod in (("old", old_mod), ("new", new_mod)):
            stats: dict = {}
            s0 = _read_cpu_stat()
            t0 = time.perf_counter()
            run(mod, stats)
            times[key].append(round(time.perf_counter() - t0, 3))
            steals[key].append(round(_steal_pct(s0, _read_cpu_stat()), 2))
            rounds[key] = stats.get("rounds")
    best_old, best_new = min(times["old"]), min(times["new"])
    print(
        json.dumps(
            {
                "ab": f"r08 step_digest {which}",
                "sf_dir": sf_dir,
                "mult": mult,
                "old_rev": old_rev,
                "old_sec": best_old,
                "new_sec": best_new,
                "speedup": round(best_old / best_new, 3),
                "rounds": rounds,
                "times": times,
                "steal_pct": steals,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
