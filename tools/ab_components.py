"""Interleaved same-session A/B of the ``dedup_components`` family
regression flagged in the round-6 verdict: the family read ~1.9x slower
than round 5 in every round-6 bench window (x1 2.62 -> 4.93 s) while its
input stage ``dedup_minhash`` improved — suspects were the handles-gated
persist change (68848d2), checkpoint-dir I/O, and session crowding.

Both arms run the full driver composition (minhash_near_duplicates ->
connected_components reliable=True interval=4) INTERLEAVED in ONE session
(cross-process A/Bs on this host are confounded by tenant-window drift —
CLAUDE.md), min-time per side, each rep stamped with hypervisor steal.
The OLD arm loads round 5's ``dedup.py`` AND ``components.py`` from git
into synthetic modules under the real package so relative imports
resolve (template: tools/ab_lsh_norm.py).

Usage: python tools/ab_components.py [reps] [old_rev]  (default 3, a27b284)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SCALE_MULT (x1).
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
    _scaled_mutant_docs,
    _session,
    _steal_pct,
)

R5_REV = "a27b284"


def _load_rev_module(rev: str, rel: str, alias: str):
    src = subprocess.run(
        ["git", "show", f"{rev}:openccnet_spark/operators/{rel}"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = os.path.join(tempfile.mkdtemp(prefix=f"ab-comp-{alias}-"), rel)
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        f"openccnet_spark.operators._{alias}_ab_old", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    old_rev = sys.argv[2] if len(sys.argv) > 2 else R5_REV
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    mult = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "1"))

    import openccnet_spark.operators.components as new_comp
    import openccnet_spark.operators.dedup as new_dedup

    old_dedup = _load_rev_module(old_rev, "dedup.py", "dedup")
    old_comp = _load_rev_module(old_rev, "components.py", "components")

    spark = _session(f"local[{cpus}]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def run(dedup_mod, comp_mod):
        handles: list = []
        stats: dict = {}
        s0 = _read_cpu_stat()
        t0 = time.perf_counter()
        pairs = dedup_mod.minhash_near_duplicates(
            _scaled_mutant_docs(spark, sf_dir, mult), persist=True, handles=handles
        )
        out = comp_mod.connected_components(
            pairs, reliable=True, checkpoint_interval=4, stats=stats,
            handles=handles,
        )
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        for h in handles:
            h.unpersist()
        return dt, _steal_pct(s0, _read_cpu_stat()), stats.get("rounds")

    run(new_dedup, new_comp)  # warm the session outside the A/B
    times = {"old": [], "new": []}
    steals = {"old": [], "new": []}
    rounds = {"old": None, "new": None}
    for _ in range(reps):
        for key, mods in (
            ("old", (old_dedup, old_comp)),
            ("new", (new_dedup, new_comp)),
        ):
            dt, st, nr = run(*mods)
            times[key].append(round(dt, 3))
            steals[key].append(round(st, 2))
            rounds[key] = nr
    best_old, best_new = min(times["old"]), min(times["new"])
    print(
        json.dumps(
            {
                "ab": "dedup_components minhash->propagation composition",
                "sf_dir": sf_dir,
                "mult": mult,
                "old_rev": old_rev,
                "old_sec": best_old,
                "new_sec": best_new,
                "new_over_old": round(best_new / best_old, 3),
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
