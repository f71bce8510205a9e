"""Solo A/B re-measure of the r03 bench regression suspects
(dedup_embedding_lsh, similarity_ann): OLD candidate-dedup plan
(distinct over (ids, qv/nv vectors) — the r02/r03 shape) vs NEW plan
(score-then-distinct on scalars only), interleaved A/B/A/B with min-time
per side under the SAME construction-inclusive timing bench.py uses.

Usage: python tools/ab_distinct.py [reps]   (default 4)
Prints one JSON line. Run on a quiet host — never concurrently with other
CPU work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from bench import _session  # noqa: E402
from openccnet_spark.operators import similarity as S  # noqa: E402


def lsh_ann_topk_old(df, query_ids, k=5, id_col="vec_id", vec_col="embedding", dim=64):
    """Pre-r04 shape: distinct BEFORE scoring, carrying qv/nv vectors."""
    planes = S._hyperplanes(dim)
    buckets = F.array(*[S.lsh_bucket_col(F.col(vec_col), planes, t) for t in range(S.N_TABLES)])
    tagged = df.select(F.col(id_col), F.col(vec_col), F.explode(buckets).alias("bucket"))
    q = tagged.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    c = tagged.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"
    )
    cand = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "nv")
        .distinct()
    )
    scored = cand.withColumn(
        "cos_milli", F.floor(S.cosine_col("qv", "nv") * 1000).cast("long")
    )
    return S._topk(scored, k)


def lsh_near_duplicates_old(df, threshold_milli=990, id_col="vec_id",
                            vec_col="embedding", dim=64, persist=False, handles=None):
    """Pre-r04 shape: distinct over (a, va, b, vb) before scoring."""
    planes = S._hyperplanes(dim)
    buckets = F.array(*[S.lsh_bucket_col(F.col(vec_col), planes, t) for t in range(S.N_TABLES)])
    tagged = df.select(F.col(id_col), F.col(vec_col), F.explode(buckets).alias("bucket"))
    if persist:
        tagged = tagged.persist()
        if handles is not None:
            handles.append(tagged)
    sized = S.oversized_bucket_filter(tagged, "bucket")
    a = sized.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
    b = sized.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "va", "b", "vb")
        .distinct()
    )
    return (
        cand.withColumn("cos_milli", F.floor(S.cosine_col("va", "vb") * 1000).cast("long"))
        .filter(F.col("cos_milli") >= threshold_milli)
        .select("a", "b", "cos_milli")
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(f"local[{cpus}]", cpus)

    def timed(build):
        t0 = time.perf_counter()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        for h in getattr(df, "_persist_handles", ()):
            h.unpersist()
        return dt

    def ann_old():
        return lsh_ann_topk_old(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"), query_ids=[0, 1, 2, 3, 4], k=5
        )

    def ann_new():
        return entry.queries()["similarity_ann"](spark, sf_dir)

    def lsh_old():
        handles: list = []
        out = lsh_near_duplicates_old(
            entry._doubled_embeddings(spark, sf_dir), threshold_milli=990,
            persist=True, handles=handles,
        )
        out._persist_handles = handles
        return out

    def lsh_new():
        return entry.queries()["dedup_embedding_lsh"](spark, sf_dir)

    results = {}
    for name, old, new in (("similarity_ann", ann_old, ann_new),
                           ("dedup_embedding_lsh", lsh_old, lsh_new)):
        # warm both plans once (scan caching, codegen) then interleave
        timed(old), timed(new)
        ts_old, ts_new = [], []
        for _ in range(reps):
            ts_old.append(timed(old))
            ts_new.append(timed(new))
        results[name] = {
            "old_min": round(min(ts_old), 3), "new_min": round(min(ts_new), 3),
            "old_all": [round(t, 3) for t in ts_old],
            "new_all": [round(t, 3) for t in ts_new],
            "speedup_old_over_new": round(min(ts_old) / min(ts_new), 3),
        }
    print(json.dumps({"ab": results, "sf_dir": sf_dir, "cpus": cpus, "reps": reps,
                      "method": "construction-inclusive min-time, interleaved A/B, warm"}))


if __name__ == "__main__":
    main()
