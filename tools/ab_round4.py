"""A/B measurements for the round-4 replans, interleaved min-time:

1. quality_quantiles: OLD per-language row_number sort window vs NEW
   bounded-domain histogram + linear fold, on documents scaled 6x
   (the window's cost is the per-language sort; the histogram's is a
   map-side-combined count — the gap should widen with input size and
   with per-language row count).
2. dedup_components: edges frame WITHOUT vs WITH the up-front
   repartition("dst") (per-round join-exchange elision).

Usage: python tools/ab_round4.py [reps]   (default 3)
Run on a quiet host; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from bench import _session  # noqa: E402
from openccnet_spark.operators import textstats as T  # noqa: E402


def quantiles_window(docs):
    """The pre-r04 plan shape (one reducer per language for the sort)."""
    q = T.quality_score_milli(F.coalesce(F.col("text"), F.lit("")))
    wnd = Window.partitionBy("lang").orderBy("q", "doc_id")
    ranked = (
        docs.select("lang", q.alias("q"), "doc_id")
        .withColumn("rn", F.row_number().over(wnd))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
    )
    aggs = [
        F.min(F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("q"))).alias(name)
        for p, name in ((0.5, "p50_milli"), (0.9, "p90_milli"), (0.99, "p99_milli"))
    ]
    return ranked.groupBy("lang").agg(*aggs)


def quantiles_hist(docs):
    """The r04 plan — the SAME builder the driver query ships
    (textstats.quality_quantiles_frame), so this A/B side cannot drift
    from the measured production plan."""
    from openccnet_spark.operators.textstats import quality_quantiles_frame

    return quality_quantiles_frame(docs)


def components_variant(spark, sf_dir, prepartition: bool):
    from openccnet_spark.operators.dedup import minhash_near_duplicates

    import __spark_entry__ as entry

    handles: list = []
    pairs = minhash_near_duplicates(
        entry._mutant_docs(spark, sf_dir), persist=True, handles=handles
    )
    # inline propagation with/without the dst pre-partition
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    if prepartition:
        edges = edges.repartition("dst")
    edges = edges.persist()
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    prev = labels.agg(F.sum("label")).first()[0]
    for _ in range(30):
        nbr = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nl"))
        )
        labels = labels.join(nbr, labels.node == nbr.src, "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nl"), F.col("label"))).alias("label"),
        ).localCheckpoint()
        cur = labels.agg(F.sum("label")).first()[0]
        if cur == prev:
            break
        prev = cur
    edges.unpersist()
    out = labels.select("node", F.col("label").alias("component"))
    out._persist_handles = handles
    return out


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(f"local[{cpus}]", cpus)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    docs6 = base
    for k in range(1, 6):
        docs6 = docs6.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + k * 1_000_000)
        )
    docs6 = docs6.persist()
    docs6.count()

    def timed(build):
        t0 = time.perf_counter()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        for h in getattr(df, "_persist_handles", ()):
            h.unpersist()
        return dt

    results = {}
    for name, old, new in (
        ("quality_quantiles_x6",
         lambda: quantiles_window(docs6), lambda: quantiles_hist(docs6)),
        ("dedup_components",
         lambda: components_variant(spark, sf_dir, False),
         lambda: components_variant(spark, sf_dir, True)),
    ):
        timed(old), timed(new)  # warm both
        ts_old, ts_new = [], []
        for _ in range(reps):
            ts_old.append(timed(old))
            ts_new.append(timed(new))
        results[name] = {
            "old_min": round(min(ts_old), 3), "new_min": round(min(ts_new), 3),
            "old_all": [round(t, 3) for t in ts_old],
            "new_all": [round(t, 3) for t in ts_new],
            "speedup": round(min(ts_old) / min(ts_new), 3),
        }
    docs6.unpersist()
    print(json.dumps({"ab": results, "sf_dir": sf_dir, "cpus": cpus, "reps": reps}))


if __name__ == "__main__":
    main()
