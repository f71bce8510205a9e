"""Connected components over near-duplicate pair lists — the clustering
step that turns pairwise dedup output (MinHash/SimHash/embedding pairs)
into per-document keep/drop decisions: one canonical document per
component, everything else dropped.

Algorithm: iterative **min-label propagation**. Every node starts labeled
with its own id; each round, a node's label becomes the minimum of its own
and its neighbors' labels; at fixpoint every node carries the smallest id
in its component. Spark shape per round: one equi-join (edges x labels) +
one groupBy-min — both shuffle on node ids, with map-side partial
aggregation; ``localCheckpoint`` after every round cuts the lineage so the
plan stays O(1) deep regardless of iteration count.

Convergence is O(component diameter) rounds. Near-dup clusters are
shallow (a document, its variants, their variants — diameters of a few),
so propagation is the right default at any corpus size. For general
web-scale graphs with long chains, the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", public literature) converges in O(log n) rounds with the same
join+min building blocks — a drop-in upgrade documented here for when
diameters are unbounded.

Fixpoint detection uses the SUM of all labels: labels only ever decrease
(min of a set including the old value), and they are integers, so an
unchanged sum between rounds proves no label moved — one cheap aggregate
on the already-checkpointed frame instead of a self-join diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 30,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; ``component`` is the
    smallest node id reachable from it. Deterministic. Driver-side control
    flow only (one tiny aggregate per round); all data stays distributed.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels = labels.localCheckpoint()
    prev_sum = labels.agg(F.sum("label")).first()[0]
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # materializes AND cuts lineage each round
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:  # labels are monotone-decreasing integers
            break
        prev_sum = cur_sum
    else:
        raise ValueError(
            f"connected_components did not converge in {max_iterations} rounds "
            "(component diameter exceeds the bound — raise max_iterations or "
            "switch to large-star/small-star)"
        )
    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))


def canonical_documents(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 30,
) -> DataFrame:
    """Per-document dedup decision from a near-dup pair list:
    (doc_id, component, is_canonical, n_members). Documents that appear in
    no pair are their own singleton component (canonical by definition).
    The keep-set = rows with ``is_canonical`` true — the end-to-end
    "dedup this corpus" operator built from pairs + components.
    """
    comp = connected_components(pairs, max_iterations=max_iterations)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    labeled = (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
        # NOT broadcast: component count grows with the corpus (one row
        # per cluster) — a plain shuffle join; AQE may still broadcast it
        # when it is actually small
        .join(sizes, "component", "left")
        .select(
            id_col,
            "component",
            (F.col(id_col) == F.col("component")).alias("is_canonical"),
            F.coalesce(F.col("n_members"), F.lit(1)).cast("long").alias("n_members"),
        )
    )
    return labeled
