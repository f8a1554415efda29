"""Connected components over a pair list — turns near-duplicate PAIRS
(from MinHash/Jaccard/embedding-cosine candidates) into duplicate CLUSTERS,
so dedup can keep one survivor per cluster instead of per pair.

Algorithm: iterative min-label propagation (the alternating-star variant of
large-star/small-star): every node's label starts as its own id; each round
every node adopts the smallest label among itself and its neighbors; stop
when no label changes.  Converges in O(log n) rounds on real near-dup
graphs (components are tiny: duplicate families), each round is ONE
shuffle-join of labels against the symmetrized edge list — no driver-side
graph, no recursion depth tied to component diameter beyond the round
count.

The driver-side loop only checks a 1-row convergence aggregate per round
(a `changed` count), which is how Pregel-style iteration terminates on any
engine; the data never leaves the cluster."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(src, dst) pairs → (id, component) with component = min id reachable.

    Isolated nodes don't appear (a node with no pair is its own survivor
    trivially); callers union them back if needed.

    Known pathological input: a single giant component with large diameter
    (e.g. fuzzy-matching sequential ID-like strings, where #1↔#2↔…↔#n
    chain transitively) needs ~log2(diameter) rounds and per-round cost
    grows with component size; real near-dup graphs (small duplicate
    families) converge in a handful of rounds.  ``max_iterations`` bounds
    runtime; labels are then a valid UNDER-merge (never wrong merges)."""
    # Checkpointing truncates lineage each round — without it the plan
    # doubles per iteration and the driver dies on plan compilation alone
    # (the standard iterative-algorithm failure mode).  RELIABLE (disk)
    # checkpoints, not localCheckpoint: in-memory checkpoint blocks pile
    # up across rounds and tip over a small-heap driver/executor JVM,
    # while the frames here are tiny relative to any disk.  The INPUT is
    # checkpointed first so the symmetrizing union never embeds two copies
    # of the caller's (possibly deep) pair-generation plan.
    sc = pairs.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        import tempfile

        sc.setCheckpointDir(tempfile.mkdtemp(prefix="cc_checkpoint_"))
    pairs = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).checkpoint()
    edges = (
        pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .checkpoint()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .checkpoint()
    )
    prev_sum = None
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        # pointer jumping: also contract component → component[component];
        # plain neighbor propagation alone moves labels ONE hop per round
        # (diameter-bounded — a path of n nodes would need n rounds), the
        # jump halves path lengths for true O(log n) convergence
        parent = stepped.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_comp")
        )
        labels = (
            stepped.join(parent, stepped.component == parent.p_id, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_comp"), F.col("component")),
                ).alias("component"),
            )
            .checkpoint()
        )
        # join-free convergence check: labels only ever decrease, so the
        # label sum is strictly monotone until the fixpoint
        cur_sum = labels.agg(F.sum("component")).head()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
