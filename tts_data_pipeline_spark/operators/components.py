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

import atexit
import os
import shutil
import tempfile

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
    runtime; labels are then a valid UNDER-merge (never wrong merges).

    Iteration state: each round's labels are persisted to a per-call temp
    parquet dir and read back — the same lineage truncation a reliable
    ``checkpoint()`` gives (without it the plan doubles per iteration and
    the driver dies on plan compilation alone), but with EXPLICIT file
    lifecycle: round i-1's files are deleted as soon as round i is
    written, the edge/pair state is deleted when the loop ends, and the
    final labels dir (the only thing the returned frame reads) is removed
    at interpreter exit.  Spark's reliable checkpoints default to
    never-cleaned files (``spark.cleaner.referenceTracking.cleanCheckpoints``
    is off and can't be enabled on a live context), which leaked disk
    unboundedly across repeated calls in a long session.  The INPUT is
    persisted first so the symmetrizing union never embeds two copies of
    the caller's (possibly deep) pair-generation plan.
    """
    spark = pairs.sparkSession
    workdir = tempfile.mkdtemp(prefix="cc_state_")
    atexit.register(shutil.rmtree, workdir, ignore_errors=True)

    def _persist(df: DataFrame, name: str) -> DataFrame:
        path = os.path.join(workdir, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    pairs = _persist(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")), "pairs"
    )
    edges = _persist(
        pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct(),
        "edges",
    )
    labels = _persist(
        edges.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component")),
        "labels_0",
    )
    prev_sum = None
    last_round = 0
    for i in range(1, max_iterations + 1):
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
        labels = _persist(
            stepped.join(parent, stepped.component == parent.p_id, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("p_comp"), F.col("component")),
                ).alias("component"),
            ),
            f"labels_{i}",
        )
        shutil.rmtree(os.path.join(workdir, f"labels_{i - 1}"), ignore_errors=True)
        last_round = i
        # join-free convergence check: labels only ever decrease, so the
        # label sum is strictly monotone until the fixpoint
        cur_sum = labels.agg(F.sum("component")).head()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # only the final labels dir has a live reader (the returned frame);
    # everything else is loop-internal state
    for name in ("pairs", "edges"):
        shutil.rmtree(os.path.join(workdir, name), ignore_errors=True)
    for i in range(last_round):
        shutil.rmtree(os.path.join(workdir, f"labels_{i}"), ignore_errors=True)
    return labels
