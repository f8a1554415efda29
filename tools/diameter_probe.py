"""Component-diameter probe for the IVF CC round-growth law (PLANS.md).

The law: large-star/small-star CC converges in rounds ≈
ceil(log2(max component diameter)) + 1 (Kiveris et al. 2014), with the
catalog path sitting at the 2-round floor while duplicate families stay
partition-local (pre-contraction union-find).  Round 10 measured it
with an ad-hoc script; this tool makes each decade re-measurable in one
command:

    python tools/diameter_probe.py /tmp/scaledata/sf1 [--control]

Prints one JSON line: vectors, IVF pair count, component count,
largest component (size, diameter), max diameter over all components,
catalog CC rounds, and (with --control) the arbitrary-partitioning
rounds — the createDataFrame control that strips the verify join's
(cell, sub)-clustered partitioning and therefore shows the raw
O(log diam) climb the contraction otherwise hides.

Diameter is exact per component via double-BFS... actually double-BFS
is exact only on trees; on general graphs it is a lower bound whose
second sweep is the standard heuristic — for the law's decades we run
FULL BFS from every node of components up to ``_EXACT_CAP`` nodes
(exact eccentricity max) and double-BFS above it, reporting which.
"""

from __future__ import annotations

import json
import os
import sys
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_EXACT_CAP = 3000


def _bfs_far(adj: dict, start) -> tuple[int, int]:
    seen = {start: 0}
    q = deque([start])
    far, fard = start, 0
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in seen:
                seen[v] = seen[u] + 1
                if seen[v] > fard:
                    far, fard = v, seen[v]
                q.append(v)
    return far, fard


def component_stats(pairs: list[tuple[int, int]]) -> dict:
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    unvisited = set(adj)
    comps = []
    while unvisited:
        root = next(iter(unvisited))
        comp = {root}
        q = deque([root])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in comp:
                    comp.add(v)
                    q.append(v)
        unvisited -= comp
        comps.append(comp)
    max_diam, largest = 0, (0, 0)
    exact = True
    for comp in comps:
        if len(comp) == 1:
            d = 0
        elif len(comp) <= _EXACT_CAP:
            d = 0
            for u in comp:
                d = max(d, _bfs_far(adj, u)[1])
        else:
            exact = False
            u, _ = _bfs_far(adj, next(iter(comp)))
            _, d = _bfs_far(adj, u)  # double-BFS lower bound
        if len(comp) > largest[0]:
            largest = (len(comp), d)
        max_diam = max(max_diam, d)
    return {
        "components": len(comps),
        "largest": largest,
        "max_diam": max_diam,
        "diam_exact": exact,
    }


def main() -> None:
    global _EXACT_CAP
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/scaledata/sf1"
    control = "--control" in sys.argv
    if "--cap" in sys.argv:
        _EXACT_CAP = int(sys.argv[sys.argv.index("--cap") + 1])

    from tts_data_pipeline_spark.operators import components
    from tts_data_pipeline_spark.plans.coverage import (
        dedup_embedding_cosine_ivf,
    )
    from tts_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "diameter_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    pairs_df = dedup_embedding_cosine_ivf(spark, sf_dir).select(
        "id_a", "id_b"
    )
    pairs = [(r.id_a, r.id_b) for r in pairs_df.collect()]
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    print(f"collected {len(pairs)} pairs; computing diameters", flush=True)
    stats = component_stats(pairs)
    print(f"stats done: {stats}", flush=True)

    components.LAST_RUN_STATS["rounds"] = 0
    components.connected_components(
        pairs_df, require_converged=True, pre_contract=True
    ).write.format("noop").mode("overwrite").save()
    catalog_rounds = components.LAST_RUN_STATS["rounds"]

    control_rounds = None
    if control:
        # strip the verify join's bucket-clustered partitioning: a
        # createDataFrame round-trip gives arbitrary partitioning, so
        # pre-contraction finds no partition-local families and the raw
        # O(log diam) round count surfaces
        rebuilt = spark.createDataFrame(pairs, ["id_a", "id_b"]).repartition(
            32
        )
        components.LAST_RUN_STATS["rounds"] = 0
        components.connected_components(
            rebuilt, require_converged=True, pre_contract=True
        ).write.format("noop").mode("overwrite").save()
        control_rounds = components.LAST_RUN_STATS["rounds"]

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "vectors": n_vec,
                "ivf_pairs": len(pairs),
                **stats,
                "cc_rounds_catalog": catalog_rounds,
                "cc_rounds_control": control_rounds,
                # rounds ≈ ceil(log2(max diam)) + 1; (d-1).bit_length()
                # == ceil(log2(d)) for d ≥ 1
                "law_pred_rounds": (
                    (stats["max_diam"] - 1).bit_length() + 1
                    if stats["max_diam"] >= 1
                    else 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
