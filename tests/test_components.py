"""Connected-components operator: cluster shapes and convergence."""

from __future__ import annotations

from tts_data_pipeline_spark.operators.components import connected_components


def test_chain_and_separate_components(spark):
    # chain 1-2-3-4 (one component), pair 10-11 (another)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    out = {r.id: r.component for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_star_and_cycle(spark):
    # star centered at 7 plus a cycle 20-21-22-20 — both resolve to min id
    pairs = spark.createDataFrame(
        [(7, 8), (7, 9), (7, 6), (20, 21), (21, 22), (22, 20)],
        ["id_a", "id_b"],
    )
    out = {r.id: r.component for r in connected_components(pairs).collect()}
    assert out[6] == out[7] == out[8] == out[9] == 6
    assert out[20] == out[21] == out[22] == 20


def test_long_path_converges_within_iterations(spark):
    # path of 40 nodes: min-label needs several rounds; must converge < 20
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["id_a", "id_b"]
    )
    out = {r.id: r.component for r in connected_components(pairs).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 41


def test_random_graphs_match_union_find(spark):
    """Property: on random graphs, the distributed large-star/small-star
    labels must equal a sequential union-find's min-label components."""
    import random

    def union_find_labels(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # min reachable id per node, only for nodes with >=1 edge
        touched = {u for e in edges for u in e}
        out = {}
        for x in touched:
            r = find(x)
            out[x] = min(y for y in touched if find(y) == r)
        return out

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(10, 80))
            }
        )
        expected = union_find_labels(n, edges)
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r.id: r.component
            for r in connected_components(df).collect()
        }
        assert got == expected, (trial, edges)


def test_require_converged_raises_at_cap_and_stats_record(spark):
    """A capped (non-converged) run must fail loudly when the caller
    requires the exact closure, and LAST_RUN_STATS reports rounds +
    convergence for the scaling harness."""
    import pytest

    from tts_data_pipeline_spark.operators import components as C

    # a 60-node path needs >1 star round; cap at 1 and demand convergence
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="under-merge"):
        connected_components(
            pairs, max_iterations=1, require_converged=True
        ).collect()
    assert C.LAST_RUN_STATS == {"rounds": 1, "converged": False}

    out = {r.id: r.component for r in connected_components(pairs).collect()}
    assert set(out.values()) == {0}
    assert C.LAST_RUN_STATS["converged"] is True
    assert 1 < C.LAST_RUN_STATS["rounds"] <= 20
