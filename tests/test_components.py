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
