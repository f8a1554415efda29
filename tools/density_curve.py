"""User-density decade for the LPA co-occurrence pair build (round-11).

The r10 verdict's top item: `graph_label_propagation_converged`'s
co-occurrence self-join buckets on (event_type, hour) — a key whose
COUNT grows with the corpus's time span but whose per-bucket mass grows
with user DENSITY (event-type count is fixed), so k× users in the same
hours means k² per-bucket pair mass with nothing bounding the per-task
work.  Round-11 grid-blocks the join through
``operators.pairgrid.adaptive_grid_pair_join`` (absolute mode:
S_b = ceil(n_b / target_rows), so per-cell pair mass is capped at
~target_rows² whatever the density).

This harness measures that claim on the ``/tmp/scaledata/dens-{2,4,8}``
tiles (``gen_scale_data --extra``: k user-id-offset copies of the sf0.1
events table — same timestamps, same event types, so bucket count is
CONSTANT and users-per-bucket is exactly ×k):

- ``pair_build`` — the edge build alone (``conv_cooccur_edges`` →
  noop sink), grid ON (shipped dials) and grid OFF
  (``spark.graft.pairgrid.s_max=1`` → every S_b = 1, i.e. the plain
  bucketed join round 10 shipped).  Identical edge COUNT both ways
  (asserted) — the dials are physical-only.
- ``full_entry`` — the whole catalog entry (pair build + LPA rounds to
  the fixpoint), grid ON, at k ≤ 4 (the k=8 graph is ~64× the base
  edge mass; the pair stage is the object under test).

Inherent mass law: the densified graph's EDGE COUNT itself grows ~k²
(every cross-copy user pair co-occurs exactly like its source pair), so
time ∝ k² is the floor for exact co-occurrence semantics — the claim
under test is mass-PROPORTIONALITY (time ratio ≈ pair-mass ratio ≈ k²,
slope ≈ 2 in k), not sublinearity; sublinear needs approximate
semantics, which is the IVF-twin story one family over.

Usage: python tools/density_curve.py [--runs 2] [--full-max-k 4]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_data_pipeline_spark.plans import catalog, graphops  # noqa: E402
from tts_data_pipeline_spark.session import get_spark  # noqa: E402

DENS = [
    (1, "/tmp/scaledata/sf0.1"),
    (2, "/tmp/scaledata/dens-2"),
    (4, "/tmp/scaledata/dens-4"),
    (8, "/tmp/scaledata/dens-8"),
    # hot-BUCKET control (gen_scale_data._hotspot_events: 30% of the
    # dens-4 events remapped to ONE (event_type, hour)): the uniform
    # tiles never make a single bucket hot enough to hurt a 32-core
    # host, so this is where grid-vs-nogrid separates — the plain join
    # runs the hot bucket's Θ(n²) mass on ONE task.  k is nominal.
    ("4hot", "/tmp/scaledata/dens-4hot"),
    # the PLANS.md control point: 12k users in ONE bucket (~72M pairs
    # on a single join key) — grid vs plain at the worst tile
    ("8hot", "/tmp/scaledata/dens-8hot"),
]


def main() -> None:
    runs = 2
    full_max_k = 4
    args = sys.argv[1:]
    while args:
        if args[0] == "--runs":
            runs = int(args[1])
        elif args[0] == "--full-max-k":
            full_max_k = int(args[1])
        args = args[2:]

    spark = get_spark(
        "density_curve", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    # warm the session so the k=1 point doesn't pay JVM startup
    catalog.queries()["q1_pricing_summary"](spark, DENS[0][1]).write.format(
        "noop"
    ).mode("overwrite").save()

    results: dict[str, dict[int, float]] = {
        "pair_grid": {},
        "pair_nogrid": {},
        "full_entry": {},
    }
    edge_counts: dict[int, int] = {}
    for k, d in DENS:
        if not os.path.isdir(d):
            print(f"missing {d} — run gen_scale_data --extra", flush=True)
            continue
        for mode in ("pair_grid", "pair_nogrid"):
            if mode == "pair_nogrid":
                spark.conf.set("spark.graft.pairgrid.s_max", "1")
            best, n_edges = math.inf, None
            try:
                for _ in range(runs):
                    t0 = time.time()
                    e = graphops.conv_cooccur_edges(spark, d)
                    e.write.format("noop").mode("overwrite").save()
                    best = min(best, time.time() - t0)
                # one extra pass for the physical-only identity check
                n_edges = graphops.conv_cooccur_edges(spark, d).count()
            finally:
                if mode == "pair_nogrid":
                    spark.conf.unset("spark.graft.pairgrid.s_max")
            results[mode][k] = round(best, 2)
            if k in edge_counts:
                assert edge_counts[k] == n_edges, (
                    f"grid changed the edge set at k={k}: "
                    f"{edge_counts[k]} vs {n_edges}"
                )
            edge_counts[k] = n_edges
        if isinstance(k, int) and k <= full_max_k:
            best = math.inf
            for _ in range(runs):
                t0 = time.time()
                catalog.queries()["graph_label_propagation_converged"](
                    spark, d
                ).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results["full_entry"][k] = round(best, 2)
        print(
            json.dumps(
                {
                    "k": k,
                    "edges": edge_counts.get(k),
                    **{m: results[m].get(k) for m in results},
                }
            ),
            flush=True,
        )

    print("\n| k | edges | pair grid s | pair no-grid s | full entry s |")
    print("|---|---|---|---|---|")
    for k, _ in DENS:
        if k not in results["pair_grid"]:
            continue
        print(
            f"| {k} | {edge_counts.get(k)} | {results['pair_grid'][k]} "
            f"| {results['pair_nogrid'][k]} "
            f"| {results['full_entry'].get(k, '—')} |"
        )


if __name__ == "__main__":
    main()
