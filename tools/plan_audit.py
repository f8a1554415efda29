"""Catalog-wide physical-plan audit (round-11): join strategy, scan
pruning, and shuffle counts for every catalog entry — the two plan
dimensions no prior sweep covered mechanically.

Prior mechanical sweeps: sampling-pass (terminal sort over a Python
node), Expand+HLL granularity, double-referenced subtrees, terminal
sorts on pair plans.  This one parses each entry's physical plan
(pre-AQE, so explicit ``broadcast()`` hints are visible as
BroadcastHashJoin regardless of runtime sizes) and flags:

  * ``smj_bounded_dim``  — a SortMergeJoin whose plan also scans a
    semantically BOUNDED dimension (region: 5 rows, nation: 25 — fixed
    by the data model, not by sf).  At 100 TB those must be explicit
    broadcasts; AQE would usually save us locally, but the 1000-executor
    plan should not depend on runtime stats for a table whose size is a
    schema-level fact.
  * ``wide_scan``        — a fact-table scan (lineitem / orders /
    documents / embeddings / events) whose ReadSchema carries >= the
    full column set while the entry's output schema is narrow.  Full-row
    semantics (e.g. dedup returning whole rows) are legitimate; the
    audit prints, a human adjudicates.
  * ``cartesian``        — CartesianProduct (never acceptable) and
    BroadcastNestedLoopJoin (acceptable only for broadcast one-row /
    codebook frames — printed for adjudication).
  * ``exchanges``        — raw Exchange count, sorted, as a smell
    ranking (reuse / pre-aggregation opportunities).

Plan-only: entries are BUILT, not executed (model-table collects and
streaming replays that run at build time still run; that is their
documented construction cost).

Usage: python tools/plan_audit.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_data_pipeline_spark.plans import catalog  # noqa: E402
from tts_data_pipeline_spark.session import get_spark  # noqa: E402

BOUNDED_DIMS = ("region", "nation")
FACTS = ("lineitem", "orders", "documents", "embeddings", "events")

# full column counts of the test tables (TESTDATA.md)
TABLE_WIDTH = {
    "lineitem": 16,
    "orders": 9,
    "documents": None,  # filled from parquet at runtime
    "embeddings": None,
    "events": None,
}


def table_widths(spark, sf_dir: str) -> dict[str, int]:
    w = {}
    for t in FACTS:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            w[t] = len(spark.read.parquet(p).columns)
    return w


_PREFIX_RE = re.compile(r"^[\s:+|-]*")


def live_scan_split(plan: str) -> tuple[list[str], list[str]]:
    """Split FileScan lines into LIVE (executed per run) vs CACHED (inside an
    InMemoryRelation subtree — executed once at materialization).  Subtree
    membership is decided by tree indentation: a FileScan deeper than an
    open InMemoryRelation belongs to its cached build plan."""
    live, cached = [], []
    imr_stack: list[int] = []
    for ln in plan.splitlines():
        indent = len(_PREFIX_RE.match(ln).group(0))
        if not ln.strip():
            continue
        while imr_stack and indent <= imr_stack[-1]:
            imr_stack.pop()
        if "InMemoryRelation" in ln:
            imr_stack.append(indent)
            continue
        if "FileScan" in ln:
            m = re.search(r"/(\w+)\.parquet", ln)
            tab = m.group(1) if m else "?"
            (cached if imr_stack else live).append(tab)
    return live, cached


def _smj_over_bounded_dim(plan: str) -> bool:
    """True only when a LIVE FileScan of a bounded dim sits INSIDE a
    SortMergeJoin subtree — the actual 'SMJ over a broadcast-able dim'
    smell.  Cached-subtree scans (materialized once, not per-join) and
    bounded-dim scans feeding some other operator in the same plan do
    not count (r11 ADVICE: the old plan-wide co-occurrence check flagged
    false positives)."""
    imr_stack: list[int] = []
    smj_stack: list[int] = []
    for ln in plan.splitlines():
        if not ln.strip():
            continue
        indent = len(_PREFIX_RE.match(ln).group(0))
        while imr_stack and indent <= imr_stack[-1]:
            imr_stack.pop()
        while smj_stack and indent <= smj_stack[-1]:
            smj_stack.pop()
        if "InMemoryRelation" in ln:
            imr_stack.append(indent)
            continue
        if "SortMergeJoin" in ln:
            smj_stack.append(indent)
            continue
        if "FileScan" in ln and smj_stack and not imr_stack:
            m = re.search(r"/(\w+)\.parquet", ln)
            if m and m.group(1) in BOUNDED_DIMS:
                return True
    return False


def audit_plan(plan: str, widths: dict[str, int]) -> dict:
    rec: dict = {}
    rec["smj"] = plan.count("SortMergeJoin")
    rec["bhj"] = plan.count("BroadcastHashJoin")
    rec["bnlj"] = plan.count("BroadcastNestedLoopJoin")
    rec["cartesian"] = plan.count("CartesianProduct")
    rec["exchanges"] = plan.count("Exchange ")
    live, cached = live_scan_split(plan)
    rec["live_scans"] = dict(
        (t, live.count(t)) for t in sorted(set(live))
    )
    rec["cached_scans"] = dict(
        (t, cached.count(t)) for t in sorted(set(cached))
    )
    rec["scans"] = []
    # scan lines: "FileScan parquet [cols...] ... file:/.../table.parquet"
    for ln in plan.splitlines():
        if "FileScan parquet" not in ln:
            continue
        mcols = re.search(r"FileScan parquet \[([^\]]*)\]", ln)
        mtab = re.search(r"/(\w+)\.parquet", ln)
        if not (mcols and mtab):
            continue
        tab = mtab.group(1)
        ncols = len([c for c in mcols.group(1).split(",") if c.strip()])
        rec["scans"].append([tab, ncols])
    flags = []
    for tab, n in rec["live_scans"].items():
        if n >= 3 and tab in FACTS:
            flags.append(f"rescan:{tab}x{n}")
    if rec["cartesian"]:
        flags.append("cartesian")
    if rec["smj"] and _smj_over_bounded_dim(plan):
        flags.append("smj_bounded_dim")
    for tab, ncols in rec["scans"]:
        w = widths.get(tab)
        if w and ncols >= w and tab in FACTS:
            flags.append(f"wide_scan:{tab}")
    rec["flags"] = sorted(set(flags))
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    widths = table_widths(spark, sf_dir)
    qs = catalog.queries()
    out = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rec = audit_plan(plan, widths)
            rec["build_s"] = round(time.time() - t0, 2)
            out[name] = rec
        except Exception:
            out[name] = {"error": traceback.format_exc(limit=2).splitlines()[-1]}
    with open("/tmp/plan_audit.json", "w") as f:
        json.dump(out, f, indent=1)
    flagged = {k: v for k, v in out.items() if v.get("flags")}
    print(f"audited {len(out)} entries; {len(flagged)} flagged")
    for k, v in sorted(flagged.items()):
        print(f"  {k}: {v['flags']}  scans={v['scans']} smj={v['smj']} bhj={v['bhj']}")
    print("\ntop exchange counts:")
    ranked = sorted(
        ((v.get("exchanges", 0), k) for k, v in out.items() if "error" not in v),
        reverse=True,
    )[:15]
    for n, k in ranked:
        print(f"  {n:3d}  {k}")
    errs = {k: v["error"] for k, v in out.items() if "error" in v}
    if errs:
        print("\nerrors:")
        for k, e in errs.items():
            print(f"  {k}: {e}")


if __name__ == "__main__":
    main()
