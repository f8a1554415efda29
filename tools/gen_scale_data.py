"""Generate sf0.3 / sf1 test tables for scaling-curve measurement.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md, read-only).  To
measure how the engine's plans scale BEYOND sf0.1 we synthesize larger
tables by tiling sf0.1 K times with consistent key offsets — foreign keys
stay valid (orderkey/custkey/partkey/suppkey shift together), attribute
distributions are preserved exactly, and row counts scale linearly, which
is what a scaling-exponent fit needs.  Two deterministic perturbations
keep the content tables honest:

- ``documents.text``: each copy k>0 rewrites ~30% of words (seeded RNG,
  vocabulary drawn from the corpus itself), so exact/near-dup structure
  grows like a real corpus (constant dup RATE) instead of every copy
  colliding with copy 0 (which would grow dup pair counts quadratically
  in K and poison the dedup slopes);
- ``embeddings.embedding``: per-copy Gaussian noise at 0.5x the component
  std, so cosine-similarity structure within a copy is preserved while
  cross-copy near-identical pairs don't accumulate.

Usage:  python tools/gen_scale_data.py [outdir]   (default /tmp/scaledata)
Writes ``{outdir}/sf0.3`` (K=3) and ``{outdir}/sf1`` (K=10).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEY_OFF = 10_000_000  # larger than any sf0.1 key

# (table, [key columns to offset per copy])
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}
FIXED_DIMS = ["region", "nation"]


def _tile_keyed(name: str, k_copies: int, outdir: str) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    copies = []
    for k in range(k_copies):
        c = t
        for col in KEYED[name]:
            i = c.schema.get_field_index(col)
            arr = pa.compute.add(c.column(col), k * KEY_OFF)
            c = c.set_column(i, c.schema.field(col), arr)
        copies.append(c)
    pq.write_table(pa.concat_tables(copies), f"{outdir}/{name}.parquet")


def _tile_documents(k_copies: int, outdir: str) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
    vocab = sorted({w for txt in t["text"] for w in txt.split() if w})
    out = {c: [] for c in ("doc_id", "text", "lang", "source", "n_chars")}
    for k in range(k_copies):
        rng = np.random.default_rng(42 + k)
        for i, txt in enumerate(t["text"]):
            if k == 0:
                new = txt
            else:
                words = txt.split(" ")
                mask = rng.random(len(words)) < 0.3
                picks = rng.integers(0, len(vocab), len(words))
                new = " ".join(
                    vocab[picks[j]] if mask[j] else w
                    for j, w in enumerate(words)
                )
            out["doc_id"].append(t["doc_id"][i] + k * KEY_OFF)
            out["text"].append(new)
            out["lang"].append(t["lang"][i])
            out["source"].append(t["source"][i])
            out["n_chars"].append(len(new))
    pq.write_table(
        pa.table(
            out,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        f"{outdir}/documents.parquet",
    )


def _tile_embeddings(k_copies: int, outdir: str) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(t.column("label").to_pylist(), dtype=np.int32)
    ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    sigma = 0.5 * float(vecs.std())
    all_ids, all_vecs, all_labels = [], [], []
    for k in range(k_copies):
        rng = np.random.default_rng(142 + k)
        v = vecs if k == 0 else (
            vecs + rng.normal(0.0, sigma, vecs.shape).astype(np.float32)
        )
        all_ids.append(ids + k * KEY_OFF)
        all_vecs.append(v)
        all_labels.append(labels)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.concatenate(all_ids),
                "embedding": pa.array(
                    [list(map(float, r)) for r in np.concatenate(all_vecs)],
                    type=pa.list_(pa.float32()),
                ),
                "label": np.concatenate(all_labels),
            }
        ),
        f"{outdir}/embeddings.parquet",
    )


def generate(outdir: str, k_copies: int) -> None:
    os.makedirs(outdir, exist_ok=True)
    for name in FIXED_DIMS:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{outdir}/{name}.parquet"
        )
    for name in KEYED:
        _tile_keyed(name, k_copies, outdir)
    _tile_documents(k_copies, outdir)
    _tile_embeddings(k_copies, outdir)
    print(f"wrote {outdir} (K={k_copies})")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata"
    generate(os.path.join(base, "sf0.3"), 3)
    generate(os.path.join(base, "sf1"), 10)
