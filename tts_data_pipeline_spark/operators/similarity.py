"""Similarity search over embedding columns (``array<float>``).

Driver-mandated extension.  Two paths:

- **Brute-force cosine top-k** — the correctness baseline: broadcast the
  (small) query set, crossJoin, dot product as a codegen'd ``zip_with`` +
  ``aggregate`` fold (double accumulator, sequential — matches DuckDB's
  ``list_dot_product`` bit-for-bit), top-k per query via ``row_number``.
  Cost O(|Q|·N) — fine when |Q| is small and broadcastable.

- **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (deterministic seed), candidates = rows sharing a signature prefix bucket,
  brute-force only within buckets.  Recall < 1 by construction; rows-only
  checked.  At 100 TB the bucket join is one shuffle on the signature key
  instead of a full crossJoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine_sim, rank).

    The ranking uses the ROUNDED similarity plus the neighbor id as a total
    tiebreak so results are engine-reproducible (floating-point ranking with
    no tiebreak is run-dependent at the boundary).
    """
    # norms are per-vector: compute them on the n + |Q| input rows, not on
    # the |Q|·n scored pairs (bit-identical floats — same sequential fold —
    # at a third of the per-pair fold work)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnrm"),
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        l2_norm(F.col(vec_col)).alias("nnrm"),
    )
    sim = F.round(
        dot(F.col("qvec"), F.col("nvec")) / (F.col("qnrm") * F.col("nnrm")),
        round_dp,
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplane_signature(vec_col: str, n_planes: int = 12, dim: int = 64, seed: int = 42):
    """Random-hyperplane sign signature as a pandas UDF (deterministic seed).

    numpy matmul over the Arrow batch — one GEMV per batch, far cheaper than
    a per-plane Catalyst expression tree at dim×planes scale.
    """

    @F.pandas_udf(T.LongType())
    def _sig(vecs):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((dim, n_planes))
        out = []
        for v in vecs:
            if v is None or len(v) != dim:
                out.append(-1)
                continue
            signs = (np.asarray(v, dtype=np.float64) @ planes) > 0
            out.append(int(signs.dot(1 << np.arange(n_planes))))
        return pd.Series(out, dtype="int64")

    return _sig(F.col(vec_col))


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell assignment — the shared front half of :func:`ivf_topk` and
    the IVF-bucketed dedup (``dedup_embedding_cosine_ivf``).

    Output: ``(vec_id, v, nrm, cell, scored)`` where ``cell`` is the id of
    the nearest codebook vector (cosine argmax, ties to smallest cid) and
    ``scored`` is the per-centroid score array (kept for multi-probe).

    Codebook = the ``n_centroids`` vectors with smallest
    ``(md5(vec_id), vec_id)`` — a deterministic pseudo-random sample whose
    size does not grow with n — collapsed to ONE row and broadcast; each
    vector computes its argmax inside codegen.  ZERO shuffle of the big
    side — no n×k join rows ever materialize."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    cent = (
        e.orderBy(F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("ncv"),
        )
    )
    # one row holding the whole codebook -> broadcast nested-loop, no shuffle
    cent1 = cent.agg(F.collect_list(F.struct("cid", "cv", "ncv")).alias("cents"))

    scored_cells = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (
                dot(F.col("v"), c["cv"])
                / F.greatest(F.col("nrm") * c["ncv"], F.lit(1e-12))
            ).alias("sim"),
            (-c["cid"]).alias("nc"),
            c["cid"].alias("cid"),
        ),
    )
    # stage the scored array as an attribute BEFORE referencing it twice —
    # inlining it into both the argmax and the probe sort would evaluate the
    # k cosine folds twice per row (Column trees are not DAGs)
    return (
        e.crossJoin(F.broadcast(cent1))
        .select("vec_id", "v", "nrm", scored_cells.alias("scored"))
        .select(
            "vec_id",
            "v",
            "nrm",
            F.array_max("scored")["cid"].alias("cell"),
            "scored",
        )
    )


# Broadcast ceiling for the member codebook, in estimated bytes.  The
# 65536-cell clamp paragraph (plans/sketches.py) measured the broadcast
# member table workable up to ~32 MB; past that the distributed
# sort-merge fetch is the named lift.  32 MB is therefore the crossover:
# with dim=64 embeddings (8·64 + 24 ≈ 536 B/centroid) the policy flips
# to "distributed" at k ≈ 62.6k — i.e. exactly at the current
# _SEMDEDUP_KMAX clamp (65536, ~33.5 MB) and nowhere below it, so every
# shipped sf keeps the measured-faster broadcast plan and a clamp lift
# automatically switches strategy instead of oversizing a broadcast.
# default of the spark.graft.codebook.broadcast_max_mb conf dial
# (tts_data_pipeline_spark.conf) — ivf_assign_hier's "auto" path reads
# the dial at build time so a deployment retunes the crossover without
# editing source; identical assignments either side (physical-only).
from tts_data_pipeline_spark.conf import CODEBOOK_BROADCAST_MAX_MB as _CB_DIAL

CODEBOOK_BROADCAST_MAX_BYTES = _CB_DIAL[1] * 1024 * 1024


def codebook_strategy(
    k: int, dim: int, threshold_bytes: int = CODEBOOK_BROADCAST_MAX_BYTES
) -> str:
    """AQE-style physical-strategy pick for the member-codebook fetch:
    ``"broadcast"`` while the estimated codebook size — k centroids of
    ``dim`` doubles plus per-row id/norm overhead — fits under
    ``threshold_bytes``, else ``"distributed"`` (sort-merge keyed on the
    super id).  Size-based like Spark's own broadcast-join threshold,
    decided from the k the cell policy already computed rather than a
    runtime statistic (k·dim is exact here, not an estimate).  Both
    strategies produce identical assignments (pinned hash-equal in
    tests/test_sketches.py); this chooses only the physical plan."""
    est_bytes = k * (dim * 8 + 24)
    return "broadcast" if est_bytes <= threshold_bytes else "distributed"


def ivf_assign_hier(
    embeddings: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: str = "broadcast",
    nprobe_super: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """TWO-LEVEL (hierarchical coarse-quantizer) IVF cell assignment —
    the Θ(n·√k) form of :func:`ivf_assign` for DATA-SCALED cell counts,
    where the flat argmax's Θ(n·k) becomes the named superlinear segment
    (k ∝ n ⇒ Θ(n²/c)); this is the faiss two-level coarse-quantizer
    shape (`quantizer=IndexIVF...`), replayed relationally.

    Output: ``(vec_id, v, nrm, cell, centroid_sim)`` where ``cell`` is
    the chosen centroid id and ``centroid_sim`` the ROUNDED (6dp) cosine
    to it.

    Mechanics (every argmax ties to the smallest id, so a SQL oracle can
    replay assignment row for row):

    - **Codebook** = the ``k`` vectors with smallest ``(md5(vec_id),
      vec_id)``; **super-codebook** = the first ``k1 = ceil(√k)`` of the
      SAME ordering (two ``TakeOrderedAndProject``s, no window).
    - **Centroid grouping**: each of the k centroids is assigned to its
      nearest super-centroid (broadcast argmax over k1 — Θ(k·√k), paid
      once, not per data row).
    - **Vector assignment**: argmax over the k1 supers, then a broadcast
      equi-join on the chosen super id fetches THAT group's member
      centroids (expected √k of them), then argmax over the members —
      Θ(√k + members) dot folds per row, all inside codegen; the big
      side never shuffles.
    - The join output copies the member array (~√k · dim doubles) into
      each row — bytes, not dot products; at k = 65536/dim = 64 that is
      ~130 KB against the ~√k·dim fused multiply-adds the flat form
      would spend on the SAME row, and it stays off the shuffle.

    Trade vs flat: a vector whose true nearest centroid lives in a
    DIFFERENT super-group than its nearest super-centroid is assigned to
    a second-best cell — the standard coarse-quantizer recall trade
    (the pair stage downstream is what bounds correctness; assignment
    only needs to be deterministic and replayable).  Group sizes are
    uneven (md5-sample supers), so worst-case per-row cost is
    k1 + max-group, expected 2√k.

    ``codebook``: ``"broadcast"`` (default) ships the k1-row member
    table to every task — right while the full codebook (k·dim doubles)
    fits executor memory.  ``"distributed"`` forces the member fetch to
    a sort-merge join keyed on the super id (both sides Exchange on
    ``sid``) — the DISTRIBUTED-CODEBOOK form for k past the broadcast
    budget: no single node ever holds all k centroids; the price is one
    keyed shuffle of the vector table.  Identical assignment either way
    (same join, different physical strategy) — the twin is pinned
    hash-equal and plan-distinct in tests.  ``"auto"`` resolves via
    :func:`codebook_strategy` from k and the embedding dimensionality;
    pass ``dim`` when the caller knows it (it usually does — the corpus
    schema is fixed) to keep plan construction JOB-FREE, else one
    bounded ``head(1)`` reads it (same driver-scalar class as the
    caller's n-count, but an eager job at build time — and an EMPTY
    frame then resolves dim=0 ⇒ broadcast regardless of k, which is
    harmless only because an empty frame has nothing to ship)."""
    import math

    k = n_centroids
    k1 = math.ceil(math.sqrt(k))
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    if codebook == "auto":
        from tts_data_pipeline_spark.conf import (
            CODEBOOK_BROADCAST_MAX_MB,
            dial,
        )

        if dim is None:
            head = e.select(F.size("v").alias("d")).head()
            dim = head["d"] if head else 0
        codebook = codebook_strategy(
            k,
            dim,
            threshold_bytes=dial(
                embeddings.sparkSession, CODEBOOK_BROADCAST_MAX_MB
            )
            * 1024
            * 1024,
        )
    ordered = e.orderBy(
        F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id"
    )
    cent = ordered.limit(k).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("ncv"),
    )
    sup = ordered.limit(k1).select(
        F.col("vec_id").alias("sid"),
        F.col("v").alias("sv"),
        F.col("nrm").alias("nsv"),
    )
    sup1 = sup.agg(F.collect_list(F.struct("sid", "sv", "nsv")).alias("sups"))

    def _best(arr, vcol, ncol, key_field, vec_field, nrm_field):
        return F.array_max(
            F.transform(
                arr,
                lambda s: F.struct(
                    (
                        dot(vcol, s[vec_field])
                        / F.greatest(ncol * s[nrm_field], F.lit(1e-12))
                    ).alias("sim"),
                    (-s[key_field]).alias("nk"),
                    s[key_field].alias("k"),
                ),
            )
        )

    # centroid -> super group (k rows x k1 folds, once)
    cgrp = (
        cent.crossJoin(F.broadcast(sup1))
        .select(
            "cid",
            "cv",
            "ncv",
            _best(F.col("sups"), F.col("cv"), F.col("ncv"), "sid", "sv", "nsv")[
                "k"
            ].alias("sid"),
        )
    )
    members = cgrp.groupBy("sid").agg(
        F.collect_list(F.struct("cid", "cv", "ncv")).alias("members")
    )
    # vector -> its nprobe_super nearest supers (staged: the scored-super
    # array is sorted/sliced in ONE projection so the k1-fold super argmax
    # runs once), then -> member centroid via one equi-join PER PROBED
    # super.  Joining per-rank columns (sid1, sid2, ...) instead of
    # exploding keeps the big side shuffle-free on the broadcast path and
    # avoids a groupBy(vec_id) re-shuffle to merge the unions; the final
    # cell is greatest() over the per-group argmax structs — identical to
    # an argmax over the union since member groups are disjoint and the
    # struct order is (sim DESC, cid ASC).  nprobe_super=1 reproduces the
    # round-8 single-assignment form bit for bit; =2 is the super-cell
    # multi-probe that buys back the adversarial-band co-location the
    # hierarchical quantizer traded (measured ladder in tests/PLANS.md).
    p = nprobe_super
    scored_sups = F.transform(
        F.col("sups"),
        lambda s: F.struct(
            (
                -(
                    dot(F.col("v"), s["sv"])
                    / F.greatest(F.col("nrm") * s["nsv"], F.lit(1e-12))
                )
            ).alias("ns"),
            s["sid"].alias("sid"),
        ),
    )
    vsup = (
        e.crossJoin(F.broadcast(sup1))
        .select(
            "vec_id",
            "v",
            "nrm",
            F.slice(F.array_sort(scored_sups), 1, p).alias("tops"),
        )
        .select(
            "vec_id",
            "v",
            "nrm",
            *[
                F.element_at("tops", r)["sid"].alias(f"sid{r}")
                for r in range(1, p + 1)
            ],
        )
    )
    fetch = vsup
    for r in range(1, p + 1):
        m_r = members.select(
            F.col("sid").alias(f"sid{r}"), F.col("members").alias(f"mem{r}")
        )
        # rank-1 is total (every vector has a best super, and every super
        # group contains at least the super itself); ranks past k1 are
        # null -> left join keeps the row, greatest() skips the null best
        how = "inner" if r == 1 else "left"
        if codebook == "distributed":
            fetch = fetch.join(m_r.hint("merge"), f"sid{r}", how)
        else:
            fetch = fetch.join(F.broadcast(m_r), f"sid{r}", how)
    bests = [
        _best(F.col(f"mem{r}"), F.col("v"), F.col("nrm"), "cid", "cv", "ncv")
        for r in range(1, p + 1)
    ]
    bm = bests[0] if p == 1 else F.greatest(*bests)
    return (
        fetch
        .select("vec_id", "v", "nrm", bm.alias("bm"))
        .select(
            "vec_id",
            "v",
            "nrm",
            F.col("bm")["k"].alias("cell"),
            F.round(F.col("bm")["sim"], 6).alias("centroid_sim"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_pred: Column,
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """IVF ANN with a FIXED-size codebook — the scale path for similarity.

    Output: (query_id, neighbor_id, cosine_sim, rank) for rows matching
    ``query_pred``.

    Scale shape (the whole point — contrast a naive n×k window plan):

    - **Codebook**: ``n_centroids`` vectors chosen by smallest
      ``md5(vec_id)`` — a deterministic pseudo-random sample whose size does
      NOT grow with n (a ``vec_id % s`` scheme gives k = n/s centroids and
      an O(n²/s) assignment — a cartesian in disguise at 100× scale).
      Spark executes the pick as TakeOrderedAndProject: per-partition
      partial top-k, no full sort, no wide shuffle.
    - **Assignment**: centroids are collapsed to ONE row
      (``collect_list`` of k structs) and broadcast; each vector computes
      its nearest centroid with ``array_max`` over a ``transform`` — a
      per-row O(k) argmax entirely inside codegen.  ZERO shuffle of the
      big side — no n×k join rows ever materialize, no window over them.
    - **Probe**: queries (tiny, by predicate) take their ``nprobe`` best
      cells via an array sort of the same k-struct array, then candidates
      come from ``cells ⋈ broadcast(probes)`` — again no big-side shuffle;
      the embedding vector rides along so no join-back for neighbor
      payloads.
    - The only shuffle in the whole plan is the final per-query top-k
      window over candidate rows: O(q · n/k · nprobe), not O(n).

    At 100 TB the cells frame would be written bucketed by ``cid`` so
    repeated probes are pruned scans; the codebook pick runs once.

    Determinism: ranking on ROUNDED sim + neighbor id; centroid argmax
    tiebreaks on smallest cid (both mirrored in the DuckDB oracle).
    """
    # per-vector norms computed once on the input rows — inside the k-wide
    # assignment transform, l2_norm(v) would otherwise re-fold PER CENTROID
    # (loop-invariant work, k× per row); same floats, same folds
    assigned = ivf_assign(
        embeddings, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
    )
    cells = assigned.select("vec_id", "v", "nrm", F.col("cell").alias("cid"))
    probe_cids = F.slice(
        F.array_sort(
            F.transform(
                F.col("scored"),
                lambda s: F.struct((-s["sim"]).alias("ns"), s["cid"].alias("cid")),
            )
        ),
        1,
        nprobe,
    )
    probes = (
        assigned.filter(query_pred)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
            F.explode(F.transform(probe_cids, lambda s: s["cid"])).alias("cid"),
        )
    )
    cand = (
        cells.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / (F.col("qnrm") * F.col("nrm")),
                round_dp,
            ).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: equi-join on the hyperplane bucket, exact cosine
    within the bucket.  Same output shape as brute_force_topk; recall
    depends on n_planes (fewer planes → bigger buckets → higher recall)."""
    sig_e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        hyperplane_signature(vec_col, n_planes, dim).alias("bucket"),
    )
    sig_q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        hyperplane_signature(vec_col, n_planes, dim).alias("bucket"),
    )
    sim = F.round(cosine(F.col("qvec"), F.col("nvec")), 6)
    w = W.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        sig_e.join(F.broadcast(sig_q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


# --- product quantization (IVFPQ-style codes + ADC scoring) ------------------


def pq_codebook(
    embeddings: DataFrame,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row codebook frame for product quantization: the ``ksub``
    vectors with smallest ``(md5(vec_id), vec_id)`` (the same fixed-size
    deterministic sample :func:`ivf_topk` uses — codebook size never grows
    with n), ORDER-PINNED by sorting the collected struct array on the
    md5 key so code values are POSITIONS into a deterministic list (ADC
    needs positional lookup; ``collect_list`` order alone is not
    deterministic).  Column ``cbl`` is ``array<array<double>>`` of length
    ``ksub``."""
    e = embeddings.select(
        F.md5(F.col(id_col).cast("string").cast("binary")).alias("mk"),
        F.col(id_col).alias("cvid"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    cand = e.orderBy("mk", "cvid").limit(ksub)
    return cand.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("mk", "cvid", "cv"))),
            lambda s: s["cv"],
        ).alias("cbl")
    )


def _pq_subdist(v, cv, j, ds: int):
    """Sequential-fold squared L2 distance between subvectors j of ``v``
    and ``cv`` (both array<double>, 1-based element_at) — the identical
    fold DuckDB's ``list_sum(list_transform(range(ds), ...))`` performs,
    so the doubles match bit-for-bit."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(ds - 1)),
            lambda d: (
                (F.element_at(v, (j * ds + d + 1).cast("int"))
                 - F.element_at(cv, (j * ds + d + 1).cast("int")))
                * (F.element_at(v, (j * ds + d + 1).cast("int"))
                   - F.element_at(cv, (j * ds + d + 1).cast("int")))
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_assign(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization encoding (Jégou et al., PAMI'11 — the faiss
    IVFPQ code layout): the vector splits into ``m`` subvectors; each maps
    to the POSITION of its nearest codebook entry in that subspace (ties
    to the smaller position via struct ordering).  Output columns:
    ``(vec_id, v, scored)`` where ``scored[j] = struct(d2, p)`` — callers
    project codes (``scored[j].p``) and reconstruction error
    (sum of ``scored[j].d2``) without re-evaluating the m×ksub distance
    grid.

    Scale shape: the one-row codebook broadcasts (ksub·dim doubles);
    encoding is a pure per-row O(m·ksub·dim/m) = O(ksub·dim) expression
    inside codegen — ZERO shuffle of the corpus, no n×ksub rows ever
    materialize.  Codes are m small ints (4 bytes here vs 256 bytes of
    float32) — the compression that makes billion-vector ANN fit RAM."""
    ds = dim // m
    cb1 = (
        codebook
        if codebook is not None
        else pq_codebook(embeddings, ksub, id_col, vec_col)
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(ksub - 1)),
                lambda p: F.struct(
                    _pq_subdist(
                        F.col("v"),
                        F.element_at(F.col("cbl"), (p + 1).cast("int")),
                        j,
                        ds,
                    ).alias("d2"),
                    p.cast("int").alias("p"),
                ),
            )
        ),
    )
    # cbl is dropped immediately: carrying ksub*dim doubles per row into
    # any downstream exchange would undo the compression
    return (
        e.crossJoin(F.broadcast(cb1))
        .select("vec_id", "v", scored.alias("scored"))
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_pred,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: queries stay
    full-precision, the corpus is its m-byte codes, and the score is
    ``sum_j ||q_sub_j - codebook[code_j]||^2`` — the faiss IVFPQ search
    kernel as a Catalyst expression.

    Scale shape: the corpus side carries only ``(vec_id, codes)`` — the
    compressed representation — and never shuffles except the final
    per-query top-k window on scalar rows; queries (+ the one-row
    codebook) broadcast.  The distance lookups are positional
    ``element_at`` into broadcast literals, all inside codegen."""
    ds = dim // m
    # one codebook job shared by the encode side and the query side
    cb1 = pq_codebook(embeddings, ksub, id_col, vec_col)
    codes = pq_assign(
        embeddings, m, ksub, dim, id_col, vec_col, codebook=cb1
    ).select(
        "vec_id",
        F.transform("scored", lambda s: s["p"]).alias("codes"),
    )
    queries = (
        embeddings.filter(query_pred)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .crossJoin(F.broadcast(cb1))
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + _pq_subdist(
            F.col("qv"),
            F.element_at(
                F.col("cbl"),
                (F.element_at(F.col("codes"), (j + 1).cast("int")) + 1).cast(
                    "int"
                ),
            ),
            j,
            ds,
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        codes.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(adc, 6).alias("adc_dist"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_pred,
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full IVFPQ pipeline (the faiss IVFPQ index as one Catalyst plan):
    IVF cells bound the CANDIDATE SET (only ``nprobe`` cells per query are
    scored), PQ codes bound the CANDIDATE MEMORY (the join moves m-byte
    codes, not float vectors), ADC computes the distances.

    Both assignments — nearest IVF centroid and per-subspace PQ code —
    are derived against two broadcast one-row codebooks in the same
    projection (no join between them, no shuffle).  The ``assigned``
    relation is referenced by both the cells branch (full corpus, one
    pass) and the probes branch — the query predicate pushes through the
    projection to the scan, so the probe branch re-evaluates the
    assignment expressions for the handful of QUERY rows only, which is
    cheaper than caching the corpus-wide assignment to serve it.  The candidate
    equi-join on the cell id then carries ``(cid, vec_id, codes)`` only;
    queries ride the broadcast with their full-precision vector plus the
    PQ codebook for the lookup tables.  The single data-sized exchange is
    the final per-query top-k window over scalar rows — O(q·n/k·nprobe),
    at code width, not vector width."""
    ds = dim // m
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    ivf_cent = (
        e.orderBy(
            F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id"
        )
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("ncv"),
        )
        .agg(F.collect_list(F.struct("cid", "cv", "ncv")).alias("cents"))
    )
    pq_cb1 = pq_codebook(embeddings, ksub, id_col, vec_col)

    scored_cells = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (
                dot(F.col("v"), c["cv"])
                / F.greatest(F.col("nrm") * c["ncv"], F.lit(1e-12))
            ).alias("sim"),
            (-c["cid"]).alias("nc"),
            c["cid"].alias("cid"),
        ),
    )
    pq_scored = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(ksub - 1)),
                lambda p: F.struct(
                    _pq_subdist(
                        F.col("v"),
                        F.element_at(F.col("cbl"), (p + 1).cast("int")),
                        j,
                        ds,
                    ).alias("d2"),
                    p.cast("int").alias("p"),
                ),
            )
        ),
    )
    assigned = (
        e.crossJoin(F.broadcast(ivf_cent))
        .crossJoin(F.broadcast(pq_cb1))
        .select(
            "vec_id",
            "v",
            scored_cells.alias("cellsc"),
            F.transform(pq_scored, lambda s: s["p"]).alias("codes"),
        )
    )
    # corpus candidate side: codes + cell only — the compressed layout
    cells = assigned.select(
        F.array_max("cellsc")["cid"].alias("cid"), "vec_id", "codes"
    )
    probe_cids = F.slice(
        F.array_sort(
            F.transform(
                F.col("cellsc"),
                lambda s: F.struct(
                    (-s["sim"]).alias("ns"), s["cid"].alias("cid")
                ),
            )
        ),
        1,
        nprobe,
    )
    probes = (
        assigned.filter(query_pred)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(F.transform(probe_cids, lambda s: s["cid"])).alias(
                "cid"
            ),
        )
        .crossJoin(F.broadcast(pq_cb1))
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + _pq_subdist(
            F.col("qv"),
            F.element_at(
                F.col("cbl"),
                (F.element_at(F.col("codes"), (j + 1).cast("int")) + 1).cast(
                    "int"
                ),
            ),
            j,
            ds,
        ),
    )
    cand = (
        cells.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(adc, 6).alias("adc_dist"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )
