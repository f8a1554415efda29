"""X1 — exact sequential sentence grouping (the reference's genuinely
stateful operator, ``process_all.py:305-335``).

Semantics: walk sentences in order, accumulate until the running word count
reaches ``threshold`` (default 20), emit the group and reset; the trailing
group is kept iff it has ≥ threshold/2 words.  Group boundaries depend on
all prior groups, so this is not window-expressible exactly (SURVEY.md §2.9);
the SQL-approximation with slightly different boundary semantics is
``x1_running_bucket`` in plans/windows.py.

Spark expression (round-11): ``repartition(key) →
sortWithinPartitions(key, order, text) → mapInPandas`` — a streaming
fold over key-contiguous rows with carry state across Arrow batches.
The previous ``groupBy(key).applyInPandas`` form paid one Python
invocation + Arrow round-trip PER GROUP: at sf0.1 that is 5,000
ten-row pandas frames, measured 10.7 s warm where this form reads
~2-3 s — same shuffle (hash by key either way), same per-key sequential
semantics, ~25× fewer Python crossings.  ``sortWithinPartitions`` is a
LOCAL sort (no range-sampler job — the r9/r10 sampling-pass class).
State is one key's buffer, always ≪ executor memory; keys are
hash-clustered so a key never spans partitions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

GROUPED_SCHEMA = (
    "group_key string, group_idx long, text string, word_count long, n_sentences long"
)
_COLS = ["group_key", "group_idx", "text", "word_count", "n_sentences"]


def _fold_one_group(
    pdf: pd.DataFrame, threshold: int, order_col: str, text_col: str, key_col: str
) -> pd.DataFrame:
    """Single-group fold, kept for direct/unit callers; the distributed
    path streams through :func:`_fold_partition` instead."""
    out: list[tuple] = []
    if len(pdf) == 0:
        return pd.DataFrame(out, columns=_COLS)
    # tiebreak on the text itself: with duplicate order values, a bare
    # mergesort keeps the incoming (post-shuffle, run-dependent) row order
    # and group contents would differ across runs
    pdf = pdf.sort_values([order_col, text_col], kind="mergesort")
    key = str(pdf[key_col].iloc[0])  # GROUPED_SCHEMA declares string
    buf: list[str] = []
    words = 0
    gidx = 0
    for sent in pdf[text_col]:
        if sent is None:
            continue
        buf.append(sent)
        words += len(sent.split())
        if words >= threshold:
            out.append((key, gidx, " ".join(buf), words, len(buf)))
            gidx += 1
            buf, words = [], 0
    # trailing group kept iff >= threshold/2 (reference process_all.py:318-332)
    if buf and words >= threshold / 2:
        out.append((key, gidx, " ".join(buf), words, len(buf)))
    return pd.DataFrame(out, columns=_COLS)


def sentence_group_by_threshold(
    sentences: DataFrame,
    key_col: str = "book_id",
    order_col: str = "seq",
    text_col: str = "sentence",
    threshold: int = 20,
) -> DataFrame:
    """Exact X1: (key, seq, sentence) → (group_key, group_idx, text,
    word_count, n_sentences).  Invariants (property-tested): every non-final
    group has word_count ≥ threshold; the final group ≥ threshold/2."""

    def fold_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # streaming per-key fold: rows arrive key-contiguous and
        # (order, text)-sorted; state carries across Arrow batches
        cur_key: str | None = None
        buf: list[str] = []
        words = 0
        gidx = 0
        out: list[tuple] = []

        def close_tail() -> None:
            nonlocal buf, words, gidx
            if buf and words >= threshold / 2:
                out.append((cur_key, gidx, " ".join(buf), words, len(buf)))
            buf, words, gidx = [], 0, 0

        for pdf in batches:
            for key, sent in zip(
                pdf[key_col].astype(str), pdf[text_col]
            ):
                if key != cur_key:
                    if cur_key is not None:
                        close_tail()
                    cur_key = key
                if sent is None:
                    continue
                buf.append(sent)
                words += len(sent.split())
                if words >= threshold:
                    out.append(
                        (cur_key, gidx, " ".join(buf), words, len(buf))
                    )
                    gidx += 1
                    buf, words = [], 0
            if len(out) >= 4096:
                yield pd.DataFrame(out, columns=_COLS)
                out = []
        if cur_key is not None:
            close_tail()
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    clustered = sentences.repartition(key_col).sortWithinPartitions(
        key_col, order_col, text_col
    )
    return clustered.mapInPandas(fold_partition, GROUPED_SCHEMA)
