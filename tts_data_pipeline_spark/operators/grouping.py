"""X1 — exact sequential sentence grouping (the reference's genuinely
stateful operator, ``process_all.py:305-335``).

Semantics: walk sentences in order, accumulate until the running word count
reaches ``threshold`` (default 20), emit the group and reset; the trailing
group is kept iff it has ≥ threshold/2 words.  Group boundaries depend on
all prior groups, so this is not window-expressible exactly (SURVEY.md §2.9);
the SQL-approximation with slightly different boundary semantics is
``x1_running_bucket`` in plans/windows.py.

Spark expression: ``groupBy(key).applyInPandas`` — per-group sequential fold
where a group (one book / one document) is always ≪ executor memory; the
shuffle is on the group key, state never leaves the executor.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

GROUPED_SCHEMA = (
    "group_key string, group_idx long, text string, word_count long, n_sentences long"
)


def _fold_one_group(
    pdf: pd.DataFrame, threshold: int, order_col: str, text_col: str, key_col: str
) -> pd.DataFrame:
    out: list[tuple] = []
    if len(pdf) == 0:  # applyInPandas never passes empty groups; direct calls may
        return pd.DataFrame(
            out,
            columns=["group_key", "group_idx", "text", "word_count", "n_sentences"],
        )
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
    return pd.DataFrame(
        out,
        columns=["group_key", "group_idx", "text", "word_count", "n_sentences"],
    )


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

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        return _fold_one_group(pdf, threshold, order_col, text_col, key_col)

    return sentences.groupBy(key_col).applyInPandas(fold, GROUPED_SCHEMA)
