"""Forced alignment (SURVEY.md §2.9 X5) — pluggable, aeneas-shaped.

The reference runs aeneas per (wav, txt) pair producing a TSV sync-map of
``(start, end, id)`` rows (``aeneas_batch_align.py:426-481``), then filters
segments to [min_duration, max_duration] (F5) and anti-joins outliers (J6).

Alignment is embarrassingly parallel per book → ``applyInPandas`` over the
book key.  aeneas isn't in this image: the default aligner is a
deterministic fake that distributes the book's audio duration over its text
lines proportionally to line length — the exact output SHAPE (segment rows
with start/end/duration per line) with stable values, so the downstream
relational pipeline (F5 filter, J4 index join, J6 anti-join, K7 layout) is
fully exercised.  The real path raises NotImplementedError until aeneas is
installed."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEGMENT_SCHEMA = (
    "book_id string, line_id int, start double, end double, "
    "duration double, text string"
)


def fake_align_book(book_id: str, lines: list[str], total_dur: float) -> pd.DataFrame:
    """Deterministic fake sync-map: time split proportional to line length.

    Closed-form (no float accumulation): segment boundaries come from
    integer cumulative weights, so ``start``/``end``/``duration`` are pure
    functions of (total_dur, cum_w, total_w) with ONE shared rounding rule
    (``floor(x*1e4+0.5)/1e4``).  That makes the whole aligner replayable in
    SQL — the catalog's ``align_segments_pipeline`` hash-checks it against
    a DuckDB oracle — where Python's banker's ``round`` plus a sequential
    ``t += dur`` float walk could not be reproduced engine-side."""
    import math

    weights = [max(len(ln), 1) for ln in lines]
    total_w = sum(weights) or 1

    def r4(cum: int) -> float:
        return math.floor(total_dur * cum / total_w * 10000.0 + 0.5) / 10000.0

    rows, cum = [], 0
    for i, (ln, w) in enumerate(zip(lines, weights)):
        rows.append(
            {
                "book_id": book_id,
                "line_id": i + 1,
                "start": r4(cum),
                "end": r4(cum + w),
                "duration": math.floor(
                    total_dur * w / total_w * 10000.0 + 0.5
                )
                / 10000.0,
                "text": ln,
            }
        )
        cum += w
    return pd.DataFrame(rows)


def align_books(
    books: DataFrame,
    book_col: str = "book_id",
    lines_col: str = "lines",
    dur_col: str = "total_dur",
) -> DataFrame:
    """X5 — grouped-map alignment: one aligner invocation per book.

    Input: one row per book with its text lines (array<string>) and audio
    duration.  Output: segment rows (the reference's TSV, as a DataFrame).
    Swap ``fake_align_book`` for an aeneas subprocess in production — the
    Spark plumbing (grouping, schema, per-book isolation) is identical."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        out = [
            fake_align_book(r[book_col], list(r[lines_col]), float(r[dur_col]))
            for _, r in pdf.iterrows()
        ]
        return pd.concat(out) if out else pd.DataFrame(
            columns=["book_id", "line_id", "start", "end", "duration", "text"]
        )

    return books.groupBy(book_col).applyInPandas(fold, SEGMENT_SCHEMA)


def real_align_book():  # pragma: no cover - needs aeneas
    """Real aligner hook — requires aeneas + espeak (not in this image)."""
    try:
        import aeneas  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "forced alignment requires aeneas (not in this environment); "
            "swap fake_align_book for a subprocess invocation"
        ) from exc


def filter_segment_outliers(
    segments: DataFrame, min_dur: float = 3.0, max_dur: float = 12.0
) -> tuple[DataFrame, DataFrame]:
    """F5/J6 — split segments into (kept, outliers) by duration bounds
    (reference ``aeneas_batch_align.py:228-248``, defaults ``:87-94``)."""
    in_range = F.col("duration").between(min_dur, max_dur)
    return segments.filter(in_range), segments.filter(~in_range)
