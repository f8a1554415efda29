"""QC + alignment pipeline queries (SURVEY.md §2.9 X5/X7/X8, §2.3 F7,
§2.6 O4) over the documents table, treated as (book=source, seg=doc).

The WER gate runs the REAL pipeline (deterministic sample → fake ASR →
word-level Levenshtein UDF → keyed aggregate → gate) and still has a full
DuckDB oracle: the fake ASR substitutes every 5th word in place, and
Levenshtein distance for an equal-length substitution-only pair is exactly
the substitution count — so expected WER is ``floor(wc/5)/wc`` in SQL.  The
UDF computes the general metric; the oracle proves it on this corruption
class."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_data_pipeline_spark.multimodal import align
from tts_data_pipeline_spark.operators import qc
from tts_data_pipeline_spark.plans.registry import query
from tts_data_pipeline_spark.sources import table


@query(
    "qc_wer_gate",
    oracle="""
    WITH seg AS (
      SELECT source AS book_id, doc_id AS seg_id, text,
             len(string_split(text, ' ')) AS wc,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))
             ) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ), sampled AS (
      SELECT * FROM seg
      WHERE rk <= greatest(CAST(ceil(n * 0.2) AS BIGINT), 1)
    )
    SELECT book_id,
           ROUND(AVG(CAST(wc // 5 AS DOUBLE) / wc), 4) AS avg_wer,
           COUNT(*) AS n_sampled,
           ROUND(AVG(CAST(wc // 5 AS DOUBLE) / wc), 4) < 0.3 AS qualified
    FROM sampled
    GROUP BY book_id
    ORDER BY book_id
    """,
)
def qc_wer_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7+X8+O4+F7 — the reference's QC flow (``post_process.py:125-376``)
    as one keyed plan: per-book 20% sample → ASR → WER → avg → gate."""
    d = table(spark, sf_dir, "documents")
    seg = d.select(
        F.col("source").alias("book_id"),
        F.col("doc_id").alias("seg_id"),
        "text",
    )
    return qc.qc_wer_gate(
        seg, sample_pct=0.2, wer_threshold=0.3
    ).orderBy("book_id")


ALIGN_ORACLE = """
WITH lines AS (
  SELECT source AS book_id, text, doc_id,
         CAST(greatest(length(text), 1) AS BIGINT) AS w,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
              AS INTEGER) AS line_id
  FROM documents
), books AS (
  SELECT source AS book_id,
         SUM(n_chars) / 100.0 AS total_dur
  FROM documents GROUP BY source
), wsum AS (
  SELECT book_id, SUM(w) AS total_w FROM lines GROUP BY book_id
), cum AS (
  SELECT l.book_id, l.line_id, l.text, l.w,
         COALESCE(SUM(l.w) OVER (PARTITION BY l.book_id ORDER BY l.line_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM lines l
), seg AS (
  SELECT c.book_id, c.line_id,
         FLOOR(b.total_dur * c.cum_prev / s.total_w * 10000.0 + 0.5)
           / 10000.0 AS start,
         FLOOR(b.total_dur * (c.cum_prev + c.w) / s.total_w * 10000.0 + 0.5)
           / 10000.0 AS "end",
         FLOOR(b.total_dur * c.w / s.total_w * 10000.0 + 0.5)
           / 10000.0 AS duration,
         c.text
  FROM cum c
  JOIN books b ON c.book_id = b.book_id
  JOIN wsum s ON c.book_id = s.book_id
)
SELECT book_id, line_id, start, "end", duration, text
FROM seg
WHERE duration BETWEEN 3.0 AND 12.0
ORDER BY book_id, line_id
"""


@query("align_segments_pipeline", oracle=ALIGN_ORACLE)
def align_segments_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5+F5 — forced-alignment pipeline.  ORACLE-BACKED: the fake aligner
    is closed-form over integer cumulative weights with the shared
    floor-rounding rule (``multimodal/align.py``), so DuckDB replays the
    whole grouped-map — segment boundaries, durations, and the F5 filter
    are value-checked, not just row-counted.

    Books assembled from documents (book=source, lines=texts in doc_id
    order, duration ∝ total chars), aligned per book via ``applyInPandas``,
    then duration-filtered exactly as the reference does
    (``aeneas_batch_align.py:228-248``)."""
    d = table(spark, sf_dir, "documents")
    books = (
        d.groupBy(F.col("source").alias("book_id"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s["text"],
            ).alias("lines"),
            (F.sum("n_chars") / 100.0).alias("total_dur"),
        )
    )
    segments = align.align_books(books)
    kept, _ = align.filter_segment_outliers(segments, 3.0, 12.0)
    return kept.orderBy("book_id", "line_id")
