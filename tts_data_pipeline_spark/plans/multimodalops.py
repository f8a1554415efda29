"""Multimodal pipeline queries (rows-only: pixel/waveform UDF stages have
no SQL equivalent; unit tests in tests/test_multimodal_* and
tests/test_sources_multimodal_streaming.py pin the math).

Binary payloads are synthesized from the documents table (utf-8 text bytes)
— the same opaque-binary + typed-metadata convention a binaryFile scan
produces, so these queries exercise the exact production plumbing: schema,
Arrow batch shapes, partitioning, per-group state bounds."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_data_pipeline_spark.multimodal import audio as A
from tts_data_pipeline_spark.multimodal import image as I
from tts_data_pipeline_spark.multimodal import video as V
from tts_data_pipeline_spark.plans.registry import query
from tts_data_pipeline_spark.sources import table
from tts_data_pipeline_spark.sources.readers import spread


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(table(spark, sf_dir, "documents"))
    return d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("path"),
        F.encode("text", "utf-8").alias("content"),
        "doc_id",
        "source",
    )


@query("mm_image_features")
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → decode (fake codec, real plumbing) → per-image channel
    stats.  One mapInPandas chain, no shuffle until the final sort."""
    p = _payloads(spark, sf_dir)
    decoded = I.decode_images(p.select("path", "content"), height=16, width=16)
    return I.image_features(decoded).orderBy("path")


@query("mm_video_motion")
def mm_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → frame-sample+decode (one row per sampled frame) → per-video
    motion aggregate.  Frame rows shuffle by video key; per-group state is
    bounded by sampled-frame count, not video length."""
    p = _payloads(spark, sf_dir).select(
        "path",
        "content",
        F.lit(10.0).alias("fps"),
        (20 + F.col("doc_id") % 30).cast("int").alias("n_frames"),
    )
    frames = V.decode_sampled_frames(p, every_k=10, height=8, width=8)
    return V.frame_motion_features(frames).orderBy("path")


@query("mm_audio_book_concat")
def mm_audio_book_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-X4 end-to-end: per-part decode (fake codec) → per-book ordered
    concat + resample + peak-normalize (reference ``process_all.py:409-438``)
    — grouped-map with per-book bounded state.  Parts = documents grouped by
    source; sequence = doc_id order."""
    p = _payloads(spark, sf_dir).select(
        F.col("source").alias("book_id"),
        F.col("doc_id").alias("seq"),
        "content",
    )
    decoded = A.decode_audio(p, payload_col="content")
    out = A.concat_book_audio(
        decoded, book_col="book_id", seq_col="seq", target_sr=4000
    )
    return out.select(
        "book_id",
        "n_parts",
        "sr",
        F.size("samples").cast("long").alias("n_samples"),
    ).orderBy("book_id")


@query(
    "s7_pdf_text_extract",
    oracle="""
    SELECT doc_id, source || chr(10) || 'Lang: ' || lang AS text
    FROM documents
    ORDER BY doc_id
    """,
)
def s7_pdf_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 end-to-end with a REAL parser: per-row minimal PDFs synthesized
    from documents (binary column), then text recovered by the pure
    content-stream extractor (``multimodal/pdf.py`` — uncompressed +
    FlateDecode, Tj/'/TJ literals) inside Arrow-batched ``mapInPandas``;
    pymupdf slots into the same plumbing when installed (reference
    ``process_all.py:265-279``).  Oracle = the synthesized ground-truth
    text, so the whole binary→text path is value-checked."""
    import pandas as pd

    from tts_data_pipeline_spark.multimodal.pdf import make_minimal_pdf, pdf_text

    d = spread(table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "lang"
    )

    # ONE mapInPandas stage: fixture synthesis and extraction share the
    # batch, matching the production shape (binaryFile scan → one extract
    # stage) — two chained MapInPandas would pay a second Python
    # round-trip per task and ship every PDF payload JVM→Python twice.
    # ``pdf_text`` here is the same parser ``extract_pdf_text`` wraps
    # (plumbing-tested standalone in tests/test_pdf_extract.py).
    def synth_extract(batches):
        for pdf in batches:
            payloads = [
                make_minimal_pdf(f"{s}\nLang: {lg}")
                for s, lg in zip(pdf["source"], pdf["lang"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "text": [pdf_text(p) for p in payloads],
                }
            )

    # No orderBy: a range sort above mapInPandas re-executes the Python
    # stage for the range-bounds sampling pass (2× the UDF work); the
    # driver's hash compare is order-insensitive.
    return d.mapInPandas(synth_extract, "doc_id bigint, text string")
