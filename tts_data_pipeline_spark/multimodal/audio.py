"""Multimodal audio column stack (SURVEY.md §1.1, §2.9 X2-X4, X6).

Convention: media is an opaque ``binary`` payload plus typed metadata
(schemas.AUDIO_BLOB); decode/resample/normalize/concat run as Arrow-batched
UDFs over ``array<float>`` columns.  The reference does the same work
row-at-a-time with librosa/soundfile (``process_all.py:382-438``); here the
Spark-side plumbing (schemas, partitioning, batch shapes) is real while the
codec itself is pluggable:

- ``librosa``/``soundfile`` are NOT in this container, so the default codec
  is a clearly-marked deterministic fake (bytes → float32 ramp) that
  exercises identical shapes and dtypes; swap ``decode_fn`` for the real
  library in production.  Real-codec call sites raise NotImplementedError
  rather than silently faking.

Scale notes: everything is per-row or per-group (book) bounded; audio
arrays for one book stay under executor memory (the reference holds whole
books in RAM too — at 100 TB you'd segment first, X6′, then process
segments, which is exactly what slice_segment does).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fake_decode_bytes(payload: bytes, sample_rate: int = 16000):
    """Deterministic fake codec: payload bytes → float32 waveform in [-1, 1).

    Stands in for ``librosa.load`` (reference ``process_all.py:382-391``).
    Deterministic in the payload so tests are stable: sample i is
    ``(byte[i % n] - 128) / 128``, length = 4 × n_bytes.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(0, dtype=np.float32), sample_rate
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    wave = np.tile((b - 128.0) / 128.0, 4)
    return wave.astype(np.float32), sample_rate


def real_decode_bytes(payload: bytes):  # pragma: no cover - needs librosa
    """Real codec hook — requires librosa/soundfile (not in this image)."""
    try:
        import io

        import librosa  # type: ignore

        y, sr = librosa.load(io.BytesIO(payload), sr=None, mono=True)
        return y.astype(np.float32), int(sr)
    except ImportError as exc:
        raise NotImplementedError(
            "real audio decode requires librosa; use fake_decode_bytes in "
            "this environment"
        ) from exc


def decode_audio(
    df: DataFrame, payload_col: str = "payload", sr_col: str = "sr_meta"
) -> DataFrame:
    """S8 — binary payload → (samples array<float>, sr int) via mapInPandas.

    mapInPandas (not a scalar UDF) so one Arrow batch amortizes codec setup
    and output rows could be re-batched/split if decoded audio is large.
    If ``sr_col`` exists it supplies the native sample rate per row (the
    real codec reads it from the container header; the fake honors the
    metadata column), mirroring ``librosa.load(sr=None)``.
    """
    out_schema = (
        df.schema.simpleString()
        .removeprefix("struct<")
        .removesuffix(">")
        + ",samples:array<float>,sr:int"
    )
    has_sr = sr_col in df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srs = pdf[sr_col] if has_sr else [16000] * len(pdf)
            decoded = [
                fake_decode_bytes(p, int(sr))
                for p, sr in zip(pdf[payload_col], srs)
            ]
            pdf = pdf.copy()
            pdf["samples"] = [d[0] for d in decoded]
            pdf["sr"] = [d[1] for d in decoded]
            yield pdf

    return df.mapInPandas(gen, out_schema)


def fake_encode_bytes(samples: np.ndarray) -> bytes:
    """K4 — deterministic fake ENCODER, the exact inverse of
    :func:`fake_decode_bytes`: the decoded wave is ``(byte - 128) / 128``
    tiled 4x, so the first quarter of the samples maps back to the
    original bytes losslessly (every step is exact in float32).  Stands in
    for ``sf.write`` (reference ``process_all.py:432,491``); a real codec
    slots into the same signature."""
    if samples is None or len(samples) == 0:
        return b""
    n = len(samples) // 4
    b = np.round(np.asarray(samples[:n], dtype=np.float32) * 128.0 + 128.0)
    return b.astype(np.uint8).tobytes()


def encode_audio(
    df: DataFrame, samples_col: str = "samples", out_col: str = "payload"
) -> DataFrame:
    """K4 — (samples array<float>) → binary payload via mapInPandas, the
    write-side twin of :func:`decode_audio`.  The payload column then goes
    through any binary-capable sink (parquet dataset layout, K7)."""
    out_schema = (
        df.schema.simpleString().removeprefix("struct<").removesuffix(">")
        + f",{out_col}:binary"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                fake_encode_bytes(np.asarray(s, dtype=np.float32))
                for s in pdf[samples_col]
            ]
            yield pdf

    return df.mapInPandas(gen, out_schema)


# --- X3: peak normalization — pure array expression, no UDF -------------------
def peak_normalize(samples: Column, peak: float = 0.95) -> Column:
    """X3 — ``y / max(|y|) * peak`` (reference ``process_all.py:400-407``)
    as a codegen'd transform over the array column."""
    absmax = F.array_max(F.transform(samples, lambda x: F.abs(x)))
    return F.when(absmax > 0, F.transform(
        samples, lambda x: (x / absmax * peak).cast("float")
    )).otherwise(samples)


# --- X6′: segment slice — array ops instead of ffmpeg ------------------------
def slice_segment(samples: Column, sr: Column, start_s: Column, dur_s: Column) -> Column:
    """X6′ — cut [start, start+dur) out of a waveform column.  The reference
    shells out to ffmpeg ``-ss/-t`` per segment (``aeneas_batch_align.py:261-288``);
    once audio is columnar it's a pure ``slice`` (1-based)."""
    start_idx = (start_s * sr).cast("int") + 1
    length = (dur_s * sr).cast("int")
    return F.slice(samples, start_idx, length)


# --- X2+X4: ordered concat with resample (grouped map) ------------------------
def resample_linear(y: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """X4 — linear-interpolation resample (librosa.resample stand-in,
    reference ``process_all.py:394-398``); deterministic, library-free."""
    if sr == target_sr or len(y) == 0:
        return y.astype(np.float32)
    n_out = int(round(len(y) * target_sr / sr))
    x_old = np.linspace(0.0, 1.0, num=len(y), endpoint=False)
    x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
    return np.interp(x_new, x_old, y).astype(np.float32)


CONCAT_SCHEMA = "book_id string, samples array<float>, sr int, n_parts long"


def concat_book_audio(
    parts: DataFrame,
    target_sr: int = 24000,
    book_col: str = "book_id",
    seq_col: str = "seq",
) -> DataFrame:
    """X2 — ordered per-book concat: decode parts (already columnar), sort by
    sequence number, resample each to target_sr, peak-normalize, concatenate
    (reference ``process_all.py:409-438``).  ``applyInPandas`` per book: the
    shuffle key is the book id, per-group state is one book's audio."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col, kind="mergesort")
        waves = [
            resample_linear(np.asarray(s, dtype=np.float32), int(sr), target_sr)
            for s, sr in zip(pdf["samples"], pdf["sr"])
        ]
        y = np.concatenate(waves) if waves else np.zeros(0, dtype=np.float32)
        peak = np.abs(y).max() if len(y) else 0.0
        if peak > 0:
            y = (y / peak * 0.95).astype(np.float32)
        return pd.DataFrame(
            {
                "book_id": [pdf[book_col].iloc[0]],
                "samples": [y],
                "sr": [target_sr],
                "n_parts": [len(pdf)],
            }
        )

    return parts.groupBy(book_col).applyInPandas(fold, CONCAT_SCHEMA)


def extract_pdf_text(
    df: DataFrame, payload_col: str = "content", engine: str = "auto"
) -> DataFrame:
    """S7 — PDF → text (reference ``process_all.py:265-279``: per-page
    pymupdf ``get_text`` then join).

    ``engine``: "pymupdf" uses fitz (raises if absent — not in this
    image); "pure" uses the stdlib-only content-stream parser in
    ``multimodal/pdf.py`` (uncompressed + FlateDecode streams, literal
    Tj/'/TJ text — the text-first simple-PDF case); "auto" prefers
    pymupdf when importable, else the pure parser.  Either way the Spark
    side is the same Arrow-batched ``mapInPandas``."""
    if engine == "auto":
        try:  # pragma: no cover - pymupdf not installed here
            import fitz  # noqa: F401

            engine = "pymupdf"
        except ImportError:
            engine = "pure"
    if engine == "pymupdf":
        try:  # pragma: no cover - not installed here
            import fitz  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "engine='pymupdf' requires pymupdf (not in this "
                "environment); use engine='pure' or 'auto'"
            ) from exc

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if engine == "pymupdf":  # pragma: no cover - not installed here
            import fitz

            def one(payload: bytes) -> str:
                doc = fitz.open(stream=payload, filetype="pdf")
                return "\n".join(page.get_text() for page in doc)

        else:
            from tts_data_pipeline_spark.multimodal.pdf import pdf_text as one

        for pdf in batches:
            texts = [one(payload) for payload in pdf[payload_col]]
            out = pdf[[c for c in pdf.columns if c != payload_col]].copy()
            out["text"] = texts
            yield out

    out_schema = ",".join(
        [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != payload_col
        ]
        + ["text:string"]
    )
    return df.mapInPandas(gen, out_schema)


# --- X3': leading/trailing silence trim — pure array expressions -------------
def trim_silence(samples: Column, eps: float = 0.125) -> Column:
    """Trim leading/trailing samples with ``|x| < eps`` (the silence gate
    every TTS segmenter applies before alignment; the reference relies on
    aeneas to absorb silence instead).  Pure codegen array ops: one
    boolean transform + two ``array_position`` probes + one ``slice`` —
    no UDF.  Returns a struct ``(lead, trail, trimmed)``; an all-silent
    input trims to an empty array."""
    flags = F.transform(samples, lambda x: F.abs(x) < eps)
    first_loud = F.array_position(flags, F.lit(False))  # 1-based, 0 = none
    last_loud = F.when(
        first_loud > 0,
        F.size(flags) - F.array_position(F.reverse(flags), F.lit(False)) + 1,
    ).otherwise(F.lit(0))
    lead = F.when(first_loud > 0, first_loud - 1).otherwise(F.size(flags))
    trail = F.when(first_loud > 0, F.size(flags) - last_loud).otherwise(
        F.lit(0)
    )
    trimmed = F.when(
        first_loud > 0,
        F.slice(samples, first_loud, (last_loud - first_loud + 1).cast("int")),
    ).otherwise(F.array().cast("array<float>"))
    return F.struct(
        lead.cast("bigint").alias("lead"),
        trail.cast("bigint").alias("trail"),
        trimmed.alias("trimmed"),
    )
