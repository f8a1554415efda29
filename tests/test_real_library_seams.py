"""Real-library smoke seams (round-10, verdict #6).

Every test here is SKIPPED in this image (the libraries aren't
installed — same convention as the protobuf skip) and runs the REAL
path on one tiny fixture the day the image gains the library, asserting
the fake-vs-real interface contract: same output schema/dtype/shape
class, same nullability.  This keeps the documented
NotImplementedError seams honest — a library upgrade that changes the
real path's contract fails here, next to the oracle-tested fakes.

Contract sources (the fakes these must match):
- S8 audio: ``multimodal.audio.fake_decode_bytes`` → (float32 1-D
  ndarray in [-1, 1], int sample rate)
- S7 pdf: ``multimodal.pdf.pdf_text`` (pure parser) — the pymupdf
  engine must extract the same text from the same minimal PDF
- C18 sentences: ``functions.vi_text.sent_tokenize`` rule-based column
  vs underthesea's tokenizer on the committed golden corpus's
  agreement subset
- image/video codec hooks: (H, W, 3) uint8 RGB frames
"""

from __future__ import annotations

import numpy as np
import pytest

# `pytest -m real tests/` selects exactly this module: skipped wholesale
# in the base image (every test importorskips its library), a live
# contract run in an env built from requirements-real.txt (r11 #5).
pytestmark = pytest.mark.real


def test_librosa_audio_decode_contract(spark):
    pytest.importorskip("librosa")
    import io
    import wave

    from tts_data_pipeline_spark.multimodal.audio import (
        fake_decode_bytes,
        real_decode_bytes,
    )

    # tiny valid 16-bit PCM WAV, 8 samples @ 8 kHz
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            np.array([0, 8192, -8192, 16384, -16384, 4096, -4096, 0], dtype="<i2")
            .tobytes()
        )
    y, sr = real_decode_bytes(buf.getvalue())
    fy, fsr = fake_decode_bytes(b"\x01\x02\x03")
    # same contract as the fake: float32 mono waveform in [-1, 1], int sr
    assert y.dtype == fy.dtype == np.float32
    assert y.ndim == fy.ndim == 1
    assert isinstance(sr, int) and sr == 8000
    assert len(y) == 8 and float(np.abs(y).max()) <= 1.0


def test_pymupdf_engine_matches_pure_parser(spark):
    pytest.importorskip("fitz")
    from tts_data_pipeline_spark.multimodal.audio import extract_pdf_text
    from tts_data_pipeline_spark.multimodal.pdf import make_minimal_pdf

    rows = [(i, make_minimal_pdf(f"doc {i} body line")) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    pure = {
        r.doc_id: r.text
        for r in extract_pdf_text(df, engine="pure").collect()
    }
    real = {
        r.doc_id: r.text
        for r in extract_pdf_text(df, engine="pymupdf").collect()
    }
    assert set(pure) == set(real)
    for k in pure:
        # pymupdf may normalize trailing whitespace; the text content
        # must agree token-for-token
        assert pure[k].split() == real[k].split(), k
        assert real[k] is not None


def test_underthesea_sent_tokenize_contract(spark):
    pytest.importorskip("underthesea")
    from pyspark.sql import functions as F

    from tts_data_pipeline_spark.functions.vi_text import sent_tokenize

    # with underthesea importable, sent_tokenize takes the pandas-UDF
    # path — the output contract (non-null array<string>, no empty
    # sentences) must match the rule-based column's
    df = spark.createDataFrame(
        [("Xin chào. Đây là câu thứ hai! Còn đây là câu ba?",), ("",)],
        ["text"],
    )
    out = df.select(sent_tokenize(F.col("text")).alias("sents")).collect()
    assert out[0].sents and all(s.strip() for s in out[0].sents)
    assert len(out[0].sents) == 3
    assert out[1].sents == []


def test_pillow_image_decode_contract(spark):
    PIL = pytest.importorskip("PIL")
    import io

    import PIL.Image as Image

    from tts_data_pipeline_spark.multimodal.image import (
        fake_decode_image,
        real_decode_image,
    )

    buf = io.BytesIO()
    Image.fromarray(
        np.arange(48, dtype=np.uint8).reshape(4, 4, 3), mode="RGB"
    ).save(buf, format="PNG")
    img = real_decode_image(buf.getvalue())
    fimg = fake_decode_image(b"\x01\x02", height=4, width=4)
    assert img.dtype == fimg.dtype == np.uint8
    assert img.shape == (4, 4, 3) and fimg.shape == (4, 4, 3)
    assert int(img[0, 0, 0]) == 0 and int(img[3, 3, 2]) == 47


def test_pyav_video_decode_contract(spark):
    pytest.importorskip("av")
    # no fixture video can be synthesized without the codec itself, so
    # the contract check uses av to ENCODE two frames then decode them
    # back through the real hook
    import io

    import av

    from tts_data_pipeline_spark.multimodal.video import real_decode_video

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as out:
        stream = out.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 16, 16
        for k in range(2):
            frame = av.VideoFrame.from_ndarray(
                np.full((16, 16, 3), k * 40, dtype=np.uint8), format="rgb24"
            )
            out.mux(stream.encode(frame))
        out.mux(stream.encode(None))
    frames = real_decode_video(buf.getvalue())
    assert len(frames) == 2
    for idx, arr in frames:
        assert isinstance(idx, int)
        assert arr.dtype == np.uint8 and arr.shape == (16, 16, 3)


def test_aeneas_hook_still_gated(spark):
    """aeneas's real path stays a documented seam (it shells out to
    espeak and needs real audio — no honest tiny fixture exists);
    this pins the SHAPE of the seam: with the lib absent the hook
    raises NotImplementedError naming the library, never a bare
    ImportError escaping to the caller."""
    try:
        import aeneas  # noqa: F401

        pytest.skip("aeneas installed — wire a real fixture here")
    except ImportError:
        pass
    from tts_data_pipeline_spark.multimodal.align import real_align_book

    with pytest.raises(NotImplementedError, match="aeneas"):
        real_align_book()


def test_transformers_hook_still_gated(spark):
    try:
        import transformers  # noqa: F401

        pytest.skip("transformers installed — wire a model fixture here")
    except ImportError:
        pass
    from tts_data_pipeline_spark.operators.qc import real_transcribe_udf

    with pytest.raises(NotImplementedError, match="transformers"):
        real_transcribe_udf()
