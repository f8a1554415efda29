"""Pure-Python PDF text extraction (S7): round trips through the minimal
synthesizer, FlateDecode streams, TJ arrays, escapes, and the Spark
mapInPandas wrapper."""

from __future__ import annotations

import re
import zlib

from pyspark.sql import functions as F

from tts_data_pipeline_spark.multimodal.pdf import make_minimal_pdf, pdf_text


def test_roundtrip_multiline_with_escapes():
    orig = "Hello (World)\nxin chào\\test\nthird line"
    assert pdf_text(make_minimal_pdf(orig)) == orig


def test_flate_compressed_stream():
    raw = make_minimal_pdf("compressed body here")
    m = re.search(rb"<</Length (\d+)>>stream\n(.*?)\nendstream", raw, re.S)
    body = m.group(2)
    comp = zlib.compress(body)
    fl = raw.replace(
        b"<</Length %d>>stream\n" % int(m.group(1)) + body,
        b"<</Length %d/Filter/FlateDecode>>stream\n" % len(comp) + comp,
    )
    assert pdf_text(fl) == "compressed body here"


def test_tj_array_and_octal_escape():
    tj = (
        b"%PDF-1.4\n1 0 obj<</Length 60>>stream\n"
        b"BT [(Ar) -20 (ray) 5 ( form)] TJ ET\nendstream endobj"
    )
    assert pdf_text(tj) == "Array form"
    oc = (
        b"%PDF-1.4\n1 0 obj<</Length 40>>stream\n"
        b"BT (\\110i) Tj ET\nendstream endobj"
    )
    assert pdf_text(oc) == "Hi"


def test_unknown_filter_and_images_skipped():
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj<</Length 9/Filter/DCTDecode>>stream\nBT (x) Tj ET\nendstream endobj\n"
        b"2 0 obj<</Subtype/Image/Length 9>>stream\nBT (y) Tj ET\nendstream endobj\n"
        b"3 0 obj<</Length 20>>stream\nBT (kept) Tj ET\nendstream endobj"
    )
    assert pdf_text(pdf) == "kept"


def test_spark_extract_pdf_text_pure(spark):
    from tts_data_pipeline_spark.multimodal.audio import extract_pdf_text

    rows = [(i, make_minimal_pdf(f"doc {i}\nline two")) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {
        r.doc_id: r.text
        for r in extract_pdf_text(df, payload_col="content", engine="pure")
        .collect()
    }
    assert out == {i: f"doc {i}\nline two" for i in range(6)}


from hypothesis import given, settings, strategies as st

# printable text incl. Vietnamese, parens, backslashes; no control chars
# other than newline (the synthesizer's line separator)
_line = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "S", "Zs"),
        include_characters="()\\ àáảãạăắằẳẵặâấầẩẫậđèéẻẽẹêếềểễệìíỉĩịòóỏõọôốồổỗộơớờởỡợùúủũụưứừửữựỳýỷỹỵ",
    ),
    min_size=0,
    max_size=60,
)


@given(lines=st.lists(_line, min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_property(lines):
    orig = "\n".join(lines)
    got = pdf_text(make_minimal_pdf(orig))
    # the extractor strips leading/trailing newlines per block; normalize
    assert got == orig.strip("\n") or got == orig
