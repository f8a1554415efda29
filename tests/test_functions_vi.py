"""Golden-output tests for the Vietnamese text functions (C1-C17), with
inputs mirroring the reference's documented examples
(``pre_processing/README.md:195-207,304-309``; FIXTURES.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tts_data_pipeline_spark.functions import vi_text as V


def _apply(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["raw"])
    return [r[0] for r in df.select(col_fn(F.col("raw"))).collect()]


def test_digits_to_vi_words(spark):
    out = _apply(spark, V.digits_to_vi_words, ["123", "Có 123 quyển sách", "0", "905"])
    assert out[0] == "một hai ba"
    assert out[1] == "Có một hai ba quyển sách"
    assert out[2] == "không"
    assert out[3] == "chín không năm"


def test_currency_normalize(spark):
    out = _apply(
        spark,
        V.normalize_currency,
        ["150000đ", "20 VNĐ", "5$", "gia 10₫ va 3vnd"],
    )
    assert out == ["150000 VND", "20 VND", "5 USD", "gia 10 VND va 3 VND"]


def test_currency_normalize_keeps_vietnamese_words(spark):
    # đ is a normal Vietnamese letter — only numeric-context markers rewrite
    out = _apply(
        spark,
        V.normalize_currency,
        [
            "đẹp quá đi",
            "Đà Nẵng đón 5000đ tiền lẻ",
            "đường số 9",
            "giá 2.5đ rồi đó",
        ],
    )
    assert out == [
        "đẹp quá đi",
        "Đà Nẵng đón 5000 VND tiền lẻ",
        "đường số 9",
        "giá 2.5 VND rồi đó",
    ]


def test_digits_to_vi_words_bounded(spark):
    out = _apply(
        spark,
        V.digits_to_vi_words_bounded,
        ["mp3 file", "Có 123 quyển", "15/3 đến 4", "x264 codec"],
    )
    assert out == [
        "mp3 file",
        "Có một hai ba quyển",
        "một năm / ba đến bốn",
        "x264 codec",
    ]


def test_duration_parse(spark):
    out = _apply(
        spark,
        V.parse_duration_seconds,
        ["01:02:03", "12:34", "00:00:59", "1;30;00"],
    )
    assert out == [3723.0, 754.0, 59.0, 5400.0]


def test_normalize_name(spark):
    out = _apply(
        spark,
        V.normalize_name,
        ["Chút Phận Linh Đinh", "Hồ Biểu Chánh", "Đất  Rừng Phương-Nam!"],
    )
    assert out == [
        "chut-phan-linh-đinh".replace("đ", "d"),
        "ho-bieu-chanh",
        "đat-rung-phuong-nam".replace("đ", "d"),
    ]


def test_decimal_comma(spark):
    out = _apply(spark, V.normalize_decimal_comma, ["1.234,56", "12,5", "1.234.567,89"])
    assert out == ["1234.56", "12.5", "1234567.89"]


def test_date_spoken(spark):
    df = spark.createDataFrame([(15, 3, 2023)], ["d", "m", "y"])
    row = df.select(
        V.date_to_vi_spoken(F.col("d"), F.col("m"), F.col("y")).alias("s")
    ).collect()[0]
    assert row.s == "ngày một năm tháng ba năm hai không hai ba"


def test_strip_punct_and_collapse(spark):
    out = _apply(
        spark,
        lambda c: V.collapse_ws_lower(V.strip_punctuation(c)),
        ['Hello, "World"!  Nice   day.'],
    )
    assert out == ["hello world nice day"]


def test_remove_urls(spark):
    out = _apply(spark, V.remove_urls, ["see https://a.b/c?d=1 now"])
    assert out == ["see  now"]


def test_nfc_normalize_udf(spark):
    # decomposed e + combining acute -> precomposed é
    decomposed = "é"
    out = _apply(spark, V.nfc_normalize, [decomposed])
    assert out == ["é"]


def test_seg_id_and_duration(spark):
    df = spark.createDataFrame([("12f", 1.0, 3.4567)], ["id", "s", "e"])
    row = df.select(
        V.clean_seg_id(F.col("id")).alias("seg"),
        V.segment_duration(F.col("s"), F.col("e")).alias("dur"),
    ).collect()[0]
    assert row.seg == 12.0
    assert row.dur == pytest.approx(2.4567)


def test_extension_default(spark):
    out = _apply(
        spark,
        V.extension_or_default,
        ["a/b/c.mp3", "a/b/track", "x.WAV2", "y.flac"],
    )
    assert out == [".mp3", ".mp3", ".WAV2", ".flac"]


def test_sent_tokenize_fallback(spark):
    out = _apply(
        spark, V.sent_tokenize, ["Câu một. Câu hai! Câu ba? Cuối"]
    )
    assert out == [["Câu một.", "Câu hai!", "Câu ba?", "Cuối"]]
