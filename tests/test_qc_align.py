"""Tests for the QC (X7/X8/F7/O4) and forced-alignment (X5/F5) stacks."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tts_data_pipeline_spark.multimodal import align
from tts_data_pipeline_spark.operators import qc


def test_word_error_rate_known_values():
    assert qc.word_error_rate(["a", "b", "c"], ["a", "b", "c"]) == 0.0
    assert qc.word_error_rate(["a", "b", "c"], ["a", "x", "c"]) == pytest.approx(1 / 3)
    assert qc.word_error_rate(["a", "b"], ["a"]) == pytest.approx(0.5)
    assert qc.word_error_rate([], []) == 0.0
    assert qc.word_error_rate([], ["x"]) == 1.0
    # insertion: ref 2 words, hyp 3 → 1 edit / 2
    assert qc.word_error_rate(["a", "b"], ["a", "x", "b"]) == pytest.approx(0.5)


def test_fake_transcribe_corrupts_every_kth():
    assert qc.fake_transcribe("w1 w2 w3 w4 w5 w6", corrupt_every=3) == "w1 w2 <err> w4 w5 <err>"


def test_qc_wer_gate_end_to_end(spark):
    # book "good": long sentences, fake ASR corrupts 1/5 → wer 0.2 < 0.3
    # a 4-word text has 0 corruption (only every 5th) → wer 0
    rows = [
        ("good", i, "one two three four") for i in range(10)
    ] + [
        ("bad", i, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10") for i in range(10)
    ]
    seg = spark.createDataFrame(rows, ["book_id", "seg_id", "text"])
    out = qc.qc_wer_gate(seg, sample_pct=1.0, wer_threshold=0.1).collect()
    got = {r.book_id: (r.avg_wer, r.qualified, r.n_sampled) for r in out}
    assert got["good"] == (0.0, True, 10)
    assert got["bad"][0] == pytest.approx(0.2)
    assert got["bad"][1] is False


def test_sample_per_group_min_one_and_bounded(spark):
    rows = [("b1", i) for i in range(100)] + [("b2", 0)]
    df = spark.createDataFrame(rows, ["book_id", "seg_id"])
    s = qc.sample_per_group(df, "book_id", 0.1, "seg_id")
    counts = {r.book_id: r.n for r in s.groupBy("book_id").agg(F.count("*").alias("n")).collect()}
    assert counts["b1"] == 10
    assert counts["b2"] == 1  # min 1 even though 0.1 * 1 < 1
    # deterministic: same sample on rerun
    ids1 = sorted(r.seg_id for r in s.collect())
    ids2 = sorted(r.seg_id for r in qc.sample_per_group(df, "book_id", 0.1, "seg_id").collect())
    assert ids1 == ids2


def test_align_books_shape_and_conservation(spark):
    books = spark.createDataFrame(
        [("b1", ["short", "a much longer line here"], 10.0),
         ("b2", ["only line"], 4.0)],
        ["book_id", "lines", "total_dur"],
    )
    seg = align.align_books(books).orderBy("book_id", "line_id")
    rows = seg.collect()
    b1 = [r for r in rows if r.book_id == "b1"]
    assert [r.line_id for r in b1] == [1, 2]
    # durations sum to the book duration, longer line gets more time
    assert sum(r.duration for r in b1) == pytest.approx(10.0, abs=0.01)
    assert b1[1].duration > b1[0].duration
    # contiguous, non-overlapping
    assert b1[0].end == pytest.approx(b1[1].start)
    b2 = [r for r in rows if r.book_id == "b2"]
    assert len(b2) == 1 and b2[0].duration == pytest.approx(4.0)


def test_filter_segment_outliers(spark):
    seg = spark.createDataFrame(
        [("b", 1, 0.0, 2.0, 2.0, "x"), ("b", 2, 2.0, 7.0, 5.0, "y"),
         ("b", 3, 7.0, 20.0, 13.0, "z")],
        ["book_id", "line_id", "start", "end", "duration", "text"],
    )
    kept, out = align.filter_segment_outliers(seg, 3.0, 12.0)
    assert [r.line_id for r in kept.collect()] == [2]
    assert sorted(r.line_id for r in out.collect()) == [1, 3]


def test_real_hooks_raise_not_implemented():
    with pytest.raises(NotImplementedError):
        qc.real_transcribe_udf()
    with pytest.raises(NotImplementedError):
        align.real_align_book()


def test_corpus_validate_each_defect_class(spark):
    """One crafted book per defect class + one clean book: the report
    isolates every `mfa validate` failure mode and the OOV rate."""
    # book "bad": s1 clean, s2 missing audio, s3 empty transcript,
    # s4 zero-duration audio, plus orphan audio stem s99
    transcripts = spark.createDataFrame(
        [
            ("bad", 1, "aa bb aa"),
            ("bad", 2, "aa aa"),
            ("bad", 3, ""),
            ("bad", 4, "aa"),
            ("ok", 10, "aa aa aa cc"),
        ],
        ["book_id", "stem", "txt"],
    )
    audio = spark.createDataFrame(
        [
            ("bad", 1, 2.5),
            ("bad", 3, 1.0),
            ("bad", 4, 0.0),
            ("bad", 99, 3.0),
            ("ok", 10, 4.0),
        ],
        ["book_id", "stem", "duration"],
    )
    lexicon = spark.createDataFrame([("aa",), ("cc",)], ["w"])
    rows = {
        r.book_id: r
        for r in qc.corpus_validate(transcripts, audio, lexicon).collect()
    }
    bad = rows["bad"]
    # s1 + s4 are paired with non-empty text: 4 tokens, 1 OOV ("bb")
    assert (
        bad.n_segments,
        bad.n_missing_audio,
        bad.n_unpaired_audio,
        bad.n_empty_transcripts,
        bad.n_zero_duration,
    ) == (4, 1, 1, 1, 1)
    assert bad.oov_rate == pytest.approx(0.25)
    assert bad.valid is False
    ok = rows["ok"]
    assert (
        ok.n_segments,
        ok.n_missing_audio,
        ok.n_unpaired_audio,
        ok.n_empty_transcripts,
        ok.n_zero_duration,
    ) == (1, 0, 0, 0, 0)
    assert ok.oov_rate == pytest.approx(0.0)
    assert ok.valid is True
