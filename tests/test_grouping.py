"""Property tests for the exact X1 sentence grouping (reference invariants
at ``process_all.py:318-332``): every non-final group ≥ threshold words,
final group ≥ threshold/2, sentence order preserved, no sentence lost from
kept groups."""

from __future__ import annotations

import random

from tts_data_pipeline_spark.operators.grouping import sentence_group_by_threshold

THRESHOLD = 20


def _mk_sentences(rng: random.Random, n_books: int = 5, max_sent: int = 40):
    rows = []
    for b in range(n_books):
        for seq in range(rng.randint(1, max_sent)):
            n_words = rng.randint(1, 12)
            words = [f"w{b}_{seq}_{i}" for i in range(n_words)]
            rows.append((f"book{b}", seq, " ".join(words)))
    return rows


def test_grouping_invariants(spark):
    rng = random.Random(42)
    rows = _mk_sentences(rng)
    df = spark.createDataFrame(rows, ["book_id", "seq", "sentence"])
    out = sentence_group_by_threshold(df, threshold=THRESHOLD).collect()

    by_book: dict[str, list] = {}
    for r in out:
        by_book.setdefault(r.group_key, []).append(r)

    for book, groups in by_book.items():
        groups.sort(key=lambda r: r.group_idx)
        # word_count column is consistent with the concatenated text
        for g in groups:
            assert g.word_count == len(g.text.split())
        # every non-final group reaches the threshold
        for g in groups[:-1]:
            assert g.word_count >= THRESHOLD
        # final group: threshold reached OR trailing-keep rule (>= T/2)
        assert groups[-1].word_count >= THRESHOLD / 2
        # group indexes are dense from 0
        assert [g.group_idx for g in groups] == list(range(len(groups)))


def test_grouping_preserves_order_and_content(spark):
    rows = [
        ("b", 0, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
        ("b", 1, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
        ("b", 2, "c1 c2 c3"),
        ("b", 3, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12 d13 d14 d15 d16 d17"),
    ]
    df = spark.createDataFrame(rows, ["book_id", "seq", "sentence"])
    out = sorted(
        sentence_group_by_threshold(df, threshold=20).collect(),
        key=lambda r: r.group_idx,
    )
    # group 0: sentences 0+1 reach 20 words; group 1: 2+3 reach 20
    assert len(out) == 2
    assert out[0].text.startswith("a1") and out[0].text.endswith("b10")
    assert out[0].word_count == 20
    assert out[1].text.startswith("c1") and out[1].text.endswith("d17")
    assert out[1].word_count == 20


def test_trailing_group_dropped_when_small(spark):
    rows = [
        ("b", 0, " ".join(f"x{i}" for i in range(20))),  # full group
        ("b", 1, "tail1 tail2"),  # 2 words < threshold/2=10 -> dropped
    ]
    df = spark.createDataFrame(rows, ["book_id", "seq", "sentence"])
    out = sentence_group_by_threshold(df, threshold=20).collect()
    assert len(out) == 1
    assert out[0].word_count == 20
