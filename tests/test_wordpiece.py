"""WordPiece trainer: oracle parity plus an independent pure-Python
reference of the likelihood-scored merge loop (##-marked symbols,
score = cnt(ab)/(cnt(a)·cnt(b)), greedy left-to-right application)."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR, run_parity

from tts_data_pipeline_spark.plans.corpus import (
    _wp_oracle,
    learn_wordpiece_merges,
    ta_wordpiece_learn,
)


def _ref_wordpiece(words_freq: dict[str, int], rounds: int):
    """Naive reference: explicit symbol lists per word, exact-fraction
    argmax (no floats), greedy left-to-right merge application."""
    from fractions import Fraction

    seqs = {
        w: ([w[0]] + ["##" + c for c in w[1:]], f)
        for w, f in words_freq.items()
    }
    merges = []
    for k in range(1, rounds + 1):
        sym: dict[str, int] = {}
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in seqs.values():
            for s in syms:
                sym[s] = sym.get(s, 0) + f
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = min(
            pairs.items(),
            key=lambda kv: (
                -Fraction(kv[1], sym[kv[0][0]] * sym[kv[0][1]]),
                f"{kv[0][0]} {kv[0][1]}",
            ),
        )
        (pl, pr), cnt = best
        merged = pl + pr[2:]
        merges.append((k, f"{pl} {pr}", merged, cnt, sym[pl], sym[pr]))
        for w, (syms, f) in seqs.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pl and syms[i + 1] == pr:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = (out, f)
    return merges


def test_wordpiece_parity(spark, ddb):
    run_parity(
        spark, ddb, ta_wordpiece_learn, _wp_oracle(3), "ta_wordpiece_learn"
    )


def test_wordpiece_matches_pure_python_reference(spark):
    words_freq = {
        w: int(f)
        for w, f in duckdb.sql(
            f"""SELECT w, COUNT(*) FROM (
                  SELECT unnest(string_split(text, ' ')) AS w
                  FROM read_parquet('{SF_DIR}/documents.parquet'))
                WHERE w <> '' GROUP BY w"""
        ).fetchall()
    }
    ref = _ref_wordpiece(words_freq, 5)
    got = learn_wordpiece_merges(spark, SF_DIR, rounds=5).collect()
    assert len(got) == len(ref)
    for r, (k, pair, merged, cnt, cl, cr) in zip(got, ref):
        assert (r.rank, r.pair, r.merged) == (k, pair, merged)
        assert (r.cnt_pair, r.cnt_left, r.cnt_right) == (cnt, cl, cr)
        # the emitted score is rounded to 9dp by the operator
        assert r.score == pytest.approx(cnt / (cl * cr), abs=5e-10)


def test_wordpiece_encode_matches_pure_python_greedy(spark):
    """Greedy longest-match-first segmentation recomputed naively per
    word (vocab = ##-marked seed alphabet ∪ the R=3 reference merges),
    then rolled up per doc — must equal the operator's output."""
    from tts_data_pipeline_spark.plans.corpus import ta_wordpiece_encode

    words_freq = {
        w: int(f)
        for w, f in duckdb.sql(
            f"""SELECT w, COUNT(*) FROM (
                  SELECT unnest(string_split(text, ' ')) AS w
                  FROM read_parquet('{SF_DIR}/documents.parquet'))
                WHERE w <> '' GROUP BY w"""
        ).fetchall()
    }
    merges = _ref_wordpiece(words_freq, 3)
    vocab = {m[2] for m in merges}
    for w in words_freq:
        vocab.add(w[0])
        vocab.update("##" + c for c in w[1:])

    def segment(w: str):
        pos, cnt = 0, 0
        while pos < len(w):
            for l in range(len(w) - pos, 0, -1):
                piece = w[:l] if pos == 0 else "##" + w[pos : pos + l]
                if piece in vocab:
                    pos += l
                    cnt += 1
                    break
            else:
                return None  # [UNK]
        return cnt

    seg = {w: segment(w) for w in words_freq}
    assert all(c is not None for c in seg.values())
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    got = {
        r.doc_id: (r.n_words, r.n_pieces, r.n_unk_words)
        for r in ta_wordpiece_encode(spark, SF_DIR).collect()
    }
    checked = 0
    for doc_id, text in docs:
        ws = [w for w in text.split(" ") if w != ""]
        if not ws:
            assert doc_id not in got
            continue
        assert got[doc_id] == (len(ws), sum(seg[w] for w in ws), 0), doc_id
        checked += 1
    assert checked >= 400


def test_wordpiece_differs_from_bpe_argmax(spark):
    """The likelihood score must actually change the selection vs raw
    pair count on this corpus — otherwise the trainer isn't exercising
    its distinguishing statistic.  (cnt_pair of the chosen pair is NOT
    the global max pair count.)"""
    rows = learn_wordpiece_merges(spark, SF_DIR, rounds=1).collect()
    assert rows
    words_freq = {
        w: int(f)
        for w, f in duckdb.sql(
            f"""SELECT w, COUNT(*) FROM (
                  SELECT unnest(string_split(text, ' ')) AS w
                  FROM read_parquet('{SF_DIR}/documents.parquet'))
                WHERE w <> '' GROUP BY w"""
        ).fetchall()
    }
    pairs: dict[tuple[str, str], int] = {}
    for w, f in words_freq.items():
        syms = [w[0]] + ["##" + c for c in w[1:]]
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + f
    max_cnt = max(pairs.values())
    assert rows[0].cnt_pair < max_cnt, (
        "likelihood argmax coincides with count argmax — threshold the "
        "corpus differently or the test is vacuous"
    )


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=12),
    pl_pick=st.integers(0, 10),
)
def test_double_space_merge_trick_equals_sequential(word, pl_pick):
    """The double-space ``replace`` trick (shared by the BPE and
    WordPiece learners) must equal the naive sequential left-to-right
    merge on the ##-marked symbol string — including overlapping
    occurrences (aaa with merge (a, ##a) → [aa, ##a], NOT [aa, ##aa]),
    which is exactly what the double-spacing exists to get right."""
    syms = [word[0]] + ["##" + c for c in word[1:]]
    # pick an adjacent pair that actually occurs (or skip)
    pairs = list(dict.fromkeys(zip(syms, syms[1:])))
    if not pairs:
        return
    pl, pr = pairs[pl_pick % len(pairs)]
    merged = pl + pr[2:]

    # naive sequential greedy left-to-right application
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pl and syms[i + 1] == pr:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1

    # the string trick, exactly as the learner's withColumn applies it
    s = " " + " ".join(syms) + " "
    t = s.replace(" ", "  ")
    t = t.replace(" " + pl + "  " + pr + " ", " " + merged + " ")
    t = t.replace("  ", " ")
    assert t.strip().split(" ") == out, (word, pl, pr)
