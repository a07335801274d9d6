"""Unigram tokenizer tests: Viterbi optimality vs brute force,
coverage invariants, collocation discovery and use, vocab budget,
Spark encode parity with the driver-side segmenter."""

from __future__ import annotations

import itertools
import math

import pytest

from fenix_spark.functions.unigram import _viterbi, train_unigram, unigram_encode


def _brute_best(word, logp):
    n = len(word)
    best_score, best_seg = -math.inf, None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        seg, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                seg.append(word[start:i])
                start = i
        seg.append(word[start:])
        s = 0.0
        ok = True
        for p in seg:
            if p in logp:
                s += logp[p]
            elif len(p) == 1:
                s += -20.0
            else:
                ok = False
                break
        if ok and s > best_score:
            best_score, best_seg = s, seg
    return best_seg, best_score


def test_viterbi_matches_bruteforce():
    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "c": math.log(0.1),
        "ab": math.log(0.25), "bc": math.log(0.1), "abc": math.log(0.05),
    }
    for word in ("a", "ab", "abc", "abca", "cabab", "bcbcab"):
        got = _viterbi(word, logp, 3)
        want, want_score = _brute_best(word, logp)
        got_score = sum(logp.get(p, -20.0) for p in got)
        assert abs(got_score - want_score) < 1e-12
        assert "".join(got) == word
        assert got == want or abs(got_score - want_score) < 1e-12


def test_unknown_chars_floor_not_crash():
    logp = {"a": math.log(0.5)}
    seg = _viterbi("axa", logp, 4)
    assert seg == ["a", "x", "a"]


@pytest.fixture(scope="module")
def corpus(spark):
    # "ing" and "ther" are high-frequency collocations
    rows = [
        (i, "running jumping singing weather whether together gathering " * 3)
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def model(corpus):
    return train_unigram(corpus, "text", vocab_size=80, max_piece_len=6)


def test_collocations_learned_and_used(spark, corpus, model):
    assert "ing" in model
    enc = unigram_encode(corpus.limit(1), "text", model).first().unigram_tokens
    assert "ing" in enc
    assert "".join(enc).startswith("runningjumping")  # lossless concat


def test_vocab_budget_and_coverage(model):
    singles = {p for p in model if len(p) == 1}
    multi = {p for p in model if len(p) > 1}
    assert len(multi) + len(singles) <= 80 + len(singles)  # budget on multi
    # every corpus character survives as a piece
    for ch in "runningjumpingsingingweatherwhethertogethergathering":
        assert ch in singles


def test_spark_encode_matches_driver_viterbi(spark, corpus, model):
    import re

    from fenix_spark.functions.texthash import BPE_TOKEN_RE

    row = corpus.first()
    got = unigram_encode(corpus.limit(1), "text", model).first().unigram_tokens
    lexer = re.compile(BPE_TOKEN_RE)
    max_len = max(len(p) for p in model)
    want = []
    for w in lexer.findall(row.text):
        want.extend(_viterbi(w, model, max_len))
    assert list(got) == want


def test_tokenizer_persistence_roundtrip(spark, corpus, model, tmp_path):
    """Saved models reload into byte-identical encoders (BPE and
    unigram both)."""
    from fenix_spark.functions.bpe import bpe_encode, load_bpe, save_bpe, train_bpe
    from fenix_spark.functions.unigram import load_unigram, save_unigram

    save_unigram(spark, model, str(tmp_path / "uni"))
    back = load_unigram(spark, str(tmp_path / "uni"))
    assert back == model
    a = unigram_encode(corpus.limit(3), "text", model).collect()
    b = unigram_encode(corpus.limit(3), "text", back).collect()
    assert [list(r.unigram_tokens) for r in a] == [list(r.unigram_tokens) for r in b]

    merges = train_bpe(corpus, "text", num_merges=30)
    save_bpe(spark, merges, str(tmp_path / "bpe"))
    merges2 = load_bpe(spark, str(tmp_path / "bpe"))
    assert merges2 == merges
    x = bpe_encode(corpus.limit(3), "text", merges).collect()
    y = bpe_encode(corpus.limit(3), "text", merges2).collect()
    assert [list(r.bpe_tokens) for r in x] == [list(r.bpe_tokens) for r in y]
