"""WordPiece tests: likelihood-vs-frequency objective (the contrast
with BPE), parity of the incremental trainer against a naive
recompute-everything reference, BERT greedy longest-match encode
semantics, Spark end-to-end, and model save/load."""

from __future__ import annotations

from collections import Counter

import pytest

from fenix_spark.functions.wordpiece import (
    CONT,
    UNK,
    _merge_symbol,
    _word_symbols,
    load_wordpiece,
    save_wordpiece,
    train_wordpiece,
    train_wordpiece_on_histogram,
    wordpiece_encode,
    wordpiece_encode_word,
)


def _naive_train(hist, num_merges, min_pair_count=2):
    """Recompute-everything reference: same objective, zero shared
    code with the incremental trainer beyond the two symbol helpers."""
    words = [(list(_word_symbols(w)), c) for w, c in hist if w]
    alphabet = sorted({s for sym, c in words for s in sym})
    merged = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        sym_counts: Counter = Counter()
        for sym, c in words:
            for s in sym:
                sym_counts[s] += c
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += c
        best = None
        for pair, cnt in pair_counts.items():
            if cnt < min_pair_count:
                continue
            denom = sym_counts[pair[0]] * sym_counts[pair[1]]
            if denom <= 0:
                continue
            key = (-(cnt / denom), pair)
            if best is None or key < best:
                best = key
        if best is None:
            break
        a, b = best[1]
        new = _merge_symbol(a, b)
        merged.append(new)
        for i, (sym, c) in enumerate(words):
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                    out.append(new)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = (out, c)
    return alphabet + merged


HIST = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]


def test_objective_differs_from_bpe():
    """On the classic corpus the most FREQUENT pair is (##u, ##g)
    (count 20), but WordPiece's likelihood score prefers a pair of
    rarer symbols — the two objectives pick different first merges."""
    from fenix_spark.functions.bpe import train_bpe_on_histogram

    wp = train_wordpiece_on_histogram(HIST, num_merges=1)
    first_wp = wp[-1]  # vocab = alphabet + [first merge]
    bpe_first = train_bpe_on_histogram(HIST, num_merges=1)[0]
    assert "".join(bpe_first).replace("</w>", "") == "ug"
    assert first_wp != "##ug"
    # and the choice matches the naive reference exactly
    assert first_wp == _naive_train(HIST, 1)[-1]


@pytest.mark.parametrize("n_merges", [1, 3, 8, 20])
def test_incremental_matches_naive(n_merges):
    import random

    rng = random.Random(4)
    hist = [
        (
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 7))),
            rng.randint(1, 30),
        )
        for _ in range(40)
    ]
    # dedupe words (histogram contract)
    agg: dict[str, int] = {}
    for w, c in hist:
        agg[w] = agg.get(w, 0) + c
    hist = sorted(agg.items())
    assert train_wordpiece_on_histogram(hist, n_merges) == _naive_train(
        hist, n_merges
    )


def test_greedy_longest_match_encode():
    vocab = {"un", "##able", "##ab", "##le", "a", "##b", "##l", "##e", "u", "##n"}
    assert wordpiece_encode_word("unable", vocab) == ["un", "##able"]
    assert wordpiece_encode_word("u", vocab) == ["u"]
    # unmatchable char anywhere → the whole word is [UNK]
    assert wordpiece_encode_word("unxble", vocab) == [UNK]
    assert wordpiece_encode_word("", vocab) == [UNK]


def test_spark_end_to_end(spark, tmp_path):
    texts = [
        ("the hug was huge",),
        ("a pug can hug",),
        ("pun and bun",),
        ("hugs for the pug",),
    ] * 5
    df = spark.createDataFrame(texts, "text string")
    vocab = train_wordpiece(df, "text", num_merges=30)
    out = wordpiece_encode(df, "text", vocab).collect()
    assert all(len(r.pieces) > 0 for r in out)
    # trained alphabet covers the corpus → no UNK anywhere
    assert all(UNK not in r.pieces for r in out)
    # pieces reassemble the pre-tokenized words exactly
    r0 = out[0]
    joined = "".join(p[len(CONT):] if p.startswith(CONT) else " " + p for p in r0.pieces).strip()
    assert joined == r0.text

    path = str(tmp_path / "wp")
    save_wordpiece(spark, vocab, path)
    assert load_wordpiece(spark, path) == vocab
