"""Unigram language-model tokenizer (SentencePiece's default
algorithm; Kudo 2018, "Subword Regularization") — the probabilistic
complement to ``functions/bpe.py``: instead of greedy merges, learn a
piece vocabulary with probabilities by EM and segment with Viterbi.

Faithfulness note: this is VITERBI-EM (hard assignments — each word's
expected piece counts come from its single best segmentation) with
count-based pruning, the standard lightweight approximation of Kudo's
soft EM + likelihood-loss pruning. The training loop lives entirely on
the word HISTOGRAM (Heaps-law-bounded, same contract as BPE training:
the one corpus-sized shuffle is the (word, count) aggregation, the EM
loop is driver-side over ≤ ``max_words`` rows), so the approximation
trades likelihood optimality, never scalability.

Encoding is exact Viterbi under the final piece log-probs, run as an
Arrow-batched pandas UDF with a per-batch word memo (each distinct
word segments once per batch) — identical shape to ``bpe_encode``.

Guarantees tested:
- single characters are never pruned → every word of known chars
  segments (full coverage); unknown chars get a per-char floor score;
- Viterbi optimality vs brute-force enumeration on short words;
- frequent collocations surface as multi-char pieces and are USED.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.bpe import word_histogram

# score assigned per unknown character (log-space): worse than any
# real piece so known segmentations always win, finite so coverage
# never fails
_UNK_LOGP = -20.0


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs — O(n·L)."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            s = logp.get(piece)
            if s is None:
                if i - j == 1:
                    s = _UNK_LOGP  # unknown single char: floor, not failure
                else:
                    continue
            cand = best[j] + s
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 512,
    max_piece_len: int = 8,
    seed_size: int = 20_000,
    em_iters: int = 4,
    shrink: float = 0.8,
    max_words: int = 2_000_000,
) -> dict[str, float]:
    """piece → logprob. Pipeline: distributed (word, count) histogram
    → driver EM (module docstring). ``shrink`` keeps that fraction of
    multi-char pieces per pruning round until ``vocab_size`` is hit."""
    rows = (
        word_histogram(df, text_col)
        .orderBy(F.desc("count"), "word")
        .limit(max_words + 1)
        .collect()
    )
    if len(rows) > max_words:
        raise ValueError(
            f"word histogram exceeds max_words={max_words}; raise the cap "
            "or tighten the pre-tokenizer"
        )
    words = [(r["word"], int(r["count"])) for r in rows]

    # seed: every substring ≤ max_piece_len, weighted by word count
    seed: Counter = Counter()
    chars: set[str] = set()
    for w, c in words:
        chars.update(w)
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + ln]] += c
    singles = {ch for ch in chars}
    multi = [p for p, _ in seed.most_common() if len(p) > 1][: seed_size]
    vocab = set(multi) | singles

    def normalize(counts: Counter) -> dict[str, float]:
        total = sum(counts.values()) or 1
        return {p: math.log(c / total) for p, c in counts.items() if c > 0}

    logp = normalize(Counter({p: seed[p] for p in vocab}))

    while True:
        for _ in range(em_iters):
            counts: Counter = Counter()
            for w, c in words:
                for piece in _viterbi(w, logp, max_piece_len):
                    counts[piece] += c
            # single chars never die (coverage invariant)
            for ch in singles:
                counts[ch] += 1
            logp = normalize(counts)
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = max(0, vocab_size - len(singles))
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * shrink))
        ranked = sorted(
            (p for p in logp if len(p) > 1), key=lambda p: -logp[p]
        )[:keep]
        vocab = set(ranked) | singles
        logp = {p: s for p, s in logp.items() if p in vocab}
    return logp


def unigram_encode(
    df: DataFrame,
    text_col: str,
    logp: dict[str, float],
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Append ``out_col`` = the document's Viterbi segmentation
    (pieces of all pre-tokenized words, concatenated in order)."""
    import re

    from fenix_spark.functions.texthash import BPE_TOKEN_RE

    lexer = re.compile(BPE_TOKEN_RE)
    max_len = max((len(p) for p in logp), default=1)
    model = dict(logp)

    @F.pandas_udf("array<string>")
    def enc(texts):  # type: ignore[no-untyped-def]
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def one(t: str) -> list[str]:
            out: list[str] = []
            for w in lexer.findall(t or ""):
                hit = memo.get(w)
                if hit is None:
                    hit = _viterbi(w, model, max_len)
                    memo[w] = hit
                out.extend(hit)
            return out

        return pd.Series([one(t) for t in texts])

    return df.withColumn(out_col, enc(F.col(text_col)))


def save_unigram(spark, logp: dict[str, float], path: str) -> None:
    """Persist piece→logprob as a parquet table (the whole model)."""
    rows = [(p, float(s)) for p, s in sorted(logp.items())]
    spark.createDataFrame(rows, "piece string, logp double").write.mode(
        "overwrite"
    ).parquet(path)


def load_unigram(spark, path: str) -> dict[str, float]:
    return {r["piece"]: r["logp"] for r in spark.read.parquet(path).collect()}
