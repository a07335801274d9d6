"""WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer)
— completing the tokenizer trio next to BPE (`functions/bpe.py`) and
unigram-LM (`functions/unigram.py`). Same scale contract as both: the
ONE corpus-sized shuffle is the (word, count) histogram; training
runs driver-side on the Heaps-law-bounded histogram; encoding is
Arrow-batched with a per-batch word memo.

How it differs from BPE (same greedy merge loop, different objective):
BPE merges the most FREQUENT pair; WordPiece merges the pair with the
highest LIKELIHOOD GAIN under a unigram LM over the current symbols,

    score(a, b) = count(ab) / (count(a) · count(b))

so a moderately frequent pair of two RARE symbols merges before a
frequent pair of ubiquitous symbols. Continuation pieces carry the
``##`` prefix (BERT convention); the model artifact is just the VOCAB
(exactly what BERT ships), and inference is greedy
longest-match-first — no merge ranks needed at encode time.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fenix_spark.functions.bpe import word_histogram

UNK = "[UNK]"
CONT = "##"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(
        ch if i == 0 else CONT + ch for i, ch in enumerate(word)
    )


def _merge_symbol(a: str, b: str) -> str:
    return a + (b[len(CONT) :] if b.startswith(CONT) else b)


def train_wordpiece_on_histogram(
    hist: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int = 2,
) -> list[str]:
    """Greedy likelihood-gain merge loop over a (word, count)
    histogram; returns the VOCAB (initial alphabet pieces + merged
    pieces in creation order). Deterministic: ties break on the pair
    itself. Incremental pair/symbol-count maintenance exactly like
    ``bpe.train_bpe_on_histogram`` — applying a merge touches only
    the words containing the pair; the argmax rescans the pair table
    (scores depend on CURRENT symbol counts, so they cannot be
    cached across merges)."""
    words: list[tuple[tuple[str, ...], int]] = [
        (_word_symbols(w), c) for w, c in hist if w
    ]
    pair_counts: Counter = Counter()
    sym_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (sym, c) in enumerate(words):
        for s in sym:
            sym_counts[s] += c
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(idx)

    alphabet = sorted(sym_counts)
    merged: list[str] = []
    for _ in range(num_merges):
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
        new_sym = _merge_symbol(a, b)
        merged.append(new_sym)
        for idx in list(pair_words[(a, b)]):
            sym, c = words[idx]
            for s in sym:
                sym_counts[s] -= c
            for pa, pb in zip(sym, sym[1:]):
                pair_counts[(pa, pb)] -= c
                pair_words[(pa, pb)].discard(idx)
            out: list[str] = []
            i, n = 0, len(sym)
            while i < n:
                if i + 1 < n and sym[i] == a and sym[i + 1] == b:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_word = tuple(out)
            words[idx] = (new_word, c)
            for s in new_word:
                sym_counts[s] += c
            for pa, pb in zip(new_word, new_word[1:]):
                pair_counts[(pa, pb)] += c
                pair_words[(pa, pb)].add(idx)
    return alphabet + merged


def train_wordpiece(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    max_words: int = 2_000_000,
) -> list[str]:
    """Distributed word histogram → driver-side merge loop; the
    collect is histogram-sized and capped loudly (same contract and
    cap semantics as ``bpe.train_bpe``)."""
    hist_df = word_histogram(df, text_col)
    rows = hist_df.orderBy(F.desc("count"), "word").limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"word histogram exceeds max_words={max_words}; raise the cap "
            "(driver memory permitting) or normalize/pre-tokenize harder"
        )
    return train_wordpiece_on_histogram(
        [(r["word"], r["count"]) for r in rows], num_merges
    )


def wordpiece_encode_word(
    word: str, vocab: set[str], max_chars: int = 200
) -> list[str]:
    """BERT's greedy longest-match-first: the longest vocab piece at
    each position (``##``-prefixed after the first); any unmatchable
    position makes the WHOLE word ``[UNK]`` (BERT semantics — partial
    pieces of an unknown word would corrupt downstream counts)."""
    if not word or len(word) > max_chars:
        return [UNK]
    out: list[str] = []
    i = 0
    while i < len(word):
        end = len(word)
        piece = None
        while end > i:
            cand = word[i:end] if i == 0 else CONT + word[i:end]
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        i = end
    return out


def wordpiece_encode(
    df: DataFrame,
    text_col: str,
    vocab: list[str],
    out_col: str = "pieces",
) -> DataFrame:
    """Append an array<string> piece column — Arrow-batched with a
    per-batch word memo (the same encode shape as ``bpe_encode``);
    the vocab ships once per executor via the closure."""
    import pandas as pd

    from fenix_spark.functions.bpe import pre_tokens

    vset = set(vocab)

    def gen(batches):
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            out = []
            for ws in pdf["__words"]:
                pieces: list[str] = []
                # ws arrives as a numpy array (truthiness is ambiguous)
                for w in (ws if ws is not None else []):
                    got = memo.get(w)
                    if got is None:
                        got = wordpiece_encode_word(w, vset)
                        memo[w] = got
                    pieces.extend(got)
                out.append(pieces)
            pdf = pdf.drop(columns="__words")
            pdf[out_col] = out
            yield pdf

    src = df.withColumn("__words", pre_tokens(F.col(text_col)))
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return src.mapInPandas(gen, f"{schema}, {out_col} array<string>")


def save_wordpiece(spark: SparkSession, vocab: list[str], path: str) -> None:
    """Vocab as a (rank, piece) parquet table — plain data, readable
    anywhere, order-preserving."""
    spark.createDataFrame(
        list(enumerate(vocab)), "rank int, piece string"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_wordpiece(spark: SparkSession, path: str) -> list[str]:
    return [
        r.piece
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]
