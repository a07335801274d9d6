"""Byte-pair-encoding tokenizer: distributed training, Arrow-batched
application.

Upgrades the curation stack's "BPE-ish" regex count (textstats.
bpe_token_count — the pre-tokenizer shape only) to a REAL learned BPE
(Sennrich et al. 2016): merges are trained on the corpus and applied
per document.

Scale shape (how production BPE trainers actually work, e.g. HF
tokenizers / SentencePiece):

1. Pre-tokenize + count words DISTRIBUTED: one explode + one groupBy —
   the only corpus-sized shuffle, and its payload is (word, count)
   pairs, not documents.
2. The merge loop runs on the WORD HISTOGRAM, not the corpus: the
   histogram is vocabulary-sized (≤ a few million rows for a 100 TB
   natural-language corpus — Heaps' law), so it is collected to the
   driver where each merge is an O(|histogram|) in-memory pass with
   incremental pair-count maintenance. ``max_words`` caps the collect
   and over-cap is an ERROR, not a silent truncation; the histogram
   keeps the top rows by (count desc, word) so truncation-by-choice is
   deterministic.
3. Applying merges is per-row work: a pandas UDF with a per-batch memo
   (corpora repeat words heavily, so each distinct word is encoded
   once per batch) — embarrassingly parallel, no shuffle.

Determinism contract: merge selection breaks count ties by pair
lexicographic order; the result is a pure function of the histogram,
hence of the corpus — retraining on a repartitioned corpus yields
byte-identical merge tables (tested).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import BPE_TOKEN_RE

END = "</w>"  # end-of-word sentinel (Sennrich convention)


def pre_tokens(c: Column) -> Column:
    """The pre-tokenizer split (letter runs / digit runs / single
    punctuation) — the same lexer textstats.bpe_token_count counts."""
    return F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)


def word_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count) over the pre-tokenized corpus — the one
    corpus-sized shuffle of BPE training (8-40 byte rows)."""
    from fenix_spark.operators.dedup import spread

    return (
        spread(df)
        .select(F.explode(pre_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe_on_histogram(
    hist: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a (word, count) histogram.

    Incremental pair maintenance: applying a merge touches only the
    words containing the merged pair (indexed), so the update is
    O(words-containing-pair); the argmax scan is O(|distinct pairs|)
    per merge (a heap would amortize it — not needed at histogram
    sizes). Stops early when no pair occurs twice."""
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (END,), c) for w, c in hist if w
    ]
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (sym, c) in enumerate(words):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for pair, cnt in pair_counts.items():
            if cnt < 2:
                continue
            key = (-cnt, pair)
            if best is None or key < best:
                best = key
        if best is None:
            break
        pair = best[1]
        merges.append(pair)
        for idx in list(pair_words[pair]):
            sym, c = words[idx]
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] -= c
                pair_words[(a, b)].discard(idx)
            new_sym = _merge_word(sym, pair)
            words[idx] = (new_sym, c)
            for a, b in zip(new_sym, new_sym[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(idx)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    max_words: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Distributed word count → driver-side merge loop (module
    docstring). The collect is histogram-sized; exceeding ``max_words``
    raises with the two legitimate outs (raise the cap / tighten the
    pre-tokenizer) rather than silently training on a prefix."""
    hist_df = word_histogram(df, text_col)
    rows = hist_df.orderBy(F.desc("count"), "word").limit(max_words + 1).collect()
    if len(rows) > max_words:
        raise ValueError(
            f"word histogram exceeds max_words={max_words}; raise the cap "
            "(driver memory permitting) or normalize/pre-tokenize harder"
        )
    return train_bpe_on_histogram([(r["word"], r["count"]) for r in rows], num_merges)


def merges_to_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge table as a DataFrame — write it through the catalog like
    any table (``catalog.make(root, name, merges_to_df(...))``) and the
    tokenizer becomes a versioned, shareable artifact."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def merges_from_df(df: DataFrame) -> list[tuple[str, str]]:
    """Inverse of ``merges_to_df`` (rank order restored regardless of
    storage order)."""
    return [
        (r["left"], r["right"])
        for r in sorted(df.collect(), key=lambda r: r["rank"])
    ]


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by rank order (lowest rank first —
    exactly the training greedy order, the standard BPE inference)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` = the document's BPE token array.

    The merge table rides to executors in the UDF closure (it is
    vocabulary-sized); each Arrow batch keeps a word→tokens memo so a
    distinct word is encoded once per batch regardless of frequency."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    import re

    lexer = re.compile(BPE_TOKEN_RE)

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(text: str) -> list[str]:
            out: list[str] = []
            for w in lexer.findall(text or ""):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))


def save_bpe(spark: SparkSession, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table (delegates to ``merges_to_df`` — ONE
    schema definition for the catalog and the file paths)."""
    merges_to_df(spark, merges).write.mode("overwrite").parquet(path)


def load_bpe(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    return merges_from_df(spark.read.parquet(path))
