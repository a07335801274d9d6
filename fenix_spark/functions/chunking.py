"""Document chunking — fixed-size overlapping windows as native
expressions.

The standard pre-embedding step (RAG / long-document indexing): split
each document into ``size``-character chunks with ``overlap``
characters of context carried between neighbors. Built entirely from
``sequence`` + ``transform`` + ``substring`` — the explode happens
where the text lives, so at 100 TB chunking is scan-speed map work
with no shuffle, and the output is ready for ``operators.search`` /
``operators.index`` embedding pipelines (chunk ids are (doc_id,
chunk_no), stable under any partitioning).

Character windows are deliberate: token-exact windows need the
tokenizer in the loop (an Arrow-batched UDF a caller can swap in);
character windows with whitespace snapping cover the common case with
zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_spans(text: Column, size: int, overlap: int = 0) -> Column:
    """array<struct<chunk_no int, start int, chunk string>> over
    ``text``: windows of ``size`` chars starting every
    ``size − overlap`` chars (1-based starts, Spark substring
    convention). The final window may be shorter; empty text yields
    one empty chunk so every document survives the explode."""
    if size <= 0:
        raise ValueError("size must be positive")
    if not 0 <= overlap < size:
        raise ValueError("overlap must satisfy 0 <= overlap < size")
    step = size - overlap
    n = F.length(text)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(step)
    )
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_no"),
            s.cast("int").alias("start"),
            F.substring(text, s, size).alias("chunk"),
        ),
    )


def chunk_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Explode documents into (id, chunk_no, start, chunk, n_chars)
    rows — one scan, no shuffle; downstream embedding/indexing keys on
    (id, chunk_no)."""
    spans = chunk_spans(F.col(text_col), size, overlap)
    return df.select(
        F.col(id_col),
        F.explode(spans).alias("__c"),
    ).select(
        id_col,
        F.col("__c.chunk_no").alias("chunk_no"),
        F.col("__c.start").alias("start"),
        F.col("__c.chunk").alias("chunk"),
        F.length("__c.chunk").alias("n_chars"),
    )
