"""Streaming heavy hitters — continuous Misra-Gries summaries per
term shard, the streaming counterpart of ``sketches.heavy_hitters``.

Design:

- terms are sharded by ``hash60(term) % shards`` so summary
  maintenance parallelizes across the cluster AND a given term always
  lands in the same shard (its counts fold into one summary — the MG
  error bound stays per-shard N_shard/(m+1));
- each shard's summary lives in keyed state as parallel
  (terms, lower-bounds) arrays plus a monotonically-increasing
  ``version``; every batch the shard re-emits its current top terms
  stamped with the new version, so readers take max-version rows per
  shard and merge (`merged_heavy_hitters`);
- emitted counts are MG lower bounds (within N_shard/(m+1) of the
  true count); the batch operator's exact verify pass has no
  streaming equivalent without re-reading history — the documented
  trade.

Built on ``applyInPandasWithState``. (Spark 4's successor API,
``transformWithStateInPandas`` with typed MapState, is the natural
port — its state-server protocol requires the ``protobuf`` package,
which this image lacks, so the older-but-equivalent API is used and
tested instead.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fenix_spark.functions.texthash import hash60, tokens

OUTPUT_SCHEMA = "shard int, version bigint, term string, lb bigint"
STATE_SCHEMA = "terms array<string>, lbs array<bigint>, version bigint"


def _fold_shard(key, pdfs, state: GroupState, m: int, emit_top: int):
    import pandas as pd

    from fenix_spark.operators.sketches import _mg_shrink

    if state.exists:
        terms, lbs, ver = state.get
        cur = dict(zip(terms, (int(x) for x in lbs)))
    else:
        cur, ver = {}, 0
    for pdf in pdfs:
        for t, c in pdf["term"].value_counts().items():
            cur[t] = cur.get(t, 0) + int(c)
    cur = _mg_shrink(cur, m)
    ver += 1
    state.update((list(cur.keys()), list(cur.values()), ver))
    top = sorted(cur.items(), key=lambda kv: (-kv[1], kv[0]))[:emit_top]
    yield pd.DataFrame(
        {
            "shard": [key[0]] * len(top),
            "version": [ver] * len(top),
            "term": [t for t, _ in top],
            "lb": [c for _, c in top],
        }
    )


def stream_heavy_hitters(
    stream_df: DataFrame,
    text_col: str,
    shards: int = 32,
    m: int = 256,
    emit_top: int = 64,
    tokenize: bool = True,
) -> DataFrame:
    """Transformed streaming frame (shard, version, term, lb) —
    append-mode emissions of each shard's current summary top."""
    src = (
        stream_df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        if tokenize
        else stream_df.select(F.col(text_col).alias("term"))
    )
    sharded = src.withColumn("shard", (hash60(F.col("term")) % shards).cast("int"))
    return sharded.groupBy("shard").applyInPandasWithState(
        lambda key, pdfs, state: _fold_shard(key, pdfs, state, m, emit_top),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merged_heavy_hitters(emissions: DataFrame, k: int) -> DataFrame:
    """Top-k terms from the landed emissions: keep each shard's
    latest-version rows (earlier snapshots are superseded), union
    shards, rank by lower bound."""
    from pyspark.sql import Window

    # windowed max, not a groupBy+self-join: avoids conflicting-
    # reference resolution on sink views and saves a shuffle
    w = Window.partitionBy("shard")
    cur = emissions.withColumn("__maxv", F.max("version").over(w)).where(
        F.col("version") == F.col("__maxv")
    )
    return (
        cur.groupBy("term")
        .agg(F.sum("lb").alias("lb"))
        .orderBy(F.col("lb").desc(), F.col("term").asc())
        .limit(k)
    )
