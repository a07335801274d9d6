"""Streaming sketch maintenance — keep distinct-count and frequency
summaries CONTINUOUSLY up to date as data lands, without ever
re-scanning history.

Mergeability (operators/sketches.py) is exactly what makes sketches
streamable: each micro-batch contributes its own partial summary, and
any read merges partials. State layout follows the repo's idempotent
foreachBatch convention (streaming/dedup.py): every batch writes ONLY
its own ``batch_id=N`` subdirectory, so

- a retried batch overwrites itself → exactly-once summaries over
  at-least-once foreachBatch, no read-modify-write race;
- the state is append-only; readers never see a torn merge because
  merging happens at READ time (`read_hll_rollup` / `read_cms`) over
  whatever complete batch directories exist;
- compaction is optional hygiene, not correctness: when partial count
  grows, `compact_state` folds everything into one dir under the
  separate ``compact=K`` namespace (never a batch id — the stream's
  checkpoint owns those and would overwrite a fold).

Cost ledger: per batch, the HLL fold shuffles ≤ |groups| sketch rows
(~1.5 KB each) and the CMS fold ≤ depth×width count rows — both
independent of batch row count after map-side partial aggregation.
Reads merge B·|groups| (or B·d·w) rows for B batch partials — that is
what `compact_state` bounds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fenix_spark.operators.sketches import cms_build, hll_merge, hll_rollup
from fenix_spark.streaming.fsutil import (
    complete_partial_ids,
    delete_path,
    read_text,
    write_text,
)


def _partial_paths(spark: SparkSession, root: str) -> list[str]:
    """Every complete partial: live batch dirs PLUS compaction folds
    (folds use their own ``compact=K`` namespace — the streaming
    query numbers ``batch_id`` from its OWN checkpoint, so a fold
    stored under a future batch id would be overwritten by that
    batch's foreachBatch when it arrives). Discovery goes through the
    Hadoop FileSystem API (fsutil), so an HDFS/S3A state_root works
    the same as a local one."""
    return [
        f"{root}/batch_id={b}"
        for b in complete_partial_ids(spark, root, "batch_id")
    ] + [
        f"{root}/compact={k}"
        for k in complete_partial_ids(spark, root, "compact")
    ]


def stream_hll_rollup(
    stream_df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    state_root: str,
    lg_k: int = 12,
):
    """foreachBatch writer: each micro-batch's per-group HLL partial
    lands under ``state_root/batch_id=N``. Returns the writeStream
    (caller picks the trigger and starts it)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = hll_rollup(batch_df, list(keys), value_col, lg_k)
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_hll_rollup(
    spark: SparkSession, state_root: str, keys: Sequence[str]
) -> DataFrame:
    """Merge every landed batch partial to the requested grain:
    (keys..., hll, distinct_est). ``keys`` ⊆ the rollup keys (empty →
    grand total)."""
    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no sketch state under {state_root}")
    return hll_merge(spark.read.parquet(*paths), list(keys))


def stream_cms(
    stream_df: DataFrame,
    term_col: str,
    state_root: str,
    depth: int = 4,
    width: int = 2048,
    tokenize: bool = False,
):
    """foreachBatch writer for a streaming count-min sketch over a
    term column (or tokenized text column with ``tokenize=True``)."""
    from fenix_spark.functions.texthash import tokens

    def process(batch_df: DataFrame, batch_id: int) -> None:
        terms = (
            batch_df.select(F.explode(tokens(F.col(term_col))).alias("term"))
            if tokenize
            else batch_df.select(F.col(term_col).alias("term"))
        )
        sk = cms_build(terms, "term", depth, width)
        sk.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def stream_bloom(
    stream_df: DataFrame,
    value_col: str,
    state_root: str,
    m_bits: int = 1 << 20,
    k: int = 5,
):
    """foreachBatch writer for a streaming Bloom filter of a key
    column — the continuously-maintained "have we ever seen this key"
    summary (e.g. ingested URL/doc-id sets for downstream join
    pre-filtering). Same idempotent ``batch_id=N`` layout: a retried
    batch overwrites its own partial, and the read-time bit_or merge
    is the union-of-sets semantics, so at-least-once delivery can
    only re-set already-set bits."""
    from fenix_spark.operators.sketches import bloom_build

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = bloom_build(batch_df, value_col, m_bits, k)
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_bloom(spark: SparkSession, state_root: str) -> DataFrame:
    """The merged (word, bits) filter over all landed batches — feed
    it to ``sketches.bloom_to_words`` / ``bloom_contains_expr``."""
    from fenix_spark.operators.sketches import bloom_merge

    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no sketch state under {state_root}")
    return bloom_merge(spark.read.parquet(*paths))


def read_cms(spark: SparkSession, state_root: str) -> DataFrame:
    """The merged sketch (r, b, c) over all landed batches — feed it
    to ``sketches.cms_estimate``."""
    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no sketch state under {state_root}")
    parts = spark.read.parquet(*paths)
    return parts.groupBy("r", "b").agg(F.sum("c").alias("c"))


def compact_state(spark: SparkSession, state_root: str) -> int:
    """Fold all partials into one dir under the ``compact=K``
    NAMESPACE — never a ``batch_id``: the streaming query numbers its
    micro-batches from its OWN checkpoint, so a fold written to
    ``batch_id=max+1`` would be OVERWRITTEN (history silently lost)
    when that batch id eventually fires. Folds and batches are
    disjoint namespaces; readers merge both.

    Write-then-delete ordering means a crash mid-compaction leaves
    EXTRA partials (merge-safe for HLL by union set-semantics; for
    CMS it is a bounded over-count window — run compaction in the
    maintenance lane, not concurrent with point reads that must be
    exact). Returns the new compact id."""
    batch_ids = complete_partial_ids(spark, state_root, "batch_id")
    compact_ids = complete_partial_ids(spark, state_root, "compact")
    inputs = [f"{state_root}/batch_id={b}" for b in batch_ids] + [
        f"{state_root}/compact={k}" for k in compact_ids
    ]
    if len(inputs) <= 1:
        return compact_ids[-1] if compact_ids else -1
    parts = spark.read.parquet(*inputs)
    cols = parts.columns
    if read_text(spark, f"{state_root}/_decay_cfg") is not None:
        # decayed-counts fold: plain sum at the state's full grain
        # (linear and exact; all partials share the sidecar anchor)
        group = [c for c in cols if c != "w"]
        folded = parts.groupBy(*group).agg(F.sum("w").alias("w"))
    elif "sample_pri" in cols:
        from fenix_spark.operators.sampling import priority_merge

        # priority-sample fold at the stream's own (k, keys, id) — all
        # sidecar-pinned; re-selection of a union is idempotent, so
        # crash-window extra partials are merge-safe (set semantics)
        cfg = read_text(spark, f"{state_root}/_pri_cfg")
        if cfg is None:
            raise FileNotFoundError(
                f"missing _pri_cfg sidecar under {state_root}"
            )
        cfg_k, _salt, pri_id, pri_keys = cfg.strip().split("|", 3)
        folded = priority_merge(
            parts,
            [c for c in pri_keys.split(",") if c],
            pri_id,
            int(cfg_k),
        )
    elif "sample_h" in cols:
        from fenix_spark.operators.sampling import bottomk_merge

        # bottom-k sample fold — same idempotent re-selection story
        cfg = read_text(spark, f"{state_root}/_bk_cfg")
        if cfg is None:
            raise FileNotFoundError(
                f"missing _bk_cfg sidecar under {state_root}"
            )
        cfg_k, _salt, bk_id, bk_keys = cfg.strip().split("|", 3)
        folded = bottomk_merge(
            parts,
            [c for c in bk_keys.split(",") if c],
            bk_id,
            int(cfg_k),
        )
    elif {"r", "b", "c"} <= set(cols):
        folded = parts.groupBy("r", "b").agg(F.sum("c").alias("c"))
    elif {"word", "bits"} <= set(cols):
        folded = parts.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    elif {"item", "weight"} <= set(cols):
        from fenix_spark.operators.sketches import kll_merge

        # KLL fold: recompact at the rollup's full grain. The crash
        # window (write-then-delete) leaves extra partials → a merge
        # would double-weight; like CMS, run in the maintenance lane.
        # k comes from the _kll_k sidecar stream_kll wrote: folding a
        # k=500 stream at the default 200 would irreversibly coarsen
        # its rank resolution.
        folded = kll_merge(
            parts,
            [c for c in cols if c not in ("item", "weight")],
            k=_kll_state_k(spark, state_root),
        )
    elif {"bin", "c"} <= set(cols):
        # hist fold: plain sum at the rollup's full grain (exact)
        group = [c for c in cols if c != "c"]
        folded = parts.groupBy(*group).agg(F.sum("c").alias("c"))
    elif "value" in cols and "hll" not in cols:
        from fenix_spark.operators.sketches import theta_merge

        # theta fold at the stream's own k (sidecar) — deterministic,
        # and crash-window extra partials are merge-safe (set union)
        text = read_text(spark, f"{state_root}/_theta_k")
        folded = theta_merge(
            parts,
            [c for c in cols if c != "value"],
            int(text.strip()) if text else 1024,
        )
    else:
        group = [c for c in cols if c != "hll"]
        folded = parts.groupBy(*group).agg(F.hll_union_agg("hll").alias("hll"))
    new_id = (compact_ids[-1] + 1) if compact_ids else 0
    folded.write.mode("overwrite").parquet(f"{state_root}/compact={new_id}")
    for p in inputs:
        delete_path(spark, p)
    return new_id


def stream_kll(
    stream_df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    state_root: str,
    k: int = 200,
):
    """foreachBatch writer for streaming quantile sketches: each
    micro-batch's per-group KLL partial (sketch rows, ~k·log(n/k) per
    group) lands under ``batch_id=N``. Same idempotence story — a
    retried batch overwrites only its own partial; read-time merge is
    KLL's native merge, so at-least-once delivery never double-counts
    a committed batch.

    ``k`` is persisted in a ``_kll_k`` sidecar next to the partials so
    maintenance (``compact_state``) and reads recompact at the
    stream's OWN resolution — a k=500 stream folded at the default
    k=200 would be silently and irreversibly coarsened. Re-attaching
    with a different k than the sidecar raises (mixed-k partials
    would make the merge bound the MIN k, not the requested one)."""
    from fenix_spark.operators.sketches import kll_rollup

    spark = stream_df.sparkSession
    existing = read_text(spark, f"{state_root}/_kll_k")
    if existing is not None and int(existing.strip()) != k:
        raise ValueError(
            f"state at {state_root} was built with k={existing.strip()}; "
            f"re-attach with that k (got k={k}) or use a fresh state_root"
        )
    write_text(spark, f"{state_root}/_kll_k", str(k))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = kll_rollup(batch_df, list(keys), value_col, k)
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def _kll_state_k(spark: SparkSession, state_root: str, default: int = 200) -> int:
    """The k a KLL state was built with (``_kll_k`` sidecar), falling
    back to the build default for pre-sidecar state dirs."""
    text = read_text(spark, f"{state_root}/_kll_k")
    return int(text.strip()) if text else default


def read_kll(
    spark: SparkSession, state_root: str, keys: Sequence[str], k: int | None = None
) -> DataFrame:
    """Merge every landed batch partial to the requested grain
    (``keys`` ⊆ the rollup keys; empty → grand total) — feed the
    result to ``sketches.kll_quantiles``. ``k`` defaults to the value
    the stream was built with (``_kll_k`` sidecar)."""
    from fenix_spark.operators.sketches import kll_merge

    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no sketch state under {state_root}")
    if k is None:
        k = _kll_state_k(spark, state_root)
    return kll_merge(spark.read.parquet(*paths), list(keys), k)


def stream_theta(
    stream_df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    state_root: str,
    k: int = 1024,
):
    """foreachBatch writer for streaming theta/KMV distinct sketches —
    the continuously-maintained distinct-count-with-set-algebra state
    (operators/sketches.theta_rollup). Identical idempotence story to
    the other sketch streams (batch_id=N partials, read-time merge);
    on top of it, theta is fully DETERMINISTIC (pure function of the
    value set), so replays and reorderings land byte-identical
    sketches. k rides the ``_theta_k`` sidecar so maintenance folds at
    the stream's own resolution; re-attaching at a different k
    raises."""
    from fenix_spark.operators.sketches import theta_rollup

    spark = stream_df.sparkSession
    existing = read_text(spark, f"{state_root}/_theta_k")
    if existing is not None and int(existing.strip()) != k:
        raise ValueError(
            f"state at {state_root} was built with k={existing.strip()}; "
            f"re-attach with that k (got k={k}) or use a fresh state_root"
        )
    write_text(spark, f"{state_root}/_theta_k", str(k))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = theta_rollup(batch_df, list(keys), value_col, k)
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_theta(
    spark: SparkSession, state_root: str, keys: Sequence[str], k: int | None = None
) -> DataFrame:
    """Merge every landed batch partial to the requested grain — feed
    the result to ``sketches.theta_estimate`` / ``theta_set_ops``.
    ``k`` defaults to the sidecar value the stream was built with."""
    from fenix_spark.operators.sketches import theta_merge

    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no sketch state under {state_root}")
    if k is None:
        text = read_text(spark, f"{state_root}/_theta_k")
        k = int(text.strip()) if text else 1024
    return theta_merge(spark.read.parquet(*paths), list(keys), k)


def stream_hist(
    stream_df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    state_root: str,
    lo: float,
    hi: float,
    bins: int = 128,
):
    """foreachBatch writer for streaming equi-width histograms — the
    live side of drift monitoring (operators/drift.py): maintain the
    stream's distribution as mergeable (keys, bin, c) partials, then
    ``hist_drift(reference, read_hist(...), keys)`` scores PSI/JSD/TV
    against a frozen reference without touching any raw history.
    (lo, hi, bins) are FIT parameters — persisted in a ``_hist_meta``
    sidecar; re-attaching with a different layout raises (bins from
    different layouts are incomparable, the hist_merge contract)."""
    from fenix_spark.operators.sketches import hist_rollup

    spark = stream_df.sparkSession
    meta = f"{lo!r},{hi!r},{bins}"
    existing = read_text(spark, f"{state_root}/_hist_meta")
    if existing is not None and existing.strip() != meta:
        raise ValueError(
            f"state at {state_root} was built with (lo,hi,bins)="
            f"({existing.strip()}); got ({meta}) — use a fresh state_root"
        )
    write_text(spark, f"{state_root}/_hist_meta", meta)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = hist_rollup(batch_df, list(keys), value_col, lo, hi, bins)
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_hist(spark: SparkSession, state_root: str, keys: Sequence[str]) -> DataFrame:
    """The merged (keys..., bin, c) rollup over all landed batches —
    feed to ``hist_quantiles`` (with the sidecar's lo/hi/bins) or
    ``hist_drift``. Histogram merge is plain sum (exact), so
    at-least-once extra partials from a compaction crash window are
    the only over-count source — same contract as CMS."""
    from fenix_spark.operators.sketches import hist_merge

    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no sketch state under {state_root}")
    return hist_merge(spark.read.parquet(*paths), list(keys))


def hist_state_layout(spark: SparkSession, state_root: str) -> tuple[float, float, int]:
    """The (lo, hi, bins) a hist state was built with (sidecar)."""
    text = read_text(spark, f"{state_root}/_hist_meta")
    if text is None:
        raise FileNotFoundError(f"no _hist_meta sidecar under {state_root}")
    lo, hi, bins = text.strip().split(",")
    return float(lo), float(hi), int(bins)


def stream_counts(
    stream_df: DataFrame,
    keys: Sequence[str],
    cat_col: str,
    state_root: str,
):
    """foreachBatch writer for streaming CATEGORICAL counts — the live
    side of ``drift.freq_drift``: per-batch (keys..., bin, c) partials
    (bin = the category), merge = plain sum (exact). Feed
    ``read_counts(...)`` straight into ``drift.hist_drift`` against a
    frozen reference counts table to watch a language/source/status
    mix drift in real time. compact_state's {bin, c} fold arm covers
    this state too (string bins fold the same as int bins)."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = (
            batch_df.where(F.col(cat_col).isNotNull())
            .groupBy(*keys, F.col(cat_col).alias("bin"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_counts(
    spark: SparkSession, state_root: str, keys: Sequence[str]
) -> DataFrame:
    """The merged (keys..., bin, c) categorical counts over all landed
    batches — hist_drift-ready."""
    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no counts state under {state_root}")
    return (
        spark.read.parquet(*paths)
        .groupBy(*keys, "bin")
        .agg(F.sum("c").alias("c"))
    )


def stream_priority(
    stream_df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    weight_col: str,
    state_root: str,
    k: int = 256,
    salt: str = "",
):
    """foreachBatch writer for a LIVE priority sample
    (operators/sampling.priority_sample — Duffield-Lund-Thorup): each
    batch lands its own top-(k+1)-per-group state partial; a read
    re-selects, which is EXACTLY the direct sample of everything
    landed (priorities are a pure function of (id, weight, salt), so
    replays/reorders/crash-window extras are all merge-safe — the
    union re-selection is idempotent). The standing answer to "keep k
    representative-by-weight examples per source, with unbiased
    subset-sum estimates, as the corpus grows".

    ``k``/``salt``/``id_col`` ride sidecars so maintenance folds at
    the stream's own configuration; re-attaching with different ones
    raises."""
    from fenix_spark.operators.sampling import priority_sample

    spark = stream_df.sparkSession
    cfg = f"{k}|{salt}|{id_col}|{','.join(keys)}"
    existing = read_text(spark, f"{state_root}/_pri_cfg")
    if existing is not None and existing.strip() != cfg:
        raise ValueError(
            f"state at {state_root} was built with (k|salt|id)="
            f"{existing.strip()!r}; re-attach with that configuration "
            f"(got {cfg!r}) or use a fresh state_root"
        )
    write_text(spark, f"{state_root}/_pri_cfg", cfg)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = priority_sample(
            batch_df, list(keys), id_col, weight_col, k, salt
        )
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_priority(
    spark: SparkSession,
    state_root: str,
    keys: Sequence[str],
    k: int | None = None,
) -> DataFrame:
    """Merge every landed batch partial into the current sample STATE
    (top-(k+1) rows per group) — feed to ``sampling.priority_take``
    for the usable k-row sample with unbiased estimates. ``k``
    defaults to the sidecar the stream was built with."""
    from fenix_spark.operators.sampling import priority_merge

    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no priority-sample state under {state_root}")
    cfg = read_text(spark, f"{state_root}/_pri_cfg")
    if cfg is None:
        raise FileNotFoundError(f"missing _pri_cfg sidecar under {state_root}")
    cfg_k, _salt, id_col, _keys = cfg.strip().split("|", 3)
    if k is None:
        k = int(cfg_k)
    return priority_merge(spark.read.parquet(*paths), list(keys), id_col, k)


def stream_decay(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_ms_col: str,
    state_root: str,
    t_ref_ms: int,
    half_life_ms: int,
    weight_col: str | None = None,
):
    """foreachBatch writer for live half-life-decayed counts
    (operators/timeseries.decayed_counts — the trending-score
    summary): each batch lands its own exact (keys..., w) partial at
    the sidecar anchor; merge is plain sum (linear), so replays
    overwrite idempotently and compaction is exact. Read with
    ``read_decay`` (optionally re-anchored to "now")."""
    from fenix_spark.operators.timeseries import decayed_counts

    spark = stream_df.sparkSession
    cfg = f"{t_ref_ms}|{half_life_ms}"
    existing = read_text(spark, f"{state_root}/_decay_cfg")
    if existing is not None and existing.strip() != cfg:
        raise ValueError(
            f"state at {state_root} was built with (t_ref|half_life)="
            f"{existing.strip()!r}; re-attach with that configuration "
            f"(got {cfg!r}) or use a fresh state_root"
        )
    write_text(spark, f"{state_root}/_decay_cfg", cfg)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = decayed_counts(
            batch_df, list(keys), ts_ms_col, t_ref_ms, half_life_ms,
            weight_col=weight_col,
        )
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_decay(
    spark: SparkSession,
    state_root: str,
    keys: Sequence[str],
    t_now_ms: int | None = None,
) -> DataFrame:
    """Merged decayed mass per key; pass ``t_now_ms`` to re-anchor the
    scores to query time (summary-sized multiply)."""
    from fenix_spark.operators.timeseries import decayed_merge, decayed_shift

    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no decay state under {state_root}")
    cfg = read_text(spark, f"{state_root}/_decay_cfg")
    if cfg is None:
        raise FileNotFoundError(f"missing _decay_cfg sidecar under {state_root}")
    t_ref, hl = (int(x) for x in cfg.strip().split("|"))
    merged = decayed_merge(spark.read.parquet(*paths), list(keys))
    if t_now_ms is not None and t_now_ms != t_ref:
        merged = decayed_shift(merged, t_ref, t_now_ms, hl)
    return merged


def stream_bottomk(
    stream_df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    state_root: str,
    k: int = 256,
    salt: str = "",
):
    """foreachBatch writer for a LIVE uniform bottom-k sample
    (operators/sampling.bottomk_sample): per-batch bottom-k partials;
    a read re-selects, which equals the direct sample of everything
    landed EXACTLY (hashes are a pure function of (id, salt) — same
    merge-safety story as the priority stream). The standing "k
    example rows per source, always current" view."""
    from fenix_spark.operators.sampling import bottomk_sample

    spark = stream_df.sparkSession
    cfg = f"{k}|{salt}|{id_col}|{','.join(keys)}"
    existing = read_text(spark, f"{state_root}/_bk_cfg")
    if existing is not None and existing.strip() != cfg:
        raise ValueError(
            f"state at {state_root} was built with (k|salt|id|keys)="
            f"{existing.strip()!r}; re-attach with that configuration "
            f"(got {cfg!r}) or use a fresh state_root"
        )
    write_text(spark, f"{state_root}/_bk_cfg", cfg)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        part = bottomk_sample(batch_df, list(keys), id_col, k, salt)
        part.write.mode("overwrite").parquet(f"{state_root}/batch_id={batch_id}")

    return stream_df.writeStream.foreachBatch(process)


def read_bottomk(
    spark: SparkSession,
    state_root: str,
    keys: Sequence[str],
    k: int | None = None,
) -> DataFrame:
    """The merged current sample over all landed batches."""
    from fenix_spark.operators.sampling import bottomk_merge

    paths = _partial_paths(spark, state_root)
    if not paths:
        raise FileNotFoundError(f"no bottom-k state under {state_root}")
    cfg = read_text(spark, f"{state_root}/_bk_cfg")
    if cfg is None:
        raise FileNotFoundError(f"missing _bk_cfg sidecar under {state_root}")
    cfg_k, _salt, id_col, _keys = cfg.strip().split("|", 3)
    if k is None:
        k = int(cfg_k)
    return bottomk_merge(spark.read.parquet(*paths), list(keys), id_col, k)
