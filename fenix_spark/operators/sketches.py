"""Mergeable sketch operators — the pre-aggregation patterns that make
interactive analytics possible at 100 TB.

The core idea shared by every operator here: compute a SMALL mergeable
summary once per fine-grained group (per day, per source, per
partition), persist it like any table, and answer coarser queries by
MERGING summaries — never by re-scanning the raw data. Re-aggregating
a 100 TB fact table for every dashboard tile is the anti-pattern these
replace.

Five summaries, by exactness and key type:

- **HLL distinct rollup** (`hll_rollup` / `hll_merge`): approximate
  COUNT(DISTINCT x) for any type, ~1.5 KB per group at lg_k=12
  (±~1.6% rel. error). Spark-native `hll_sketch_agg` /
  `hll_union_agg` (Datasketches HLL — the same sketches BigQuery and
  Snowflake expose), so merging is a first-class aggregate.
- **Bitmap distinct rollup** (`bitmap_rollup` / `bitmap_merge`):
  EXACT mergeable COUNT(DISTINCT int_key) via Spark's bitmap
  functions — dense ids compress to bits; merge is bitmap OR.
- **Count-min sketch** (`cms_build` / `cms_merge` / `cms_estimate`):
  frequency point-queries with one-sided error (never under-counts),
  built RELATIONALLY — the sketch is a (row, bucket, count) DataFrame
  of at most depth×width rows, so it is engine-portable (md5 bucket
  hashing, DuckDB-mirrorable), mergeable by plain sum, and inspectable
  with SQL. Estimate error ≤ e/width · N with prob ≥ 1 − e^-depth.
- **Histogram rollup** (`hist_rollup` / `hist_quantiles`): exact-
  mergeable equi-width histograms for quantile queries at any grain
  (error ≤ one bin width); merge is plain sum, DuckDB-mirrorable.
- **Misra-Gries heavy hitters** (`heavy_hitters`): the deterministic
  frequent-items summary. Per-partition Misra-Gries summaries (m
  counters each, Counter-per-Arrow-batch then summary-merge, so the
  hot loop is C-speed) are unioned and merged; every term whose true
  count exceeds N/m is guaranteed to surface. A final exact pass
  (semi-join on the ≤ m·P candidate terms) replaces lower-bound
  estimates with EXACT counts, so returned counts carry no error —
  only completeness has the N/m bound, and it is reported.
- **Theta / KMV sketch** (`theta_rollup` / `theta_merge` /
  `theta_estimate` / `theta_set_ops` / `overlap_matrix`): distinct
  counting WITH SET ALGEBRA — intersection / union / Jaccard between
  sketches (HLL unions but cannot intersect), RSE ≈ 1/√(k−2). Fully
  deterministic (k smallest xxhash64 values — a pure function of the
  value set), so merges are EXACTLY layout-independent and a sketch
  holding < k values is exact. The decontamination / snapshot-overlap
  audit tool: "how many eval ids are in the training crawl" from two
  persisted k-row sketches, no data rescan.
- **Bloom filter** (`bloom_build` / `bloom_merge` /
  `bloom_contains_expr`): one-sided set membership (no false
  negatives) as a sparse (word, bits) DataFrame — md5 positions like
  CMS, mergeable by bitwise OR, DuckDB-mirrorable. The scale use is
  KEY PRE-FILTERING: a 1M-bit filter of table B's join keys is
  ~128 KB; testing table A against it as a pure scan expression
  drops most non-matching rows BEFORE the join shuffle, with the
  false-positive stragglers eliminated by the join itself.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60

# ------------------------------------------------------------------ HLL


def hll_rollup(
    df: DataFrame, keys: Sequence[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """(keys..., hll) — one ~1.5 KB Datasketches HLL sketch per group.
    Persist this at the finest grain you'll ever query (e.g. per day ×
    source); every coarser distinct-count comes from `hll_merge`
    without touching the fact table again."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll")
    )


def hll_merge(rollup: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge sketches up to a coarser grain: (keys..., hll, distinct_est).
    ``keys`` may be empty for a grand total."""
    merged = rollup.groupBy(*keys).agg(F.hll_union_agg("hll").alias("hll"))
    return merged.withColumn(
        "distinct_est", F.hll_sketch_estimate("hll").cast("bigint")
    )


def hll_estimate(rollup: DataFrame) -> DataFrame:
    """Append ``distinct_est`` to a rollup without merging."""
    return rollup.withColumn(
        "distinct_est", F.hll_sketch_estimate("hll").cast("bigint")
    )


# --------------------------------------------------------------- bitmap


def bitmap_rollup(
    df: DataFrame, keys: Sequence[str], int_col: str
) -> DataFrame:
    """EXACT mergeable distinct-count summary for an integer key:
    (keys..., bucket, bmp). Spark's bitmap functions shard the id space
    into fixed 32768-bit buckets (`bitmap_bucket_number`), so each
    group holds one 4 KB bitmap per TOUCHED bucket — dense ids cost
    ~1 bit each, sparse ids one bucket row per 32k range."""
    return (
        df.select(*keys, F.col(int_col).alias("v"))
        .withColumn("bucket", F.bitmap_bucket_number("v"))
        .groupBy(*keys, "bucket")
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("v")).alias("bmp"))
    )


def bitmap_merge(rollup: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge to a coarser grain: (keys..., distinct_exact). OR the
    bitmaps within each (group, bucket), count bits, sum over buckets.
    Exactness is structural: a bit is set iff the id occurred."""
    ored = rollup.groupBy(*keys, "bucket").agg(F.bitmap_or_agg("bmp").alias("bmp"))
    return (
        ored.withColumn("c", F.bitmap_count("bmp"))
        .groupBy(*keys)
        .agg(F.sum("c").alias("distinct_exact"))
    )


# ------------------------------------------------------------------ CMS


def cms_build(
    terms: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Relational count-min sketch of a term stream: (r, b, c) with
    r < depth, b < width, c = Σ weight of terms hashing to (r, b).

    The ONLY shuffle carries at most depth×width keys (map-side
    partial aggregation collapses each partition to ≤ d·w rows), so
    sketch cost is independent of term cardinality — the reason to use
    it over exact groupBy(term) when terms are unbounded (URLs,
    n-grams) at 100 TB. Row r's hash is md5-based (`hash60` of
    ``r‖term``) — engine-portable, no seeds to coordinate."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("bigint")
    rows = terms.select(
        F.posexplode(
            F.array(
                *[
                    hash60(F.concat(F.lit(f"{r}|"), F.col(term_col))) % width
                    for r in range(depth)
                ]
            )
        ).alias("r", "b"),
        w.alias("w"),
    )
    return rows.groupBy("r", "b").agg(F.sum("w").alias("c"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): elementwise
    sum — the linearity that makes CMS a distributed/streaming
    summary."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("r", "b").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """(term, est) for each candidate term: est = min over rows r of
    the (r, hash_r(term)) counter — the classic one-sided estimate,
    est ≥ true count always. (depth, width) must match the build call;
    the sketch side is ≤ d·w rows and is broadcast."""
    probes = candidates.select(
        F.col(term_col).alias("term"),
        F.posexplode(
            F.array(
                *[
                    hash60(F.concat(F.lit(f"{r}|"), F.col(term_col))) % width
                    for r in range(depth)
                ]
            )
        ).alias("r", "b"),
    )
    joined = probes.join(F.broadcast(sketch), ["r", "b"], "left")
    return joined.groupBy("term").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")
    )


# --------------------------------------------------- Misra-Gries top-k


def _mg_shrink(counts: dict, m: int) -> dict:
    """Misra-Gries summary invariant: keep ≤ m counters by subtracting
    the (m+1)-th largest value from all and dropping ≤ 0 — each shrink
    under-counts every survivor by at most that pivot, and the total
    under-count per stream is ≤ N/(m+1)."""
    if len(counts) <= m:
        return counts
    pivot = sorted(counts.values(), reverse=True)[m]
    return {t: c - pivot for t, c in counts.items() if c > pivot}


def heavy_hitters(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    m: int = 512,
    tokenize: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """The k most frequent terms with EXACT counts, at a cost that
    never shuffles the full term universe.

    Pass 1 (one scan): per-partition Misra-Gries summaries of size
    ≤ m. Each Arrow batch is counted with a C-speed ``value_counts``;
    batch counts fold into the running summary which is shrunk to m
    counters (`_mg_shrink`). Each partition ships ≤ m (term, lb) rows.
    Guarantee: any term with global count > N/(m+1) appears in at
    least one partition summary (its global under-count is < N/(m+1)).

    Pass 2 (one scan): exact counts for the candidate union via a
    broadcast semi-join on ≤ m·P candidate terms — groupBy shuffles
    only candidate terms. Returned counts are exact; the
    completeness bound is ATTACHED as the ``count_floor`` column
    (⌊N/(m+1)⌋, N = total term weight): every term with true count
    above it is guaranteed present, the tail below it may not be."""
    import pandas as pd

    from fenix_spark.operators.dedup import spread
    from fenix_spark.functions.texthash import tokens

    src = spread(df)
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    if tokenize:
        if weight_col:
            raise ValueError("weight_col applies to pre-tokenized term rows (tokenize=False)")
        terms = src.select(F.explode(tokens(F.col(text_col))).alias("term"), F.lit(1).cast("bigint").alias("w"))
    else:
        terms = src.select(F.col(text_col).alias("term"), w.alias("w"))

    mm = m

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        total_w = 0
        for pdf in batches:
            total_w += int(pdf["w"].sum())
            for t, c in pdf.groupby("term")["w"].sum().items():
                counts[t] = counts.get(t, 0) + int(c)
            counts = _mg_shrink(counts, mm)
        yield pd.DataFrame(
            {
                "term": list(counts.keys()) + [None],
                "lb": list(counts.values()) + [total_w],
            }
        )

    if tokenize:
        # Pass 1 ships per-doc token ARRAYS across the Arrow boundary,
        # not exploded token rows (guide §4: boundary rows drop ~100×
        # — one row per document instead of one per token, and an
        # Arrow list<string> is one contiguous buffer + offsets).
        # Tokens are flattened and counted batch-at-a-time in C
        # (pyarrow list_flatten + value_counts); the running summary
        # merges and shrinks vectorized. Batch boundaries differ from
        # the exploded form, so the CANDIDATE SET may differ — the MG
        # guarantee (any term with count > N/(m+1) survives in some
        # partition summary) holds under any batching, and pass 2
        # computes exact counts, so the returned rows are identical
        # (pinned by tests/test_sketches.py adversarial corpus).
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        def summarize_arrays(
            batches: "Iterator[pa.RecordBatch]",
        ) -> "Iterator[pa.RecordBatch]":
            running: pd.Series | None = None
            total_w = 0
            for rb in batches:
                flat = pc.list_flatten(rb.column(0))
                total_w += len(flat)  # null terms count toward N, as
                # in the exploded form (groupby dropped them from
                # counters but their weight stayed in total_w)
                vc = pc.drop_null(flat).value_counts()
                s = pd.Series(
                    vc.field("counts").to_numpy(zero_copy_only=False),
                    index=vc.field("values").to_pandas(),
                )
                running = s if running is None else running.add(s, fill_value=0)
                if len(running) > mm:
                    vals = running.to_numpy()
                    # same invariant as _mg_shrink: subtract the
                    # (m+1)-th largest, keep strictly-positive
                    pivot = np.partition(vals, -(mm + 1))[-(mm + 1)]
                    running = running[vals > pivot] - pivot
            out_terms = [] if running is None else list(running.index)
            out_lbs = (
                []
                if running is None
                else [int(x) for x in running.to_numpy()]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_terms + [None], type=pa.string()),
                    pa.array(out_lbs + [total_w], type=pa.int64()),
                ],
                names=["term", "lb"],
            )

        doc_toks = src.select(tokens(F.col(text_col)).alias("toks"))
        partials = doc_toks.mapInArrow(summarize_arrays, "term string, lb bigint")
    else:
        partials = terms.mapInPandas(summarize, "term string, lb bigint")
    # the NULL-term sentinel row per partition carries that partition's
    # total weight, so N (the completeness bound's numerator) comes out
    # of the SAME pass — no third scan. The grouped summary (≤ m·P + 1
    # rows) feeds TWO consumers (candidate broadcast + the floor row),
    # so truncate its lineage: the MG Arrow pass runs exactly ONCE per
    # invocation. (It previously ran twice — an eager .first() at plan-
    # build time collected N to bake count_floor in as a literal, then
    # the returned plan recomputed the whole pass for the candidates.)
    from fenix_spark.checkpoint import checkpoint_lazy

    grouped = (
        partials.groupBy("term")
        .agg(F.sum("lb").alias("lb"))
        .transform(checkpoint_lazy)
    )
    candidates = grouped.where(F.col("term").isNotNull())
    floor_row = grouped.where(F.col("term").isNull()).select(
        F.expr(f"CAST(coalesce(sum(lb), 0) DIV {mm + 1} AS BIGINT)").alias(
            "count_floor"
        )
    )

    exact = (
        terms.join(F.broadcast(candidates.select("term")), "term", "left_semi")
        .groupBy("term")
        .agg(F.sum("w").alias("count"))
    )
    return (
        exact.join(F.broadcast(floor_row))
        .orderBy(F.col("count").desc(), F.col("term").asc())
        .limit(k)
    )


# ----------------------------------------------- histogram / quantiles


def hist_rollup(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """(keys..., bin, c) — an EXACT-mergeable equi-width histogram
    summary for quantile queries at any grain (the fixed-layout cousin
    of t-digest: coarser tails, but merge = plain sum and the layout
    is engine-portable so DuckDB reproduces it bit-for-bit).

    Values are clamped into [lo, hi] (bin 0 / bins−1 catch
    out-of-range mass); quantile error is bounded by the bin width
    (hi−lo)/bins. Per group the summary is ≤ bins rows — like the
    other sketches, persist at the finest grain and merge upward."""
    v = F.col(value_col).cast("double")
    width = (hi - lo) / bins
    b = F.least(
        F.lit(bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    # nulls OUT, explicitly: greatest() skips nulls, so a null value
    # would otherwise silently land in bin 0 and drag every quantile
    # toward lo — the histogram summarizes the non-null distribution
    return (
        df.where(v.isNotNull())
        .select(*keys, b.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hist_merge(rollup: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge to a coarser grain: (keys..., bin, c)."""
    return rollup.groupBy(*keys, "bin").agg(F.sum("c").alias("c"))


def hist_quantiles(
    rollup: DataFrame,
    keys: Sequence[str],
    qs: Sequence[float],
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """(keys..., q, value) — quantile estimates from a (merged)
    histogram summary: the upper edge of the first bin whose
    cumulative count reaches q·N. Error ≤ one bin width by
    construction. Windowed cumulative over ≤ bins rows per group —
    summary-sized work, not data-sized."""
    from pyspark.sql import Window

    width = (hi - lo) / bins
    merged = hist_merge(rollup, keys)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy("bin") if keys else Window.orderBy("bin")
    tot = Window.partitionBy(*[F.col(k) for k in keys]) if keys else Window.partitionBy()
    cum = merged.select(
        *keys,
        "bin",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(tot).alias("n"),
    )
    # all quantiles in ONE pass (explode + min-bin groupBy, the
    # kll_quantiles shape) rather than a union arm per q — same
    # result, one summary-sized shuffle instead of |qs|
    t = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).where(F.col("cum") >= F.col("q") * F.col("n"))
    return t.groupBy(*keys, "q").agg(
        (F.lit(lo) + (F.min("bin") + 1) * F.lit(width)).alias("value")
    )


def hist_rollup_auto(
    df: DataFrame, keys: Sequence[str], value_col: str, bins: int = 128
) -> tuple[DataFrame, float, float]:
    """``hist_rollup`` with the range read from the data (one min/max
    aggregation — a cheap pushdown-friendly scan). Returns
    (rollup, lo, hi) so quantile queries reuse the fitted range.
    The range is a FIT parameter: persist (lo, hi) with the rollup;
    merging rollups requires identical ranges (assert, don't guess)."""
    row = df.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    ).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None:
        raise ValueError(f"hist_rollup_auto: {value_col} has no non-null values")
    if hi <= lo:
        hi = lo + 1.0  # degenerate single-value column: one bin wide
    return hist_rollup(df, keys, value_col, lo, hi, bins), lo, hi


# ---------------------------------------------------------------- Bloom

_BLOOM_WORD_BITS = 32
# bits live in the LOW 32 bits of a stored BIGINT word: shifting into
# bit 63 would overflow DuckDB's checked << (and flip the sign in
# Spark), so the portable choice is 32-bit words in 64-bit storage


def _bloom_positions(value: Column, m_bits: int, k: int) -> list[Column]:
    """k md5-derived bit positions for a value — engine-portable (the
    same ``hash60(i‖value)`` scheme as CMS rows; no seeds to
    coordinate between builders)."""
    return [
        hash60(F.concat(F.lit(f"{i}|"), value.cast("string"))) % m_bits
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Sparse relational Bloom filter of a value column: (word, bits)
    rows, ``word = pos >> 5``, low-32 bit set per position. NULL
    values are skipped (a null key can never be asked for).

    The only shuffle carries ≤ m_bits/32 words (map-side bit_or
    collapses each partition first), so build cost is independent of
    value cardinality. Size the filter as usual: false-positive rate
    ≈ (1 − e^(−k·n/m))^k — m_bits=2^20, k=5 gives < 1% up to ~100k
    distinct values; scale m_bits with n."""
    positions = df.where(F.col(value_col).isNotNull()).select(
        F.explode(
            F.array(*_bloom_positions(F.col(value_col), m_bits, k))
        ).alias("pos")
    )
    bit_lut = F.lit([1 << j for j in range(_BLOOM_WORD_BITS)])
    return (
        positions.select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.element_at(bit_lut, (F.col("pos") % _BLOOM_WORD_BITS + 1).cast("int")).alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Merge filters built with the same (m_bits, k): bitwise OR —
    the union-of-sets semantics that makes Bloom a distributed /
    streaming summary (idempotent under re-merge, so at-least-once
    partial folds are safe)."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_to_words(sketch: DataFrame, m_bits: int = 1 << 20) -> list[int]:
    """Densify a (word, bits) filter to a driver-side word list for
    :func:`bloom_contains_expr`. Driver/plan cost is m_bits/8 bytes
    (2^20 bits → 128 KB) — bounded by the FILTER size you chose, never
    by data size; beyond ~2^26 bits prefer the relational join form
    (explode positions → join the sparse sketch on ``word``)."""
    n_words = m_bits // _BLOOM_WORD_BITS
    words = [0] * n_words
    for r in sketch.collect():
        w = int(r["word"])
        if not 0 <= w < n_words:
            # silently dropping an out-of-range word would lose set
            # bits and turn the one-sided guarantee into FALSE
            # NEGATIVES — an m_bits mismatch between build and densify
            # must fail loudly
            raise ValueError(
                f"bloom word index {w} outside 0..{n_words - 1}: the "
                f"sketch was built with a different m_bits than "
                f"{m_bits} — pass the same m_bits used in bloom_build"
            )
        words[w] = int(r["bits"])
    return words


def bloom_contains_expr(
    value: Column,
    words: list[int],
    m_bits: int = 1 << 20,
    k: int = 5,
) -> Column:
    """Pure scan-side membership test: true iff every one of the k
    positions is set (one-sided — false negatives are impossible, so
    filtering on this NEVER drops a real match). All native
    expressions (md5 + array lookups) inside whole-stage codegen; use
    it to pre-filter a big table's rows against another table's key
    set before the join shuffle.

    The word array enters the plan as ONE let-bound SINGLE-NODE
    literal (metrics.lit_long_array): k naive inlined copies of a
    2^20-bit filter's 32k-element array would multiply plan size (and
    Catalyst analysis cost) by k — and even ONE copy built with
    ``F.lit(list)`` costs a py4j round trip per element plus a
    32k-node tree that every optimizer rule re-traverses (r14,
    measured: ~15 s of driver time per query containing this
    predicate; the single-node literal form is ~0.4 s end to end on
    a 1M-row scan)."""
    from fenix_spark.functions.metrics import lit_long_array
    from fenix_spark.functions.texthash import let

    bit_lut = F.lit([1 << j for j in range(_BLOOM_WORD_BITS)])

    def body(word_lut: Column) -> Column:
        out = None
        for pos in _bloom_positions(value, m_bits, k):
            word = F.element_at(word_lut, F.shiftright(pos, 5).cast("int") + 1)
            bit = F.element_at(bit_lut, (pos % _BLOOM_WORD_BITS + 1).cast("int"))
            check = word.bitwiseAND(bit) != 0
            out = check if out is None else (out & check)
        return out

    return let(lit_long_array(words), body)


# ----------------------------------------------------------------- KLL

_KLL_MIN_CAP = 8
_KLL_DECAY = 2.0 / 3.0


def _kll_caps(k: int, n_levels: int) -> list[int]:
    """Per-level capacities: the top level holds k items, lower levels
    decay by 2/3 (Karnin-Lang-Liberty 2016), floored at 8."""
    import math

    return [
        max(_KLL_MIN_CAP, int(math.ceil(k * _KLL_DECAY ** (n_levels - 1 - i))))
        for i in range(n_levels)
    ]


def _kll_compress(levels: list, k: int, ncomp: int) -> tuple[list, int]:
    """Compact any over-capacity level: sort, promote every other item
    (alternating offset — deterministic for a given input sequence,
    no RNG) to the next level where each item's weight doubles. An odd
    leftover stays at its level, so TOTAL WEIGHT IS CONSERVED EXACTLY
    (sum of weights == number of values fed, pinned in tests)."""
    import numpy as np

    while True:
        caps = _kll_caps(k, len(levels))
        for i in range(len(levels)):
            if len(levels[i]) > caps[i]:
                srt = np.sort(levels[i])
                if len(srt) % 2 == 1:
                    hold, srt = srt[-1:], srt[:-1]
                else:
                    hold = srt[:0]
                promoted = srt[ncomp % 2 :: 2]
                ncomp += 1
                levels[i] = hold
                if i + 1 == len(levels):
                    levels.append(np.empty(0, dtype=np.float64))
                levels[i + 1] = np.concatenate([levels[i + 1], promoted])
                break
        else:
            return levels, ncomp


def _kll_rows(levels: list) -> list[tuple[float, int]]:
    return [
        (float(v), 1 << lvl) for lvl, arr in enumerate(levels) for v in arr
    ]


def _kll_from_weighted(values, weights, k: int) -> list[tuple[float, int]]:
    """Values + power-of-two weights (fresh data comes in at weight 1,
    sketch rows at their level weight) → compacted sketch rows. The
    shared core of build and merge; vectorized — one boolean-mask
    split per level, never a per-item append."""
    import numpy as np

    values = np.asarray(values, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.int64)
    if len(values) == 0:
        return []
    lvls = np.log2(weights.astype(np.float64)).astype(np.int64)
    levels = [values[lvls == lvl] for lvl in range(int(lvls.max()) + 1)]
    levels, _ = _kll_compress(levels, k, 0)
    return _kll_rows(levels)


def kll_rollup(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int = 200
) -> DataFrame:
    """Mergeable KLL quantile sketch per group: (keys..., item,
    weight) rows, ~k·log(n/k) rows per group regardless of n. This is
    the persistable form Spark's own ``approx_percentile`` lacks (its
    aggregation state dies with the query): write the rollup at the
    finest grain once, answer every coarser quantile forever via
    ``kll_merge`` + ``kll_quantiles`` without re-reading the fact
    table.

    Two phases, both bounded: per-PARTITION sketches built in one
    Arrow pass (raw values never shuffle — only sketch rows, the
    sketch-family contract), then one per-group merge+recompact.
    Rank-error ≈ O(1/k)·√log(n/k); k=200 lands near 1% (measured
    bound pinned in tests at generous slack). NULL values are
    excluded, like percentile aggregates. Compaction coins alternate
    deterministically (no RNG): a retried task re-feeding the same
    partition rebuilds the identical partial."""
    import pandas as pd

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    out_schema = (key_schema + ", " if key_schema else "") + "item double, weight long"

    def build(batches):
        import numpy as np

        for pdf in batches:
            frames = []
            for kv, g in (
                pdf.groupby(list(keys), dropna=False, sort=False)
                if keys
                else [((), pdf)]
            ):
                vals = g["__v"].dropna().to_numpy(dtype=np.float64)
                if len(vals) == 0:
                    continue
                rows = _kll_from_weighted(
                    vals, np.ones(len(vals), dtype=np.int64), k
                )
                f = pd.DataFrame(rows, columns=["item", "weight"])
                if keys:
                    kv = kv if isinstance(kv, tuple) else (kv,)
                    for name, val in zip(keys, kv):
                        f[name] = val
                frames.append(f[[*keys, "item", "weight"]])
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(columns=[*keys, "item", "weight"])
            )

    partials = df.select(
        *keys, F.col(value_col).cast("double").alias("__v")
    ).mapInPandas(build, out_schema)
    return _kll_regroup(partials, keys, k, out_schema)


def _kll_regroup(rows: DataFrame, keys: Sequence[str], k: int, schema: str) -> DataFrame:
    import pandas as pd

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rows_ = _kll_from_weighted(
            pdf["item"].to_numpy(), pdf["weight"].to_numpy(), k
        )
        out = pd.DataFrame(rows_, columns=["item", "weight"])
        for name in keys:
            out[name] = pdf[name].iloc[0]
        return out[[*keys, "item", "weight"]]

    if keys:
        return rows.groupBy(*keys).applyInPandas(merge, schema)
    return rows.groupBy().applyInPandas(merge, schema)


def kll_merge(
    rollup: DataFrame, keys: Sequence[str], k: int = 200
) -> DataFrame:
    """Merge sketch rows up to a coarser grain (``keys`` ⊂ the
    rollup's keys; empty for a grand total): union the rows, recompact
    once per group. Weights stay exact powers of two and total weight
    is conserved, so merged quantiles carry the same rank-error class
    as a direct build."""
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in rollup.select(*keys).schema.fields
    )
    schema = (key_schema + ", " if key_schema else "") + "item double, weight long"
    return _kll_regroup(rollup.select(*keys, "item", "weight"), keys, k, schema)


def kll_quantiles(
    rollup: DataFrame, keys: Sequence[str], qs: Sequence[float]
) -> DataFrame:
    """(keys..., q, value) — the lower weighted quantile (smallest
    item whose cumulative weight ≥ q·total) straight from sketch rows,
    ENTIRELY NATIVE: one cumulative-sum window per group + a groupBy.
    q=0/q=1 return the smallest/largest RETAINED item — within rank ε
    of the true extremes but not exact (compaction may drop them; KLL
    implementations that promise exact min/max track them outside the
    compactors — here that is one F.min/F.max agg at build time if a
    caller needs it). No Python touches the query path — sketches are
    built once, interrogated cheaply. With empty ``keys`` the window
    is global and single-partitions its input — fine here, because
    the input is SKETCH ROWS (~k·log(n/k) per group), never data."""
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy(*keys)
        .orderBy(F.col("item").asc(), F.col("weight").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*keys)
    t = rollup.withColumn("__cum", F.sum("weight").over(wcum)).withColumn(
        "__tot", F.sum("weight").over(wall)
    )
    t = t.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).where(F.col("__cum") >= F.col("q") * F.col("__tot"))
    return t.groupBy(*keys, "q").agg(F.min("item").alias("value"))


# ------------------------------------------------ Theta / KMV sketches
#
# The distinct-count summary with SET ALGEBRA: HLL unions but cannot
# intersect, so "how many eval docs are in the training crawl" / "how
# much do two snapshots overlap" is out of its reach. A KMV (k minimum
# values) theta sketch (Beyer et al., "On Synopses for Distinct-Value
# Estimation Under Multiset Operations", SIGMOD'07 — the estimator
# family behind Apache DataSketches' theta sketches) — the k smallest
# 64-bit hash values of a group's distinct items — supports union,
# intersection, and Jaccard
# with bounded relative error (RSE ≈ 1/sqrt(k-2); k=1024 → ~3.1%),
# while staying a plain (keys..., value) row-set like every other
# sketch here: persistable, mergeable (union rows, keep k smallest),
# engine-inspectable. It is also fully DETERMINISTIC — the sketch is
# a pure function of the value set (xxhash64, no RNG), so identical
# data yields the IDENTICAL sketch under any partitioning or retry.
#
# Ordering: SIGNED i64 order of xxhash64 (a uniform hash is uniform
# under any fixed bit-order), mapped to u = h/2^64 + 0.5 ∈ [0,1) for
# estimation. A sketch holding fewer than k rows is EXACT (it IS the
# distinct hash set); estimates then have zero sketch error.


def _theta_u(col: Column) -> Column:
    """hash value → u ∈ [0, 1) under the signed-order mapping."""
    return col / F.lit(float(1 << 64)) + F.lit(0.5)


def theta_rollup(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int = 1024
) -> DataFrame:
    """(keys..., value) — the k smallest distinct ``xxhash64(value)``
    per group (fewer ⇒ the sketch is exact). Two bounded phases, the
    sketch-family contract: per-batch bottom-k partials in one Arrow
    pass (raw values never shuffle — at most k hash rows per group per
    batch do), then one per-group re-selection. NULL values are
    excluded, matching COUNT(DISTINCT)."""
    import pandas as pd

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )
    schema = (key_schema + ", " if key_schema else "") + "value long"

    def build(batches):
        import numpy as np

        for pdf in batches:
            frames = []
            for kv, g in (
                pdf.groupby(list(keys), dropna=False, sort=False)
                if keys
                else [((), pdf)]
            ):
                h = g["__h"].dropna().to_numpy(dtype=np.int64)
                if len(h) == 0:
                    continue
                h = np.unique(h)  # sorted ascending (signed)
                f = pd.DataFrame({"value": h[:k]})
                if keys:
                    kv = kv if isinstance(kv, tuple) else (kv,)
                    for name, val in zip(keys, kv):
                        f[name] = val
                frames.append(f[[*keys, "value"]])
            yield (
                pd.concat(frames)
                if frames
                else pd.DataFrame(columns=[*keys, "value"])
            )

    partials = df.where(F.col(value_col).isNotNull()).select(
        *keys, F.xxhash64(F.col(value_col)).alias("__h")
    ).mapInPandas(build, schema)
    return _theta_regroup(partials, keys, k, schema)


def _theta_regroup(
    rows: DataFrame, keys: Sequence[str], k: int, schema: str
) -> DataFrame:
    import pandas as pd

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        h = np.unique(pdf["value"].to_numpy(dtype=np.int64))
        out = pd.DataFrame({"value": h[:k]})
        for name in keys:
            out[name] = pdf[name].iloc[0]
        return out[[*keys, "value"]]

    if keys:
        return rows.groupBy(*keys).applyInPandas(merge, schema)
    return rows.groupBy().applyInPandas(merge, schema)


def theta_merge(
    rollup: DataFrame, keys: Sequence[str], k: int = 1024
) -> DataFrame:
    """Merge sketch rows to a coarser grain (``keys`` ⊂ the rollup's
    keys; empty for a grand total): distinct-union the values, keep
    the k smallest. Deterministic — merged == direct build on the
    unioned data, EXACTLY (pinned in tests), because bottom-k of a
    set is layout-independent."""
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in rollup.select(*keys).schema.fields
    )
    schema = (key_schema + ", " if key_schema else "") + "value long"
    return _theta_regroup(rollup.select(*keys, "value"), keys, k, schema)


def theta_estimate(
    rollup: DataFrame, keys: Sequence[str], k: int = 1024
) -> DataFrame:
    """(keys..., distinct_est, exact) — ENTIRELY NATIVE over sketch
    rows: a group retaining fewer than k values is exact (the sketch
    is its distinct hash set); otherwise the KMV estimator
    (k−1)/u_max. Pass the k the sketch was BUILT with."""
    g = rollup.groupBy(*keys).agg(
        F.count("value").alias("__n"), F.max("value").alias("__vmax")
    )
    est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) / _theta_u(F.col("__vmax")))
    return g.select(
        *keys,
        est.alias("distinct_est"),
        (F.col("__n") < k).alias("exact"),
    )


def theta_set_ops(
    a: DataFrame, b: DataFrame, keys: Sequence[str], k: int = 1024
) -> DataFrame:
    """Per-key set algebra between two theta rollups built with the
    same ``k``: (keys..., a_est, b_est, intersect_est, union_est,
    jaccard_est). ENTIRELY NATIVE on sketch rows (≤ k per group per
    side): θ = min of the two per-key thresholds (1.0 for an exact
    side), and |A∩B| ≈ |{v ∈ Sa ∩ Sb : u(v) < θ}| / θ — the standard
    theta intersection; the union estimate counts the distinct-union
    below θ, so jaccard is a plain ratio of the two counts and both
    sides exact ⇒ all five numbers exact. Keys present in only one
    rollup come back with intersect 0 and the other side's estimate
    null. Empty ``keys`` compares the two GRAND sketches (one output
    row)."""
    if not keys:
        g = F.lit("__all").alias("__g")
        return theta_set_ops(
            a.select(g, "value"), b.select(g, "value"), ["__g"], k
        ).drop("__g")

    def th(df: DataFrame, tag: str) -> DataFrame:
        g = df.groupBy(*keys).agg(
            F.count("value").alias(f"__n_{tag}"),
            F.max("value").alias(f"__vmax_{tag}"),
        )
        theta = F.when(F.col(f"__n_{tag}") < k, F.lit(1.0)).otherwise(
            _theta_u(F.col(f"__vmax_{tag}"))
        )
        est = F.when(
            F.col(f"__n_{tag}") < k, F.col(f"__n_{tag}").cast("double")
        ).otherwise(F.lit(float(k - 1)) / _theta_u(F.col(f"__vmax_{tag}")))
        return g.select(
            *keys, theta.alias(f"__th_{tag}"), est.alias(f"{tag}_est")
        )

    key_list = list(keys)
    heads = th(a, "a").join(th(b, "b"), key_list, "full_outer").withColumn(
        "__theta", F.least(F.coalesce("__th_a", F.lit(1.0)),
                           F.coalesce("__th_b", F.lit(1.0)))
    )
    av = a.select(*key_list, "value")
    bv = b.select(*key_list, "value")
    uni = (
        av.unionByName(bv).distinct()
        .join(heads.select(*key_list, "__theta"), key_list)
        .where(_theta_u(F.col("value")) < F.col("__theta"))
        .groupBy(*key_list).agg(F.count("value").alias("__n_uni"))
    )
    com = (
        av.join(bv, [*key_list, "value"])
        .join(heads.select(*key_list, "__theta"), key_list)
        .where(_theta_u(F.col("value")) < F.col("__theta"))
        .groupBy(*key_list).agg(F.count("value").alias("__n_com"))
    )
    out = (
        heads.join(uni, key_list, "left").join(com, key_list, "left")
        .withColumn("__n_com", F.coalesce("__n_com", F.lit(0)))
        .withColumn("__n_uni", F.coalesce("__n_uni", F.lit(0)))
    )
    return out.select(
        *key_list,
        "a_est",
        "b_est",
        (F.col("__n_com") / F.col("__theta")).alias("intersect_est"),
        (F.col("__n_uni") / F.col("__theta")).alias("union_est"),
        F.when(
            F.col("__n_uni") > 0, F.col("__n_com") / F.col("__n_uni")
        ).otherwise(F.lit(0.0)).alias("jaccard_est"),
    )


def overlap_matrix(
    rollup: DataFrame, label_col: str, k: int = 1024
) -> DataFrame:
    """Pairwise corpus-overlap audit from ONE theta rollup keyed by
    ``label_col`` (source / snapshot / split): for every unordered
    label pair, (label_a, label_b, a_est, b_est, intersect_est,
    union_est, jaccard_est). The decontamination / snapshot-dedup
    planning view — S sources cost S·k sketch rows total, and the
    S²/2 pair estimates are computed natively from them (the value
    self-join is on 8-byte hashes, summary-sized). Per-pair θ and the
    below-θ per-side counts follow theta_set_ops' estimator
    exactly."""
    g = rollup.groupBy(label_col).agg(
        F.count("value").alias("__n"), F.max("value").alias("__vmax")
    )
    theta = F.when(F.col("__n") < k, F.lit(1.0)).otherwise(
        _theta_u(F.col("__vmax"))
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1)) / _theta_u(F.col("__vmax"))
    )
    heads = g.select(
        F.col(label_col).alias("__lbl"),
        theta.alias("__th"),
        est.alias("__est"),
    )
    pairs = (
        heads.alias("ha")
        .join(heads.alias("hb"), F.col("ha.__lbl") < F.col("hb.__lbl"))
        .select(
            F.col("ha.__lbl").alias("label_a"),
            F.col("hb.__lbl").alias("label_b"),
            F.least("ha.__th", "hb.__th").alias("__theta"),
            F.col("ha.__est").alias("a_est"),
            F.col("hb.__est").alias("b_est"),
        )
    )
    vals = rollup.select(F.col(label_col).alias("__lbl"), "value")
    # per-pair below-θ counts for each side (θ varies per pair)
    side_a = (
        pairs.join(vals, pairs["label_a"] == vals["__lbl"])
        .where(_theta_u(F.col("value")) < F.col("__theta"))
        .groupBy("label_a", "label_b").agg(F.count("value").alias("__ca"))
    )
    side_b = (
        pairs.join(vals, pairs["label_b"] == vals["__lbl"])
        .where(_theta_u(F.col("value")) < F.col("__theta"))
        .groupBy("label_a", "label_b").agg(F.count("value").alias("__cb"))
    )
    com = (
        vals.alias("va")
        .join(vals.alias("vb"), "value")
        .where(F.col("va.__lbl") < F.col("vb.__lbl"))
        .select(
            F.col("va.__lbl").alias("label_a"),
            F.col("vb.__lbl").alias("label_b"),
            "value",
        )
        .join(pairs.select("label_a", "label_b", "__theta"),
              ["label_a", "label_b"])
        .where(_theta_u(F.col("value")) < F.col("__theta"))
        .groupBy("label_a", "label_b").agg(F.count("value").alias("__cc"))
    )
    out = (
        pairs.join(side_a, ["label_a", "label_b"], "left")
        .join(side_b, ["label_a", "label_b"], "left")
        .join(com, ["label_a", "label_b"], "left")
        .withColumn("__ca", F.coalesce("__ca", F.lit(0)))
        .withColumn("__cb", F.coalesce("__cb", F.lit(0)))
        .withColumn("__cc", F.coalesce("__cc", F.lit(0)))
        .withColumn("__cu", F.col("__ca") + F.col("__cb") - F.col("__cc"))
    )
    return out.select(
        "label_a",
        "label_b",
        "a_est",
        "b_est",
        (F.col("__cc") / F.col("__theta")).alias("intersect_est"),
        (F.col("__cu") / F.col("__theta")).alias("union_est"),
        F.when(F.col("__cu") > 0, F.col("__cc") / F.col("__cu"))
        .otherwise(F.lit(0.0)).alias("jaccard_est"),
    )


def ngram_novelty(
    ref: DataFrame,
    cur: DataFrame,
    text_col: str,
    n: int = 3,
    k: int = 4096,
) -> dict:
    """How much of ``cur`` is genuinely NEW against ``ref``, measured
    on distinct word n-grams — the diminishing-returns question every
    data-acquisition decision asks ("does this crawl add anything?"),
    answered from two k-row theta sketches instead of a distinct-join
    of two corpora's gram streams.

    Returns {'ref_grams', 'cur_grams', 'shared_grams', 'new_grams',
    'novelty'} — estimates (exact when a side holds < k distinct
    grams); ``novelty`` = new/cur ∈ [0, 1]. Gram streams never
    shuffle: each side folds to its bottom-k sketch scan-side
    (theta_rollup), and the set algebra runs on ≤ 2k rows. Persist the
    ref sketch once (it is a plain DataFrame) and score every
    candidate corpus against it for free."""
    from fenix_spark.functions.texthash import tokens, word_shingles

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.explode(
                word_shingles(tokens(F.col(text_col)), n)
            ).alias("gram")
        )

    a = theta_rollup(grams(ref), [], "gram", k)
    b = theta_rollup(grams(cur), [], "gram", k)
    row = theta_set_ops(a, b, [], k).first()
    if row is None:
        # both corpora produced zero grams (empty / whitespace-only
        # text, or texts shorter than n words): nothing new by
        # definition — return the zeroed report instead of crashing.
        return {
            "ref_grams": 0.0,
            "cur_grams": 0.0,
            "shared_grams": 0.0,
            "new_grams": 0.0,
            "novelty": 0.0,
        }
    ref_g = float(row["a_est"] or 0.0)
    cur_g = float(row["b_est"] or 0.0)
    shared = min(float(row["intersect_est"]), cur_g)
    new = max(cur_g - shared, 0.0)
    return {
        "ref_grams": ref_g,
        "cur_grams": cur_g,
        "shared_grams": shared,
        "new_grams": new,
        "novelty": (new / cur_g) if cur_g > 0 else 0.0,
    }


def cms_join_size(a: DataFrame, b: DataFrame, depth: int = 4) -> DataFrame:
    """Estimate the INNER-JOIN row count between two keyed tables from
    their count-min sketches alone: |A ⋈_key B| = Σ_v f_A(v)·f_B(v),
    estimated as min over rows r of Σ_b c_A(r,b)·c_B(r,b) (the CM
    inner-product estimator, Cormode & Muthukrishnan, J.Alg 55(1),
    2005 §4.2). With the sketch family's FIXED md5 hashes the estimate
    is deterministic and ONE-SIDED: collisions only add non-negative
    cross terms, so ``join_size_est >= true`` always — a safe
    admission bound for "can I afford this join" planning. Error is
    bounded by ε·||f_A||₁·||f_B||₁ per row at width 1/ε (tight only
    under adversarial collision pile-up; typical error is far
    smaller, pinned in tests).

    Both sketches must come from ``cms_build`` with the SAME
    (depth, width). Cost: one equi-join of two ≤ d·w-row summaries —
    the 100 TB join is never touched."""
    pa = a.select("r", "b", F.col("c").alias("ca"))
    pb = b.select("r", "b", F.col("c").alias("cb"))
    per_row = (
        pa.join(pb, ["r", "b"])
        .groupBy("r")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("s"))
    )
    # a hash row with NO overlapping cells proves the true join is
    # empty (any shared key would populate every row) — est = 0 then
    return per_row.agg(
        F.when(
            F.count(F.lit(1)) < depth, F.lit(0).cast("bigint")
        )
        .otherwise(F.coalesce(F.min("s"), F.lit(0)))
        .alias("join_size_est")
    )


def equi_depth_edges(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    keys: Sequence[str] = (),
    k: int = 200,
) -> DataFrame:
    """(keys..., edges) — the ``n_bins − 1`` interior cut points that
    split each group's value distribution into equal-mass bins, from
    one KLL sketch pass (:func:`kll_rollup`): edge i is the lower
    weighted quantile at i/n_bins. Equi-depth discretization is the
    feature-binning / stratification primitive equal-WIDTH histograms
    can't provide on skewed data — a power-law column puts 99% of
    rows in one width-bin, but depth-bins stay balanced within the
    sketch's rank error (O(1/k)·√log(n/k)).

    Edges are non-decreasing by construction (cumulative-weight
    thresholds over one sorted sketch); heavy ties can REPEAT an edge
    — :func:`assign_equi_depth` then simply leaves the duplicate bin
    empty rather than splitting a tied value across bins (determinism
    over cosmetic balance). All-null/empty groups yield no row, like
    the percentile aggregates.

    Scale shape: inherits the sketch contract — raw values never
    shuffle, edges per group are ``n_bins − 1`` doubles, and the edge
    frame is broadcast-sized for the assignment join.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be ≥ 2 (got {n_bins})")
    rollup = kll_rollup(df, list(keys), value_col, k=k)
    qs = [i / n_bins for i in range(1, n_bins)]
    quants = kll_quantiles(rollup, list(keys), qs)
    # kll_quantiles emits (keys..., q, value): collect each group's
    # edges into one ascending array row
    return (
        quants.groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("q"), F.col("value")))
            ).alias("_qv")
        )
        .select(
            *keys,
            F.transform(F.col("_qv"), lambda s: s["value"]).alias("edges"),
        )
    )


def assign_equi_depth(
    df: DataFrame,
    edges: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    out_col: str = "bin",
) -> DataFrame:
    """Attach ``out_col`` = the 0-based equi-depth bin of ``value_col``
    under the ``edges`` frame (from :func:`equi_depth_edges`): the
    number of edges ≤ the value — lower-inclusive, matching the lower-
    quantile convention of the edges, so a value exactly on edge i
    lands in bin i. Null values get a null bin; rows whose group has
    no edges row (all-null at fit time) also get null.

    The edges frame is broadcast (one short array per group) and the
    bin is a native ``filter``/``size`` expression — no shuffle of
    ``df`` at all."""
    # GRAND (no keys): route through an internal constant key so the
    # join stays a left equi-join — a crossJoin against an EMPTY edges
    # frame (all-null fit input) would drop every row instead of
    # null-binning them
    e = edges.select(*keys, F.col("edges").alias("__edges")).withColumn(
        "__g", F.lit(1)
    )
    joined = df.withColumn("__g", F.lit(1)).join(
        F.broadcast(e), [*keys, "__g"], "left"
    ).drop("__g")
    v = F.col(value_col)
    return joined.withColumn(
        out_col,
        F.when(
            v.isNotNull() & F.col("__edges").isNotNull(),
            F.size(F.filter(F.col("__edges"), lambda x: x <= v)),
        ),
    ).drop("__edges")
