"""Reproducible sampling & quota operators for training-data curation.

The reference's only sampling is torch's in-memory random permutation
(src/fenix/io/batch/batch.py:16-46) — seed-dependent, single-node, and
unreproducible across runs with different worker counts. A 100 TB
pipeline needs sampling that is (a) a pure function of the ROW, so any
engine, any partitioning, any retry produces the same subset, and (b)
a scan-level filter, so it costs one map pass and pushes no shuffle.

Everything here keys off ``hash60(id)`` (functions/texthash.py — md5-
derived, engine-portable): a row's fate is decided by its id alone.
That also makes every operator DuckDB-oracle-checkable, unlike
``df.sample()`` whose RNG stream is Spark-internal.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fenix_spark.functions.texthash import hash60

_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, 10000) from the row id (+ optional salt
    so independent samples of the same table decorrelate)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return hash60(F.concat(c.cast("string"), F.lit(salt))) % _BUCKETS


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by hash bucket — a
    scan filter (no shuffle, no RNG state), stable under retries,
    repartitioning, and engine changes."""
    # round(), not truncation: 0.29 * 10000 is 2899.999… in binary —
    # int() would silently drop a bucket (under-sample by 0.01%).
    return df.where(hash_bucket(id_col, salt) < int(round(fraction * _BUCKETS)))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    keep_per_unit_weight: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic Poisson-style weighted sampling: row i survives
    with probability ``min(1, keep_per_unit_weight · w_i)``, decided by
    its hash bucket — the curation move for up-weighting high-quality
    sources without an RNG (same retry/repartition/engine stability as
    ``deterministic_sample``; mirrors the Bernoulli thinning used for
    quality-weighted corpus mixing).

    Still a scan-level filter: the threshold is a per-row expression of
    the weight column. Weights ≤ 0 never survive; weights ≥
    1/keep_per_unit_weight always survive (probability caps at 1)."""
    thresh = F.round(
        F.least(F.col(weight_col) * F.lit(keep_per_unit_weight), F.lit(1.0))
        * _BUCKETS
    ).cast("bigint")
    return df.where(
        (F.col(weight_col) > 0) & (hash_bucket(id_col, salt) < thresh)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[float],
    names: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Disjoint, exhaustive train/val/test split: adds a ``split``
    column from cumulative weight boundaries over the hash bucket.
    Every row lands in exactly one split, forever."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    total = sum(weights)
    bucket = hash_bucket(id_col, salt)
    bounds = []
    acc = 0.0
    for w in weights:
        acc += w / total
        bounds.append(int(round(acc * _BUCKETS)))  # round: see deterministic_sample
    bounds[-1] = _BUCKETS  # close the last interval against rounding
    # nested whens, lowest bound innermost: bucket < bounds[0] → names[0], …
    expr = F.lit(names[-1])
    for b, name in reversed(list(zip(bounds[:-1], names[:-1]))):
        expr = F.when(bucket < b, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def per_group_limit(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    n: int,
) -> DataFrame:
    """Quota sampling: keep the first ``n`` rows per group under a
    DETERMINISTIC order (pass id tiebreaks!) — caps any one domain's
    contribution to a corpus. One shuffle on the group key; with AQE
    skew handling a hot domain splits across reducers before the
    window. For quantile-accurate caps at extreme skew, pre-filter
    with an approximate per-group count first."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def mixture(
    sources: Sequence[tuple[DataFrame, float]],
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Weighted corpus mixture: union each source after keeping
    ``weight`` of its rows (weight in [0, 1] — a per-source sampling
    rate, the knob LLM data recipes express as 'epochs'/'repeat
    factor' capped at 1). Per-row hash decisions (decorrelated across
    sources by position+salt) keep this a pure scan filter on every
    source — no shuffle, reproducible under retries; sources may have
    different columns (union by name, missing columns null).
    A ``__source`` column records provenance."""
    picked = []
    for i, (df, w) in enumerate(sources):
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"mixture weight {w} not in [0, 1]")
        picked.append(
            deterministic_sample(df, id_col, w, salt=f"{salt}/mix{i}").withColumn(
                "__source", F.lit(i)
            )
        )
    out = picked[0]
    for df in picked[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    shard_rows: int,
    salt: str = "",
) -> int:
    """Export a corpus as deterministically-shuffled fixed-size
    training shards — the terminal op of a data pipeline, where
    'shuffled well' matters because trainers read shards sequentially.

    The permutation key is ``hash60(id || salt)``: a pure row function,
    so the SAME corpus + salt always produces the SAME shard layout
    (resumable exports, reproducible ablations) while being
    statistically indistinguishable from a random shuffle.
    ``repartitionByRange`` on the key gives one range-shuffle and
    globally contiguous shards; ``sortWithinPartitions`` orders rows
    inside each file so shard contents are byte-stable. Returns the
    shard count. At 100 TB this is the one full-data shuffle a
    pipeline should ever do — everything upstream filters or
    appends."""
    n_rows = df.count()
    n_shards = max(1, -(-n_rows // shard_rows))  # ceil
    key = hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    (
        df.withColumn("__shuffle_key", key)
        .repartitionByRange(n_shards, "__shuffle_key")
        .sortWithinPartitions("__shuffle_key")
        .drop("__shuffle_key")
        .write.mode("overwrite")
        .parquet(path)
    )
    return n_shards


def temperature_rates(
    counts: Sequence[int], temperature: float, budget: int, cap: float = 1.0
) -> list[float]:
    """Per-source keep rates implementing temperature-scaled corpus
    mixing (the mT5 / XLM-R recipe): source s receives a share of the
    ``budget`` ∝ count_s^T. T=1 is natural proportions; T→0 flattens
    toward uniform across sources (up-weighting low-resource sources).

    Rates are capped at ``cap`` and the overflow of saturated sources
    is WATER-FILLED back into the unsaturated ones, renormalizing
    their shares each pass — so the realized total stays as close to
    ``budget`` as availability allows. The default cap of 1 is the
    scan-filter regime (:func:`mixture` — a filter cannot repeat
    rows); a cap > 1 is the UPSAMPLING regime (:func:`epoch_mixture`
    — rate 3.4 means 3 full epochs + a 0.4 fractional pass), bounded
    because repeating a tiny source dozens of times degrades training
    more than it balances (the data-recipe 'max epochs' knob). Pure
    driver arithmetic over one int per source; the data itself is
    never touched."""
    if not 0.0 < temperature <= 1.0:
        raise ValueError(f"temperature {temperature} not in (0, 1]")
    if budget <= 0:
        raise ValueError(f"budget {budget} must be positive")
    if cap < 1.0:
        raise ValueError(f"cap {cap} must be >= 1 (rates below 1 are the norm)")
    n = len(counts)
    rates = [0.0] * n
    free = list(range(n))
    remaining = float(budget)
    # each pass fixes newly-saturated sources at the cap; shares of the
    # still-free sources renormalize over the remaining budget
    while free and remaining > 0:
        shares = [counts[i] ** temperature for i in free]
        tot = sum(shares)
        if tot == 0:
            break
        saturated = []
        for i, sh in zip(free, shares):
            want = remaining * sh / tot
            if want >= counts[i] * cap:
                rates[i] = cap
                saturated.append(i)
        if not saturated:
            for i, sh in zip(free, shares):
                rates[i] = (remaining * sh / tot) / counts[i] if counts[i] else 0.0
            break
        remaining -= sum(counts[i] * cap for i in saturated)
        free = [i for i in free if i not in saturated]
    return rates


def temperature_mixture(
    sources: Sequence[DataFrame],
    id_col: str,
    temperature: float,
    budget: int,
    counts: Sequence[int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Temperature-mixed corpus: compute per-source rates from source
    sizes (``counts`` if the catalog already knows them — at 100 TB
    use table statistics, don't re-count — else one count() job per
    source) and delegate to :func:`mixture`, so the result remains a
    pure scan filter per source with a ``__source`` provenance
    column."""
    if counts is None:
        counts = [df.count() for df in sources]
    elif len(counts) != len(sources):
        raise ValueError(
            f"counts has {len(counts)} entries for {len(sources)} sources"
        )
    rates = temperature_rates(list(counts), temperature, budget)
    return mixture(list(zip(sources, rates)), id_col, salt=salt)


def epoch_repeat(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Repeat a source ``rate`` times deterministically: ⌊rate⌋ FULL
    epochs (every row, tagged ``__epoch`` 0..⌊rate⌋−1) plus one
    fractional epoch keeping the usual hash-decided subset, salted by
    the epoch index so the partial epoch is decorrelated from the id
    order. Replication is ``explode(sequence(...))`` — row-local
    within the scan, NO shuffle, no driver loop — so a 10 TB source at
    rate 3.4 costs one scan emitting 3.4× rows, exactly the cost of
    the data produced. rate ≤ 1 degrades to ``deterministic_sample``
    with ``__epoch`` = 0."""
    if rate < 0:
        raise ValueError(f"epoch_repeat rate {rate} must be >= 0")
    full = int(rate)
    frac = rate - full
    parts = []
    if full >= 1:
        parts.append(
            df.withColumn("__epoch", F.explode(F.sequence(F.lit(0), F.lit(full - 1))))
        )
    if frac > 0:
        parts.append(
            deterministic_sample(df, id_col, frac, salt=f"{salt}/ep{full}")
            .withColumn("__epoch", F.lit(full))
        )
    if not parts:
        return df.withColumn("__epoch", F.lit(0)).where(F.lit(False))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def epoch_mixture(
    sources: Sequence[DataFrame],
    id_col: str,
    temperature: float,
    budget: int,
    counts: Sequence[int] | None = None,
    max_epochs: float = 4.0,
    salt: str = "",
) -> DataFrame:
    """Temperature-mixed corpus WITH UPSAMPLING — the full LLM
    data-recipe mixing law. :func:`temperature_mixture` can only
    down-sample (a scan filter caps every rate at 1), which silently
    under-delivers the low-resource shares the temperature exists to
    protect: at T→0 a tiny source's equal share may exceed its size.
    Here rates may reach ``max_epochs`` (the standard 'repeat cap' —
    data quality work shows a few epochs of a small high-quality
    source beat one epoch padded with filler, but dozens degrade), and
    each source is materialized by :func:`epoch_repeat`: full epochs
    via row-local explode + one hash-filtered fractional epoch — every
    source remains a pure scan, ZERO corpus shuffles, reproducible
    under retries and repartitioning.

    Provenance: ``__source`` (position in ``sources``) and ``__epoch``
    columns — dedup-style downstream ops can key on (source, epoch,
    id). Like :func:`temperature_mixture`, pass ``counts`` from table
    statistics at scale rather than re-counting."""
    if counts is None:
        counts = [df.count() for df in sources]
    elif len(counts) != len(sources):
        raise ValueError(
            f"counts has {len(counts)} entries for {len(sources)} sources"
        )
    rates = temperature_rates(list(counts), temperature, budget, cap=max_epochs)
    parts = [
        epoch_repeat(df, id_col, r, salt=f"{salt}/mix{i}").withColumn(
            "__source", F.lit(i)
        )
        for i, (df, r) in enumerate(zip(sources, rates))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def cluster_balanced_sample(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    budget: int,
    salt: str = "",
    max_clusters: int = 100_000,
) -> DataFrame:
    """Diversity-balanced sampling: spread ``budget`` rows EQUALLY
    across the values of ``cluster_col`` (semantic clusters, sources,
    languages — any partition of the corpus), water-filling quotas
    when small clusters can't absorb their share
    (:func:`temperature_rates` at the uniform limit).

    The cluster pass is one tiny groupBy count; the sample itself is
    the usual pure row-hash filter — the per-cluster rate arrives via
    a broadcast join of ≤ |clusters| rows, so the whole operator adds
    ZERO corpus-sized shuffles. Pair with ``coder.train_coding`` +
    ``index.assign_code_expr`` to derive ``cluster_col`` from an
    embedding column (the SemDeDup-style semantic grid).

    Rows with a NULL cluster are excluded (a null key never matches
    the rate join) — assign unclustered rows a sentinel cluster first
    if they must participate.

    The per-cluster count is collected to the driver to run the
    water-filling law, so cardinality is gated at ``max_clusters``
    (default 100k — far above any sane semantic grid): the collect is
    bounded by ``limit(max_clusters + 1)`` and raises loudly if a
    high-cardinality ``cluster_col`` (e.g. a document-level key) would
    otherwise materialize millions of rows on the driver."""
    # counts over NON-NULL clusters only: the rate join drops null-
    # cluster rows, so giving the null group a share would silently
    # underrun the budget. limit(cap+1) bounds the driver transfer
    # BEFORE collecting — same fail-fast pattern as
    # similarity_join_brute's broadcast gate (search.py).
    counts = (
        df.where(F.col(cluster_col).isNotNull())
        .groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .limit(max_clusters + 1)
        .collect()
    )
    if len(counts) > max_clusters:
        raise ValueError(
            f"cluster_balanced_sample: {cluster_col!r} has more than "
            f"{max_clusters:,} distinct values; the per-cluster quota "
            "table would be collected to the driver. Balanced sampling "
            "wants a COARSE partition (a k-means cell id, source, or "
            "language — 64-64k values). Derive a coarse cluster first "
            "(coder.train_coding + index.assign_code_expr), or raise "
            "max_clusters if the cardinality is genuinely intended."
        )
    if not counts:
        return df.where(F.lit(False))
    clusters = [r[cluster_col] for r in counts]
    rates = temperature_rates([r["__n"] for r in counts], 1e-9, budget)
    spark = df.sparkSession
    rate_df = spark.createDataFrame(
        [(c, float(r)) for c, r in zip(clusters, rates)],
        schema=df.select(cluster_col).schema.add("__rate", "double"),
    )
    # full-precision hash threshold (rate · 2^60), not the 10k-bucket
    # grid: a huge cluster's tiny equal-share rate must not round to
    # zero (rate quantization would step realized counts by n/10000)
    h = hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt))).cast("double")
    return (
        df.join(F.broadcast(rate_df), cluster_col)
        .where(h < F.col("__rate") * F.lit(float(1 << 60)))
        .drop("__rate")
    )


def bottomk_sample(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """A MERGEABLE bounded uniform sample: the k rows per group whose
    ``hash60(id + salt)`` is smallest — the KMV/bottom-k construction
    (operators/sketches.theta_rollup) carrying full payload rows
    instead of bare hashes. Properties the scan-filter samplers above
    can't give:

    - **fixed size**, not fixed rate: exactly min(k, |group|) rows per
      group whatever the group sizes — the "show me 100 example docs
      per source" view at any scale;
    - **mergeable**: bottom-k of a union == bottom-k of the unioned
      bottom-ks, so per-shard / per-day samples fold into corpus
      samples via ``bottomk_merge`` without touching the data again —
      and the result is IDENTICAL to sampling the whole corpus
      directly (layout-independent, pinned in tests);
    - **deterministic**: a pure function of the id set, stable under
      retries, repartitioning, and incremental appends (an appended
      row displaces the largest hash iff it truly belongs).

    Rows with duplicate ids keep one representative (min hash ties
    collapse arbitrarily-but-deterministically by the sort). Output =
    input columns + ``sample_h`` (the rank hash, kept so merges
    re-rank without recomputing). Two bounded phases like every
    sketch: per-batch bottom-k partials, then one per-group
    re-selection — raw groups never sort globally."""
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key_list = list(keys)
    base = df.withColumn(
        "sample_h",
        hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
    )
    schema = base.schema

    def head_k(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # Dedup PER GROUP (keys + id), not globally by id: the partial
        # phase sees multi-group Arrow batches, and an id legitimately
        # appearing under two different key groups must survive in
        # both — id-only dedup here would make the result depend on
        # batch layout. (In the per-group applyInPandas phase the key
        # columns are constant, so the subset is equivalent to id-only.)
        out = pdf.sort_values("sample_h").drop_duplicates(
            subset=[*key_list, id_col]
        )
        if key_list:
            out = out.groupby(key_list, dropna=False, sort=False).head(k)
        else:
            out = out.head(k)
        return out

    def build(batches):
        for pdf in batches:
            if len(pdf):
                yield head_k(pdf)

    partials = base.mapInPandas(build, schema)
    if key_list:
        return partials.groupBy(*key_list).applyInPandas(
            lambda pdf: head_k(pdf), schema
        )
    return partials.groupBy().applyInPandas(lambda pdf: head_k(pdf), schema)


def bottomk_merge(
    samples: DataFrame, keys: Sequence[str], id_col: str, k: int
) -> DataFrame:
    """Fold unioned bottom-k samples (e.g. per-shard outputs of
    ``bottomk_sample``) to the coarser ``keys`` grain — input rows
    already carry ``sample_h``, so this is one summary-sized
    re-selection; no rehash, no data scan."""
    import pandas as pd

    key_list = list(keys)
    schema = samples.schema

    def head_k(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # keys + id in the subset for the same layout-independence
        # reason as bottomk_sample (within one applyInPandas group the
        # key columns are constant, so this equals id-only dedup).
        out = pdf.sort_values("sample_h").drop_duplicates(
            subset=[*key_list, id_col]
        )
        return (
            out.groupby(key_list, dropna=False, sort=False).head(k)
            if key_list
            else out.head(k)
        )

    if key_list:
        return samples.groupBy(*key_list).applyInPandas(
            lambda pdf: head_k(pdf), schema
        )
    return samples.groupBy().applyInPandas(lambda pdf: head_k(pdf), schema)


# ------------------------------------------------ priority samples
#
# The weighted sibling of the bottom-k family: Priority Sampling
# (Duffield, Lund, Thorup, "Priority sampling for estimation of
# arbitrary subset sums", JACM 54(6), 2007 — public). Row i draws a
# deterministic uniform u_i = (hash60(id+salt)+1)/2^60 ∈ (0,1] and a
# priority q_i = w_i / u_i; the sample is the k highest-priority rows
# per group, the threshold tau is the (k+1)-th priority, and each kept
# row estimates its weight as max(w_i, tau). Subset sums estimated by
# summing max(w_i, tau) over kept rows matching the predicate are
# UNBIASED (DLT Thm 1), with near-optimal variance among k-sample
# schemes — the principled answer to "estimate per-source token counts
# from a bounded sample" where uniform sampling would be dominated by
# the heavy tail.
#
# Like bottom-k, the state is a pure function of (id, weight, salt):
# deterministic under retries and repartitioning, mergeable exactly
# (top-(k+1) of a union == top-(k+1) of unioned top-(k+1)s), and
# engine-portable (DuckDB mirror pinned in tests).


def _priority(id_col: str, weight_col: str, salt: str) -> Column:
    """q_i = w_i / u_i with u_i = (hash60(id‖salt)+1)/2^60 ∈ (0,1]."""
    u = (hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt))) + 1) / F.lit(
        float(1 << 60)
    )
    return F.col(weight_col).cast("double") / u


def priority_sample(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Mergeable priority-sample STATE: the k+1 highest-priority rows
    per group (k+1, not k — the extra row carries the threshold that
    makes estimates unbiased). Rows with NULL or non-positive weight
    are excluded (they can never be sampled); duplicate ids keep the
    highest-priority representative. Output = input columns +
    ``sample_pri``. Feed to ``priority_take`` for the usable k-row
    sample with estimates, or union shard states into
    ``priority_merge``.

    Two bounded phases like every sketch: per-batch top-(k+1) partials
    in one Arrow pass (at most k+1 rows per group per batch shuffle —
    raw groups never sort globally), then one per-group re-selection."""
    import pandas as pd  # noqa: F401

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key_list = list(keys)
    base = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("sample_pri", _priority(id_col, weight_col, salt))
    schema = base.schema

    def head_k(pdf):
        # Dedup per (keys, id): the partial phase sees multi-group
        # batches, and an id under two key groups must survive in both
        # (see bottomk_sample.head_k).
        out = pdf.sort_values(
            ["sample_pri", id_col], ascending=[False, True]
        ).drop_duplicates(subset=[*key_list, id_col])
        if key_list:
            return out.groupby(key_list, dropna=False, sort=False).head(k + 1)
        return out.head(k + 1)

    def build(batches):
        for pdf in batches:
            if len(pdf):
                yield head_k(pdf)

    partials = base.mapInPandas(build, schema)
    if key_list:
        return partials.groupBy(*key_list).applyInPandas(
            lambda pdf: head_k(pdf), schema
        )
    return partials.groupBy().applyInPandas(lambda pdf: head_k(pdf), schema)


def priority_merge(
    samples: DataFrame, keys: Sequence[str], id_col: str, k: int
) -> DataFrame:
    """Fold unioned priority-sample states (e.g. per-shard outputs) to
    the coarser ``keys`` grain — rows already carry ``sample_pri``, so
    this is one summary-sized re-selection producing EXACTLY the state
    a direct sample of the union would (pinned in tests). No rehash,
    no data scan."""
    import pandas as pd  # noqa: F401

    key_list = list(keys)
    schema = samples.schema

    def head_k(pdf):
        # keys + id in the subset (constant within a group — equals
        # id-only dedup; kept consistent with priority_sample).
        out = pdf.sort_values(
            ["sample_pri", id_col], ascending=[False, True]
        ).drop_duplicates(subset=[*key_list, id_col])
        if key_list:
            return out.groupby(key_list, dropna=False, sort=False).head(k + 1)
        return out.head(k + 1)

    if key_list:
        return samples.groupBy(*key_list).applyInPandas(
            lambda pdf: head_k(pdf), schema
        )
    return samples.groupBy().applyInPandas(lambda pdf: head_k(pdf), schema)


def priority_take(
    state: DataFrame,
    keys: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """The usable sample from a priority-sample state: the top-k rows
    per group plus ``sample_est = max(weight, tau)`` where tau is the
    (k+1)-th priority (0 when the group has ≤ k rows — then the sample
    is the whole group and every estimate is exact). ``SUM(sample_est)
    WHERE <predicate>`` is an unbiased estimate of the true weighted
    subset sum (DLT Thm 1). Fully native window query over the
    summary-sized state — two windows, no Python."""
    key_list = list(keys)
    w_rank = Window.partitionBy(*key_list).orderBy(
        F.desc("sample_pri"), F.col(id_col)
    )
    w_grp = Window.partitionBy(*key_list)
    ranked = state.withColumn("__rn", F.row_number().over(w_rank))
    with_tau = ranked.withColumn(
        "__tau",
        F.coalesce(
            F.max(F.when(F.col("__rn") == k + 1, F.col("sample_pri"))).over(
                w_grp
            ),
            F.lit(0.0),
        ),
    )
    return (
        with_tau.where(F.col("__rn") <= k)
        .withColumn(
            "sample_est",
            F.greatest(F.col(weight_col).cast("double"), F.col("__tau")),
        )
        .drop("__rn", "__tau")
    )


def neyman_allocation(
    df: DataFrame,
    strata: Sequence[str],
    value_col: str,
    n_total: int,
) -> DataFrame:
    """(strata..., n_rows, stddev, alloc) — the optimal (Neyman 1934)
    allocation of an ``n_total``-row sample budget across strata for
    estimating the mean/total of ``value_col``: n_h ∝ N_h·σ_h, the
    allocation that minimizes estimator variance for a fixed budget.
    Proportional allocation oversamples big-but-uniform strata and
    starves small-but-wild ones; Neyman spends the budget where the
    variance actually lives.

    Allocations are computed by largest-remainder rounding so they sum
    EXACTLY to ``n_total`` (capped at the stratum population; freed
    budget is re-spread over uncapped strata by the same rule).
    Zero-variance strata (constant or single-row) get σ = 0 and are
    sampled only through remainder spreading — one representative row
    tells you everything about a constant stratum.

    Scale shape: ONE partial-aggregable groupBy computes (N_h, σ_h);
    the allocation arithmetic runs on the strata-count-sized summary
    driver-side (strata are report-sized by definition). Pair with
    :func:`bottomk_sample` keyed by the same strata to DRAW the
    allocated rows deterministically.
    """
    if n_total < 1:
        raise ValueError(f"n_total must be ≥ 1 (got {n_total})")
    if not strata:
        raise ValueError("strata must be non-empty")
    stats = (
        df.groupBy(*strata)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(F.stddev_pop(value_col), F.lit(0.0)).alias("stddev"),
        )
        .collect()
    )
    if not stats:
        raise ValueError("no rows to allocate over")
    weights = [r["n_rows"] * r["stddev"] for r in stats]
    caps = [r["n_rows"] for r in stats]
    alloc = [0] * len(stats)
    remaining = n_total
    active = [i for i, w in enumerate(weights) if w > 0]
    # iterate: proportional shares with largest-remainder rounding;
    # capped strata drop out and their slack re-spreads
    while remaining > 0 and active:
        tot = sum(weights[i] for i in active)
        shares = [(i, remaining * weights[i] / tot) for i in active]
        base = {i: min(int(s), caps[i] - alloc[i]) for i, s in shares}
        handed = sum(base.values())
        rema = sorted(
            ((s - int(s), i) for i, s in shares),
            key=lambda t: (-t[0], t[1]),
        )
        for frac, i in rema:
            if handed >= remaining:
                break
            if alloc[i] + base[i] < caps[i]:
                base[i] += 1
                handed += 1
        for i, b in base.items():
            alloc[i] += b
        remaining -= handed
        active = [i for i in active if alloc[i] < caps[i]]
        if handed == 0:
            break
    if remaining > 0:
        # spread leftovers (all weighted strata capped) over zero-σ /
        # capped-out strata by population, largest first
        order = sorted(
            range(len(stats)), key=lambda i: (-(caps[i] - alloc[i]), i)
        )
        for i in order:
            take = min(remaining, caps[i] - alloc[i])
            alloc[i] += take
            remaining -= take
            if remaining == 0:
                break
    spark = df.sparkSession
    rows = [
        tuple(r[c] for c in strata) + (r["n_rows"], float(r["stddev"]), alloc[i])
        for i, r in enumerate(stats)
    ]
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*strata).schema.fields
    )
    return spark.createDataFrame(
        rows, key_schema + ", n_rows long, stddev double, alloc long"
    )


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    value_col: str,
    id_col: str,
    n_total: int,
    salt: str = "",
) -> DataFrame:
    """Draw the :func:`neyman_allocation` deterministically: per-
    stratum bottom-k by ``hash60(id+salt)`` at each stratum's
    allocated k — mergeable, retry-stable, layout-independent (the
    bottom-k properties), with the budget spent variance-optimally."""
    allocs = neyman_allocation(df, strata, value_col, n_total)
    ranked = bottomk_sample(df, list(strata), id_col, n_total, salt=salt)
    # bottomk_sample at the global budget over-draws per stratum; cut
    # each stratum to its allocation by the SAME hash order so the
    # result equals a direct per-stratum bottom-alloc draw
    from pyspark.sql import Window

    w = Window.partitionBy(*strata).orderBy(
        hash60(F.concat(F.col(id_col).cast("string"), F.lit(salt))).asc(),
        F.col(id_col).asc(),
    )
    return (
        ranked.withColumn("__rk", F.row_number().over(w))
        .join(F.broadcast(allocs.select(*strata, "alloc")), list(strata))
        .where(F.col("__rk") <= F.col("alloc"))
        .drop("__rk", "alloc")
    )
