"""File-level Bloom indexes — membership-based data skipping for
point lookups, the complement of footer min/max pruning
(``sources/parquet_stats.py``): min/max prunes RANGE predicates on
clustered layouts, but an equality probe for one id in 100 TB of
UNCLUSTERED data passes every file's min/max. A 16 KB-per-file Bloom
sidecar answers "which files can possibly contain this value" in one
summary-sized join, and its one-sidedness makes the skip PROVABLY
sound — a false positive costs one extra file read, a false negative
cannot happen.

The index is a plain (file, word, bits) DataFrame — persistable
through the catalog, mergeable across builds of disjoint file sets
(rows don't interact across files), and rebuilt per file so appended
files just append index rows.

Scale shape: the build shuffles ≤ files × m_bits/32 words (map-side
``bit_or`` collapses each partition first — value cardinality never
hits the exchange). A lookup broadcasts the probe values' required
(word, mask) rows — k words per value — against the index, and a file
qualifies for a value iff EVERY required word has all mask bits set:
one broadcast join + one count-match aggregate over index-sized rows.
The final read opens ONLY candidate files.

Uses the same engine-portable md5 position scheme as the relational
Bloom sketch (``operators/sketches.py``), so positions computed at
build and probe time agree by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fenix_spark.operators.sketches import _BLOOM_WORD_BITS, _bloom_positions

__all__ = ["build_file_bloom", "append_file_bloom", "candidate_files", "point_lookup"]


def build_file_bloom(
    spark: SparkSession,
    path: str,
    col: str,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """(file, word, bits) — one independent Bloom filter per data file
    of the parquet dataset at ``path``, over ``col``'s non-null values
    (a null can never equal a probe). Size ``m_bits`` for the distinct
    values PER FILE: the 2^17 default (16 KB/file dense) keeps fp < 1%
    up to ~12k distinct values per file."""
    df = spark.read.parquet(path)
    positions = (
        df.where(F.col(col).isNotNull())
        .select(
            F.input_file_name().alias("file"),
            F.explode(F.array(*_bloom_positions(F.col(col), m_bits, k))).alias(
                "pos"
            ),
        )
    )
    bit_lut = F.lit([1 << j for j in range(_BLOOM_WORD_BITS)])
    return (
        positions.select(
            "file",
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.element_at(
                bit_lut, (F.col("pos") % _BLOOM_WORD_BITS + 1).cast("int")
            ).alias("bit"),
        )
        .groupBy("file", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def _required_words(
    spark: SparkSession, values: Sequence, m_bits: int, k: int
) -> DataFrame:
    """(value, word, mask, n_words) — the words and bit masks a file's
    filter must cover for each probe value, with the per-value word
    count for the all-words-matched test."""
    if not values:
        raise ValueError("values must be non-empty")
    if any(v is None for v in values):
        raise ValueError("cannot probe for NULL (null never equals anything)")
    # Build the probe frame TYPED and let Spark do the string cast
    # inside _bloom_positions: the index hashed cast('string') of the
    # data column, and Spark's rendering differs from Python str() for
    # booleans ('true' vs 'True'), floats ('1.0E20' vs '1e+20'), and
    # timestamps — hashing str(v) would produce silent false negatives.
    typed = spark.createDataFrame([(v,) for v in values], ["typed"])
    vals = typed.select(F.col("typed").cast("string").alias("value"))
    bit_lut = F.lit([1 << j for j in range(_BLOOM_WORD_BITS)])
    pos = vals.select(
        "value",
        F.explode(F.array(*_bloom_positions(F.col("value"), m_bits, k))).alias(
            "pos"
        ),
    ).select(
        "value",
        F.shiftright(F.col("pos"), 5).alias("word"),
        F.element_at(
            bit_lut, (F.col("pos") % _BLOOM_WORD_BITS + 1).cast("int")
        ).alias("bit"),
    )
    req = pos.groupBy("value", "word").agg(F.bit_or("bit").alias("mask"))
    return req.withColumn(
        "n_words", F.count(F.lit(1)).over(Window.partitionBy("value"))
    )


def candidate_files(
    index: DataFrame,
    values: Sequence,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """(value, file) — every file whose filter admits the value. Sound:
    a file actually containing the value ALWAYS appears (no false
    negatives); extra rows are Bloom false positives that the exact
    read filters out."""
    req = _required_words(index.sparkSession, values, m_bits, k)
    matched = index.join(F.broadcast(req), "word").where(
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    return (
        matched.groupBy("value", "file")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.first("n_words").alias("n_words"),
        )
        .where(F.col("n_matched") == F.col("n_words"))
        .select("value", "file")
    )


def point_lookup(
    spark: SparkSession,
    path: str,
    col: str,
    values: Sequence,
    index: DataFrame,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Rows of the dataset where ``col`` ∈ ``values``, reading ONLY the
    files the index admits — identical results to the full-scan filter
    by Bloom one-sidedness. The candidate file list is collected
    driver-side: it is bounded by |files actually containing a probe|
    plus the fp slack you sized ``m_bits`` for, not by dataset size."""
    cand = [
        r.file
        for r in candidate_files(index, values, m_bits, k)
        .select("file")
        .distinct()
        .collect()
    ]
    full = spark.read.parquet(path)
    # typed isin, not str(v) string-matching: Spark coerces the
    # literals against the column's own type (so boolean/float/
    # timestamp probes compare correctly), and the native predicate
    # pushes down to the parquet scan.
    probe = F.col(col).isin(list(values))
    if not cand:
        return full.where(F.lit(False))
    return spark.read.parquet(*cand).where(probe)


def append_file_bloom(
    spark: SparkSession,
    index: DataFrame,
    path: str,
    col: str,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Extend an existing index to the dataset's CURRENT file set:
    only files with no index rows are read and sketched; the old rows
    pass through untouched (per-file filters never interact, so append
    is a plain union — the incremental-maintenance property that makes
    the index viable on a growing 100 TB dataset: indexing cost tracks
    the delta, not the corpus). ``m_bits``/``k`` must match the
    original build — mixed geometries would corrupt lookups, so the
    caller owns that contract (store them next to the index)."""
    have = index.select("file").distinct()
    current = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .distinct()
    )
    missing = [r.file for r in current.join(have, "file", "left_anti").collect()]
    if not missing:
        return index
    df = spark.read.parquet(*missing)
    positions = (
        df.where(F.col(col).isNotNull())
        .select(
            F.input_file_name().alias("file"),
            F.explode(F.array(*_bloom_positions(F.col(col), m_bits, k))).alias(
                "pos"
            ),
        )
    )
    bit_lut = F.lit([1 << j for j in range(_BLOOM_WORD_BITS)])
    fresh = (
        positions.select(
            "file",
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.element_at(
                bit_lut, (F.col("pos") % _BLOOM_WORD_BITS + 1).cast("int")
            ).alias("bit"),
        )
        .groupBy("file", "word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return index.unionByName(fresh)
