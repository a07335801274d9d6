"""Content-defined chunking: cover/determinism invariants, the
shift-resistance property that motivates CDC over fixed-size
chunking, and the Spark chunk/dedup/pair surface."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from fenix_spark.multimodal.cdc import (
    blob_chunk_pairs,
    blob_chunks,
    cdc_chunk_spans,
    chunk_dedup_stats,
)


def _blob(rng, n) -> bytes:
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def test_spans_cover_exactly_and_respect_bounds():
    rng = np.random.default_rng(1)
    for n in (0, 1, 100, 2047, 2048, 50_000, 300_000):
        data = _blob(rng, n)
        spans = cdc_chunk_spans(data, 2048, 8192, 65536)
        assert b"".join(data[o : o + ln] for o, ln in spans) == data
        assert all(ln <= 65536 for _, ln in spans)
        assert all(ln >= 2048 for _, ln in spans[:-1])  # last may be short
        # deterministic
        assert spans == cdc_chunk_spans(data, 2048, 8192, 65536)


def test_avg_chunk_size_is_in_the_right_ballpark():
    rng = np.random.default_rng(2)
    data = _blob(rng, 2_000_000)
    spans = cdc_chunk_spans(data, 2048, 8192, 65536)
    avg = len(data) / len(spans)
    assert 4096 < avg < 20000  # target 8192 + min-size truncation bias


def test_incompressible_max_run_forced_cuts():
    # constant bytes never hit the mask → every cut is the max_size
    # force; cover still exact
    data = b"\x00" * 200_000
    spans = cdc_chunk_spans(data, 2048, 8192, 65536)
    assert all(ln == 65536 for _, ln in spans[:-1])
    assert sum(ln for _, ln in spans) == len(data)


def test_shift_resistance_vs_fixed_size():
    """THE CDC property: prepending 17 bytes re-synchronizes within a
    chunk — most chunk hashes survive. Fixed-size chunking at the same
    granularity shares (essentially) nothing after a shift."""
    rng = np.random.default_rng(3)
    a = _blob(rng, 400_000)
    b = _blob(rng, 17) + a

    def hashes(data):
        return {
            hashlib.md5(data[o : o + ln]).hexdigest()
            for o, ln in cdc_chunk_spans(data, 2048, 8192, 65536)
        }

    ha, hb = hashes(a), hashes(b)
    shared = len(ha & hb) / len(ha)
    assert shared > 0.8

    def fixed(data, sz=8192):
        return {
            hashlib.md5(data[i : i + sz]).hexdigest()
            for i in range(0, len(data), sz)
        }
    fixed_shared = len(fixed(a) & fixed(b)) / len(fixed(a))
    assert fixed_shared < 0.05


def test_append_shares_prefix_chunks():
    rng = np.random.default_rng(4)
    a = _blob(rng, 300_000)
    b = a + _blob(rng, 40_000)
    sa = cdc_chunk_spans(a, 2048, 8192, 65536)
    sb = cdc_chunk_spans(b, 2048, 8192, 65536)
    # every chunk of a except possibly the trailing one reappears in b
    assert sa[:-1] == sb[: len(sa) - 1]


def test_bad_sizes_raise():
    with pytest.raises(ValueError, match="min"):
        cdc_chunk_spans(b"x", 100, 50, 200)


@pytest.fixture(scope="module")
def blob_df(spark):
    rng = np.random.default_rng(7)
    base = _blob(rng, 120_000)
    reup = _blob(rng, 31) + base          # shifted re-upload
    other = _blob(rng, 90_000)            # unrelated
    dup = base                            # exact duplicate
    return spark.createDataFrame(
        [(1, base), (2, reup), (3, other), (4, dup), (5, None)],
        "media_id bigint, data binary",
    )


def test_blob_chunks_spark_matches_local(spark, blob_df):
    chunks = blob_chunks(blob_df, "data", "media_id", 1024, 4096, 32768)
    got = {
        (r["id"], r["chunk_idx"]): (r["offset"], r["length"], r["chunk_hash"])
        for r in chunks.collect()
    }
    rows = {r["media_id"]: r["data"] for r in blob_df.collect()}
    for mid, data in rows.items():
        if data is None:
            assert not any(k[0] == mid for k in got)
            continue
        data = bytes(data)
        for k, (o, ln) in enumerate(cdc_chunk_spans(data, 1024, 4096, 32768)):
            assert got[(mid, k)] == (o, ln, hashlib.md5(data[o : o + ln]).hexdigest())


def test_chunk_dedup_stats(spark, blob_df):
    chunks = blob_chunks(blob_df, "data", "media_id", 1024, 4096, 32768)
    s = chunk_dedup_stats(chunks).collect()[0]
    # blobs 1 and 4 are byte-identical; 2 shares most of 1's chunks
    assert s["total_bytes"] == 120_000 * 2 + 120_031 + 90_000
    assert s["unique_bytes"] < s["total_bytes"] - 120_000  # dup blob + reuse
    assert s["dedup_ratio"] > 1.5
    assert s["unique_chunks"] < s["total_chunks"]


def test_blob_chunk_pairs(spark, blob_df):
    chunks = blob_chunks(blob_df, "data", "media_id", 1024, 4096, 32768)
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in blob_chunk_pairs(chunks, min_shared_fraction=0.5).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)]["frac_a"] == 1.0
    assert (1, 2) in pairs and pairs[(1, 2)]["frac_a"] > 0.6
    assert (2, 4) in pairs
    assert not any(3 in p for p in pairs)  # unrelated blob pairs with nothing


def test_mega_group_cap_drops_universal_chunks(spark):
    """A chunk shared by every blob (a universal header) must not pair
    everything with everything when the cap excludes it."""
    rng = np.random.default_rng(9)
    header = _blob(rng, 50_000)
    rows = [(i, header + _blob(rng, 60_000)) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "media_id bigint, data binary")
    chunks = blob_chunks(df, "data", "media_id", 1024, 4096, 32768)
    capped = blob_chunk_pairs(chunks, min_shared_fraction=0.3, max_group=3)
    uncapped = blob_chunk_pairs(chunks, min_shared_fraction=0.3, max_group=1024)
    assert uncapped.count() == 15  # all C(6,2) pairs share the header
    assert capped.count() == 0


def test_blob_chunk_pairs_plan_no_cartesian(spark, blob_df):
    chunks = blob_chunks(blob_df, "data", "media_id", 1024, 4096, 32768)
    plan = (
        blob_chunk_pairs(chunks)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gear_table_pinned_independent_of_numpy_rng():
    """The gear table must be a pinned spec function (blake2b per RFC
    7693), NOT an RNG stream — NumPy does not guarantee Generator
    bit-stream stability across releases, and a shifted table moves
    every persisted chunk boundary."""
    from fenix_spark.multimodal.cdc import _GEAR

    assert _GEAR.shape == (256,) and _GEAR.dtype == np.uint64
    # spot values recomputed independently from blake2b
    for i in (0, 1, 255):
        want = int.from_bytes(
            hashlib.blake2b(bytes([i]), digest_size=8).digest(), "big"
        )
        assert int(_GEAR[i]) == want
    # full-table content pin — fails loudly if anything perturbs it
    assert (
        hashlib.md5(_GEAR.astype(">u8").tobytes()).hexdigest()
        == "01cbc645a3be881c37475d8503eca2fb"
    )
