"""Audio fingerprinting + duplicate-recording detection — the audio
sibling of ``multimodal/phash.py``, closing the perceptual-dedup set
(text shingles / image dHash / audio fingerprints).

Per-frame hashes follow Haitsma-Kalker (2002): frame the signal, FFT
magnitude, pool into log-spaced energy bands, and take the SIGN of
the band-difference time-derivative — 16 bits per frame, invariant to
amplitude scaling (a global gain multiplies every band energy, signs
of differences survive) and robust to mild noise/transcoding.

Matching is two-stage:

1. Shazam-style offset-voting join (Wang 2003): explode tracks to
   (id, frame, fhash) rows, equi-join on fhash (optionally the
   hamming-1 probe neighborhood — the paper's fragile-bit fix), and
   let each collision VOTE for the frame offset ``frame_a −
   frame_b``; true copies (including time-shifted crops) concentrate
   votes on one offset, random collisions scatter.
2. Haitsma-Kalker bit-error-rate verification
   (:func:`audio_match_pairs_ber`): align frames at the voted offset
   and threshold the mean ``bit_count(xor)/16`` over the overlap —
   recovers transcodes voting misses, rejects snippet-sharing false
   positives. Measured separations on the planted corpus are pinned
   in RECALL.md.

The pipeline shape is the repo's standard candidate-join discipline:

- fingerprinting is ``mapInPandas`` over the audio column — sample
  bytes never leave the executor, output is 12-byte rows;
- the fhash equi-join is the only shuffle, with a ``max_group`` cap
  excluding degenerate hashes (silence frames — the audio analog of
  paragraph boilerplate, reported not silent);
- offset voting is one groupBy; the verdict is votes ≥ min_votes at
  the best offset.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BANDS = 17  # 16 bits per frame


def frame_hashes(
    samples: np.ndarray,
    sample_rate: int,
    frame: int = 2048,
    hop: int = 1024,
) -> list[int]:
    """16-bit Haitsma-Kalker hash per frame of a mono int/float
    signal; fewer than two frames → empty list."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    n_frames = 1 + max(0, (len(x) - frame)) // hop
    if n_frames < 2:
        return []
    win = np.hanning(frame)
    # log-spaced band edges over [300 Hz, min(2000, nyquist)] — the
    # speech/music band the original paper uses (scaled to the rate)
    nyq = sample_rate / 2
    lo_hz, hi_hz = min(300.0, nyq / 4), min(2000.0, nyq * 0.9)
    edges_hz = np.logspace(np.log10(lo_hz), np.log10(hi_hz), N_BANDS + 1)
    bins = np.clip((edges_hz / nyq * (frame // 2)).astype(int), 1, frame // 2)
    energies = np.empty((n_frames, N_BANDS))
    for t in range(n_frames):
        seg = x[t * hop : t * hop + frame] * win
        mag = np.abs(np.fft.rfft(seg)) ** 2
        for b in range(N_BANDS):
            s, e = bins[b], max(bins[b + 1], bins[b] + 1)
            energies[t, b] = mag[s:e].sum()
    # temporal [1,2,1]/4 smoothing of band energies before the sign
    # decision: fattens the margin of the decision variable, so small
    # perturbations (transcode error, light noise) flip fewer fragile
    # bits — measured ~20% BER reduction on narrowband signals at zero
    # cost to discrimination (unrelated audio stays at the ~0.5 floor).
    # Alignment-safe: the filter is time-local with the same hop grid,
    # so cropped/shifted copies smooth identically except at edges.
    if n_frames >= 3:
        sm = energies.copy()
        sm[1:-1] = 0.25 * energies[:-2] + 0.5 * energies[1:-1] + 0.25 * energies[2:]
        energies = sm
    d = energies[:, :-1] - energies[:, 1:]  # band differences
    bits = (d[1:] - d[:-1]) > 0  # time derivative sign
    out = []
    for row in bits:
        h = 0
        for bit in row:
            h = (h << 1) | int(bit)
        out.append(h)
    return out


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "data",
    fmt_col: str = "fmt",
    frame: int = 2048,
    hop: int = 1024,
) -> DataFrame:
    """(id, frame, fhash) — one row per analysis frame; undecodable
    blobs contribute no rows (dirty crawl audio must not crash)."""
    import pandas as pd

    from fenix_spark.multimodal.media import decode_audio

    def gen(batches):
        for pdf in batches:
            ids, frames, hashes = [], [], []
            for i in range(len(pdf)):
                try:
                    samples, sr = decode_audio(
                        bytes(pdf["__data"].iloc[i]), pdf["__fmt"].iloc[i]
                    )
                    for t, h in enumerate(
                        frame_hashes(samples, sr, frame, hop)
                    ):
                        ids.append(pdf["__id"].iloc[i])
                        frames.append(t)
                        hashes.append(h)
                except Exception:  # noqa: BLE001 - undecodable blob
                    continue
            yield pd.DataFrame({"id": ids, "frame": frames, "fhash": hashes})

    src = df.select(
        F.col(id_col).alias("__id"),
        F.col(data_col).alias("__data"),
        F.col(fmt_col).alias("__fmt"),
    )
    return src.mapInPandas(gen, "id bigint, frame int, fhash int")


def audio_match_pairs(
    fps: DataFrame,
    min_votes: int = 8,
    max_group: int = 1000,
    probe_bits: int = 0,
) -> DataFrame:
    """(id_a, id_b, offset, votes) — track pairs whose frame hashes
    agree ≥ ``min_votes`` times AT ONE OFFSET (frame_a − frame_b);
    the offset-consistency requirement is what separates true copies
    from chance collisions. Hashes shared by more than ``max_group``
    frames corpus-wide (silence and other degenerate spectra) are
    excluded from voting.

    Scope: exact-hash voting detects COPIES and CROPS (bit-identical
    sample reuse — enough frames hash identically). Transcoded/
    re-quantized variants flip a couple of fragile bits per frame
    (tested: ~86% bit agreement after int re-quantization), so they
    need bit-error-rate matching over candidate offsets —
    :func:`audio_match_pairs_ber` layers that verification on top of
    this candidate generator.

    ``probe_bits=1`` applies the paper's own fix for fragile bits:
    one join side explodes each hash into its 17-key hamming-1
    neighborhood (itself + 16 single-bit flips), so frames within 1
    bit still collide — per-frame hit probability under 2-bit
    transcode noise rises from ~0.09 (exact) to ~0.32, which is what
    keeps candidate generation alive for re-encoded audio. Cost is a
    17× row multiplier on ONE side of the equi-join (hashes are
    4-byte values; at 100 TB this is the standard probe-side blowup,
    bounded and shuffle-friendly). Each frame pair still contributes
    at most one vote (probe keys are distinct values)."""
    if probe_bits not in (0, 1):
        raise ValueError(f"probe_bits {probe_bits} unsupported (0 or 1)")
    sizes = fps.groupBy("fhash").agg(F.count(F.lit(1)).alias("__n"))
    informative = sizes.where(F.col("__n") <= max_group).select("fhash")
    scoped = fps.join(informative, "fhash")
    if probe_bits == 1:
        probe_keys = F.array(
            F.col("fhash"),
            *[
                F.col("fhash").bitwiseXOR(F.lit(1 << i))
                for i in range((N_BANDS - 1))
            ],
        )
        a = scoped.select(
            F.explode(probe_keys).alias("fhash"),
            F.col("id").alias("id_a"),
            F.col("frame").alias("f_a"),
        )
    else:
        a = scoped.select(
            F.col("fhash"), F.col("id").alias("id_a"), F.col("frame").alias("f_a")
        )
    b = scoped.select(
        F.col("fhash"), F.col("id").alias("id_b"), F.col("frame").alias("f_b")
    )
    votes = (
        a.join(b, "fhash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("f_a") - F.col("f_b")).alias("offset"))
        .agg(F.count(F.lit(1)).alias("votes"))
        .where(F.col("votes") >= min_votes)
    )
    # best offset per pair (deterministic tiebreak)
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("votes").desc(), F.col("offset").asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def audio_match_pairs_ber(
    fps: DataFrame,
    candidate_min_votes: int = 4,
    max_group: int = 1000,
    max_ber: float = 0.25,
    min_overlap: int = 32,
    probe_bits: int = 1,
) -> DataFrame:
    """(id_a, id_b, offset, votes, n_overlap, ber) — Haitsma-Kalker
    bit-error-rate verification over offset-aligned frame windows,
    layered on :func:`audio_match_pairs` candidate generation.

    Why two stages: exact-hash voting finds the RIGHT OFFSET cheaply
    but judges each frame all-or-nothing — a transcode that flips two
    fragile bits per frame (86% bit agreement) rarely produces whole
    identical 16-bit hashes, so pure voting at a safe threshold MISSES
    it; conversely a short shared snippet (a jingle, a sampled loop)
    can rack up enough exact votes to look like a duplicate. The H-K
    decision variable is the BER over the aligned overlap: align
    ``frame_a = frame_b + offset`` for each candidate's best offset
    and average ``bit_count(h_a XOR h_b)/16`` over every overlapping
    frame — near 0.5 for unrelated audio (random bits), well under the
    paper's 0.35 operating threshold for true transcodes. The default
    0.25 sits between the measured transcode BER (~0.14) and the
    unrelated-audio floor with margin on both sides.

    So BER both RECOVERS transcodes voting misses (run candidates at a
    LOW ``candidate_min_votes``; BER does the real accepting) and
    REJECTS snippet-sharing false positives (high votes, high BER).
    ``min_overlap`` floors the evidence: a verdict from a handful of
    aligned frames is noise either way.

    Shape: candidates join back to ``fps`` twice — both equi-joins
    (on id_a, then on (id_b, aligned frame)); candidate cardinality is
    pair-bounded, so AQE broadcasts the small side. One groupBy per
    candidate pair computes n_overlap and ber; no all-pairs stage
    anywhere. ``probe_bits=1`` (default) runs candidate generation
    with the hamming-1 probe neighborhood — a transcode pair's true
    offset then collects ~0.32·overlap votes instead of ~0.09·overlap,
    so candidates survive re-encoding; BER remains the decision."""
    cand = audio_match_pairs(
        fps,
        min_votes=candidate_min_votes,
        max_group=max_group,
        probe_bits=probe_bits,
    )
    a = fps.select(
        F.col("id").alias("id_a"),
        F.col("frame").alias("f_a"),
        F.col("fhash").alias("h_a"),
    )
    b = fps.select(
        F.col("id").alias("id_b"),
        F.col("frame").alias("f_b"),
        F.col("fhash").alias("h_b"),
    )
    aligned = (
        a.join(cand, "id_a")
        .withColumn("f_b", F.col("f_a") - F.col("offset"))
        .join(b, ["id_b", "f_b"])
    )
    return (
        aligned.groupBy("id_a", "id_b", "offset", "votes")
        .agg(
            F.count(F.lit(1)).alias("n_overlap"),
            F.round(
                F.avg(
                    F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
                    / F.lit(float(N_BANDS - 1))
                ),
                6,
            ).alias("ber"),
        )
        .where(
            (F.col("n_overlap") >= min_overlap) & (F.col("ber") <= max_ber)
        )
    )
