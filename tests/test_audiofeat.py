"""Mel/MFCC features: textbook properties as oracles (no DSP lib to
golden against — the tests pin the published math instead)."""

from __future__ import annotations

import numpy as np
import pytest

from fenix_spark.multimodal.audiofeat import (
    _dct2_ortho,
    audio_mfcc,
    log_mel_spectrogram,
    mel_filterbank,
    mfcc,
)

SR = 16000


def test_filterbank_shape_and_triangles():
    fb = mel_filterbank(40, 512, SR)
    assert fb.shape == (40, 257)
    assert fb.min() >= 0.0 and fb.max() <= 1.0 + 1e-12
    # every filter is unimodal with a single peak near 1 (HTK peaks=1
    # up to bin quantization) and covers a contiguous band
    for row in fb:
        nz = np.flatnonzero(row)
        assert nz.size > 0
        assert np.array_equal(nz, np.arange(nz[0], nz[-1] + 1))
    assert fb.max(axis=1).min() > 0.5
    # centers strictly increase in frequency
    assert np.all(np.diff(fb.argmax(axis=1)) >= 0)


def test_filterbank_bad_range_raises():
    with pytest.raises(ValueError, match="fmin"):
        mel_filterbank(40, 512, SR, fmin=9000.0, fmax=8000.0)


def test_pure_tone_energy_lands_in_the_right_mel_band():
    """A 1 kHz tone's log-mel energy must peak in the filter whose
    passband contains 1 kHz — the most basic spectral-sanity oracle."""
    t = np.arange(SR) / SR
    for f0 in (500.0, 1000.0, 3000.0):
        x = np.sin(2 * np.pi * f0 * t)
        lm = log_mel_spectrogram(x, SR, n_fft=512, hop=160, n_mels=40)
        band = lm.mean(axis=0).argmax()
        fb = mel_filterbank(40, 512, SR)
        freqs = np.fft.rfftfreq(512, d=1.0 / SR)
        peak_hz = freqs[fb[band].argmax()]
        assert abs(peak_hz - f0) < 250.0, (f0, peak_hz)


def test_dct_matrix_is_orthonormal():
    m = _dct2_ortho(40, 40)
    np.testing.assert_allclose(m @ m.T, np.eye(40), atol=1e-12)


def test_amplitude_scaling_moves_only_c0():
    """log(a²·P) = log P + const per band → the DCT of a constant
    vector is nonzero only at coefficient 0. Exact textbook property
    (up to the eps floor, so use a loud signal)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=SR).astype(np.float64)
    a, b = mfcc(x, SR), mfcc(3.0 * x, SR)
    assert a.shape == b.shape and a.shape[1] == 13
    np.testing.assert_allclose(a[:, 1:], b[:, 1:], atol=1e-6)
    assert np.all(b[:, 0] > a[:, 0])  # louder → larger c0, every frame


def test_hop_shift_invariance_of_interior_frames():
    rng = np.random.default_rng(1)
    x = rng.normal(size=SR).astype(np.float64)
    a = mfcc(x, SR, hop=160)
    b = mfcc(x[160:], SR, hop=160)
    np.testing.assert_allclose(a[1 : 1 + len(b)], b, atol=1e-9)


def test_short_clip_returns_empty():
    assert log_mel_spectrogram(np.zeros(100), SR).shape == (0, 40)


def test_audio_mfcc_spark_matches_local(spark):
    from fenix_spark.multimodal.media import MEDIA_SCHEMA, decode_audio, encode_wav

    rng = np.random.default_rng(2)
    t = np.arange(SR) / SR
    clips = {
        1: (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16),
        2: (rng.normal(size=SR) * 8000).astype(np.int16),
    }
    rows = [
        (mid, "audio", bytearray(encode_wav(sig, SR)), ("wav", 0, 0, 0, SR, 0))
        for mid, sig in clips.items()
    ]
    rows.append((3, "audio", bytearray(b"garbage"), ("wav", 0, 0, 0, SR, 0)))
    rows.append((4, "image", bytearray(b"x"), ("bmp", 1, 1, 3, 0, 0)))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in audio_mfcc(df).collect()}

    assert set(got) == {1, 2, 3}  # image row filtered, garbage kept as NULL
    assert got[3]["mfcc"] is None and got[3]["n_frames"] is None
    for mid, sig in clips.items():
        x, sr = decode_audio(encode_wav(sig, SR), "wav")
        m = mfcc(x, sr)
        want = np.concatenate([m.mean(axis=0), m.std(axis=0)])
        assert got[mid]["n_frames"] == len(m)
        np.testing.assert_allclose(np.array(got[mid]["mfcc"]), want, rtol=1e-9)


def test_mfcc_separates_unlike_clips_and_groups_transcoded_ones(spark):
    """The pooled vector behaves as an embedding: a level-scaled copy
    of a clip sits far closer (cosine) to its source than an unrelated
    clip does — the property the embedding near-dup operators need."""
    rng = np.random.default_rng(3)
    t = np.arange(SR) / SR
    base = np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 1310 * t)
    quiet = 0.5 * base
    other = rng.normal(size=SR)

    def vec(x):
        m = mfcc(x, SR)
        return np.concatenate([m.mean(axis=0), m.std(axis=0)])

    def cos(u, v):
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

    assert cos(vec(base), vec(quiet)) > 0.99
    assert cos(vec(base), vec(other)) < 0.9


def test_pooled_mfcc_is_timbre_not_content():
    """The documented boundary, pinned: over same-recipe textured
    tracks the pooled-MFCC "copy" and "unrelated" distance classes
    sit within ONE ORDER OF MAGNITUDE of each other (some draws
    overlap outright) — there is no robust threshold, unlike the
    fingerprint pipeline's ~0.0-transcode vs ~0.5-unrelated BER
    separation. That missing margin is why audiofp (not this vector)
    owns copy dedup."""
    from fenix_spark.multimodal.planted import SR as PSR
    from fenix_spark.multimodal.planted import textured_track

    rng = np.random.default_rng(21)
    bases = [textured_track(rng).astype(np.float64) for _ in range(5)]

    def vec(x):
        m = mfcc(x, PSR)
        return np.concatenate([m.mean(axis=0), m.std(axis=0)])

    def cosd(u, v):
        return 0.5 - 0.5 * float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

    base_vecs = [vec(x) for x in bases]
    within = [
        cosd(
            base_vecs[i],
            vec(x + rng.normal(0, np.abs(x).max() * 0.10, x.shape)),
        )
        for i, x in enumerate(bases)
    ]
    across = [
        cosd(base_vecs[i], base_vecs[j])
        for i in range(5)
        for j in range(i + 1, 5)
    ]
    assert min(across) < 10 * max(within)  # no robust margin exists
