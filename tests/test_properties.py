"""Property-based tests (hypothesis) for the algebraic guarantees the
operators advertise. Each property runs MANY cases through ONE Spark
job (a single createDataFrame per example set) to stay fast."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fenix_spark.functions.tensors import choose_qparams, dequantize, quantize
from fenix_spark.functions.texthash import let, tokens, word_shingles
from fenix_spark.operators.sampling import hash_split

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

vecs = st.lists(
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
    min_size=2,
    max_size=16,
)


def test_quantize_error_bounded_by_half_scale(spark):
    """|x − dequant(quant(x))| ≤ scale/2 for every in-range element —
    the affine-quantization contract (ref quint8.py:23-53).

    Batched grid (r14 test-wall): 80 seeded random vectors through ONE
    Spark action instead of a one-row job per hypothesis example."""
    import random

    rng = random.Random(271)
    cases = [
        [rng.uniform(-1e4, 1e4) for _ in range(rng.randint(2, 16))]
        for _ in range(80)
    ]
    # adversarial extras: constants, tiny ranges, sign straddles
    cases += [[0.0, 0.0], [5.0, 5.0, 5.0], [-1e4, 1e4], [1e-9, 2e-9]]
    df = spark.createDataFrame([(c,) for c in cases], "v array<double>")
    v = F.col("v")
    scale, shift = choose_qparams(v)
    deq = dequantize(quantize(v, scale, shift), scale, shift)
    rows = df.select(
        F.array_max(F.zip_with(v, deq, lambda a, b: F.abs(a - b))).alias("err"),
        scale.alias("scale"),
    ).collect()
    assert len(rows) == len(cases)
    for row in rows:
        assert row["err"] <= row["scale"] / 2 + 1e-9


@given(
    weights=st.lists(st.floats(min_value=0.05, max_value=5, allow_nan=False), min_size=2, max_size=5),
    n=st.integers(min_value=1, max_value=300),
)
@settings(**_SETTINGS)
def test_hash_split_partition_property(spark, weights, n):
    """Any weight vector: every row lands in exactly one split."""
    names = [f"s{i}" for i in range(len(weights))]
    df = spark.range(n).withColumnRenamed("id", "k")
    out = hash_split(df, "k", weights, names)
    rows = out.select("k", "split").collect()
    assert len(rows) == n
    assert all(r["split"] in names for r in rows)


def test_word_shingles_count(spark):
    """len(shingles) == max(len(tokens) − n + 1, 1): rolling shingles
    with the short-document degenerate branch.

    Batched grid (r14 test-wall): 40 seeded token lists × n ∈ 1..4,
    one unioned action (n is plan-baked, so one plan per n)."""
    import random

    rng = random.Random(907)
    toks_cases = [
        [rng.choice("abcdefgh") for _ in range(rng.randint(1, 30))]
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, " ".join(tk), len(tk)) for i, tk in enumerate(toks_cases)],
        "id bigint, t string, ntok bigint",
    )
    union = None
    for n in (1, 2, 3, 4):
        part = df.select(
            "id",
            "ntok",
            F.lit(n).alias("n"),
            F.size(
                # single-arg lambda: let() hands (x, i) to any callable
                # accepting two parameters (the F.transform trap)
                let(tokens(F.col("t")), (lambda n_: lambda tk: word_shingles(tk, n_))(n))
            ).alias("got"),
        )
        union = part if union is None else union.unionByName(part)
    for r in union.collect():
        assert r["got"] == max(r["ntok"] - r["n"] + 1, 1), (r["id"], r["n"])


def test_asof_join_matches_reference_model(spark):
    """asof_join == the obvious per-row model: greatest right ts ≤
    left ts within the key (ties allowed), None when absent.

    Batched (r14 test-wall): 20 seeded cases ride ONE asof_join call
    with case-namespaced keys (asof is keyed, so cases can't
    interact), including empty-right and one-sided-key cases."""
    import random

    from fenix_spark.operators.joins import asof_join

    rng = random.Random(977)
    lrows, rrows, model = [], [], []
    lid = 0
    for c in range(20):
        lefts = [
            (f"c{c}{rng.choice('AB')}", rng.randint(0, 50))
            for _ in range(rng.randint(1, 15))
        ]
        rights = list(
            {
                (f"c{c}{rng.choice('AB')}", rng.randint(0, 50))
                for _ in range(rng.randint(0, 15))
            }
        )
        for k, t in lefts:
            lrows.append((k, t, lid))
            cands = [rt for rk, rt in rights if rk == k and rt <= t]
            model.append((lid, max(cands) if cands else None))
            lid += 1
        rrows += [(k, t, float(t) * 2) for k, t in rights]
    ldf = spark.createDataFrame(lrows, "k string, ts bigint, lid bigint")
    rdf = spark.createDataFrame(rrows, "k string, ts bigint, px double")
    out = {
        r["lid"]: r["right_ts"]
        for r in asof_join(ldf, rdf, "k", "ts", "ts", ["px"]).collect()
    }
    for i, expect in model:
        assert out[i] == expect, i


def test_range_join_bucketed_equals_broadcast_any_width(spark):
    """The bucket rewrite is semantics-preserving for ANY bucket width
    and ANY interval layout (intervals from sorted random edges).

    Batched (r14 test-wall): 12 seeded interval layouts live in
    DISJOINT value ranges (case c offset by c·10⁶, so cross-case
    matches are impossible) and ride ONE brute + ONE bucketed call per
    width — 8 actions instead of 24 one-row jobs, widths spanning the
    sampled range including awkward non-divisor floats."""
    import random

    from fenix_spark.operators.joins import range_join, range_join_bucketed

    rng = random.Random(31)
    pt_rows, band_rows, want_possible = [], [], set()
    pid = 0
    for c in range(12):
        off = c * 1_000_000.0
        pts = [
            off + rng.uniform(-50, 150) for _ in range(rng.randint(1, 20))
        ]
        edges = sorted(
            {round(off + rng.uniform(-40, 140), 6) for _ in range(rng.randint(2, 6))}
        )
        while len(edges) < 2:
            edges.append(edges[-1] + 1.0)
        for i in range(len(edges) - 1):
            band_rows.append((edges[i], edges[i + 1], f"c{c}b{i}"))
        for v in pts:
            pt_rows.append((pid, v))
            pid += 1
    pdf = spark.createDataFrame(pt_rows, "id bigint, v double")
    bdf = spark.createDataFrame(band_rows, "lo double, hi double, band string")
    brute = {(r["id"], r["band"]) for r in range_join(pdf, bdf, "v").collect()}
    for width in (3.0, 7.75, 19.3, 60.0):
        bucketed = {
            (r["id"], r["band"])
            for r in range_join_bucketed(pdf, bdf, "v", bucket_width=width).collect()
        }
        assert bucketed == brute, width


def test_simhash_band_join_is_exact(spark):
    """The pigeonhole claim, verified: the band equi-join + hamming
    post-filter returns EXACTLY the pairs with hamming(simhash) ≤ 3 —
    perfect recall (any 3 flipped bits leave ≥1 of 4 disjoint bands
    intact) and perfect precision (explicit bit_count check).

    Batched (r14 test-wall): one 70-doc seeded corpus (short docs over
    a 10-letter alphabet, maximizing near-collisions) through ONE
    operator call vs the full O(n²) brute hamming model — the law is
    corpus-universal, so the merged corpus covers what the per-example
    hypothesis runs sampled."""
    import random

    from fenix_spark.operators.dedup import simhash_fingerprints, simhash_neardup_pairs

    rng = random.Random(421)
    texts = [
        " ".join(rng.choice("abcdefghij") for _ in range(rng.randint(3, 12)))
        for _ in range(70)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {
        (r["id_l"], r["id_r"])
        for r in simhash_neardup_pairs(df, "text", "doc_id").collect()
    }
    fps = {r["id"]: r["sim"] for r in simhash_fingerprints(df, "text", "doc_id").collect()}
    ids = sorted(fps)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == brute


@given(
    shared=st.lists(st.sampled_from("xyzuvw"), min_size=7, max_size=12),
    pre=st.lists(st.sampled_from("abcd"), min_size=0, max_size=6),
    post=st.lists(st.sampled_from("efgh"), min_size=0, max_size=6),
)
@settings(**_SETTINGS)
def test_winnowing_guarantee(spark, shared, pre, post):
    """Schleimer et al.'s guarantee: two documents sharing a run of
    ≥ window + shingle − 1 tokens (here 4+3−1=6) share ≥1 fingerprint."""
    from fenix_spark.operators.dedup import winnow_fingerprints

    d1 = " ".join(pre + shared)
    d2 = " ".join(shared + post)
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id bigint, text string")
    out = winnow_fingerprints(df, "text", "doc_id")
    fps = {}
    for r in out.collect():
        fps.setdefault(r["id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared 7+-token run must share a fingerprint"


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    """encode_bmp/_decode_bmp are inverse for EVERY (w, h) — padding,
    bottom-up row order, and BGR swap all cancel exactly."""
    import numpy as np

    from fenix_spark.multimodal import encode_bmp
    from fenix_spark.multimodal.media import _decode_bmp

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (_decode_bmp(encode_bmp(img)) == img).all()


@given(
    n=st.integers(min_value=1, max_value=400),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(n, sr, seed):
    import numpy as np

    from fenix_spark.multimodal import decode_audio, encode_wav

    sig = np.random.default_rng(seed).integers(-(2**15), 2**15, size=n, dtype=np.int64)
    x, got_sr = decode_audio(encode_wav(sig, sr), "wav")
    assert got_sr == sr and len(x) == n and (x == sig.astype(float)).all()


@given(
    lengths=st.lists(st.integers(min_value=1, max_value=150), min_size=1, max_size=60),
    budget=st.integers(min_value=40, max_value=120),
)
@settings(**_SETTINGS)
def test_packing_partition_and_budget_invariants(spark, lengths, budget):
    """For ANY length multiset and budget: every doc lands in exactly
    one pack; no multi-doc pack exceeds the budget (only an oversize
    own-pack may); pack_len is the true per-pack sum."""
    from fenix_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(list(enumerate(lengths)), "doc_id bigint, n bigint")
    rows = pack_sequences(df, "n", budget=budget, num_buckets=3).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(lengths)))
    packs = {}
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r)
    for members in packs.values():
        total = sum(r["length"] for r in members)
        assert all(r["pack_len"] == total for r in members)
        if len(members) > 1:
            assert total <= budget


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)), min_size=1, max_size=40
    ),
)
@settings(**_SETTINGS)
def test_zorder_interleave_matches_python_reference(spark, pts):
    """The native bit-interleave equals the textbook Morton number for
    every input (10-bit, 2-D)."""
    from fenix_spark.functions.zorder import interleave_bits

    df = spark.createDataFrame(pts, "x int, y int")
    got = [
        r["z"]
        for r in df.select(
            interleave_bits([F.col("x"), F.col("y")], bits=10).alias("z")
        ).collect()
    ]

    def morton(x, y):
        z = 0
        for j in range(10):
            z |= ((x >> j) & 1) << (2 * j) | ((y >> j) & 1) << (2 * j + 1)
        return z

    assert got == [morton(x, y) for x, y in pts]


def test_asof_all_directions_match_pandas(spark):
    """Batched (r14 test-wall): 12 seeded (lts, rts) cases ride ONE
    asof_join per direction as distinct keys, checked per key against
    pandas merge_asof — 3 actions instead of 36 one-row jobs."""
    import pandas as pd

    import random

    from fenix_spark.operators.joins import asof_join

    rng = random.Random(137)
    cases = {}
    lrows, rrows = [], []
    for c in range(12):
        lts = sorted({rng.randint(0, 60) for _ in range(rng.randint(1, 15))})
        rts = sorted({rng.randint(0, 60) for _ in range(rng.randint(0, 15))})
        cases[c] = (lts, rts)
        lrows += [(c, t) for t in lts]
        rrows += [(c, t, float(t) * 10) for t in rts]
    left = spark.createDataFrame(lrows, "k bigint, t bigint")
    right = spark.createDataFrame(rrows, "k bigint, t bigint, v double")

    for direction in ("backward", "forward", "nearest"):
        got = {}
        for r in asof_join(
            left, right, "k", "t", "t", ["v"], direction=direction
        ).collect():
            got.setdefault(r["k"], {})[r["t"]] = r["right_v"]
        for c, (lts, rts) in cases.items():
            lp = pd.DataFrame([(c, t) for t in lts], columns=["k", "t"])
            rp = pd.DataFrame(
                [(c, t, float(t) * 10) for t in rts], columns=["k", "t", "v"]
            )
            if rts:
                exp_df = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
                exp = {
                    r.t: (None if pd.isna(r.v) else r.v)
                    for r in exp_df.itertuples()
                }
            else:
                exp = {t: None for t in lts}
            assert got.get(c, {}) == exp, (c, direction)


words = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=5), min_size=2, max_size=12, unique=True
)


def test_fuzzy_join_exact_vs_bruteforce_property(spark):
    """Deletion-neighborhood join == brute-force levenshtein filter for
    ANY vocabulary (tiny alphabet maximizes collisions/adversity).

    Batched (r14 test-wall): one 90-word seeded unique vocabulary over
    alphabet "abc" (max adversity: dense deletion-neighborhood
    collisions) through ONE operator call, checked against the full
    O(n²) brute model — the merged corpus is itself an instance of the
    universally-quantified law the per-example form sampled."""
    import itertools
    import random

    from fenix_spark.operators.fuzzy import fuzzy_self_pairs

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(613)
    pool = [""] + [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
        for _ in range(400)
    ]
    vocab = []
    seen = set()
    for w in pool:
        if w not in seen:
            seen.add(w)
            vocab.append(w)
        if len(vocab) == 90:
            break

    df = spark.createDataFrame(list(enumerate(vocab)), "id bigint, s string")
    got = {
        (r.id_l, r.id_r, r.dist)
        for r in fuzzy_self_pairs(df, "s", "id", max_dist=2).collect()
    }
    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(vocab), 2)
        if lev(a, b) <= 2
    }
    assert got == want


def test_gapfill_grid_properties(spark):
    """For any observation set: the grid is dense over the key's
    extent, real buckets keep their aggregate, locf never leaves an
    interior null, and linear fill is bounded by its bracket values.

    Batched (r14 test-wall): 15 seeded observation sets ride ONE
    gapfill call per grain×fill as distinct KEYS (gapfill grids per
    key, so cases are independent by construction) — 9 actions
    instead of 36 one-row jobs."""
    import random

    from fenix_spark.operators.timeseries import gapfill

    rng = random.Random(53)
    cases = {}
    rows = []
    for c in range(15):
        obs = [
            (rng.randint(0, 40), round(rng.uniform(-100, 100), 3))
            for _ in range(rng.randint(1, 15))
        ]
        cases[f"k{c}"] = obs
        rows += [(f"k{c}", t, v) for t, v in obs]
    df = spark.createDataFrame(rows, "key string, ts_ms bigint, value double")

    for grain in (1, 3, 7):
        dense = {}
        for r in gapfill(df, "key", "ts_ms", "value", grain).collect():
            dense.setdefault(r.key, {})[r.bucket_ms] = (r.value, r.filled)
        locf = {}
        for r in gapfill(df, "key", "ts_ms", "value", grain, fill="locf").collect():
            locf.setdefault(r.key, {})[r.bucket_ms] = r.value
        lin = {}
        for r in gapfill(df, "key", "ts_ms", "value", grain, fill="linear").collect():
            lin.setdefault(r.key, {})[r.bucket_ms] = r.value

        for key, obs in cases.items():
            buckets = sorted(dense[key])
            lo = min(t // grain * grain for t, _ in obs)
            hi = max(t // grain * grain for t, _ in obs)
            assert buckets == list(range(lo, hi + 1, grain)), (key, grain)
            assert all(locf[key][b] is not None for b in buckets), (key, grain)
            reals = [b for b in buckets if not dense[key][b][1]]
            for b in buckets:
                if dense[key][b][1] and lin[key][b] is not None:
                    prev = max(rb for rb in reals if rb < b)
                    nxt = min(rb for rb in reals if rb > b)
                    low, high = sorted((dense[key][prev][0], dense[key][nxt][0]))
                    assert low - 1e-9 <= lin[key][b] <= high + 1e-9, (key, grain, b)


@given(
    hist=st.lists(
        st.tuples(st.text(alphabet="ab", min_size=1, max_size=6), st.integers(1, 9)),
        min_size=1,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
    n_merges=st.integers(min_value=0, max_value=20),
)
@settings(**_SETTINGS)
def test_bpe_histogram_invariants(hist, n_merges):
    """Any histogram: merges are distinct, encode concat restores the
    word, and total token count is non-increasing in merge count."""
    from fenix_spark.functions.bpe import (
        END,
        encode_word,
        train_bpe_on_histogram,
    )

    merges = train_bpe_on_histogram(hist, n_merges)
    assert len(set(merges)) == len(merges) <= n_merges
    ranks = {p: i for i, p in enumerate(merges)}
    prev_total = None
    for cut in range(len(merges) + 1):
        sub = {p: i for i, p in enumerate(merges[:cut])}
        total = 0
        for w, c in hist:
            toks = encode_word(w, sub)
            assert "".join(toks).replace(END, "") == w
            total += len(toks) * c
        if prev_total is not None:
            assert total <= prev_total
        prev_total = total
    _ = ranks


# ----------------------------------------------- temperature mixing laws


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=8),
    t=st.floats(min_value=0.05, max_value=1.0),
    budget=st.integers(min_value=1, max_value=50_000),
)
@settings(max_examples=200, deadline=None)
def test_temperature_rates_laws(counts, t, budget):
    """Driver-side arithmetic laws: rates in [0,1]; realized total =
    min(budget, available) up to float slack; saturated sources only
    at rate exactly 1."""
    from fenix_spark.operators.sampling import temperature_rates

    rates = temperature_rates(counts, t, budget)
    assert len(rates) == len(counts)
    assert all(0.0 <= r <= 1.0 for r in rates)
    realized = sum(r * c for r, c in zip(rates, counts))
    want = min(budget, sum(counts))
    assert abs(realized - want) < 1e-6 * max(want, 1)


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=8),
    t=st.floats(min_value=0.05, max_value=1.0),
    budget=st.integers(min_value=1, max_value=50_000),
    cap=st.floats(min_value=1.0, max_value=8.0),
)
@settings(max_examples=200, deadline=None)
def test_temperature_rates_cap_laws(counts, t, budget, cap):
    """The upsampling generalization (epoch_mixture's law): rates in
    [0, cap]; realized total = min(budget, cap × available) up to
    float slack; cap=1 degenerates to the scan-filter law above."""
    from fenix_spark.operators.sampling import temperature_rates

    rates = temperature_rates(counts, t, budget, cap=cap)
    assert all(0.0 <= r <= cap for r in rates)
    realized = sum(r * c for r, c in zip(rates, counts))
    want = min(budget, cap * sum(counts))
    assert abs(realized - want) < 1e-6 * max(want, 1)


@given(
    counts=st.lists(st.integers(min_value=10, max_value=10_000), min_size=2, max_size=6),
    budget=st.integers(min_value=5, max_value=1_000),
)
@settings(max_examples=100, deadline=None)
def test_temperature_flattening_monotone(counts, budget):
    """Lower temperature shifts share toward smaller sources: the
    smallest source's allocation is non-decreasing as T drops (when
    nothing saturates)."""
    from fenix_spark.operators.sampling import temperature_rates

    small = min(range(len(counts)), key=lambda i: counts[i])
    allocs = []
    for t in (1.0, 0.5, 0.2):
        r = temperature_rates(counts, t, budget)
        if any(x == 1.0 for x in r):
            return  # saturation changes the geometry; covered elsewhere
        allocs.append(r[small] * counts[small])
    assert allocs[0] <= allocs[1] + 1e-9 <= allocs[2] + 2e-9


# ------------------------------------------------ paragraph dedup laws


def test_paragraph_dedup_identity_without_cross_doc_dups(spark):
    """Corpora where every paragraph is made unique per doc must pass
    through dedup_paragraphs byte-identically (text rebuilt with the
    canonical blank-line separator it was built with).

    Batched (r14 test-wall): 60 seeded docs with globally-unique
    paragraph suffixes in ONE corpus/operator call — the identity law
    quantifies over corpora without cross-doc duplicates, and the
    merged corpus is one (bigger) such corpus."""
    import random

    from fenix_spark.operators.paragraphs import dedup_paragraphs

    rng = random.Random(89)
    bases = [
        "alpha beta gamma delta words",
        "epsilon zeta eta theta words",
        "iota kappa lambda mu words",
        "nu xi omicron pi words",
    ]
    rows = [
        (
            i,
            "\n\n".join(
                f"{rng.choice(bases)} doc{i} para{j}"
                for j in range(rng.randint(1, 4))
            ),
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.id: r.text for r in dedup_paragraphs(df, "text", "doc_id").collect()}
    for i, text in rows:
        assert out[i] == text


# --------------------------------------------- conversation budget law


def test_truncate_budget_laws(spark):
    """Output is always a suffix of the input body (plus the system
    turn), never exceeds the budget unless it is the bare system
    turn, and is untouched when already within budget.

    Batched grid (r14 test-wall): 40 seeded random message lists ×
    6 budgets × with/without system turn = 480 cases through ONE
    Spark action — replaces the hypothesis form, which paid a
    one-row Spark job per example (25 examples ≈ 42 s) for the same
    law coverage; the budget parameter is plan-baked, so cases are
    grouped per budget and unioned before the single collect."""
    import random

    from pyspark.sql import functions as F

    from fenix_spark.operators.conversations import truncate_to_budget

    rng = random.Random(1729)
    case_lens = [
        [rng.randint(1, 12) for _ in range(rng.randint(1, 8))] for _ in range(40)
    ]
    inputs = {}  # case id -> (msgs, budget, with_sys)
    rows = []
    cid = 0
    for budget in (1, 2, 3, 7, 17, 40):
        for lens in case_lens:
            for with_sys in (False, True):
                msgs = (
                    [{"role": "system", "content": "s y s"}] if with_sys else []
                ) + [
                    {
                        "role": "user" if i % 2 == 0 else "assistant",
                        "content": "w " * n,
                    }
                    for i, n in enumerate(lens)
                ]
                inputs[cid] = (msgs, budget, with_sys)
                rows.append((cid, budget, msgs))
                cid += 1
    df = spark.createDataFrame(
        rows,
        "id bigint, budget bigint, messages array<struct<role string, content string>>",
    )
    outs = [
        truncate_to_budget(df.where(F.col("budget") == b), "messages", budget=b)
        for b in (1, 2, 3, 7, 17, 40)
    ]
    union = outs[0]
    for o in outs[1:]:
        union = union.unionByName(o)
    got = {r.id: [m.content for m in r.messages] for r in union.collect()}
    assert len(got) == cid
    for case, (msgs, budget, with_sys) in inputs.items():
        out_contents = got[case]
        in_contents = [m["content"] for m in msgs]
        sys_tok = 3 if with_sys else 0
        body_out = out_contents[1:] if with_sys else out_contents
        body_in = in_contents[1:] if with_sys else in_contents
        # suffix law
        assert body_out == (
            body_in[len(body_in) - len(body_out):] if body_out else []
        ), (case, budget)
        if with_sys:
            assert out_contents[:1] == in_contents[:1], (case, budget)
        # budget law (bare-system degenerate case exempt)
        total = sys_tok + sum(len(c.split()) for c in body_out)
        if body_out:
            assert total <= budget, (case, budget)
        # identity law
        full_total = sys_tok + sum(len(c.split()) for c in body_in)
        if full_total <= budget:
            assert out_contents == in_contents, (case, budget)
