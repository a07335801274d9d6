"""sf0.1 scale smoke (slow): the session-4 operator families on the
largest local testdata — not micro-benchmarks, just proof that each
runs to completion at 100× the unit-test size with sane outputs.
The per-operator scale ARGUMENTS live in SCALE.md; this is the
executable backstop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def docs01(spark):
    return spark.read.parquet(f"{SF01}/documents.parquet")


@pytest.fixture(scope="module")
def events01(spark):
    return spark.read.parquet(f"{SF01}/events.parquet")


def test_heavy_hitters_sf01(spark, docs01):
    from fenix_spark.operators.sketches import heavy_hitters

    top = heavy_hitters(docs01, "text", k=10, m=1024).collect()
    assert len(top) == 10
    assert all(top[i]["count"] >= top[i + 1]["count"] for i in range(9))


def test_dsir_sf01(spark, docs01):
    from fenix_spark.operators.dsir import dsir_select, fit_importance_model

    target = docs01.limit(500)
    model = fit_importance_model(target, docs01, "text", "doc_id")
    sel = dsir_select(docs01, "text", "doc_id", model, k=100, salt="s")
    assert sel.count() == 100


def test_hll_and_hist_rollups_sf01(spark, events01):
    from fenix_spark.operators.sketches import (
        hist_quantiles,
        hist_rollup,
        hll_merge,
        hll_rollup,
    )

    total = hll_merge(
        hll_rollup(events01, ["event_type"], "user_id"), []
    ).first().distinct_est
    exact = events01.agg(F.countDistinct("user_id")).first()[0]
    assert abs(total - exact) <= 0.05 * exact

    roll = hist_rollup(events01, ["event_type"], "value", 0.0, 1000.0, 256)
    q = hist_quantiles(roll, ["event_type"], [0.5], 0.0, 1000.0, 256)
    assert q.count() == events01.select("event_type").distinct().count()


def test_paragraph_dedup_sf01(spark, docs01):
    from fenix_spark.operators.paragraphs import dedup_paragraphs

    out = dedup_paragraphs(docs01, "text", "doc_id")
    n = out.count()
    assert n == docs01.count()
    # conservation at scale: every doc accounted, no text invented
    assert out.where(F.col("kept_paragraphs") < 0).count() == 0


def test_html_extraction_sf01(spark, docs01):
    """documents.text isn't HTML; wrap it to exercise the extractor
    at volume (regex chains over ~60k docs)."""
    from fenix_spark.functions.html import boilerplate_features, html_to_text

    wrapped = docs01.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
        ).alias("html"),
    )
    out = wrapped.select(
        "doc_id",
        html_to_text(F.col("html")).alias("t"),
        boilerplate_features(F.col("html")).alias("f"),
    )
    row = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.length("t") > 0).cast("long")).alias("nonempty"),
        F.avg("f.text_ratio").alias("ratio"),
    ).first()
    assert row.n == row.nonempty
    assert 0.5 < row.ratio <= 1.0


def test_bloom_prefilter_sf01(spark, docs01, events01):
    """Bloom over the full sf0.1 doc-id key set, pre-filtering the
    events fact table: completeness (no join match lost) at 100× the
    unit-test size."""
    from fenix_spark.operators.sketches import (
        bloom_build,
        bloom_contains_expr,
        bloom_to_words,
    )

    m, k = 1 << 20, 5
    keys = docs01.select((F.col("doc_id") % 5000).alias("key")).distinct()
    words = bloom_to_words(bloom_build(keys, "key", m, k), m)
    fact = events01.select((F.col("user_id") % 20000).alias("key"), "event_id")
    pre = fact.where(bloom_contains_expr(F.col("key"), words, m, k))
    full = fact.join(keys, "key").count()
    filtered = pre.join(keys, "key").count()
    assert filtered == full


def test_audio_match_pipeline_sf01(spark):
    """Fingerprint + BER matching over the synthesized sf0.1 media
    table's audio rows — completion + no self-pairs at scale."""
    from fenix_spark.artifacts import ensure_media_artifact
    from fenix_spark.multimodal.audiofp import (
        audio_fingerprints,
        audio_match_pairs_ber,
    )

    media = ensure_media_artifact(spark, SF01)
    audio = (
        media.where(F.col("kind") == "audio")
        .select("media_id", "data", F.col("meta.format").alias("fmt"))
        .limit(64)
    )
    assert audio.count() > 0
    fps = audio_fingerprints(audio).localCheckpoint(eager=True)
    pairs = audio_match_pairs_ber(fps, candidate_min_votes=4).collect()
    assert all(p.id_a < p.id_b for p in pairs)
    assert all(p.ber <= 0.25 for p in pairs)


def test_url_canonicalize_sf01(spark, docs01):
    """URL expression tier over ~60k synthesized URLs: one scan, no
    exchange, canonical fixed point."""
    from fenix_spark.functions.urls import canonicalize_url, registrable_domain

    urls = docs01.select(
        F.concat(
            F.lit("https://sub"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(".example"),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source=x&id="),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    out = urls.select(
        canonicalize_url(F.col("url")).alias("c"),
        registrable_domain(F.col("url")).alias("d"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    once = out.select("c")
    twice = once.select(canonicalize_url(F.col("c")).alias("c"))
    assert once.exceptAll(twice).count() == 0
    assert out.where(~F.col("d").rlike(r"^example\d+\.com$")).count() == 0


def test_opq_beats_plain_pq_on_correlated_vectors_sf01(spark):
    """The case OPQ exists for, pinned at sf0.1 embedding scale: a
    rank-6 latent signal mixed across all 32 dims (variance straddling
    every PQ block boundary). Floors: OPQ must cut reconstruction MSE
    by ≥15% AND beat plain PQ's OFF-RERANK ADC recall@10 (rerank would
    hide coding quality). Deterministic seeds end to end."""
    import numpy as np

    from fenix_spark.operators.coder import CodingConfig, train_coding
    from fenix_spark.operators.index import CODE_COL, adc_search, assign_code_expr
    from fenix_spark.operators.opq import fit_opq, opq_transform, rotate_query

    rng = np.random.default_rng(29)
    n, d, latent = 2000, 32, 6
    z = rng.normal(size=(n, latent)) * np.linspace(6.0, 1.5, latent)
    mix = rng.normal(size=(latent, d))
    x = z @ mix + 0.15 * rng.normal(size=(n, d))
    df = (
        spark.createDataFrame(
            [(i, x[i].tolist()) for i in range(n)],
            "vec_id bigint, embedding array<double>",
        )
        .repartition(16)
        .localCheckpoint()
    )
    cfg = CodingConfig(metric="l2", codebook_size=16, num_codebooks=4)
    pq = train_coding(df, "embedding", cfg)
    opq = fit_opq(df, "embedding", cfg, iters=3)
    assert opq.mse_history[-1] < 0.85 * opq.mse_history[0]  # ≥15% MSE cut

    plain = df.withColumn(CODE_COL, assign_code_expr("embedding", pq, "l2"))
    plain = plain.localCheckpoint(eager=False)
    rot = opq_transform(df, "embedding", opq, "opq")
    rot = rot.withColumn(
        CODE_COL, assign_code_expr("opq", opq.coding, "l2")
    ).localCheckpoint(eager=False)

    K = 10
    qidx = list(range(0, n, n // 10))[:10]
    d2 = ((x[qidx, None, :] - x[None, :, :]) ** 2).sum(axis=2)
    exact = np.argsort(d2, axis=1)[:, :K]
    h_pq = h_opq = 0
    for pos, qi in enumerate(qidx):
        want = set(int(v) for v in exact[pos])
        got_pq = {
            r["vec_id"]
            for r in adc_search(
                plain, pq, "embedding", x[qi].tolist(),
                metric="l2", k=K, rerank=None, id_col="vec_id",
            ).collect()
        }
        got_opq = {
            r["vec_id"]
            for r in adc_search(
                rot, opq.coding, "opq", rotate_query(x[qi].tolist(), opq),
                metric="l2", k=K, rerank=None, id_col="vec_id",
            ).collect()
        }
        h_pq += len(got_pq & want)
        h_opq += len(got_opq & want)
    # strict off-rerank win on correlated data (both recalls out of 100)
    assert h_opq > h_pq, (h_opq, h_pq)
    assert h_opq >= 50  # and the OPQ coding is genuinely usable


def test_dedup_substrings_sf01(spark, docs01):
    """ExactSubstr at 5k real docs: completes, preserves row count,
    never produces negative removal, and untouched docs pass through
    byte-identical (spot-checked against the source text)."""
    from fenix_spark.operators.substring import dedup_substrings

    out = dedup_substrings(docs01, "text", "doc_id", min_tokens=30)
    rows = out.select("doc_id", "text", "tokens_removed").collect()
    assert len(rows) == docs01.count()
    assert all(r["tokens_removed"] >= 0 for r in rows)
    src = {r["doc_id"]: r["text"] for r in docs01.select("doc_id", "text").collect()}
    untouched = [r for r in rows if r["tokens_removed"] == 0][:200]
    assert untouched and all(r["text"] == src[r["doc_id"]] for r in untouched)


def test_warc_crawl_tier_sf01(spark, tmp_path):
    """Crawl tier at volume: 4 segments x 3,000 records (~10 MB gz of
    member-per-record HTML) through source -> charset -> html ->
    exact dedup; counts and parallelism sane."""
    import numpy as np
    from pyspark.sql import functions as F

    from fenix_spark.functions.charset import payloads_to_text
    from fenix_spark.functions.html import html_to_text
    from fenix_spark.operators.dedup import exact_dedup_by_hash
    from fenix_spark.sources.warc_source import register, write_warc

    rng = np.random.default_rng(6)
    vocab = [f"w{i}" for i in range(500)]
    n_seg, per_seg = 4, 3000
    for seg in range(n_seg):
        records = []
        for i in range(per_seg):
            body = " ".join(vocab[j] for j in rng.integers(0, len(vocab), 40))
            if i % 10 == 0:
                body = "shared boilerplate duplicate page content"  # exact dups
            html = f"<html><body><p>{body}</p></body></html>".encode()
            records.append(
                {"type": "response", "url": f"https://s{seg}.ex/p{i}",
                 "http": True, "payload": html,
                 "content_type": "text/html; charset=utf-8"}
            )
        write_warc(str(tmp_path / f"seg{seg}.warc.gz"), records)

    register(spark)
    raw = spark.read.format("warc").load(str(tmp_path))
    docs = payloads_to_text(
        raw.where(F.col("http_status") == 200)
    ).withColumnRenamed("id", "url").select(
        "url", html_to_text(F.col("text")).alias("text")
    )
    total = docs.count()
    assert total == n_seg * per_seg
    groups = exact_dedup_by_hash(docs, "text", "url")
    agg = groups.agg(
        F.count(F.lit(1)).alias("distinct_texts"),
        F.sum("dup_count").alias("rows"),
        F.max("dup_count").alias("biggest"),
    ).collect()[0]
    assert agg["rows"] == total
    assert agg["biggest"] == n_seg * per_seg // 10  # the planted dup class
    assert raw.select("file").distinct().count() == n_seg  # one partition/file


def test_crawl_recipe_ledger_sf01(spark, tmp_path):
    """The full crawl-tier recipe at the sf0.1 corpus size — the REAL
    5,000-document sf0.1 table shipped as member-per-record gzip WARC
    (robots.txt responses included in-band), then
    source → charset → html → robots → ExactSubstr → minhash →
    curation stats, with a per-stage row/byte ledger printed at the
    end (the SCALE.md crawl-ledger row's source — run with ``-s``).

    Every stage's count is asserted against an independently computed
    expectation where one exists (record totals, robots block set,
    row conservation), not just "ran to completion"."""
    from fenix_spark.functions.charset import payloads_to_text
    from fenix_spark.functions.html import html_to_text
    from fenix_spark.functions.robots import robots_filter, robots_rules
    from fenix_spark.functions.textstats import quality_score
    from fenix_spark.operators.dedup import minhash_neardup_pairs
    from fenix_spark.operators.substring import dedup_substrings
    from fenix_spark.sources.warc_source import register, write_warc

    docs = [
        (int(r["doc_id"]), r["text"])
        for r in spark.read.parquet(f"{SF01}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    n_hosts, n_seg = 20, 8
    # hosts h0/h1 block everything; h2 blocks /docs/3*; others allow
    robots_bodies = {}
    for h in range(n_hosts):
        if h in (0, 1):
            robots_bodies[h] = "User-agent: *\nDisallow: /\n"
        elif h == 2:
            robots_bodies[h] = "User-agent: *\nDisallow: /docs/3\n"
        else:
            robots_bodies[h] = "User-agent: *\nDisallow:\n"

    def host(doc_id: int) -> int:
        return doc_id % n_hosts

    per_seg = (len(docs) + n_seg - 1) // n_seg
    for seg in range(n_seg):
        records = []
        if seg == 0:  # robots.txt responses ride in the crawl itself
            for h in range(n_hosts):
                records.append(
                    {"type": "response", "url": f"https://h{h}.example/robots.txt",
                     "http": True, "payload": robots_bodies[h].encode(),
                     "content_type": "text/plain"}
                )
        for doc_id, text in docs[seg * per_seg : (seg + 1) * per_seg]:
            html = f"<html><body><p>{text}</p></body></html>".encode()
            records.append(
                {"type": "response",
                 "url": f"https://h{host(doc_id)}.example/docs/{doc_id}",
                 "http": True, "payload": html,
                 "content_type": "text/html; charset=utf-8"}
            )
        write_warc(str(tmp_path / f"seg{seg}.warc.gz"), records)

    ledger: list[tuple[str, int, int]] = []  # (stage, rows, bytes)

    register(spark)
    raw = spark.read.format("warc").load(str(tmp_path)).where(
        F.col("http_status") == 200
    ).localCheckpoint()  # one ingest; every later stage re-reads memory
    r = raw.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("payload")).alias("b")
    ).first()
    assert r["n"] == len(docs) + n_hosts
    ledger.append(("warc_records", r["n"], r["b"]))

    # robots rules from the in-band robots.txt responses
    rb = raw.where(F.col("url").endswith("/robots.txt")).select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.col("payload").cast("string").alias("robots"),
    )
    rules = robots_rules(rb, "host", "robots")
    n_rules = rules.count()
    assert n_rules == 3  # h0 '/', h1 '/', h2 '/docs/3' (empty Disallow = no rule)
    ledger.append(("robots_rules", n_rules, 0))

    # charset → html text
    pages = payloads_to_text(
        raw.where(~F.col("url").endswith("/robots.txt"))
    ).select(F.col("id").alias("url"), html_to_text(F.col("text")).alias("text"))
    t = pages.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("b")
    ).first()
    assert t["n"] == len(docs)
    ledger.append(("html_text", t["n"], t["b"]))

    # robots filter (id-keyed winner — the retry-safe path)
    with_host = pages.withColumn("host", F.parse_url("url", F.lit("HOST")))
    allowed = robots_filter(with_host, rules, "url", id_col="url").where(
        "robots_allowed"
    ).select("url", "text")
    expected_allowed = sum(
        1 for doc_id, _ in docs
        if host(doc_id) not in (0, 1)
        and not (host(doc_id) == 2 and str(doc_id).startswith("3"))
    )
    a = allowed.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("b")
    ).first()
    assert a["n"] == expected_allowed
    ledger.append(("robots_allowed", a["n"], a["b"]))

    # ExactSubstr dedup (winnowed candidates — the 100 TB shape)
    deduped = dedup_substrings(allowed, "text", "url", min_tokens=20)
    d = deduped.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("b"),
        F.sum("tokens_removed").alias("removed"),
        F.sum((F.col("tokens_removed") > 0).cast("long")).alias("touched"),
    ).first()
    assert d["n"] == expected_allowed  # row conservation
    assert d["removed"] >= 0 and d["b"] <= a["b"]
    ledger.append(("exactsubstr_text", d["n"], d["b"]))
    ledger.append(("exactsubstr_touched_docs", d["touched"], d["removed"]))

    # minhash near-dup pairs over the cleaned corpus
    pairs = minhash_neardup_pairs(
        deduped, "text", "url", threshold=0.8, shingle=3, max_group=64
    )
    n_pairs = pairs.count()
    ledger.append(("minhash_pairs", n_pairs, 0))

    # curation stats over the survivors
    stats = deduped.select(quality_score(F.col("text")).alias("q")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("q"), 4).alias("avg_quality"),
        F.sum((F.col("q") >= 0.5).cast("long")).alias("above_half"),
    ).first()
    assert stats["n_docs"] == expected_allowed
    ledger.append(("curation_docs", stats["n_docs"], 0))

    print("\nCRAWL LEDGER sf0.1:")
    for stage, rows, size in ledger:
        print(f"  {stage:28s} rows={rows:>8,}  bytes={size if size else 0:>12,}")
    print(f"  minhash_pairs={n_pairs}  avg_quality={stats['avg_quality']}"
          f"  above_half={stats['above_half']}")


def test_winnow_parity_at_sf01(spark, docs01):
    """VERDICT r6 #1's done-bar: the winnowed candidate pre-filter must
    be OUTPUT-IDENTICAL to the brute per-position pass on the real
    sf0.1 corpus, not just unit fixtures — every (doc, tokens_removed,
    rewritten text) triple equal."""
    from fenix_spark.operators.substring import dedup_substrings

    cols = ("doc_id", "tokens_removed", "text")
    got_w = {
        r["doc_id"]: (r["tokens_removed"], r["text"])
        for r in dedup_substrings(
            docs01, "text", "doc_id", min_tokens=20, candidates="winnow"
        ).select(*cols).collect()
    }
    got_a = {
        r["doc_id"]: (r["tokens_removed"], r["text"])
        for r in dedup_substrings(
            docs01, "text", "doc_id", min_tokens=20, candidates="all"
        ).select(*cols).collect()
    }
    assert got_w == got_a
    assert sum(1 for v in got_w.values() if v[0] > 0) > 0  # real dups exist


@pytest.fixture(scope="module")
def warc_archive01(spark, tmp_path_factory):
    """The sf0.1 documents shipped as 8 member-per-record gzip WARC
    segments — the corpus for the CDX random-access ledger."""
    from fenix_spark.sources.warc_source import write_warc

    root = tmp_path_factory.mktemp("warc01")
    docs = [
        (int(r["doc_id"]), r["text"])
        for r in spark.read.parquet(f"{SF01}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    n_seg = 8
    per_seg = (len(docs) + n_seg - 1) // n_seg
    paths = []
    for seg in range(n_seg):
        records = [
            {
                "type": "response",
                "url": f"https://h{doc_id % 20}.example/docs/{doc_id}",
                "http": True,
                "payload": f"<html><body><p>{text}</p></body></html>".encode(),
                "content_type": "text/html; charset=utf-8",
            }
            for doc_id, text in docs[seg * per_seg : (seg + 1) * per_seg]
        ]
        p = str(root / f"seg{seg}.warc.gz")
        write_warc(p, records)
        paths.append(p)
    return {"paths": paths, "docs": dict(docs), "n_docs": len(docs)}


def test_cdx_random_access_ledger_sf01(spark, warc_archive01):
    """VERDICT r7 #5's done-bar: the CDX tier at sf0.1 corpus size,
    with the index-vs-scan byte ledger that makes the 100 TB access
    claim concrete. index_warc_files walks all 8 archives distributed;
    the CDX-J round-trips through the NATIVE parser; a host-prefix
    filter on the index selects ~5% of members; read_warc_members
    then fetches ONLY those byte ranges — members fetched equals the
    filtered index rows exactly, and the fetched compressed bytes are
    a small fraction of the archive (the part a full scan would have
    had to read)."""
    import os

    from fenix_spark.sources.cdx import (
        index_warc_files,
        parse_cdxj,
        read_warc_members,
        write_cdxj,
    )

    paths, n_docs = warc_archive01["paths"], warc_archive01["n_docs"]
    total_bytes = sum(os.path.getsize(p) for p in paths)

    # distributed index build: one walker per archive
    idx = index_warc_files(
        spark.createDataFrame([(p,) for p in paths], "path string")
    )
    entries = [r.asDict() for r in idx.collect()]
    assert len(entries) == n_docs

    # CDX-J round trip through the NATIVE parser (pushdown-capable)
    cdx_path = os.path.join(os.path.dirname(paths[0]), "index.cdxj")
    write_cdxj(cdx_path, entries)
    parsed = parse_cdxj(
        spark.read.text(cdx_path).withColumnRenamed("value", "line")
    )
    assert parsed.where(~F.col("parse_ok")).count() == 0
    assert parsed.count() == n_docs

    # the Common Crawl pattern: filter the INDEX (one host's docs),
    # fetch only the named byte ranges
    wanted = parsed.where(F.col("urlkey").startswith("example,h7)"))
    expect_ids = {i for i in warc_archive01["docs"] if i % 20 == 7}
    n_wanted = wanted.count()
    assert n_wanted == len(expect_ids)

    fetched = read_warc_members(wanted).localCheckpoint()
    # members fetched == index rows filtered — nothing else was read
    assert fetched.count() == n_wanted
    assert fetched.where(~F.col("fetch_ok")).count() == 0
    got_ids = {
        int(r["url"].rsplit("/", 1)[1]) for r in fetched.select("url").collect()
    }
    assert got_ids == expect_ids
    # payloads are the real documents (spot-check round trip)
    some = fetched.select("url", "payload").limit(20).collect()
    for r in some:
        did = int(r["url"].rsplit("/", 1)[1])
        assert warc_archive01["docs"][did] in r["payload"].decode("utf-8")

    bytes_fetched = wanted.agg(F.sum("length")).first()[0]
    frac = bytes_fetched / total_bytes
    # ~1/20 of members + per-member gzip overhead; a full scan reads 1.0
    assert frac < 0.12, (bytes_fetched, total_bytes)
    print(
        f"\nCDX LEDGER sf0.1: archives={len(paths)} members={n_docs} "
        f"archive_bytes={total_bytes:,} fetched_members={n_wanted} "
        f"fetched_bytes={bytes_fetched:,} scan_fraction={frac:.4f}"
    )


def test_theta_overlap_audit_sf01(spark, docs01):
    """Theta at corpus scale: per-language distinct-doc sketches over
    the real sf0.1 table, estimates within 5·RSE of exact
    countDistinct, and the overlap matrix confirms languages partition
    the corpus (pairwise intersections estimate ~0)."""
    from fenix_spark.operators.sketches import (
        overlap_matrix,
        theta_estimate,
        theta_rollup,
    )

    k = 1024
    roll = theta_rollup(docs01, ["lang"], "doc_id", k).localCheckpoint()
    exact = {
        r["lang"]: r["d"]
        for r in docs01.groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    rse = 1.0 / (k - 2) ** 0.5
    for r in theta_estimate(roll, ["lang"], k).collect():
        n = exact[r["lang"]]
        assert abs(r["distinct_est"] - n) <= max(5 * rse * n, 2), (r, n)
    # doc_ids are disjoint across languages → near-zero intersections
    for r in overlap_matrix(roll, "lang", k).collect():
        assert r["jaccard_est"] < 0.01, r


def test_bottomk_sample_sf01(spark, docs01):
    """Fixed-size per-language samples over the real corpus: exact
    group sizes, layout-invariance (4 vs 32 partitions), payload rows
    intact."""
    from fenix_spark.operators.sampling import bottomk_sample

    k = 25
    sizes = {
        r["lang"]: r["n"]
        for r in docs01.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    a = bottomk_sample(docs01.repartition(4), ["lang"], "doc_id", k)
    b = bottomk_sample(docs01.repartition(32), ["lang"], "doc_id", k)
    sa = {(r["lang"], r["doc_id"]) for r in a.select("lang", "doc_id").collect()}
    sb = {(r["lang"], r["doc_id"]) for r in b.select("lang", "doc_id").collect()}
    assert sa == sb
    per = {}
    for lang, _ in sa:
        per[lang] = per.get(lang, 0) + 1
    assert per == {lang: min(k, n) for lang, n in sizes.items()}
