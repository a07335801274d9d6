"""Exact substring deduplication — the ExactSubstr pass of Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL'22):
any token run of ≥ ``min_tokens`` that occurs more than once in the
corpus keeps its FIRST occurrence and every other occurrence is cut
out of the document text.

The reference engine has no text surface; like the rest of the dedup
family this is a north-star extension, built as pure DataFrame ops.

Spark-first shape (the paper builds one giant suffix array — a global
sort of the whole corpus; that is exactly the thing NOT to do on a
1000-executor cluster):

- Phase 1 (candidate generation, the 100 TB lever): winnowed anchor
  values (`winnow_candidate_ids`) find every document that can hold a
  duplicate with 3.4× (L=20) to 4.9× (L=50) fewer shuffle rows than
  one-per-token MEASURED at sf0.1 (SCALE.md); the asymptotic
  anchor-arm density is 2/(K+1) ≈ 13× at L=50 on low-duplication
  corpora, where phase 2's candidate set stays small. The
  per-position pipeline below then runs on those docs only, with
  IDENTICAL output (the winnow guarantee is deterministic).
- Every candidate document emits one row per ``min_tokens``-token window:
  ``(id, pos, xxhash64(window))``. The window hash is computed inside
  the scan (`transform` over `sequence`, `xxhash64` over an array
  slice) — no Python, no shuffle; rows carry ~24 bytes.
- Duplicated windows are found with ONE partial-aggregating groupBy on
  the 8-byte hash (`min(struct(id, pos))` = the canonical occurrence;
  mega-duplicated boilerplate windows map-side-combine instead of
  skewing a sort window).
- Overlapping duplicated windows merge into spans per document with
  the classic gaps-and-islands window (per-doc partitions — bounded).
- Excision is scan-local: an indexed `filter` over the token array
  drops positions covered by any span; only AFFECTED documents are
  rewritten, untouched documents pass through byte-identical.

Correctness at scale: two DIFFERENT windows hashing equal (64-bit
collision) would remove non-duplicated text. At 10¹³ windows (100 TB)
birthday collisions are expected, so ``verify_exact=True`` (default)
re-checks every candidate occurrence against the canonical
occurrence's actual tokens with an equi-join that only touches
documents already containing candidates.

Tokens are RAW whitespace tokens (``split('\\s+')``), not the
normalized ``texthash.tokens`` — excision rewrites document text, so
the token stream must preserve case and punctuation; rebuilt text is
the kept tokens joined with single spaces (the standard ExactSubstr
convention: the pass operates on the token stream, original
inter-token whitespace is not preserved in rewritten docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fenix_spark.operators.dedup import spread
from fenix_spark.checkpoint import checkpoint_lazy as _ckpt_lazy

__all__ = [
    "token_windows",
    "duplicated_spans",
    "dedup_substrings",
    "winnow_candidate_ids",
]


def _raw_tokens(text_col: str):
    return F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return spread(df).select(
        F.col(id_col).alias("id"),
        _raw_tokens(text_col).alias("t"),
    ).withColumn("n", F.size("t"))


def token_windows(
    df: DataFrame, text_col: str, id_col: str, min_tokens: int = 50
) -> DataFrame:
    """``(id, pos, whash)`` — one row per ``min_tokens``-token window
    of each document (0-based token position), hash computed in the
    scan. Documents shorter than ``min_tokens`` emit nothing."""
    if min_tokens < 2:
        raise ValueError(f"min_tokens must be ≥ 2, got {min_tokens}")
    L = min_tokens
    base = _tokenized(df, text_col, id_col).where(F.col("n") >= L)
    wh = F.transform(
        F.sequence(F.lit(0), F.col("n") - L),
        lambda i: F.xxhash64(F.slice("t", i + 1, L)),
    )
    return base.select("id", F.posexplode(wh).alias("pos", "whash"))


def winnow_candidate_ids(
    df: DataFrame, text_col: str, id_col: str, min_tokens: int = 50
) -> DataFrame:
    """``(id)`` — every document that can possibly contain a duplicated
    ``min_tokens``-token window, found WITHOUT shuffling one row per
    token position. This is the candidate pre-filter that makes the
    full pass scale: phase 2 (the per-position pipeline) only runs on
    these docs, and its output over them is IDENTICAL to running it on
    the whole corpus, because a window duplicated anywhere has every
    one of its occurrences inside the candidate set.

    Mechanism — winnowing (Schleimer et al., SIGMOD'03) over W-token
    window hashes with selection window K, where ``W = L//2 + 1`` and
    ``K = L - W + 1`` so the guarantee threshold ``W + K - 1 = L``:
    every copy of a duplicated run of ≥ L tokens contains K
    consecutive W-window positions whose windows all lie inside the
    run, and the MINIMUM hash over them — a pure function of run
    content, hence the same VALUE in every copy — is winnow-selected
    in each copy. So any cross-document duplicate makes both documents
    emit a shared anchor value, caught by one groupBy on the 8-byte
    value. Within-document duplicates can collapse to a single
    selected anchor under self-overlap (periodic text repeating at a
    short period), so they are caught scan-locally instead: a doc
    whose full L-window hash array has any repeated value is flagged
    directly — no shuffle at all for that arm.

    Scale shape: measured at sf0.1, 3.4× (L=20) to 4.9× (L=50) fewer
    shuffle rows than the full pass's one-row-per-position (SCALE.md
    has the row counts); the asymptotic anchor density is 2/(K+1) —
    ~13× at L=50, approached on low-duplication corpora where few
    docs reach phase 2 — and the rows carry only (id, value). False positives
    (64-bit collisions, repeated W-grams inside no duplicated L-run)
    only cost phase-2 work on extra docs; false negatives are
    impossible — hash equality is implied by content equality and the
    winnow guarantee is deterministic, not probabilistic."""
    if min_tokens < 2:
        raise ValueError(f"min_tokens must be ≥ 2, got {min_tokens}")
    L = min_tokens
    W = L // 2 + 1
    K = L - W + 1
    base = _tokenized(df, text_col, id_col).where(F.col("n") >= L)
    lwh = F.transform(
        F.sequence(F.lit(0), F.col("n") - L),
        lambda i: F.xxhash64(F.slice("t", i + 1, L)),
    )
    wh = F.transform(
        F.sequence(F.lit(0), F.col("n") - W),
        lambda i: F.xxhash64(F.slice("t", i + 1, W)),
    )
    hashed = base.select(
        "id",
        (F.size(F.array_distinct(lwh)) < F.size(lwh)).alias("internal"),
        wh.alias("__wh"),
    )
    anchors = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size("__wh") - K),
            lambda q: F.array_min(F.slice("__wh", q + 1, K)),
        )
    )
    per_doc = hashed.select("id", "internal", anchors.alias("anchors"))
    # feeds three consumers (internal filter, anchor groupBy, anchor
    # semi-join) — truncate lineage so the tokenize+hash scan runs once
    per_doc = per_doc.transform(_ckpt_lazy)
    internal_ids = per_doc.where("internal").select("id")
    a = per_doc.select("id", F.explode("anchors").alias("ahash"))
    # cross-doc anchor values via min/max id (partial-aggregable; a
    # countDistinct would expand) — value seen in ≥2 docs ⇒ candidates
    cross = (
        a.groupBy("ahash")
        .agg(F.min("id").alias("i0"), F.max("id").alias("i1"))
        .where(F.col("i0") != F.col("i1"))
        .select("ahash")
    )
    cross_ids = a.join(cross, "ahash", "left_semi").select("id")
    return internal_ids.union(cross_ids).distinct()


def duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 50,
    verify_exact: bool = True,
    candidates: str = "winnow",
) -> DataFrame:
    """``(id, start, end)`` — merged token spans (0-based, end
    exclusive) of every NON-canonical occurrence of a duplicated
    ≥ ``min_tokens``-token window. The canonical (lowest ``(id, pos)``)
    occurrence of each window is never in a span, so applying the spans
    keeps exactly one copy of every duplicated substring.

    Collision semantics of ``verify_exact`` are one-sided: an
    occurrence is removed only when its tokens EQUAL the hash group's
    canonical occurrence's tokens. If two different texts collide into
    one 64-bit group, a true duplicate pair hiding behind the foreign
    canonical is left in place (under-removal) — the pass never
    removes text that wasn't verifiably duplicated (no over-removal),
    which is the failure direction that matters for training data.

    ``candidates``: ``"winnow"`` (default) pre-filters to the docs
    that can possibly hold a duplicate via ``winnow_candidate_ids`` —
    output-identical (the guarantee is deterministic) with 3.4–4.9×
    fewer per-position shuffle rows measured at sf0.1 (2/(K+1) ≈ 13×
    asymptotically at L = 50); ``"all"`` runs the
    per-position pipeline on the whole corpus (the former shape, kept
    for parity testing)."""
    if candidates not in ("winnow", "all"):
        raise ValueError(f"candidates must be 'winnow' or 'all', got {candidates!r}")
    if candidates == "winnow":
        cand = winnow_candidate_ids(df, text_col, id_col, min_tokens)
        df = df.join(cand.select(F.col("id").alias(id_col)), id_col, "left_semi")
    L = min_tokens
    w = token_windows(df, text_col, id_col, min_tokens)

    canon = (
        w.groupBy("whash")
        .agg(
            F.min(F.struct("id", "pos")).alias("first"),
            F.count(F.lit(1)).alias("occ"),
        )
        .where(F.col("occ") > 1)
        .select("whash", "first")
    )
    dups = w.join(canon, "whash").where(
        ~((F.col("id") == F.col("first.id")) & (F.col("pos") == F.col("first.pos")))
    )

    if verify_exact:
        toks = _tokenized(df, text_col, id_col).select("id", "t")
        occ = (
            dups.join(toks, "id")
            .withColumn("occ_sl", F.slice("t", F.col("pos") + 1, L))
            .select("id", "pos", "whash", "first", "occ_sl")
        )
        can = (
            dups.select("whash", "first").distinct()
            .join(toks.withColumnRenamed("id", "cid"), F.col("first.id") == F.col("cid"))
            .select(
                "whash",
                F.col("first").alias("cfirst"),
                F.slice("t", F.col("first.pos") + 1, L).alias("can_sl"),
            )
        )
        dups = occ.join(
            can,
            (occ["whash"] == can["whash"]) & (occ["first"] == can["cfirst"]),
        ).where(F.col("occ_sl") == F.col("can_sl"))

    return _merge_spans(dups.select("id", "pos").distinct(), L)


def _merge_spans(marks: DataFrame, L: int) -> DataFrame:
    """(id, pos) window marks → merged (id, start, end) token spans
    (gaps-and-islands; windows are L wide so islands break when
    consecutive marks are more than L apart)."""
    ww = Window.partitionBy("id").orderBy("pos")
    islands = marks.withColumn(
        "new_island",
        F.when(
            F.lag("pos").over(ww).isNull()
            | (F.col("pos") - F.lag("pos").over(ww) > L),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(ww.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("id", "island").agg(
        F.min("pos").alias("start"), (F.max("pos") + L).alias("end")
    ).select("id", "start", "end")


def dedup_substrings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 50,
    verify_exact: bool = True,
    candidates: str = "winnow",
) -> DataFrame:
    """The full ExactSubstr pass: returns ``df``'s columns with
    ``text_col`` rewritten (duplicated spans excised, first occurrence
    kept) plus ``tokens_removed``. Only documents that actually contain
    a span are rewritten — everything else passes through untouched
    (original whitespace intact). ``candidates`` as in
    ``duplicated_spans`` (winnowed pre-filter by default)."""
    spans = duplicated_spans(
        df, text_col, id_col, min_tokens, verify_exact, candidates
    )
    return _apply_spans(df, spans, text_col, id_col)


def _apply_spans(
    df: DataFrame, spans: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Excise (id, start, end) token spans from ``df``'s ``text_col``;
    append ``tokens_removed``. Only affected docs are rewritten."""
    if "tokens_removed" in df.columns:
        raise ValueError(
            "df already has a 'tokens_removed' column — rename it before "
            "dedup_substrings (the pass appends its own)"
        )
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("start", "end")).alias("spans")
    )
    toks = _tokenized(df, text_col, id_col)
    rewritten = (
        per_doc.join(toks, "id")
        .withColumn(
            "kept",
            F.filter(
                "t",
                lambda tok, i: ~F.exists(
                    "spans", lambda s: (i >= s["start"]) & (i < s["end"])
                ),
            ),
        )
        .select(
            F.col("id").alias("__sid"),
            F.array_join("kept", " ").alias("__new_text"),
            (F.col("n") - F.size("kept")).alias("__removed"),
        )
    )
    out_cols = [
        F.coalesce("__new_text", F.col(text_col)).alias(c)
        if c == text_col
        else F.col(c)
        for c in df.columns
    ]
    return (
        df.join(rewritten, F.col(id_col) == F.col("__sid"), "left")
        .select(*out_cols, F.coalesce("__removed", F.lit(0)).alias("tokens_removed"))
    )


def substring_state(
    df: DataFrame, text_col: str, id_col: str, min_tokens: int = 50
) -> DataFrame:
    """The persistable corpus state for INCREMENTAL ExactSubstr: the
    DISTINCT ``(h1, h2)`` double 64-bit hashes of every
    ``min_tokens``-token window in the corpus. Write once through the
    catalog; each increment probes it (``incremental_dedup_substrings``)
    instead of re-hashing the corpus.

    Two independent xxhash64 values (second seeded by a literal
    prefix) stand in for the exact-verify join the batch pass does —
    the state deliberately does NOT carry corpus text, so cross-corpus
    matches are hash-trusted at ~2⁻¹²⁸ joint collision odds instead of
    token-verified. ``min_tokens`` must match between state build and
    increments — it is data, not configuration."""
    L = min_tokens
    base = _tokenized(df, text_col, id_col).where(F.col("n") >= L)
    pairs = F.transform(
        F.sequence(F.lit(0), F.col("n") - L),
        lambda i: F.struct(
            F.xxhash64(F.slice("t", i + 1, L)).alias("h1"),
            F.xxhash64(F.lit("fenix-h2"), F.slice("t", i + 1, L)).alias("h2"),
        ),
    )
    return (
        base.select(F.explode(pairs).alias("w"))
        .select(F.col("w.h1").alias("h1"), F.col("w.h2").alias("h2"))
        .distinct()
    )


def incremental_dedup_substrings(
    new_docs: DataFrame,
    corpus_state: DataFrame,
    text_col: str,
    id_col: str,
    min_tokens: int = 50,
    verify_exact: bool = True,
) -> DataFrame:
    """ExactSubstr over an INCREMENT against a persisted corpus state:
    rewrites only the new docs, without re-reading corpus text.

    A new window is excised when (a) its double hash exists in the
    corpus state — the corpus holds the canonical copy — or (b) it is
    a non-canonical occurrence of a window duplicated WITHIN the
    increment (the standard verified pipeline on ``new_docs`` alone).
    Equivalent to the batch pass over corpus ∪ increment restricted to
    increment docs, PROVIDED increment ids sort after corpus ids (the
    caller's contract — monotone doc ids make the corpus occurrence
    canonical, tested in ``test_substring.py``).

    Scale shape: the increment's windows PROBE the state with one
    left-semi equi-join on (h1, h2) — increment ≪ corpus, so only
    increment-sized rows move; the within-increment arm is the batch
    pipeline at increment size."""
    L = min_tokens
    base = _tokenized(new_docs, text_col, id_col).where(F.col("n") >= L)
    pairs = F.transform(
        F.sequence(F.lit(0), F.col("n") - L),
        lambda i: F.struct(
            F.xxhash64(F.slice("t", i + 1, L)).alias("h1"),
            F.xxhash64(F.lit("fenix-h2"), F.slice("t", i + 1, L)).alias("h2"),
        ),
    )
    neww = base.select("id", F.posexplode(pairs).alias("pos", "w")).select(
        "id", "pos", F.col("w.h1").alias("h1"), F.col("w.h2").alias("h2")
    )
    corpus_marks = neww.join(corpus_state, ["h1", "h2"], "left_semi").select(
        "id", "pos"
    )
    inc_spans = duplicated_spans(new_docs, text_col, id_col, min_tokens, verify_exact)
    # inc_spans are merged spans; re-expand to window-start positions
    # [start, end-L] — a superset of the original marks with the SAME
    # range union (every re-added start's window lies inside the span),
    # so the final merged coverage is unchanged
    inc_marks = inc_spans.select(
        "id", F.explode(F.sequence("start", F.col("end") - L)).alias("pos")
    )
    marks = corpus_marks.union(inc_marks).distinct()
    return _apply_spans(new_docs, _merge_spans(marks, L), text_col, id_col)
