"""Markov transition analysis: python-mirror parity (counts, Laplace
smoothing, scoring), DuckDB mirror on the real events table, planted
anomalous-session detection, and the -inf unseen-transition contract."""

from __future__ import annotations

import math

import duckdb
import pytest

from fenix_spark.operators.sequences import sequence_logprob, transition_counts

SEQS = {
    "u1": ["a", "b", "a", "b", "c"],
    "u2": ["a", "b", "c"],
    "u3": ["b", "a", "b"],
}


def _rows(seqs):
    return [
        (k, i, s) for k, seq in seqs.items() for i, s in enumerate(seq)
    ]


def _py_counts(seqs):
    out = {}
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            out[(a, b)] = out.get((a, b), 0) + 1
    return out


def test_transition_counts_match_python_mirror(spark):
    df = spark.createDataFrame(_rows(SEQS), "key string, ts bigint, s string")
    got = {
        (r.from_state, r.to_state): (r.n, r.prob)
        for r in transition_counts(df, "key", "ts", "s").collect()
    }
    want = _py_counts(SEQS)
    assert {k: v[0] for k, v in got.items()} == want
    for (a, _b), (_n, p) in got.items():
        row_total = sum(n for (x, _), n in want.items() if x == a)
        assert 0 < p <= 1
    # row-normalization: probs per from_state sum to 1
    for a in {k[0] for k in want}:
        s = sum(p for (x, _), (_, p) in got.items() if x == a)
        assert s == pytest.approx(1.0)


def test_laplace_densifies_and_smooths(spark):
    df = spark.createDataFrame(_rows(SEQS), "key string, ts bigint, s string")
    got = {
        (r.from_state, r.to_state): (r.n, r.prob)
        for r in transition_counts(df, "key", "ts", "s", laplace=1.0).collect()
    }
    states = {"a", "b", "c"}
    froms = {"a", "b"} | {"c"} - {"c"}  # c never transitions out
    # every (observed-from × observed-state) pair present
    assert set(got) == {(f, t) for f in {"a", "b"} for t in states}
    want = _py_counts(SEQS)
    for (a, b), (n, p) in got.items():
        row_total = sum(v for (x, _), v in want.items() if x == a)
        assert n == want.get((a, b), 0)
        assert p == pytest.approx((n + 1.0) / (row_total + 3.0))


def test_sequence_logprob_mirror_and_unseen_is_inf(spark):
    fit = spark.createDataFrame(_rows(SEQS), "key string, ts bigint, s string")
    model = transition_counts(fit, "key", "ts", "s", laplace=0.5)
    probs = {
        (r.from_state, r.to_state): r.prob for r in model.collect()
    }
    got = {
        r.key: (r.n_transitions, r.logprob, r.avg_logprob)
        for r in sequence_logprob(fit, "key", "ts", "s", model).collect()
    }
    for k, seq in SEQS.items():
        lp = sum(math.log(probs[(a, b)]) for a, b in zip(seq, seq[1:]))
        assert got[k][0] == len(seq) - 1
        assert got[k][1] == pytest.approx(lp)
        assert got[k][2] == pytest.approx(lp / (len(seq) - 1))
    # a sequence using a state the model never saw FROM: -inf, loudly
    novel = spark.createDataFrame(
        [("ux", 0, "c"), ("ux", 1, "a")], "key string, ts bigint, s string"
    )
    [r] = sequence_logprob(novel, "key", "ts", "s", model).collect()
    assert r.logprob == float("-inf")


def test_planted_anomalous_session_scores_lowest(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    # normal users walk view→click→view…; the anomaly ping-pongs
    # error→signup, a transition normals never make
    for u in range(20):
        s = "view"
        for i in range(30):
            rows.append((f"u{u}", float(i), s))
            s = "click" if s == "view" else ("view" if rng.random() < 0.8 else "purchase")
            if s == "purchase":
                rows.append((f"u{u}", i + 0.5, s))
                s = "view"
    fit_df = spark.createDataFrame(rows, "key string, ts double, s string")
    # model fit on NORMAL traffic only (the intended usage: reference
    # corpus → score incoming sessions); the anomaly chains purchases
    # back-to-back — a transition normals never make, but one the
    # Laplace grid still prices (finite, low)
    rows_all = rows + [("anom", float(i), "purchase") for i in range(30)]
    df = spark.createDataFrame(rows_all, "key string, ts double, s string")
    model = transition_counts(fit_df, "key", "ts", "s", laplace=0.1)
    scores = {
        r.key: r.avg_logprob
        for r in sequence_logprob(df, "key", "ts", "s", model).collect()
    }
    anom = scores.pop("anom")
    assert anom > float("-inf")
    assert anom < min(scores.values())


def test_transitions_duckdb_mirror_on_events(spark, sf_dir):
    from fenix_spark.suite import events_table

    ev = events_table(spark, sf_dir)
    got = sorted(
        (r.from_state, r.to_state, r.n, round(r.prob, 9))
        for r in transition_counts(ev, "user_id", "ts_ms", "event_type").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        (a, b, n, round(p, 9))
        for a, b, n, p in con.execute(
            """
            WITH pairs AS (
              SELECT event_type AS from_state,
                     lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_ms(ts), event_type) AS to_state
              FROM events
            ),
            c AS (
              SELECT from_state, to_state, count(*) AS n
              FROM pairs WHERE to_state IS NOT NULL GROUP BY 1, 2
            )
            SELECT from_state, to_state, n,
                   n / sum(n) OVER (PARTITION BY from_state) AS prob
            FROM c
            """
        ).fetchall()
    )
    assert got == want


def test_top_paths_matches_python_mirror(spark):
    evs = [
        ("u1", 0, "a"), ("u1", 1, "b"), ("u1", 2, "c"), ("u1", 3, "a"),
        ("u2", 0, "a"), ("u2", 1, "b"), ("u2", 2, "c"),
        ("u3", 0, "b"), ("u3", 1, "c"), ("u3", 2, "a"),
    ]
    df = spark.createDataFrame(evs, "key string, ts bigint, s string")
    from fenix_spark.operators.sequences import top_paths

    got = [(r.path, r.n_occurrences, r.n_keys, r.rank)
           for r in top_paths(df, "key", "ts", "s", n=3, k=10).collect()]
    # brute: per-key ordered 3-grams
    seqs = {}
    for k_, t, s in sorted(evs, key=lambda e: (e[0], e[1])):
        seqs.setdefault(k_, []).append(s)
    from collections import Counter

    cnt, keys = Counter(), {}
    for k_, seq in seqs.items():
        for i in range(len(seq) - 2):
            p = " > ".join(seq[i : i + 3])
            cnt[p] += 1
            keys.setdefault(p, set()).add(k_)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(p, n) for p, n, _, _ in got] == want
    for p, n, nk, r in got:
        assert nk == len(keys[p])
    assert [r for _, _, _, r in got] == list(range(1, len(got) + 1))
    assert got[0][0] == "a > b > c" and got[0][1] == 2


def test_top_paths_k_and_validation(spark):
    from fenix_spark.operators.sequences import top_paths

    df = spark.createDataFrame(
        [("u", i, str(i % 4)) for i in range(40)], "key string, ts bigint, s string"
    )
    assert top_paths(df, "key", "ts", "s", n=2, k=3).count() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        top_paths(df, "key", "ts", "s", n=1)
    with _pytest.raises(ValueError):
        top_paths(df, "key", "ts", "s", k=0)


def test_markov_transitions_duckdb_mirror_staged(spark):
    """Rotation #10 staging bar (mirror-first; PROMOTED r13):
    suite._markov_transitions vs its DuckDB oracle SQL must be
    ROW-IDENTICAL on the driver corpora — run at sf0.001 and sf0.01,
    the oracle gate's own scales. Staged and proven before promotion,
    now the sequences family's first live oracle row."""
    import duckdb

    from fenix_spark import suite

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = [
            (r["from_state"], r["to_state"], r["n"], r["prob"])
            for r in suite._markov_transitions(spark, sf_dir).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        want = [tuple(r) for r in con.execute(suite._MARKOV_TRANSITIONS_SQL).fetchall()]
        con.close()
        assert len(got) > 0, sf_dir
        assert got == want, sf_dir


def test_group_topn_retired_row_still_mirrors(spark):
    """Rotation #10 retired the `group_topn` oracle row for
    markov_transitions; the retired row's FULL DuckDB mirror runs here
    verbatim so its coverage never lapses — row_number top-3 by
    totalprice within each priority class, row-identical across
    engines at sf0.001."""
    from fenix_spark import suite

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r["o_orderpriority"], r["o_orderkey"], r["totalprice"], r["rn"])
        for r in suite._group_topn(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    want = sorted(map(tuple, con.execute(suite._GROUP_TOPN_SQL).fetchall()))
    con.close()
    assert got == want and len(got) > 0
