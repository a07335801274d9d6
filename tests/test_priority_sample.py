"""Priority sampling (operators/sampling.py) — the weighted mergeable
bounded sample with unbiased subset-sum estimation (Duffield, Lund,
Thorup, JACM 54(6), 2007).

Proof bar:
- the STATE is pinned to its exact spec (top-(k+1) rows by
  q = w / u, u = (hash60(id+salt)+1)/2^60) against an independent
  pure-Python computation;
- merge of shard states == direct state of the union, exactly;
- layout-invariant under repartitioning;
- exact when |group| <= k (tau = 0, every estimate == its weight);
- unbiased: the mean full-sum / subset-sum estimate over many salts
  converges on the truth;
- engine-portable: a DuckDB SQL mirror of state + take reproduces the
  same ids and estimates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from fenix_spark.operators.sampling import (
    priority_merge,
    priority_sample,
    priority_take,
)


def _py_u(ident: str, salt: str = "") -> float:
    h = int(hashlib.md5((ident + salt).encode()).hexdigest()[:15], 16)
    return float(h + 1) / float(1 << 60)


def _py_state(rows, k, salt=""):
    """rows: (grp, id, w) with w > 0 → {grp: [(pri, id), ...]} top-(k+1)."""
    per = {}
    for g, i, w in rows:
        if w is None or w <= 0:
            continue
        pri = float(w) / _py_u(i, salt)
        per.setdefault(g, {})
        # duplicate ids keep the highest-priority representative
        if i not in per[g] or pri > per[g][i]:
            per[g][i] = pri
    out = {}
    for g, d in per.items():
        ranked = sorted(d.items(), key=lambda t: (-t[1], t[0]))
        out[g] = [(pri, i) for i, pri in ranked[: k + 1]]
    return out


def _rows(n, n_grp=2):
    # skewed weights: heavy tail so uniform sampling would be wrong
    return [
        (f"g{i % n_grp}", f"id{i}", float((i * 7919) % 97 + 1) ** 2)
        for i in range(n)
    ]


def test_state_matches_pure_python_spec(spark):
    rows = _rows(600)
    df = spark.createDataFrame(
        rows, "grp string, id string, w double"
    ).repartition(16)
    k = 40
    got = {}
    for r in priority_sample(df, ["grp"], "id", "w", k).collect():
        got.setdefault(r["grp"], []).append((r["sample_pri"], r["id"]))
    exp = _py_state(rows, k)
    assert set(got) == set(exp)
    for g in exp:
        got_sorted = sorted(got[g], key=lambda t: (-t[0], t[1]))
        assert [i for _, i in got_sorted] == [i for _, i in exp[g]]
        for (gp, _), (ep, _) in zip(got_sorted, exp[g]):
            assert gp == pytest.approx(ep, rel=1e-12)


def test_layout_invariant_and_excludes_bad_weights(spark):
    rows = _rows(2_000) + [
        ("g0", "dead1", 0.0),
        ("g0", "dead2", -3.0),
        ("g1", "dead3", None),
    ]
    df = spark.createDataFrame(rows, "grp string, id string, w double")
    k = 25
    a = {
        (r["grp"], r["id"], r["sample_pri"])
        for r in priority_sample(df.repartition(32), ["grp"], "id", "w", k).collect()
    }
    b = {
        (r["grp"], r["id"], r["sample_pri"])
        for r in priority_sample(df.repartition(3), ["grp"], "id", "w", k).collect()
    }
    assert a == b
    assert not any(i.startswith("dead") for _, i, _ in a)


def test_duplicate_ids_keep_highest_priority(spark):
    rows = [("g", "x", 5.0), ("g", "x", 9.0), ("g", "y", 1.0)]
    df = spark.createDataFrame(rows, "grp string, id string, w double")
    got = {
        r["id"]: r["sample_pri"]
        for r in priority_sample(df, ["grp"], "id", "w", 10).collect()
    }
    assert set(got) == {"x", "y"}
    assert got["x"] == pytest.approx(9.0 / _py_u("x"), rel=1e-12)


def test_same_id_under_two_groups_one_batch(spark):
    """An id under TWO group keys forced into one Arrow batch must
    survive in both groups (partial-phase dedup is per (keys, id))."""
    rows = [("g0", "dup", 3.0), ("g1", "dup", 4.0)] + [
        (f"g{i % 2}", f"id{i}", float(i + 1)) for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "grp string, id string, w double"
    ).coalesce(1)
    got = {}
    for r in priority_sample(df, ["grp"], "id", "w", 10).collect():
        got.setdefault(r["grp"], {})[r["id"]] = r["sample_pri"]
    assert "dup" in got["g0"] and "dup" in got["g1"]
    assert got["g0"]["dup"] == pytest.approx(3.0 / _py_u("dup"), rel=1e-12)
    assert got["g1"]["dup"] == pytest.approx(4.0 / _py_u("dup"), rel=1e-12)
    assert len(got["g0"]) == 5 and len(got["g1"]) == 5


def test_merge_equals_direct_exactly(spark):
    rows = _rows(4_000, n_grp=3)
    df = spark.createDataFrame(rows, "grp string, id string, w double")
    k = 48
    shards = [
        priority_sample(
            df.where(F.crc32(F.col("id")) % 3 == s), ["grp"], "id", "w", k
        )
        for s in range(3)
    ]
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    merged = {
        (r["grp"], r["id"], r["sample_pri"])
        for r in priority_merge(u, ["grp"], "id", k).collect()
    }
    direct = {
        (r["grp"], r["id"], r["sample_pri"])
        for r in priority_sample(df, ["grp"], "id", "w", k).collect()
    }
    assert merged == direct


def test_small_group_is_exact(spark):
    rows = [("g", f"i{j}", float(j + 1)) for j in range(7)]
    df = spark.createDataFrame(rows, "grp string, id string, w double")
    got = priority_take(
        priority_sample(df, ["grp"], "id", "w", 50), ["grp"], "id", "w", 50
    ).collect()
    assert len(got) == 7
    for r in got:
        assert r["sample_est"] == r["w"]  # tau = 0 → estimates exact


def test_take_shape_and_tau_floor(spark):
    rows = _rows(500)
    df = spark.createDataFrame(rows, "grp string, id string, w double")
    k = 20
    state = priority_sample(df, ["grp"], "id", "w", k)
    taken = priority_take(state, ["grp"], "id", "w", k).collect()
    per = {}
    for r in taken:
        per.setdefault(r["grp"], []).append(r)
    exp = _py_state(rows, k)
    for g, rs in per.items():
        assert len(rs) == k
        tau = exp[g][k][0]  # the (k+1)-th priority
        for r in rs:
            assert r["sample_est"] == pytest.approx(max(r["w"], tau), rel=1e-12)
            # every kept row's priority clears the threshold
            assert r["sample_pri"] >= tau


def test_grand_sample_no_keys(spark):
    rows = _rows(300)
    df = spark.createDataFrame(rows, "grp string, id string, w double")
    got = priority_take(
        priority_sample(df, [], "id", "w", 32), [], "id", "w", 32
    ).collect()
    assert len(got) == 32


def test_subset_sum_unbiased_over_salts(spark):
    """DLT Thm 1: E[sum of sample_est over kept rows in S] = true
    weighted sum over S, for ANY fixed subset S. Check the full sum
    and a 1/3 subset; the mean over salts must converge."""
    rows = _rows(400, n_grp=1)
    true_full = sum(w for _, _, w in rows)
    subset_base = {i for _, i, _ in rows if int(i[2:]) % 3 == 0}
    true_sub = sum(w for _, i, w in rows if i in subset_base)
    k = 64
    # 24 independent replicas ride ONE sample/take call (r14
    # test-wall): priorities hash (id, salt), so distinct per-replica
    # id prefixes under one salt give independent draws of the SAME
    # weight multiset, and the per-grp top-k selection keeps replicas
    # separate — identical law, one Spark action instead of 24.
    rep_rows = [
        (f"g{s}", f"s{s}|{i}", w) for s in range(24) for _, i, w in rows
    ]
    df = spark.createDataFrame(rep_rows, "grp string, id string, w double")
    taken = priority_take(
        priority_sample(df, ["grp"], "id", "w", k, salt="s"),
        ["grp"],
        "id",
        "w",
        k,
    ).collect()
    full_ests = {s: 0.0 for s in range(24)}
    sub_ests = {s: 0.0 for s in range(24)}
    for r in taken:
        s = int(r["grp"][1:])
        base_id = r["id"].split("|", 1)[1]
        full_ests[s] += r["sample_est"]
        if base_id in subset_base:
            sub_ests[s] += r["sample_est"]
    assert np.mean(list(full_ests.values())) == pytest.approx(true_full, rel=0.08)
    assert np.mean(list(sub_ests.values())) == pytest.approx(true_sub, rel=0.15)


def test_duckdb_mirror_state_and_take(spark, tmp_path):
    """Engine parity: the whole state+take pipeline expressed in
    DuckDB SQL over the same parquet yields the same ids and
    estimates."""
    import duckdb

    from fenix_spark.functions.texthash import duck_hash60

    rows = _rows(800)
    df = spark.createDataFrame(rows, "grp string, id string, w double")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    k = 30
    taken = priority_take(
        priority_sample(df, ["grp"], "id", "w", k), ["grp"], "id", "w", k
    ).collect()
    got = sorted(
        (r["grp"], r["id"], round(r["sample_est"], 6)) for r in taken
    )
    u = f"(({duck_hash60('id')} + 1) / 1152921504606846976.0)"
    sql = f"""
        WITH pri AS (
            SELECT grp, id, w, w / {u} AS sample_pri
            FROM read_parquet('{p}/*.parquet') WHERE w > 0
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY grp ORDER BY sample_pri DESC, id
            ) AS rn FROM pri
        ), tau AS (
            SELECT grp, max(CASE WHEN rn = {k + 1} THEN sample_pri END)
                OVER (PARTITION BY grp) AS tau, id, w, rn
            FROM ranked WHERE rn <= {k + 1}
        )
        SELECT grp, id, greatest(w, coalesce(tau, 0.0)) AS sample_est
        FROM tau WHERE rn <= {k}
    """
    exp = sorted(
        (g, i, round(e, 6)) for g, i, e in duckdb.sql(sql).fetchall()
    )
    assert got == exp


def test_heavy_tail_beats_uniform_at_same_k(spark):
    """The reason this operator exists: on a heavy-tailed corpus the
    priority-sample full-sum estimator is far tighter than scaling a
    uniform bottom-k sample of the same size."""
    from fenix_spark.operators.sampling import bottomk_sample

    n = 2_000
    # one giant row and a sea of small ones
    rows = [("g", f"id{i}", 10_000.0 if i == 7 else 1.0) for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, id string, w double")
    true_sum = 10_000.0 + (n - 1)
    k = 50
    pri_errs, uni_errs = [], []
    for s in range(8):
        taken = priority_take(
            priority_sample(df, ["grp"], "id", "w", k, salt=f"s{s}"),
            ["grp"],
            "id",
            "w",
            k,
        ).collect()
        pri_errs.append(abs(sum(r["sample_est"] for r in taken) - true_sum))
        uni = bottomk_sample(df, ["grp"], "id", k, salt=f"s{s}").collect()
        uni_errs.append(abs(sum(r["w"] for r in uni) * n / k - true_sum))
    # priority sampling ALWAYS catches the giant row (its priority is
    # ~10000x the field); uniform almost never does at k/n = 2.5%
    assert max(pri_errs) < 0.2 * true_sum
    assert np.mean(uni_errs) > np.mean(pri_errs)
