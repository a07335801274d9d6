"""Pin codegen behavior of the big rendered SQL expressions (r13 opt).

The r13 optimization round renders large expression trees as single SQL
strings (the k^n probe-cell scorer, the B-replicate bootstrap
aggregates, the 32-term simhash vote fold). At the sizes the suite uses
they whole-stage-compile fine; these tests pin the ADVERSARIAL sizes —
the max the operators accept — with ``spark.sql.codegen.fallback=false``
so a Janino compile failure (64KB method / constant-pool limits) THROWS
instead of silently flipping the hot path to interpreted mode.

(The known CodegenFallback expressions — higher-order functions like
``aggregate``/``transform``/``zip_with`` — are *expression-level*
fallbacks embedded inside compiled projections; they do not trip
``codegen.fallback``. What this pins is that the surrounding generated
code still compiles at the operators' size bounds.)
"""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def strict_codegen(spark):
    """codegen.fallback=false so a Janino failure THROWS; AQE off so
    ``executedPlan`` is the concrete plan (not an un-finalized
    ``AdaptiveSparkPlan`` wrapper); maxToStringFields raised so the
    giant rendered projections aren't truncated out of the plan string
    before the WholeStageCodegen markers."""
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.codegen.fallback",
            "spark.sql.adaptive.enabled",
            "spark.sql.debug.maxToStringFields",
        )
    }
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    try:
        yield spark
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_probe_cells_compiles_at_max_enumerated_cells(strict_codegen):
    """k^n at the operator's hard bound (4096 joint cells): the rendered
    scorer must still compile under Janino limits."""
    from fenix_spark.operators.index import (
        _MAX_ENUMERATED_CELLS,
        _probe_cells_from_cents,
    )

    spark = strict_codegen
    k, n, sub_dim = 8, 4, 2
    assert k**n == _MAX_ENUMERATED_CELLS
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((n, k, sub_dim))
    vecs = spark.range(8).select(
        "id",
        F.expr(
            "transform(sequence(1, 8), i -> cast(id * i as double))"
        ).alias("vec"),
    )
    probe = _probe_cells_from_cents("vec", cents, k, n, probes=8, metric="l2")
    out = vecs.select("id", probe.alias("probes"))
    # the scorer uses higher-order functions (CodegenFallback), so the
    # projection itself is never whole-stage compiled — the pin is that
    # execution under codegen.fallback=false does not throw (Janino
    # limits) and the surrounding spans still codegen. ONE execution:
    # collect() runs the plan under the strict conf and yields the rows
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "*(" in plan
    assert all(len(r["probes"]) == 8 for r in rows)


def test_probe_cells_refuses_above_bound():
    from fenix_spark.operators.index import _probe_cells_from_cents

    cents = np.zeros((7, 8, 2))
    with pytest.raises(ValueError, match="enumerates all"):
        _probe_cells_from_cents("vec", cents, 8, 7, probes=8, metric="l2")


def test_bootstrap_compiles_at_max_replicates(strict_codegen, documents):
    """B=500 (the operator's cap) = 1001 rendered aggregate columns +
    a 500-element coalesce array: must compile and execute."""
    from fenix_spark.operators.bootstrap import bootstrap_ci

    out = bootstrap_ci(
        documents, ["lang"], "n_chars", "doc_id", stat="mean", n_boot=500
    )
    # 1001 aggregate columns exceed spark.sql.codegen.maxFields (100),
    # so Spark skips WSCG on the aggregate BY DESIGN at this size; the
    # pin is that nothing that IS generated trips Janino limits. ONE
    # execution via collect() — a separate noop write would run the
    # whole B=500 aggregation twice
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert rows and all(r["lo"] <= r["estimate"] <= r["hi"] for r in rows)


def test_simhash_and_minhash_renderings_compile(strict_codegen, documents):
    """The 32-term simhash vote fold and 24-component minhash signature
    SQL renderings, at suite sizes, under strict codegen."""
    from fenix_spark.functions.texthash import minhash_signature_hashed, simhash
    from fenix_spark.operators.dedup import hashed_token_sets

    sets = hashed_token_sets(documents.limit(64), "text", "doc_id", 1)
    out = sets.select(
        "id",
        minhash_signature_hashed("s", 24).alias("sig"),
        simhash(F.expr("transform(s, x -> CAST(x AS STRING))")).alias("sim"),
    )
    # transform/aggregate HOFs are CodegenFallback → the projection is
    # interpreted by design; the scan span must still codegen and the
    # rendered expressions must not trip Janino under strict fallback
    assert len(out.collect()) == 64  # ONE full-column execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "*(" in plan
