"""Session helpers: package shipping for foreign driver sessions
(session.ensure_package_shipped) — the mechanism that lets a session
created from ANY cwd run the suite's Arrow-batched closures (their
module-level helpers pickle by module reference, so executor workers
must be able to import fenix_spark)."""

from __future__ import annotations


def test_ensure_package_shipped_is_idempotent_and_registers(spark):
    """The package zip lands in the session's python includes exactly
    once; repeated calls are no-ops (the per-query wrapper in
    __spark_entry__ calls this on every invocation)."""
    from fenix_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    inc = [str(i) for i in (spark.sparkContext._python_includes or [])]
    assert sum("fenix_spark_pkg" in i for i in inc) == 1
    ensure_package_shipped(spark)
    inc2 = [str(i) for i in (spark.sparkContext._python_includes or [])]
    assert sum("fenix_spark_pkg" in i for i in inc2) == 1


def test_shipped_zip_contains_the_package(spark):
    import glob
    import os
    import tempfile
    import zipfile

    from fenix_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    zips = glob.glob(os.path.join(tempfile.gettempdir(), "fenix_spark_pkg-*.zip"))
    assert zips
    names = zipfile.ZipFile(zips[0]).namelist()
    assert "fenix_spark/__init__.py" in names
    assert "fenix_spark/operators/sketches.py" in names  # the KLL helpers
