"""Store validator — fsck for a catalog root.

``python -m fenix_spark.validate <root>`` (or ``validate_store(root)``)
walks the store layout WITHOUT a Spark session: every check is an
os.listdir or a parquet FOOTER read (pyarrow), so validating a 100 TB
store costs one ~KB read per file, never a data page. The reference has
no equivalent — its store is trusted blindly until a query crashes;
here an operator can prove a store healthy after a migration, a crash,
or a vacuum, and CI can gate on it.

Checked invariants (each maps to a protocol contract elsewhere):

- table/coder/index names are valid single path segments
  (``catalog.check_name`` — the Flight-wire traversal boundary);
- a manifest pointer names an EXISTING generation dir (``manifest.
  resolve`` raises on this; here it's reported, not thrown mid-query);
- generation dirs parse; uncommitted orphans and retained superseded
  layouts are counted as INFO (both are protocol-normal, vacuumed by
  the next commit);
- every parquet file's footer opens, and all files of one layout agree
  on the arrow schema (a torn write or a mixed-schema append breaks
  readers loudly at scan time — this finds it first);
- every index layout contains ``__CODED_ID__`` (the probe-pruning
  contract, operators/index.py); a missing coder for an index is INFO,
  not an error — ``drop-coder`` keeps indexes serving from their
  co-written codes;
- stale ``.get-spool-*`` dirs (flight do_get crash leftovers) are INFO.

Severity: ERROR = a reader would fail or return wrong data; WARN =
suspicious but readable; INFO = protocol-normal transient state.
``validate_store`` returns the report dict; the CLI prints one line
per finding and exits 1 iff any ERROR.
"""

from __future__ import annotations

import os
from typing import Any

__all__ = ["validate_store"]


def _finding(report: dict, sev: str, where: str, msg: str) -> None:
    report["findings"].append({"severity": sev, "where": where, "message": msg})


def _layout_files(d: str) -> list[str]:
    """Relative paths of the layout's parquet files — recursive, so
    hive-partitioned layouts (``__CODED_ID__=N/part-*.parquet``,
    ``partition_by`` tables) are covered; underscore/dot components
    (markers, generations, spools) are skipped like Spark does."""
    out = []
    for cur, dirs, files in os.walk(d):
        dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.relpath(os.path.join(cur, f), d))
    return sorted(out)


def _check_parquet_layout(report: dict, where: str, d: str) -> int:
    """Footer-read every file; check schema agreement. Returns rows."""
    import pyarrow.parquet as pq

    files = _layout_files(d)
    if not files:
        _finding(report, "WARN", where, "no parquet files in layout")
        return 0
    schema = None
    rows = 0
    for f in files:
        full = os.path.join(d, f)
        try:
            md = pq.read_metadata(full)
            s = pq.read_schema(full)
        except Exception as e:  # torn write, truncation, not parquet
            _finding(report, "ERROR", where, f"unreadable footer {f}: {e}")
            continue
        rows += md.num_rows
        s = s.remove_metadata()
        if schema is None:
            schema = s
        elif not s.equals(schema):
            _finding(
                report, "ERROR", where,
                f"schema mismatch within layout: {f} disagrees with {files[0]}",
            )
    return rows


def _check_manifest_dir(report: dict, where: str, path: str) -> str | None:
    """Validate pointer/generation state; return the live layout dir
    (generation dir, or the path itself for flat layout)."""
    from fenix_spark import manifest

    try:
        cur, prev = manifest._read_pointer(path)
    except (ValueError, OSError) as e:
        _finding(report, "ERROR", where, f"corrupt {manifest.CURRENT_POINTER}: {e}")
        return None
    gens = manifest.list_gens(path)
    if cur is None:
        if gens:
            _finding(
                report, "INFO", where,
                f"{len(gens)} uncommitted generation dir(s) with no pointer "
                "(crashed writer; next commit's vacuum sweeps them)",
            )
        return path
    live = os.path.join(path, f"_gen-{cur:06d}")
    if not os.path.isdir(live):
        _finding(
            report, "ERROR", where,
            f"pointer names generation {cur} but its dir is missing "
            "(external damage — unreachable through the commit protocol)",
        )
        return None
    extras = [g for g in gens if g != cur]
    retained = [g for g in extras if prev is not None and g == prev]
    orphans = [g for g in extras if g not in retained]
    if retained:
        _finding(
            report, "INFO", where,
            f"retained superseded generation {retained[0]} "
            "(retention window; expires on the next commit)",
        )
    if orphans:
        _finding(
            report, "INFO", where,
            f"{len(orphans)} orphan generation(s) {orphans} "
            "(never committed; next vacuum sweeps them)",
        )
    if prev == 0 and _layout_files(path):
        _finding(
            report, "INFO", where,
            "retained flat legacy files (retention window; expire on the "
            "next commit)",
        )
    return live


def validate_store(root: str) -> dict[str, Any]:
    from fenix_spark.catalog import check_name

    report: dict[str, Any] = {"root": root, "findings": [], "tables": {}}
    if not os.path.isdir(root):
        _finding(report, "ERROR", root, "store root does not exist")
        report["errors"] = 1
        return report

    # ------------------------------------------------------- sources
    src_base = os.path.join(root, "sources")
    for name in sorted(os.listdir(src_base)) if os.path.isdir(src_base) else []:
        where = f"sources/{name}"
        try:
            check_name(name)
        except ValueError as e:
            _finding(report, "ERROR", where, str(e))
            continue
        live = _check_manifest_dir(report, where, os.path.join(src_base, name))
        if live is not None:
            report["tables"][name] = _check_parquet_layout(report, where, live)

    # ------------------------------------------------------- codings
    cod_base = os.path.join(root, "codings")
    coders = set()
    for name in sorted(os.listdir(cod_base)) if os.path.isdir(cod_base) else []:
        where = f"codings/{name}"
        try:
            check_name(name)
        except ValueError as e:
            _finding(report, "ERROR", where, str(e))
            continue
        coders.add(name)
        _check_parquet_layout(report, where, os.path.join(cod_base, name))

    # ------------------------------------------------------- indexes
    import pyarrow.parquet as pq

    idx_base = os.path.join(root, "indexes")

    def _subdirs(base: str, where: str) -> list[str]:
        # fsck must SURVIVE damage, not crash on it: a stray file where
        # the layout promises a directory level is itself a finding,
        # not a NotADirectoryError aborting the whole walk (ADVICE r11)
        out = []
        for e in sorted(os.listdir(base)):
            if os.path.isdir(os.path.join(base, e)):
                out.append(e)
            else:
                _finding(
                    report, "WARN", f"{where}/{e}",
                    "stray file where the index tree expects a directory "
                    "level (indexes/<source>/<column>/<coding>)",
                )
        return out

    if os.path.isdir(idx_base):
        for src in _subdirs(idx_base, "indexes"):
            for col in _subdirs(os.path.join(idx_base, src), f"indexes/{src}"):
                for cod in _subdirs(
                    os.path.join(idx_base, src, col), f"indexes/{src}/{col}"
                ):
                    where = f"indexes/{src}/{col}/{cod}"
                    d = os.path.join(idx_base, src, col, cod)
                    for seg in (src, col, cod):
                        try:
                            check_name(seg)
                        except ValueError as e:
                            _finding(report, "ERROR", where, str(e))
                            d = None
                    if d is None:
                        continue
                    live = _check_manifest_dir(report, where, d)
                    if live is None:
                        continue
                    _check_parquet_layout(report, where, live)
                    # the probe-pruning contract: codes live either as a
                    # data column or as hive partition dirs __CODED_ID__=N
                    has_code = any(
                        e.startswith("__CODED_ID__=")
                        for e in os.listdir(live)
                        if os.path.isdir(os.path.join(live, e))
                    )
                    if not has_code:
                        files = _layout_files(live)
                        if files and "__CODED_ID__" not in set(
                            pq.read_schema(os.path.join(live, files[0])).names
                        ):
                            _finding(
                                report, "ERROR", where,
                                "index layout lacks __CODED_ID__ (neither a "
                                "partition dir nor a column) — probe pruning "
                                "cannot work",
                            )
                    if cod not in coders:
                        _finding(
                            report, "INFO", where,
                            f"coder {cod!r} absent (drop-coder keeps indexes "
                            "serving from co-written codes; re-training needs "
                            "the coder)",
                        )

    # -------------------------------------------------------- spools
    for e in sorted(os.listdir(root)):
        if e.startswith(".get-spool-"):
            _finding(
                report, "INFO", root,
                f"stale flight spool {e} (crashed do_get stream; swept at "
                "next server start)",
            )

    report["errors"] = sum(1 for f in report["findings"] if f["severity"] == "ERROR")
    return report


def main() -> None:
    import sys

    if len(sys.argv) != 2:
        raise SystemExit("usage: python -m fenix_spark.validate <store-root>")
    report = validate_store(sys.argv[1])
    for f in report["findings"]:
        print(f"{f['severity']:5} {f['where']}: {f['message']}")
    n_tables = len(report["tables"])
    total = sum(report["tables"].values())
    print(
        f"{n_tables} table(s), {total} row(s), "
        f"{report['errors']} error(s), {len(report['findings'])} finding(s)"
    )
    sys.exit(1 if report["errors"] else 0)


if __name__ == "__main__":
    main()
