"""Compare two bench JSON artifacts: wall-clock AND byte-volume deltas
per query, with the noise separated out — walls shift with ambient
load and host CPU (both stamped in the artifacts), byte volumes shift
ONLY when the plan or data changed. A volume delta is a real
regression signal even when the wall delta is inside the noise; a wall
delta with identical bytes is environment (r10's lesson, STATE.md
bench history).

Usage: python scripts/bench_diff.py OLD.json NEW.json [--pct 10]

Accepts both artifact shapes: the raw one-line bench.py output and the
driver's ``{"parsed": ..., "tail": ...}`` wrapper (parsed only).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    import os

    d = json.load(open(path))
    if "parsed" in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(
            f"{path}: no parsed queries section (truncated driver tail?) — "
            "diff the builder-side artifact instead"
        )
    # r11+: the driver-visible line is a compact summary pointing at
    # the full sidecar (raw_bytes/raw_runs/load stamps live there).
    # Adopt the sidecar ONLY if its timings match — bench overwrites
    # it every run, so a stale pointer must not smuggle in another
    # run's byte volumes.
    if "raw_bytes" not in d and d.get("full"):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        side = d["full"] if os.path.isabs(d["full"]) else os.path.join(repo, d["full"])
        if os.path.isfile(side):
            full = json.load(open(side))
            if full.get("queries") == d["queries"]:
                return full
            print(f"note: {side} is from a different run; bytes unavailable")
    return d


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    pct = 10.0
    if "--pct" in sys.argv:
        pct = float(sys.argv[sys.argv.index("--pct") + 1])

    def cpu(d):
        return d.get("cpu_md5_sec")

    print(f"wall: {old.get('value')}s -> {new.get('value')}s")
    print(f"cpu_md5_sec: {cpu(old)} -> {cpu(new)}  "
          f"(host speed ratio {round(cpu(new) / cpu(old), 2) if cpu(old) and cpu(new) else 'n/a'})")
    mo, mn = old.get("cpu_md5_mt_sec"), new.get("cpu_md5_mt_sec")
    print(f"cpu_md5_mt_sec: {mo} -> {mn}  (parallel-throughput ratio "
          f"{round(mn / mo, 2) if mo and mn else 'n/a'})")
    go, gn = old.get("cpu_gemm_sec"), new.get("cpu_gemm_sec")
    print(f"cpu_gemm_sec: {go} -> {gn}  (BLAS-throughput ratio "
          f"{round(gn / go, 2) if go and gn else 'n/a'} — GEMM/Arrow rows track THIS one; "
          "md5 probes miss FPU/bandwidth degradation, r11 lesson)")
    gxo, gxn = old.get("cpu_gemm_max_sec"), new.get("cpu_gemm_max_sec")
    if gxo or gxn:
        print(f"cpu_gemm_max_sec: {gxo} -> {gxn}  (a wide min/max gap within one "
              "artifact = the host was swinging DURING the sweep)")
    print(f"loadavg_start: {old.get('loadavg_start')} -> {new.get('loadavg_start')}")
    print()
    common = sorted(set(old["queries"]) & set(new["queries"]))
    flagged = 0
    print(f"{'query':24} {'wall_old':>8} {'wall_new':>8} {'Δ%':>7}  bytes verdict")
    for q in common:
        wo, wn = old["queries"][q], new["queries"][q]
        dw = 100.0 * (wn - wo) / wo if wo else 0.0
        bo = (old.get("raw_bytes") or {}).get(q)
        bn = (new.get("raw_bytes") or {}).get(q)
        verdict = "no-bytes"
        if bo and bn:
            keys = ("shuffle_read", "input", "spill_disk", "stages")
            deltas = [
                f"{k} {bo[k]}→{bn[k]}" for k in keys if bo.get(k) != bn.get(k)
            ]
            verdict = "VOLUME CHANGED: " + "; ".join(deltas) if deltas else "bytes identical"
        mark = ""
        if abs(dw) >= pct:
            mark = " <-- wall moved"
            if bo and bn and verdict == "bytes identical":
                mark += " (bytes identical => environment, not plan)"
            flagged += 1
        print(f"{q:24} {wo:8.3f} {wn:8.3f} {dw:6.1f}%  {verdict}{mark}")
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:", ", ".join(only_new))
    print(f"\n{flagged}/{len(common)} rows moved >= {pct}% wall")


if __name__ == "__main__":
    main()
