"""Flight-serving sf1 ledger (VERDICT r11 #5): measure the wire paths
at sf0.1 vs the derived sf1 (10×) on the LARGEST testdata table
(lineitem, ~11 MB → ~101 MB parquet):

- direct single-stream read (plain ticket, zero Spark job)
- direct PARALLEL shard read (get_flight_info per-file endpoints)
- spooled computed read (filter forces the distributed spool write)
- direct read of a hive-PARTITIONED layout (the r12 fix: previously
  every partitioned wire read took the spool path — this ledger pins
  the measured write-amplification the fix removes)

For each: wall seconds, wire bytes (Arrow buffer bytes received), and
for the spool path the rewrite bytes (parquet bytes written into the
spool = the amplification). Usage:

    python scripts/flight_scale.py [--rebuild]
"""

from __future__ import annotations


import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "_artifacts", "sf1_data")
STORES = os.path.join(REPO, "_artifacts", "flight_scale")


def _build_store(spark, sf_dir: str, root: str) -> None:
    from fenix_spark import catalog

    done = os.path.join(root, "_BUILT_OK")
    if os.path.isfile(done) and "--rebuild" not in sys.argv:
        return
    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # multi-file flat table: the parallel-endpoint unit is the file
    df.repartition(16).write.mode("overwrite").parquet(
        catalog.source_path(root, "li")
    )
    # hive-partitioned layout, same rows — l_returnflag has 3 values
    df.write.partitionBy("l_returnflag").mode("overwrite").parquet(
        catalog.source_path(root, "li_part")
    )
    with open(done, "w") as fh:
        fh.write("ok")


def _timed(fn, n=2):
    walls, out = [], None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return min(walls), out


def main() -> None:
    from fenix_spark.flight import Client, Server
    from fenix_spark.session import get_session

    spark = get_session("flight_scale")
    spark.sparkContext.setLogLevel("ERROR")

    print("| sf | path | wall | wire MB | batches | spooled | note |")
    print("|---|---|---|---|---|---|---|")
    for label, sf_dir in (("0.1", SF01), ("1", SF1)):
        root = os.path.join(STORES, f"sf{label.replace('.', '')}", "store")
        _build_store(spark, sf_dir, root)
        server = Server(spark, root, port=0)
        client = Client(port=server.port)
        try:
            # direct single stream
            w, t = _timed(lambda: client.read_table("li").read_all())
            s = server.last_get_stats
            print(
                f"| {label} | direct single | {w:.2f}s | {t.nbytes / 1e6:.0f} "
                f"| {s['batches']} | {s['spooled']} | rows={t.num_rows:,} |"
            )
            # direct parallel shards
            w, t = _timed(lambda: client.read_table_parallel("li", max_workers=8))
            import pyarrow.flight as fl

            info = client.conn.get_flight_info(fl.FlightDescriptor.for_path("li"))
            print(
                f"| {label} | direct parallel | {w:.2f}s | {t.nbytes / 1e6:.0f} "
                f"| {len(info.endpoints)} eps | False | rows={t.num_rows:,} |"
            )
            # computed read -> spool (predicate is scan-true so the
            # row volume matches the direct reads; the COST is the
            # distributed rewrite)
            w, t = _timed(
                lambda: client.read_table(
                    "li", filter="l_quantity >= 0"
                ).read_all()
            )
            s = server.last_get_stats
            print(
                f"| {label} | spooled computed | {w:.2f}s | {t.nbytes / 1e6:.0f} "
                f"| {s['batches']} | {s['spooled']} "
                f"| rewrote {s['spool_bytes'] / 1e6:.0f} MB parquet |"
            )
            # partitioned layout, plain read (r12: direct, was spool)
            w, t = _timed(lambda: client.read_table("li_part").read_all())
            s = server.last_get_stats
            info = client.conn.get_flight_info(
                fl.FlightDescriptor.for_path("li_part")
            )
            print(
                f"| {label} | partitioned direct (r12) | {w:.2f}s "
                f"| {t.nbytes / 1e6:.0f} | {s['batches']} | {s['spooled']} "
                f"| {len(info.endpoints)} eps across partition dirs |"
            )
        finally:
            client.close()
            server.shutdown()
    la = os.getloadavg()
    print(f"load_1m={la[0]:.1f}")


if __name__ == "__main__":
    main()
