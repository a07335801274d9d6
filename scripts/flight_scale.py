"""Flight-serving sf1 ledger (VERDICT r11 #5): measure the wire paths
at sf0.1 vs the derived sf1 (10×) on the LARGEST testdata table
(lineitem, ~11 MB → ~101 MB parquet):

- direct single-stream read (plain ticket, zero Spark job)
- direct PARALLEL shard read (get_flight_info per-file endpoints)
- spooled computed read (the float-column filter stays OUTSIDE the r13
  pushdown subset, so this row keeps measuring the spool rewrite)
- PUSHED scan-true filter (r13: an int-column predicate streams direct
  through the Arrow scanner — the spool row's rewrite cost is gone)
- PUSHED selective partition filter on the hive layout (r13: prunes
  fragments before any file opens)
- PUSHED projection (select two of sixteen columns — the wire carries
  only the projected bytes)
- direct read of a hive-PARTITIONED layout (the r12 fix: previously
  every partitioned wire read took the spool path — this ledger pins
  the measured write-amplification the fix removes)
- do_exchange batched brute k-NN (VERDICT r12 #4: wall + wire bytes at
  target counts 8/64/256 — the N×k result is the only driver-side
  materialization, bounded by exchange_max_targets)

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
        # the emb table arrived in r13 — add it to stores built earlier
        emb_dir = catalog.source_path(root, "emb")
        if not os.path.isdir(emb_dir):
            emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            emb.repartition(8).write.mode("overwrite").parquet(emb_dir)
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
    # embeddings table for the do_exchange ledger
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.repartition(8).write.mode("overwrite").parquet(
        catalog.source_path(root, "emb")
    )
    with open(done, "w") as fh:
        fh.write("ok")


def _proc_reader(args):
    """One OS-process reader for the concurrency-envelope row: fetch a
    strided slice of the table's shard endpoints over its OWN gRPC
    connection. Top-level so multiprocessing spawn can import it."""
    port, name, idx, stride = args
    import pyarrow.flight as fl

    conn = fl.connect(f"grpc://127.0.0.1:{port}")
    info = conn.get_flight_info(fl.FlightDescriptor.for_path(name))
    rows = nbytes = 0
    for ep in info.endpoints[idx::stride]:
        t = conn.do_get(ep.ticket).read_all()
        rows += t.num_rows
        nbytes += t.nbytes
    conn.close()
    return rows, nbytes


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
            # r13: pushed scan-true filter on an int column — the same
            # row volume the spool row serves, with the rewrite gone
            w, t = _timed(
                lambda: client.read_table(
                    "li", filter="l_orderkey >= 0"
                ).read_all()
            )
            s = server.last_get_stats
            print(
                f"| {label} | pushed filter (r13) | {w:.2f}s | {t.nbytes / 1e6:.0f} "
                f"| {s['batches']} | {s['spooled']} "
                f"| pushed={s['pushed_filter']}, rewrite gone |"
            )
            # r13: selective partition filter on the hive layout —
            # fragments pruned before any file opens
            w, t = _timed(
                lambda: client.read_table(
                    "li_part", filter="l_returnflag = 'A'"
                ).read_all()
            )
            s = server.last_get_stats
            print(
                f"| {label} | pushed partition filter (r13) | {w:.2f}s "
                f"| {t.nbytes / 1e6:.0f} | {s['batches']} | {s['spooled']} "
                f"| {s['fragments']} fragments opened, rows={t.num_rows:,} |"
            )
            # r13: projection — two of sixteen columns on the wire
            w, t = _timed(
                lambda: client.read_table(
                    "li", select=["l_orderkey", "l_quantity"]
                ).read_all()
            )
            s = server.last_get_stats
            print(
                f"| {label} | pushed select (r13) | {w:.2f}s | {t.nbytes / 1e6:.0f} "
                f"| {s['batches']} | {s['spooled']} | 2/16 columns |"
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
            # r13: parallel FILTERED fetch — the pushable filter rides
            # every shard ticket (row-local ⇒ per-shard union equals
            # the whole-table filter), shards stream concurrently
            w, t = _timed(
                lambda: client.read_table_parallel(
                    "li_part", max_workers=8, filter="l_returnflag = 'A'"
                )
            )
            print(
                f"| {label} | parallel filtered fetch (r13) | {w:.2f}s "
                f"| {t.nbytes / 1e6:.0f} | 8 workers | False "
                f"| rows={t.num_rows:,}, filter on every shard ticket |"
            )
            # r13 (r12 watch item #2): the concurrency ENVELOPE —
            # 4 separate OS processes (4 gRPC connections, 4 peers)
            # each stream a disjoint quarter of the shard endpoints
            # concurrently; aggregate throughput vs the single stream
            # proves concurrent readers don't serialize on the server
            import multiprocessing as mp

            ctx = mp.get_context("spawn")
            with ctx.Pool(4) as pool:
                # warm the pool (python + pyarrow import per process)
                # so the row times the READS, not process startup
                pool.map(int, range(4))
                t0 = time.time()
                res = pool.map(
                    _proc_reader, [(server.port, "li", i, 4) for i in range(4)]
                )
                wall4 = time.time() - t0
            rows4 = sum(r for r, _ in res)
            mb4 = sum(b for _, b in res) / 1e6
            print(
                f"| {label} | 4-process concurrent readers | {wall4:.2f}s "
                f"| {mb4:.0f} | 4 conns | False "
                f"| rows={rows4:,}, disjoint shard quarters |"
            )
            # r12 #4: the do_exchange batched brute path — ONE corpus
            # scan per call with the query matrix broadcast; the N×k
            # result rows are the only driver-side materialization
            import pyarrow.parquet as pq

            emb = pq.read_table(
                os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
            )
            vecs = [list(v) for v in emb.column("embedding").to_pylist()[:256]]
            for n_targets in (8, 64, 256):
                w, t = _timed(
                    lambda n=n_targets: client.search(
                        vecs[:n], "emb", "embedding", maxval=10,
                        id_col="vec_id",
                    ),
                    n=2,
                )
                print(
                    f"| {label} | do_exchange brute N={n_targets} | {w:.2f}s "
                    f"| {t.nbytes / 1e6:.2f} | {t.num_rows} rows "
                    f"| n/a | k=10, result = N×k exactly |"
                )
        finally:
            client.close()
            server.shutdown()
    la = os.getloadavg()
    print(f"load_1m={la[0]:.1f}")


if __name__ == "__main__":
    main()
