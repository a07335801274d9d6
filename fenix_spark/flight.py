"""Arrow Flight serving surface — the reference's one entry point that
had no wire-level counterpart until now (VERDICT r09 "What's missing"
#1; ref: src/fenix/flight.py:17-138 Server, 149-292 Flight client,
launch.py:12-17 launcher). Every verb delegates to ``Store``
(store.py) — the gRPC layer owns NO logic, exactly as the reference's
Server delegates to ``io.*``:

    reference wire verb              →  here
    --------------------------------    --------------------------------
    do_put(path=name, batches)          do_put → Store.make_table
    do_get(ticket "a:b:c")              do_get → Store.read_table
    do_exchange(search command)         do_exchange → Store.search /
                                        batch_probe_search (N targets)
    make-coder / make-index actions     same action names → Store
    drop-table / drop-index / remove    same
    set/del-coding/column/filter/select same names, but per-PEER state
    (launch.py CLI)                     launch(root, host, port)

Two deliberate protocol deviations, both documented here because a
wire protocol is a contract:

- **JSON, never pickle.** The reference pickles action bodies, search
  commands and filter expressions (flight.py:79, 83, 170-189) — any
  client can execute arbitrary code in the server process, and the
  bytes are engine-specific. Every body/command/ticket here is JSON;
  filters travel as SQL EXPRESSION STRINGS parsed by Spark's own
  parser (``F.expr``) — the same strings DuckDB/any engine can read.
- **Per-peer session state.** The reference stores set-coding /
  set-filter / set-select on the server OBJECT (flight.py:105-131), so
  one client's ``read_table(coding=…)`` rewrites every concurrent
  client's reads. The same verbs exist here for call-site parity, but
  the state is keyed by the gRPC peer; the ticket may also carry the
  whole spec as JSON (the stateless form ``Client.read_table`` uses).

Scale shape: this is a SERVING surface (control plane + result
delivery), not a bulk-transfer path — ``do_get`` materializes the
result on the driver before streaming (Arrow batches of 64k rows).
Bulk data belongs in parquet/Arrow-IPC files read by the engines
directly; a search result or a dimension table fits the driver by
definition of the use case. ``do_exchange`` runs the k-NN on the
CLUSTER (partition-pruned probe search / batched cell equi-join) and
only the top-k rows ever reach the driver.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fenix_spark.store import Store

__all__ = ["Server", "Client", "launch"]

_BATCH_ROWS = 1 << 16


def _require_flight():
    import pyarrow.flight as fl

    return fl


def _normalize_arrow(table):
    """Fixed-size-list columns → plain lists (Spark's Arrow ingest
    speaks variable lists); chunked → combined. Duplicate column
    names raise (the dict-based rebuild would silently keep only the
    last one)."""
    import pyarrow as pa

    names = table.schema.names
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate column names in upload: {dupes}")
    cols = []
    fields = []
    for i, f in enumerate(table.schema):
        col = table.column(i).combine_chunks()
        if pa.types.is_fixed_size_list(f.type):
            col = col.cast(pa.list_(f.type.value_type))
            f = f.with_type(pa.list_(f.type.value_type))
        cols.append(col)
        fields.append(f)
    return pa.table(dict(zip([f.name for f in fields], cols)))


class Server:
    """Flight server over a catalog store. ``port=0`` binds an
    ephemeral port (read it back from ``server.port``); call
    ``serve()`` to block, or drive it from a background thread in
    tests — pyarrow starts the gRPC listener at construction."""

    def __init__(
        self, spark: SparkSession, root: str, host: str = "127.0.0.1", port: int = 0
    ):
        fl = _require_flight()
        outer = self

        class _Impl(fl.FlightServerBase):
            def do_put(self, ctx, descriptor, reader, writer):
                outer._do_put(descriptor, reader)

            def do_get(self, ctx, ticket):
                return outer._do_get(ctx, ticket)

            def do_exchange(self, ctx, descriptor, reader, writer):
                outer._do_exchange(descriptor, reader, writer)

            def do_action(self, ctx, action):
                yield from outer._do_action(ctx, action)

            def list_flights(self, ctx, criteria):
                fld = fl.FlightDescriptor
                for name in outer.store.list_tables():
                    yield fl.FlightInfo(
                        outer._table_schema(name), fld.for_path(name), [], -1, -1
                    )

            def get_flight_info(self, ctx, descriptor):
                # the reference raises NotImplementedError here
                # (flight.py:24-28); serving the schema + endpoint is
                # strictly more useful and costs one limit(0) plan
                name = descriptor.path[0].decode()
                return fl.FlightInfo(
                    outer._table_schema(name),
                    descriptor,
                    [fl.FlightEndpoint(name, [outer.grpc])],
                    -1,
                    -1,
                )

        import collections

        self.spark = spark
        self.store = Store(spark, root)
        self._impl = _Impl(location=f"grpc://{host}:{port}")
        # per-peer session state, LRU-bounded: peers are ip:ephemeral-
        # port strings (unique per CONNECTION) and disconnects are
        # invisible to the server, so an unbounded dict grows with
        # total connections served. 1024 live set-* sessions is far
        # beyond any real concurrency; older ones age out.
        self._state: "collections.OrderedDict[str, dict]" = collections.OrderedDict()
        self._state_cap = 1024
        self.host = host
        self.port = self._impl.port
        self.grpc = f"grpc://{host}:{self.port}"

    # ---------------------------------------------------------- verbs

    def _table_schema(self, name: str):
        # footer read, not a Spark plan: list_flights over a 50-table
        # store must not run 50 plan-compile/execute round-trips
        import os

        import pyarrow.parquet as pq

        from fenix_spark.catalog import source_path
        from fenix_spark.manifest import resolve

        d = resolve(source_path(self.store.root, name))
        for entry in sorted(os.listdir(d)):
            if entry.endswith(".parquet") and not entry.startswith(("_", ".")):
                return pq.read_schema(os.path.join(d, entry))
        return self.store.read_table(name).limit(0).toArrow().schema

    # flush threshold for streamed puts: bounds driver memory to one
    # buffer regardless of upload size (tests lower it to force the
    # multi-flush path)
    put_flush_bytes: int = 128 << 20

    def _do_put(self, descriptor, reader) -> None:
        """Streamed ingest, ATOMIC and memory-bounded: batches buffer
        up to ``put_flush_bytes`` then append into a hidden manifest
        GENERATION; the pointer flips only when the stream completes.
        A 100 GB put never holds more than one buffer on the driver,
        and a connection dropped mid-stream leaves the previous table
        intact (the orphan generation is vacuumed by the next commit) —
        the same crash contract as catalog.compact."""
        import pyarrow as pa

        from fenix_spark import manifest
        from fenix_spark.catalog import source_path

        name = descriptor.path[0].decode()
        path = source_path(self.store.root, name)
        gen, staging = manifest.begin(path)
        rb = reader.to_reader()
        buf: list = []
        nbytes = 0
        wrote = False

        def flush() -> None:
            nonlocal buf, nbytes, wrote
            if not buf:
                return
            tbl = _normalize_arrow(pa.Table.from_batches(buf))
            self.spark.createDataFrame(tbl).write.mode("append").parquet(staging)
            buf, nbytes, wrote = [], 0, True

        for batch in rb:
            buf.append(batch)
            nbytes += batch.nbytes
            if nbytes >= self.put_flush_bytes:
                flush()
        flush()
        if not wrote:
            # empty stream: still create the (empty) table with schema
            tbl = _normalize_arrow(rb.schema.empty_table())
            self.spark.createDataFrame(tbl).write.mode("append").parquet(staging)
        manifest.commit(path, gen)
        manifest.vacuum(path)

    def _spec_df(self, spec: dict):
        flt = spec.get("filter")
        sel = spec.get("select")
        source = spec.get("source")
        if isinstance(source, str):
            source = source.split(":") if ":" in source else source
        return self.store.read_table(
            source,
            coding=spec.get("coding"),
            column=spec.get("column"),
            filter=F.expr(flt) if flt else None,
            select=sel,
        )

    def _do_get(self, ctx, ticket):
        fl = _require_flight()
        raw = ticket.ticket.decode()
        spec = json.loads(raw) if raw.startswith("{") else {"source": raw}
        state = self._state.get(ctx.peer(), {})
        spec = {**state, **spec}
        table = self._spec_df(spec).toArrow()
        return fl.GeneratorStream(
            table.schema, table.to_batches(max_chunksize=_BATCH_ROWS)
        )

    def _do_exchange(self, descriptor, reader, writer) -> None:
        spec = json.loads(descriptor.command.decode())
        body = _normalize_arrow(reader.read_all())
        targets = body.column("target").to_pylist()
        if not targets:
            raise ValueError("do_exchange: empty target column")
        k = int(spec.get("maxval") or 10)
        coding = spec.get("coding")
        flt = spec.get("filter")
        source, column = spec["source"], spec["column"]
        metric = spec.get("metric", "l2")
        common = dict(
            metric=metric,
            filter=F.expr(flt) if flt else None,
            select=spec.get("select"),
            maxval=k,
            id_col=spec.get("id_col"),
        )
        if coding is not None and len(targets) > 1:
            # the batched scale path: one cell equi-join plan for ALL
            # targets, never a per-target driver loop
            from fenix_spark.operators.index import batch_probe_search

            indexed = self.store.read_table(source, coding=coding, column=column)
            if common["filter"] is not None:
                indexed = indexed.where(common["filter"])
            queries = self.spark.createDataFrame(
                [(i, t) for i, t in enumerate(targets)],
                f"__qid bigint, {column} array<double>",
            )
            rid = spec.get("id_col") or "vec_id"
            out = (
                batch_probe_search(
                    queries,
                    indexed,
                    self.store.read_coder(coding),
                    column,
                    metric=metric,
                    k=k,
                    probes=int(spec.get("probes") or 8),
                    query_id="__qid",
                    right_id=rid,
                )
                .withColumnRenamed("query_id", "query_index")
                # one wire schema across the multi-target branches: the
                # id column keeps its REAL name, never 'right_id'
                .withColumnRenamed("right_id", rid)
            )
            sel = spec.get("select")
            if sel:
                # N×k result rows — joining the selected columns back
                # is a broadcast join; re-sorted after (joins drop it).
                # Without this the batched path silently swallowed the
                # select spec the other two branches honor.
                out = out.join(indexed.select(rid, *sel), rid).orderBy(
                    "query_index", "rank"
                )
        elif coding is None and len(targets) > 1:
            # brute multi-target: ONE corpus scan with the query matrix
            # broadcast (operators.search.batch_knn_brute) — no
            # per-target plan loop; its max_targets cap stays the loud
            # bound for absurd query sets (use an index instead)
            from fenix_spark.operators.search import batch_knn_brute

            corpus = self.store.read_table(source)
            if common["filter"] is not None:
                corpus = corpus.where(common["filter"])
            rid = spec.get("id_col") or "vec_id"
            out = batch_knn_brute(
                corpus, column, targets, metric=metric, k=k, right_id=rid
            )
            sel = spec.get("select")
            if sel:
                # the result is N×k rows — joining the selected columns
                # back is a broadcast join against one more corpus scan
                # (re-sorted after: the join drops the rank order)
                out = out.join(corpus.select(rid, *sel), rid).orderBy(
                    "query_index", "rank"
                )
        else:
            parts = []
            for i, t in enumerate(targets):
                one = self.store.search(
                    source, column, t, coding=coding,
                    probes=spec.get("probes"), **common,
                )
                parts.append(one.select(F.lit(i).alias("query_index"), "*"))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        table = out.toArrow()
        writer.begin(table.schema)
        writer.write_table(table)

    def _do_action(self, ctx, action):
        fl = _require_flight()
        body = action.body.to_pybytes()
        cfg = json.loads(body.decode()) if body else {}
        kind = action.type
        if kind == "make-coder":
            from fenix_spark.operators.coder import CodingConfig

            conf = CodingConfig(**cfg["config"]) if cfg.get("config") else None
            self.store.make_coder(cfg["name"], cfg["source"], cfg["column"], conf)
        elif kind == "make-index":
            self.store.make_index(cfg["source"], cfg["column"], cfg["name"])
        elif kind == "drop-table":
            self.store.drop_table(cfg["name"])
        elif kind == "drop-index":
            # reference semantics (flight.py:92-99): drop the coder AND
            # every index built with it
            for source, column, coding in self.store.list_indexes():
                if coding == cfg["name"]:
                    self.store.drop_index(source, column, coding)
            self.store.drop_coder(cfg["name"])
        elif kind == "remove":
            self.store.remove()
        elif kind == "list-tables":
            yield fl.Result(json.dumps(self.store.list_tables()).encode())
        elif kind == "list-coders":
            yield fl.Result(json.dumps(self.store.list_coders()).encode())
        elif kind == "list-indexes":
            yield fl.Result(
                json.dumps([list(t) for t in self.store.list_indexes()]).encode()
            )
        elif kind.startswith("set-") and kind[4:] in (
            "coding", "column", "filter", "select",
        ):
            peer = ctx.peer()
            self._state.setdefault(peer, {})[kind[4:]] = cfg[kind[4:]]
            self._state.move_to_end(peer)
            while len(self._state) > self._state_cap:
                self._state.popitem(last=False)
        elif kind.startswith("del-") and kind[4:] in (
            "coding", "column", "filter", "select",
        ):
            self._state.get(ctx.peer(), {}).pop(kind[4:], None)
        else:
            raise ValueError(f"unknown action {kind!r}")

    # ------------------------------------------------------ lifecycle

    def serve(self) -> None:
        self._impl.serve()

    def shutdown(self) -> None:
        self._impl.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()


class Client:
    """Verb-for-verb mirror of the reference Flight client
    (flight.py:149-292) over the JSON protocol. Results come back as
    pyarrow objects, like the reference's."""

    def __init__(self, host: str = "127.0.0.1", port: int = 9001):
        fl = _require_flight()
        self.conn = fl.connect(f"grpc://{host}:{port}")

    def close(self) -> None:
        self.conn.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------- actions

    def _action(self, kind: str, **cfg):
        fl = _require_flight()
        return list(self.conn.do_action(fl.Action(kind, json.dumps(cfg).encode())))

    def make_table(self, name: str, data) -> "Client":
        """``data``: pyarrow Table or RecordBatchReader."""
        import pyarrow as pa

        fl = _require_flight()
        if isinstance(data, pa.Table):
            data = data.to_reader()
        writer, _ = self.conn.do_put(fl.FlightDescriptor.for_path(name), data.schema)
        with writer:
            for batch in data:
                writer.write_batch(batch)
        return self

    def read_table(
        self,
        source: str | Sequence[str],
        coding: str | None = None,
        column: str | None = None,
        select: Sequence[str] | None = None,
        filter: str | None = None,  # noqa: A002 - reference kwarg
    ):
        fl = _require_flight()
        spec = {
            "source": source if isinstance(source, str) else list(source),
            "coding": coding,
            "column": column,
            "select": list(select) if select else None,
            "filter": filter,
        }
        spec = {k: v for k, v in spec.items() if v is not None}
        return self.conn.do_get(fl.Ticket(json.dumps(spec).encode())).to_reader()

    def drop_table(self, name: str) -> "Client":
        self._action("drop-table", name=name)
        return self

    def list_tables(self) -> list[str]:
        return json.loads(self._action("list-tables")[0].body.to_pybytes())

    def make_index(self, name: str, source: str, column: str, config: dict | None = None) -> "Client":
        self._action("make-coder", name=name, source=source, column=column, config=config)
        return self.sync_index(name, source, column)

    def sync_index(self, name: str, source: str, column: str) -> "Client":
        self._action("make-index", name=name, source=source, column=column)
        return self

    def drop_index(self, name: str) -> "Client":
        self._action("drop-index", name=name)
        return self

    def search(
        self,
        target,
        source: str,
        column: str,
        metric: str = "l2",
        coding: str | None = None,
        select: Sequence[str] | None = None,
        filter: str | None = None,  # noqa: A002 - reference kwarg
        maxval: int = 10,
        probes: int | None = None,
        id_col: str | None = None,
    ):
        """``target``: one vector (list of floats) or a list of
        vectors; returns a pyarrow Table with ``query_index``."""
        import pyarrow as pa

        fl = _require_flight()
        if target and isinstance(target[0], (int, float)):
            target = [list(target)]
        spec = {
            "source": source, "column": column, "metric": metric,
            "coding": coding, "select": list(select) if select else None,
            "filter": filter, "maxval": maxval, "probes": probes,
            "id_col": id_col,
        }
        spec = {k: v for k, v in spec.items() if v is not None}
        descriptor = fl.FlightDescriptor.for_command(json.dumps(spec).encode())
        writer, reader = self.conn.do_exchange(descriptor)
        with writer:
            body = pa.table({"target": [list(t) for t in target]})
            writer.begin(body.schema)
            writer.write_table(body)
            writer.done_writing()
            return reader.read_all()

    def remove(self) -> "Client":
        self._action("remove")
        return self


def launch(root: str, host: str = "0.0.0.0", port: int = 9001) -> None:
    """ref: launch.py:12-17 — build a session, serve forever.
    ``python -m fenix_spark.flight <root> [host] [port]``."""
    from fenix_spark.session import get_session

    server = Server(get_session("fenix_spark_flight"), root, host, port)
    print(f"fenix_spark flight server at {server.grpc} over {root}")
    server.serve()


if __name__ == "__main__":
    import sys

    launch(
        sys.argv[1],
        sys.argv[2] if len(sys.argv) > 2 else "0.0.0.0",
        int(sys.argv[3]) if len(sys.argv) > 3 else 9001,
    )
