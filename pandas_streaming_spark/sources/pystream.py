"""Python-native streaming sources (Spark 4 DataSource API).

The reference's ``from_iterable`` emits a finite in-memory sequence as a
stream; its file/kafka sources cover everything durable. Spark 4's Python
``DataSource`` API lets us express the in-memory case as a *real*
Structured Streaming source — offsets, recovery replay, any trigger —
instead of bouncing through the file-replay fixture.

Scale honesty: like the reference's version this is a driver-side source
(the data IS an in-process iterable); its job is API parity and testing,
not throughput. Durable inputs belong on the file/kafka paths.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class _IterableStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, rows: list[list], batch_size: int):
        self._rows = rows
        self._bs = batch_size

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = start["i"]
        chunk = self._rows[i : i + self._bs]
        return iter([tuple(r) for r in chunk]), {"i": i + len(chunk)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # recovery replay between committed offsets — same slice, so a
        # restarted query sees byte-identical micro-batches
        return iter([tuple(r) for r in self._rows[start["i"] : end["i"]]])


class IterableDataSource(DataSource):
    """``format("iterable_stream")``: rows JSON-encoded in options (the
    DataSource contract ships only strings to the reader)."""

    @classmethod
    def name(cls) -> str:
        return "iterable_stream"

    def schema(self) -> str:
        return self.options["schema"]

    def simpleStreamReader(self, schema) -> _IterableStreamReader:
        return _IterableStreamReader(
            json.loads(self.options["rows"]),
            int(self.options.get("batch_size", "10")),
        )


def from_iterable_stream(
    spark: SparkSession, rows, schema: str, batch_size: int = 10
) -> DataFrame:
    """Streaming DataFrame over an in-memory sequence, ``batch_size``
    rows per micro-batch (reference ``from_iterable``). JSON-serializable
    scalar columns only — by construction the data already fits on the
    driver."""
    spark.dataSource.register(IterableDataSource)
    return (
        spark.readStream.format("iterable_stream")
        .option("rows", json.dumps([list(r) for r in rows]))
        .option("schema", schema)
        .option("batch_size", str(batch_size))
        .load()
    )


class _ProcessStreamReader(SimpleDataSourceStreamReader):
    """Stream the stdout lines of a subprocess.

    The process is spawned ONCE with stdout redirected to a spool file;
    the spool — not the pipe — is the source of truth. Offsets are line
    counts into the spool, so ``readBetweenOffsets`` re-reads the exact
    committed slice and a restarted query replays byte-identical
    micro-batches (a raw pipe cannot be re-read; the spool is what makes
    this source exactly-once instead of at-most-once).

    SimpleDataSourceStreamReader runs on the driver, which is where the
    subprocess lives — same locality story as the reference's
    ``from_process``. Durable high-volume inputs belong on file/kafka.
    """

    def __init__(self, spool: str, cmd_json: str, batch_size: int):
        self._spool = spool
        self._cmd = (json.loads(cmd_json) if cmd_json else None) or None
        self._bs = batch_size
        self._proc = None

    def _ensure_started(self) -> None:
        import os
        import subprocess

        if self._proc is not None or self._cmd is None:
            return
        os.makedirs(os.path.dirname(self._spool), exist_ok=True)
        out = open(self._spool, "ab")
        self._proc = subprocess.Popen(self._cmd, stdout=out, stderr=subprocess.DEVNULL)

    def _complete_lines(self) -> list[str]:
        import os

        if not os.path.exists(self._spool):
            return []
        with open(self._spool, "rb") as f:
            data = f.read()
        if not data:
            return []
        # only lines terminated by \n are committed — a partially-written
        # tail line is invisible until the writer finishes it
        return data.decode("utf-8", errors="replace").split("\n")[:-1]

    def initialOffset(self) -> dict:
        return {"line": 0}

    def read(self, start: dict):
        self._ensure_started()
        i = start["line"]
        lines = self._complete_lines()
        chunk = lines[i : i + self._bs]
        return iter([(i + j, s) for j, s in enumerate(chunk)]), {"line": i + len(chunk)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lines = self._complete_lines()
        return iter(
            [(j, s) for j, s in enumerate(lines[start["line"] : end["line"]], start["line"])]
        )


class ProcessDataSource(DataSource):
    """``format("process_stream")``: options are ``spool`` (line log
    path), optional ``cmd`` (JSON argv list to spawn; omit to tail a
    spool another writer owns) and ``batch_size``."""

    @classmethod
    def name(cls) -> str:
        return "process_stream"

    def schema(self) -> str:
        return "line_no long, value string"

    def simpleStreamReader(self, schema) -> _ProcessStreamReader:
        return _ProcessStreamReader(
            self.options["spool"],
            self.options.get("cmd", ""),
            int(self.options.get("batch_size", "100")),
        )


def from_process_stream(
    spark: SparkSession,
    cmd: list[str],
    spool: str,
    batch_size: int = 100,
) -> DataFrame:
    """Streaming DataFrame of a subprocess's stdout lines (reference
    ``from_process``): columns ``(line_no long, value string)``. ``spool``
    must be a fresh path per logical stream — it is the durable log the
    offsets index into."""
    spark.dataSource.register(ProcessDataSource)
    return (
        spark.readStream.format("process_stream")
        .option("cmd", json.dumps(list(cmd)))
        .option("spool", spool)
        .option("batch_size", str(batch_size))
        .load()
    )


_HTTP_SERVERS: dict[int, object] = {}


def from_http_server(
    spark: SparkSession,
    port: int,
    spool: str,
    batch_size: int = 100,
) -> DataFrame:
    """Streaming DataFrame of lines POSTed to a local HTTP endpoint
    (reference ``from_http_server``): columns ``(line_no long,
    value string)``.

    Same durable-log design as ``from_process_stream``: the handler
    appends newline-terminated lines to the spool under a lock, and the
    stream reader indexes committed lines by offset — so acknowledged
    POSTs survive query restarts exactly-once, which a socket buffer
    cannot promise. The server is a driver-side daemon thread (one per
    port, reused across calls); production ingestion belongs on
    file/kafka paths, this is the reference's dev-ingest parity.
    """
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    if port not in _HTTP_SERVERS:
        lock = threading.Lock()

        class _Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (http.server API name)
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode("utf-8", errors="replace")
                lines = [ln for ln in body.split("\n") if ln]
                import os

                os.makedirs(os.path.dirname(spool) or ".", exist_ok=True)
                with lock, open(spool, "a", encoding="utf-8") as f:
                    for ln in lines:
                        f.write(ln + "\n")
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):  # silence per-request stderr noise
                pass

        srv = ThreadingHTTPServer(("127.0.0.1", port), _Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        _HTTP_SERVERS[port] = srv

    spark.dataSource.register(ProcessDataSource)
    return (
        spark.readStream.format("process_stream")
        .option("spool", spool)
        .option("batch_size", str(batch_size))
        .load()
    )
