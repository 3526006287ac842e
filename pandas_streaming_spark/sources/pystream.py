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
import logging
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


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


class _WorkerSlice(InputPartition):
    """Picklable (worker log, line range) read task for the partitioned
    process source."""

    def __init__(self, worker: int, path: str, start: int, end: int):
        self.worker = worker
        self.path = path
        self.start = start
        self.end = end


class _ProcessPoolStreamReader(DataSourceStreamReader):
    """Partitioned reader for ``from_process_pool``: N worker commands,
    each spooling stdout to its own durable log; every micro-batch plans
    one (worker, line range) slice per log and the slices are read IN
    EXECUTOR TASKS — the scale-out form of the driver-side
    ``_ProcessStreamReader`` (N workers → N-way read parallelism, the
    same shape the kafka source gives topic partitions).

    Offsets are ``{worker_index: committed_line_count}``; a restarted
    query replays exact committed slices from the logs. The worker
    processes themselves live on the driver (they are the *ingest*
    edge); the decode/parse cost is what scales out.
    """

    def __init__(self, spool_dir: str, cmds_json: str, batch_size: int):
        self._dir = spool_dir
        self._cmds = json.loads(cmds_json) if cmds_json else []
        self._bs = batch_size
        self._procs: list | None = None

    def _log(self, i: int) -> str:
        import os

        return os.path.join(self._dir, f"w{i:03d}.log")

    def _ensure_started(self) -> None:
        import os
        import subprocess

        if self._procs is not None:
            return
        os.makedirs(self._dir, exist_ok=True)
        self._procs = []
        for i, cmd in enumerate(self._cmds):
            out = open(self._log(i), "ab")
            self._procs.append(
                subprocess.Popen(cmd, stdout=out, stderr=subprocess.DEVNULL)
            )

    def _n_workers(self) -> int:
        import glob as g
        import os

        n_logs = len(g.glob(os.path.join(self._dir, "w*.log")))
        return max(len(self._cmds), n_logs)

    def initialOffset(self) -> dict:
        return {str(i): 0 for i in range(self._n_workers())}

    def latestOffset(self) -> dict:
        import os

        self._ensure_started()
        prev = getattr(self, "_last_offered", None) or self.initialOffset()
        out = {}
        for i in range(self._n_workers()):
            path = self._log(i)
            n = 0
            if os.path.exists(path):
                with open(path, "rb") as f:
                    data = f.read()
                n = data.count(b"\n")  # committed = newline-terminated
            # admission control: at most batch_size new lines per worker
            # per trigger, so one chatty worker can't starve a micro-batch
            base = prev.get(str(i), 0)
            out[str(i)] = min(n, base + self._bs)
        self._last_offered = out
        return out

    def partitions(self, start: dict, end: dict):
        return [
            _WorkerSlice(int(key), self._log(int(key)), start.get(key, 0), hi)
            for key, hi in end.items()
            if hi > start.get(key, 0)
        ]

    def read(self, partition: _WorkerSlice):
        # executor-side: decode exactly the committed slice of one log
        s = partition
        with open(s.path, "rb") as f:
            lines = f.read().decode("utf-8", errors="replace").split("\n")[:-1]
        return iter(
            [(s.worker, j, v) for j, v in enumerate(lines[s.start : s.end], s.start)]
        )

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        for p in self._procs or []:
            if p.poll() is None:
                p.terminate()


class ProcessPoolDataSource(DataSource):
    """``format("process_pool_stream")``: options ``spool_dir``, ``cmds``
    (JSON list of argv lists; empty to tail logs another writer owns) and
    ``batch_size``."""

    @classmethod
    def name(cls) -> str:
        return "process_pool_stream"

    def schema(self) -> str:
        return "worker int, line_no long, value string"

    def streamReader(self, schema) -> _ProcessPoolStreamReader:
        return _ProcessPoolStreamReader(
            self.options["spool_dir"],
            self.options.get("cmds", ""),
            int(self.options.get("batch_size", "1000")),
        )


def from_process_pool(
    spark: SparkSession,
    cmds: list[list[str]],
    spool_dir: str,
    batch_size: int = 1000,
) -> DataFrame:
    """Streaming DataFrame over N worker subprocesses, one durable log
    and one *read partition* per worker: columns ``(worker int, line_no
    long, value string)``. The partitioned counterpart of
    ``from_process_stream`` — use it when the parse/transform after
    ingest should fan out across the cluster."""
    spark.dataSource.register(ProcessPoolDataSource)
    return (
        spark.readStream.format("process_pool_stream")
        .option("spool_dir", spool_dir)
        .option("cmds", json.dumps([list(c) for c in cmds]))
        .option("batch_size", str(batch_size))
        .load()
    )


_HTTP_SERVERS: dict[int, tuple[object, str]] = {}

#: Per-port count of malformed/unservable requests the ingest endpoints
#: refused (bad Content-Length, unreadable body). A source that silently
#: loses data is the one place exception-swallowing is dangerous, so the
#: drop is counted where tests and operators can see it, and debug-logged.
SOURCE_DROPS: dict[int, int] = {}


def _check_port_spool(
    cache: dict[int, tuple[object, str]], port: int, spool: str, kind: str
) -> bool:
    """True if a server for ``port`` already exists (after verifying it
    writes to the same ``spool``). The daemon's handler captures the
    first call's spool in its closure, so reusing the port with a
    different spool would silently append to the old file while the new
    stream reads an empty one — refuse loudly instead."""
    if port in cache:
        _, bound = cache[port]
        if bound != spool:
            raise ValueError(
                f"{kind} server on port {port} is already spooling to "
                f"{bound!r}; pass the same spool or use a fresh port "
                f"(one durable log per endpoint)."
            )
        return True
    return False


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

    if not _check_port_spool(_HTTP_SERVERS, port, spool, "from_http_server"):
        lock = threading.Lock()
        SOURCE_DROPS.setdefault(port, 0)

        class _Handler(BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802 (http.server API name)
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(n).decode("utf-8", errors="replace")
                except (ValueError, OSError) as exc:
                    # Malformed request: refuse with 400 and COUNT the
                    # drop — never ack (200) data that didn't reach the
                    # durable spool.
                    SOURCE_DROPS[port] += 1
                    logging.getLogger(__name__).debug(
                        "from_http_server port %d dropped request: %s", port, exc
                    )
                    try:
                        self.send_response(400)
                        self.end_headers()
                    except OSError:
                        pass  # client already gone; the drop is counted
                    return
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
        _HTTP_SERVERS[port] = (srv, spool)

    spark.dataSource.register(ProcessDataSource)
    return (
        spark.readStream.format("process_stream")
        .option("spool", spool)
        .option("batch_size", str(batch_size))
        .load()
    )


_WS_SERVERS: dict[int, tuple[object, str]] = {}
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3


def _ws_handshake(conn) -> bool:
    """Read the client's HTTP upgrade request and answer 101 with the
    RFC 6455 accept key. Returns False on a malformed request."""
    import base64
    import hashlib

    data = b""
    while b"\r\n\r\n" not in data:
        chunk = conn.recv(4096)
        if not chunk:
            return False
        data += chunk
    key = None
    for line in data.split(b"\r\n"):
        if line.lower().startswith(b"sec-websocket-key:"):
            key = line.split(b":", 1)[1].strip().decode()
    if key is None:
        return False
    accept = base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest()
    ).decode()
    conn.sendall(
        b"HTTP/1.1 101 Switching Protocols\r\n"
        b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
        b"Sec-WebSocket-Accept: " + accept.encode() + b"\r\n\r\n"
    )
    return True


def _ws_read_frame(conn):
    """Parse one client frame → (opcode, payload bytes) or None on EOF.
    Client frames are always masked (RFC 6455 §5.1)."""

    def recv_exact(n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    hdr = recv_exact(2)
    if hdr is None:
        return None
    opcode = hdr[0] & 0x0F
    masked, ln = hdr[1] & 0x80, hdr[1] & 0x7F
    if ln == 126:
        ext = recv_exact(2)
        if ext is None:
            return None
        ln = int.from_bytes(ext, "big")
    elif ln == 127:
        ext = recv_exact(8)
        if ext is None:
            return None
        ln = int.from_bytes(ext, "big")
    mask = recv_exact(4) if masked else b"\x00" * 4
    if mask is None:
        return None
    payload = recv_exact(ln) if ln else b""
    if payload is None:
        return None
    return opcode, bytes(b ^ mask[i % 4] for i, b in enumerate(payload))


def from_websocket(
    spark: SparkSession,
    port: int,
    spool: str,
    batch_size: int = 100,
) -> DataFrame:
    """Streaming DataFrame of text messages sent to a local WebSocket
    endpoint (reference ``from_websocket``): columns ``(line_no long,
    value string)``.

    The server is a stdlib RFC 6455 implementation (handshake accept
    key, masked client frames, close/ping control frames) running as a
    driver-side daemon thread — the same durable-spool design as
    ``from_http_server``: each text message appends one newline-
    terminated line under a lock, and the stream reader's line offsets
    make acknowledged messages replayable exactly-once across restarts.
    Newlines inside a message are message separators, matching the
    line-oriented schema shared by the process/http/socket sources.
    """
    import socket
    import threading

    if not _check_port_spool(_WS_SERVERS, port, spool, "from_websocket"):
        lock = threading.Lock()
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen()

        def spool_lines(text: str) -> None:
            import os

            lines = [ln for ln in text.split("\n") if ln]
            os.makedirs(os.path.dirname(spool) or ".", exist_ok=True)
            with lock, open(spool, "a", encoding="utf-8") as f:
                for ln in lines:
                    f.write(ln + "\n")

        def serve_conn(conn) -> None:
            with conn:
                if not _ws_handshake(conn):
                    return
                while True:
                    frame = _ws_read_frame(conn)
                    if frame is None:
                        return
                    opcode, payload = frame
                    if opcode == 0x8:  # close: echo and finish
                        conn.sendall(b"\x88\x00")
                        return
                    if opcode == 0x9:  # ping -> pong, unmasked server frame
                        conn.sendall(bytes([0x8A, len(payload)]) + payload)
                        continue
                    if opcode in (0x1, 0x0):  # text / continuation
                        spool_lines(payload.decode("utf-8", errors="replace"))

        def accept_loop() -> None:
            while True:
                try:
                    conn, _ = srv.accept()
                except OSError:  # listener closed
                    return
                threading.Thread(target=serve_conn, args=(conn,), daemon=True).start()

        threading.Thread(target=accept_loop, daemon=True).start()
        _WS_SERVERS[port] = (srv, spool)

    spark.dataSource.register(ProcessDataSource)
    return (
        spark.readStream.format("process_stream")
        .option("spool", spool)
        .option("batch_size", str(batch_size))
        .load()
    )


_MQTT_SERVERS: dict[int, tuple[object, str]] = {}


def _mqtt_read_packet(conn):
    """Read one MQTT control packet → (type, flags, body) or None on EOF.
    Remaining-length is the spec's 7-bit varint (§2.2.3)."""

    def recv_exact(n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    hdr = recv_exact(1)
    if hdr is None:
        return None
    ptype, flags = hdr[0] >> 4, hdr[0] & 0x0F
    ln, shift = 0, 0
    for _ in range(4):
        b = recv_exact(1)
        if b is None:
            return None
        ln |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    body = recv_exact(ln) if ln else b""
    if body is None:
        return None
    return ptype, flags, body


def from_mqtt(
    spark: SparkSession,
    port: int,
    spool: str,
    batch_size: int = 100,
) -> DataFrame:
    """Streaming DataFrame of messages PUBLISHed to a local MQTT 3.1.1
    endpoint (reference ``from_mqtt``): columns ``(line_no long,
    value string)`` where value is ``topic<TAB>payload``.

    A broker-less stdlib endpoint speaking the server half of MQTT
    3.1.1: CONNECT→CONNACK, SUBSCRIBE→SUBACK, PINGREQ→PINGRESP,
    PUBLISH QoS 0 spooled / QoS 1 spooled-then-PUBACK (the ack ordering
    is what makes QoS 1 at-least-once end-to-end: the line is durable
    before the client is told), DISCONNECT closes. Same durable-spool
    exactly-once replay story as the http/websocket sources; a real
    deployment points from_kafka/file paths at a production broker —
    this is the reference's dev-ingest parity surface.
    """
    import socket
    import threading

    if not _check_port_spool(_MQTT_SERVERS, port, spool, "from_mqtt"):
        lock = threading.Lock()
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen()

        def spool_line(topic: str, payload: str) -> None:
            import os

            os.makedirs(os.path.dirname(spool) or ".", exist_ok=True)
            line = topic + "\t" + payload.replace("\n", " ")
            with lock, open(spool, "a", encoding="utf-8") as f:
                f.write(line + "\n")

        def serve_conn(conn) -> None:
            with conn:
                while True:
                    pkt = _mqtt_read_packet(conn)
                    if pkt is None:
                        return
                    ptype, flags, body = pkt
                    if ptype == 1:  # CONNECT -> CONNACK (session 0, rc 0)
                        conn.sendall(b"\x20\x02\x00\x00")
                    elif ptype == 3:  # PUBLISH
                        qos = (flags >> 1) & 0x3
                        tlen = int.from_bytes(body[:2], "big")
                        topic = body[2 : 2 + tlen].decode("utf-8", "replace")
                        rest = body[2 + tlen :]
                        pkt_id = rest[:2] if qos else b""
                        payload = rest[2:] if qos else rest
                        spool_line(topic, payload.decode("utf-8", "replace"))
                        if qos == 1:  # durable first, then PUBACK
                            conn.sendall(b"\x40\x02" + pkt_id)
                    elif ptype == 8:  # SUBSCRIBE -> SUBACK (maxQoS 0)
                        conn.sendall(b"\x90\x03" + body[:2] + b"\x00")
                    elif ptype == 12:  # PINGREQ -> PINGRESP
                        conn.sendall(b"\xd0\x00")
                    elif ptype == 14:  # DISCONNECT
                        return

        def accept_loop() -> None:
            while True:
                try:
                    conn, _ = srv.accept()
                except OSError:
                    return
                threading.Thread(target=serve_conn, args=(conn,), daemon=True).start()

        threading.Thread(target=accept_loop, daemon=True).start()
        _MQTT_SERVERS[port] = (srv, spool)

    spark.dataSource.register(ProcessDataSource)
    return (
        spark.readStream.format("process_stream")
        .option("spool", spool)
        .option("batch_size", str(batch_size))
        .load()
    )
