"""Stdio NDJSON connector-protocol adapter.

Runs an EXTERNAL destination connector process — anything implementing the
reference's connector contract — against this engine, so unmodified
third-party connectors stay pluggable (SURVEY §3.1).

Protocol (reference ``packages/node-cdk/src/std.ts:31-186`` message loop,
message shapes ``packages/protocol/src/index.ts``):

- engine → connector stdin, one JSON message per line:
  ``describe`` / ``describe-streams`` / ``start-stream`` (payload: stream,
  connectionCredentials, syncId, fullRefresh, streamOptions) / ``row``
  (payload.row) / ``end-stream``;
- connector → engine stdout: ``spec`` / ``stream-spec`` /
  ``stream-result`` (received/skipped/success/failed) / ``log`` (forwarded
  to the engine logger with the sync prefix, sync.ts:372-399) / ``halt``
  (fatal → HaltError, sync.ts:151-153);
- state side-channel: the engine serves the same loopback HTTP RPC the
  reference starts per connector (``docker-channel.ts:170-256``):
  ``state.get/set/del/deleteByPrefix/size`` POST JSON → JSON,
  ``state.list`` → NDJSON entry stream; the child finds it via the
  ``RPC_URL`` / ``RPC_TOKEN`` env vars (std.ts:252-259).

Rows are serialized with the engine's ISO-millis row encoder, matching what
the reference engine puts on the wire. One connector process serves one
stream lifecycle (std.ts exits after replying stream-result), exactly like
the reference's channel; describe/describe-streams use short-lived
processes.
"""

from __future__ import annotations

import json
import logging
import os
import queue
import secrets
import subprocess
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from syncmaven_spark.sinks.base import (
    DestinationProvider,
    HaltError,
    OutputStream,
    StreamSpec,
)
from syncmaven_spark.state import StateStore
from syncmaven_spark.types import row_to_json

logger = logging.getLogger(__name__)

_STREAM_RESULT_TIMEOUT_S = 600.0  # end-stream flush deadline (see finish())
_REPLY_TIMEOUT_S = 30.0


class StateRpcServer:
    """Loopback HTTP RPC for the connector's state store
    (docker-channel.ts:170-256): one server per stream lifecycle, bound to
    127.0.0.1 on an ephemeral port, bearer-token checked."""

    def __init__(
        self,
        store: StateStore,
        bind: str = "127.0.0.1",
        advertise: str | None = None,
    ) -> None:
        self.token = secrets.token_hex(16)
        self._advertise = advertise
        rpc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args: Any) -> None:  # silence stdlib noise
                pass

            def do_POST(self) -> None:  # noqa: N802 - stdlib API
                auth = self.headers.get("Authorization", "")
                if auth != f"Bearer {rpc.token}":
                    self.send_response(401)
                    self.end_headers()
                    return
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length) or b"{}")
                try:
                    rpc._dispatch(self, self.path, body)
                except Exception as e:  # noqa: BLE001 - 500 like the reference
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps({"error": str(e)}).encode())

        self._server = ThreadingHTTPServer((bind, 0), Handler)
        self._store = store
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        # containers reach the engine via the host-gateway alias, not the
        # loopback/bind address (container.ts:206-208)
        return f"http://{self._advertise or host}:{port}"

    def _dispatch(self, handler: BaseHTTPRequestHandler, path: str, body: dict) -> None:
        store = self._store

        def send_json(obj: Any) -> None:
            data = json.dumps(obj).encode()
            handler.send_response(200)
            handler.send_header("Content-Type", "application/json")
            handler.send_header("Content-Length", str(len(data)))
            handler.end_headers()
            handler.wfile.write(data)

        if path == "/state.get":
            # reference returns {} for missing keys (docker-channel.ts:186-187);
            # `is None`, not falsy — stored 0/false/""/[] must round-trip
            value = store.get(body["key"])
            send_json({} if value is None else value)
        elif path == "/state.set":
            store.set(body["key"], body["value"])
            send_json({})
        elif path == "/state.del":
            store.delete(body["key"])
            send_json({})
        elif path == "/state.deleteByPrefix":
            store.delete_by_prefix(body["prefix"])
            send_json({})
        elif path == "/state.size":
            # the reference scopes size to the connector's key prefix
            # (std.ts:212 sends it; docker-channel.ts:197-199 answers with
            # store.size(prefix)) — a global count would leak cursors of
            # every other sync into the connector's number
            prefix = body.get("prefix")
            if prefix is None:
                send_json({"size": store.size()})
            else:
                send_json({"size": sum(1 for _ in store.stream(prefix))})
        elif path == "/state.list":
            # NDJSON entry stream, key split back into segments
            # (docker-channel.ts:200-207, std.ts list contract)
            lines = [
                json.dumps({"key": k.split("::"), "value": v})
                for k, v in store.stream(body["prefix"])
            ]
            data = ("\n".join(lines) + ("\n" if lines else "")).encode()
            handler.send_response(200)
            handler.send_header("Content-Type", "application/x-ndjson")
            handler.send_header("Content-Length", str(len(data)))
            handler.end_headers()
            handler.wfile.write(data)
        else:
            send_json({})

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()


class _ConnectorProcess:
    """One child connector process + a stdout reader thread.

    The reader thread drains stdout continuously (so a chatty connector
    cannot deadlock the pipe while the engine pumps rows), forwards ``log``
    messages to the engine logger, and queues protocol replies."""

    def __init__(self, command: list[str], env: dict[str, str] | None = None):
        self.proc = subprocess.Popen(
            command,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env={**os.environ, **(env or {})},
            text=True,
        )
        self._replies: queue.Queue[dict] = queue.Queue()
        self._reader = threading.Thread(target=self._drain, daemon=True)
        self._reader.start()

    def _drain(self) -> None:
        assert self.proc.stdout is not None
        for line in self.proc.stdout:
            line = line.strip()
            if not line:
                continue
            try:
                message = json.loads(line)
            except json.JSONDecodeError:
                logger.warning("connector emitted non-JSON line: %s", line[:200])
                continue
            if message.get("type") == "log":
                payload = message.get("payload", {})
                level = getattr(
                    logging, str(payload.get("level", "info")).upper(), logging.INFO
                )
                logger.log(level, "[connector] %s", payload.get("message"))
                continue
            self._replies.put(message)
        # EOF sentinel: child exited — lets expect() fail fast instead of
        # burning the full reply timeout on a dead process
        self._replies.put({"type": "_eof"})

    def check_halt(self) -> None:
        """Surface an already-queued halt without blocking (the connector
        may halt at any time, sync.ts:372-399).

        Only the queue head is examined, and it is consumed only when it IS
        a halt: a get+put round-trip would rotate a non-halt reply to the
        tail, so ``[stream-result, _eof]`` could become ``[_eof,
        stream-result]`` and ``finish()`` would report a dead connector
        despite having its result. Direct deque access under the queue's
        own mutex is safe here — the engine is the only consumer."""
        halt_msg = None
        with self._replies.mutex:
            pending = self._replies.queue
            if pending and pending[0].get("type") == "halt":
                halt_msg = pending.popleft()
        if halt_msg is not None:
            raise HaltError(halt_msg.get("payload", {}).get("message", "halt"))

    def send(self, message: dict) -> None:
        self.send_raw(json.dumps(message))

    def send_raw(self, line: str) -> None:
        assert self.proc.stdin is not None
        try:
            self.proc.stdin.write(line + "\n")
            self.proc.stdin.flush()
        except (BrokenPipeError, OSError):
            # child exited — if it halted, raise that reason; else the pipe
            # error itself
            self.check_halt()
            raise

    def expect(self, *types: str, timeout: float = _REPLY_TIMEOUT_S) -> dict:
        while True:
            try:
                message = self._replies.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(
                    f"connector did not reply with {types} within {timeout}s"
                ) from None
            if message.get("type") == "halt":
                raise HaltError(message.get("payload", {}).get("message", "halt"))
            if message.get("type") == "_eof":
                raise RuntimeError(
                    f"connector exited (code {self.proc.poll()}) without "
                    f"replying with {types}"
                )
            if message.get("type") in types:
                return message
            logger.warning("unexpected connector message: %s", message.get("type"))

    def close(self) -> None:
        try:
            if self.proc.stdin:
                self.proc.stdin.close()
        except OSError:
            pass
        try:
            self.proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            self.proc.kill()


class StdioOutputStream(OutputStream):
    """Engine-side row pump for one started connector stream."""

    def __init__(self, proc: _ConnectorProcess, rpc: StateRpcServer) -> None:
        super().__init__()
        self._proc = proc
        self._rpc = rpc

    def handle_row(self, row: dict[str, Any]) -> None:
        self._proc.check_halt()
        self.stats.received += 1
        # one protocol message per row (sync.ts:550-554); dates already
        # ISO-millis via the engine encoder
        self._proc.send_raw(
            '{"type":"row","payload":{"row":' + row_to_json(row) + "}}"
        )

    def finish(self):
        from syncmaven_spark.sinks.base import StreamStats

        try:
            self._proc.send({"type": "end-stream"})
        except (BrokenPipeError, OSError):
            pass  # child already exited — read its last words below
        try:
            # the end-of-stream flush can legitimately take minutes (a
            # batching connector draining up to 1000 buffered rows through
            # a rate-limited API); the reference awaits the stream result
            # without a deadline — keep a generous one as a hang backstop
            result = self._proc.expect(
                "stream-result", timeout=_STREAM_RESULT_TIMEOUT_S
            )
            payload = result.get("payload", {})
            self.stats = StreamStats(
                received=payload.get("received", self.stats.received),
                success=payload.get("success", 0),
                skipped=payload.get("skipped", 0),
                failed=payload.get("failed", 0),
            )
        finally:
            self._proc.close()
            self._rpc.close()
        return self.stats


class StdioDestination(DestinationProvider):
    """A destination backed by an external connector process speaking the
    NDJSON stdio protocol. ``command`` is the argv to spawn (for the
    reference's Docker images: ``["docker", "run", "-i", "--rm", image]``
    plus a host-reachable RPC_URL)."""

    def __init__(
        self,
        command: list[str],
        name: str = "stdio",
        rpc_bind: str = "127.0.0.1",
        rpc_advertise: str | None = None,
    ) -> None:
        self.name = name
        self.command = list(command)
        self._rpc_bind = rpc_bind
        self._rpc_advertise = rpc_advertise
        self._spec_cache: list[StreamSpec] | None = None
        self._default_stream: str | None = None

    def describe(self) -> dict[str, Any]:
        proc = _ConnectorProcess(self.command)
        try:
            proc.send({"type": "describe"})
            payload = proc.expect("spec").get("payload", {})
        finally:
            proc.close()
        return {
            "name": payload.get("description", self.name),
            "streams": [s.name for s in self.streams()],
            "connectionCredentials": payload.get("connectionCredentials", {}),
        }

    def streams(self) -> list[StreamSpec]:
        if self._spec_cache is None:
            proc = _ConnectorProcess(self.command)
            try:
                proc.send({"type": "describe-streams"})
                payload = proc.expect("stream-spec").get("payload", {})
            finally:
                proc.close()
            self._spec_cache = [
                StreamSpec(name=s["name"], row_type=s.get("rowType") or {})
                for s in payload.get("streams", [])
            ]
            self._default_stream = payload.get("defaultStream")
        return self._spec_cache

    def _resolve_stream(self, stream_name: str) -> str:
        specs = self.streams()
        # the project compiler falls back to "default" for unknown packages;
        # honor the connector's advertised defaultStream (std.ts:92-99)
        if self._default_stream and stream_name == "default" and not any(
            s.name == "default" for s in specs
        ):
            return self._default_stream
        return stream_name

    def stream_spec(self, stream_name: str) -> StreamSpec:
        resolved = self._resolve_stream(stream_name)
        for s in self.streams():
            if s.name == resolved:
                return s
        raise KeyError(f"{self.name} has no stream {stream_name!r}")

    def create_output_stream(
        self,
        stream_name: str,
        credentials: dict[str, Any],
        sync_id: str,
        store: Any,
        full_refresh: bool = False,
        restart: bool = False,
        options: dict[str, Any] | None = None,
    ) -> OutputStream:
        # NOTE: `restart` is accepted for interface uniformity but not
        # transmitted — the reference protocol's start-stream payload has
        # NO continuation field (protocol/src/index.ts:102-110), and the
        # reference engine's own checkpoint cycle re-sends a plain
        # start-stream (sync.ts:566-569). External connectors therefore
        # re-run their start logic per checkpoint exactly as they do under
        # the reference; the in-process sinks honoring restart are a
        # deliberate improvement the protocol cannot express.
        stream_name = self._resolve_stream(stream_name)
        self.stream_spec(stream_name)
        rpc = StateRpcServer(
            store, bind=self._rpc_bind, advertise=self._rpc_advertise
        )
        proc = None
        try:
            proc = _ConnectorProcess(
                self.command, env={"RPC_URL": rpc.url, "RPC_TOKEN": rpc.token}
            )
            proc.send(
                {
                    "type": "start-stream",
                    "payload": {
                        "stream": stream_name,
                        "connectionCredentials": credentials,
                        "syncId": sync_id,
                        "fullRefresh": full_refresh,
                        "streamOptions": options or {},
                    },
                }
            )
        except BaseException:
            # don't leak the RPC server thread/socket or the child handle
            # when the connector dies at startup
            if proc is not None:
                proc.close()
            rpc.close()
            raise
        return StdioOutputStream(proc, rpc)
