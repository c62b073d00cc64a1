"""Stdio NDJSON connector-protocol adapter tests.

The fake connector in tests/assets is a separate process speaking the
reference protocol (std.ts:31-186) incl. the state RPC side-channel — so
these tests cover the full engine ↔ external-connector path: describe /
describe-streams introspection, start-stream/row/end-stream lifecycle with
stream-result stats, golden-file output parity with the in-process file
sink, state RPC roundtrip, and halt propagation.
"""

import os
import sys

import pytest

from syncmaven_spark.runner import ModelDefinition, SyncDefinition, run_sync
from syncmaven_spark.sinks.base import HaltError
from syncmaven_spark.sinks.stdio import StdioDestination
from syncmaven_spark.state import InMemoryStore

FAKE_CONNECTOR = os.path.join(
    os.path.dirname(__file__), "assets", "fake_file_connector.py"
)
COMMAND = [sys.executable, FAKE_CONNECTOR]

MODEL_SQL = (
    "select event_id, ts, event_type from events "
    "where (:cursor is null or event_id >= :cursor) and event_id < 30 "
    "order by event_id asc"
)


def _sync(filename: str, destination) -> SyncDefinition:
    return SyncDefinition(
        id="stdio_sync",
        model=ModelDefinition(id="m", query=MODEL_SQL, cursor="event_id"),
        destination=destination,
        stream="raw",
        credentials={"filename": filename},
    )


def test_describe_and_streams():
    dest = StdioDestination(COMMAND, name="fake-file")
    spec = dest.describe()
    assert spec["name"] == "fake-file"
    assert "filename" in spec["connectionCredentials"]["properties"]
    streams = dest.streams()
    assert [s.name for s in streams] == ["raw"]


def test_stdio_sync_matches_in_process_file_sink(spark, testdata, tmp_path):
    """The external connector's NDJSON output is byte-identical to the
    in-process file sink's (ISO-millis dates included), and the connector's
    state RPC roundtrip leaves its marker in the engine's store."""
    store = InMemoryStore()
    stdio_out = str(tmp_path / "stdio.ndjson")
    result = run_sync(
        spark, _sync(stdio_out, StdioDestination(COMMAND)), store
    )
    assert result.stats.received == result.stats.success > 0

    ref_store = InMemoryStore()
    file_out = str(tmp_path / "file.ndjson")
    run_sync(spark, _sync(file_out, "file"), ref_store)

    with open(stdio_out) as f1, open(file_out) as f2:
        assert f1.read() == f2.read()

    # the connector wrote through the RPC side-channel into OUR store
    assert store.get(["syncId=stdio_sync", "fake-connector-marker"]) == {
        "started": True
    }


def test_stdio_incremental_second_run(spark, testdata, tmp_path):
    store = InMemoryStore()
    out1 = str(tmp_path / "p1.ndjson")
    run_sync(spark, _sync(out1, StdioDestination(COMMAND)), store)
    out2 = str(tmp_path / "p2.ndjson")
    result = run_sync(spark, _sync(out2, StdioDestination(COMMAND)), store)
    # inclusive >= boundary row only
    assert result.stats.success == 1


def test_halt_propagates():
    halting = [
        sys.executable,
        "-c",
        (
            "import sys, json\n"
            "for line in sys.stdin:\n"
            "    m = json.loads(line)\n"
            "    if m['type'] == 'start-stream':\n"
            "        print(json.dumps({'type': 'halt', "
            "'payload': {'message': 'credentials rejected'}}), flush=True)\n"
            "        break\n"
        ),
    ]
    dest = StdioDestination(halting)
    dest._spec_cache = [  # skip describe-streams against the one-trick child
        __import__(
            "syncmaven_spark.sinks.base", fromlist=["StreamSpec"]
        ).StreamSpec(name="raw", row_type={"type": "object"})
    ]
    out = dest.create_output_stream(
        "raw", {}, "s1", InMemoryStore(), options={}
    )
    with pytest.raises(HaltError, match="credentials rejected"):
        out.finish()


def test_state_rpc_list_and_size():
    """state.list streams NDJSON entries with segmented keys; state.size
    counts (docker-channel.ts:185-207)."""
    import json as _json
    import urllib.request

    from syncmaven_spark.sinks.stdio import StateRpcServer

    store = InMemoryStore()
    store.set(["p", "a"], 1)
    store.set(["p", "b"], {"x": 2})
    store.set(["q"], 3)
    rpc = StateRpcServer(store)
    try:
        def post(method, body):
            req = urllib.request.Request(
                f"{rpc.url}/{method}",
                data=_json.dumps(body).encode(),
                headers={"Content-Type": "application/json",
                         "Authorization": f"Bearer {rpc.token}"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=5) as resp:
                return resp.read().decode()

        lines = [l for l in post("state.list", {"prefix": ["p"]}).splitlines() if l]
        entries = [_json.loads(l) for l in lines]
        assert entries == [
            {"key": ["p", "a"], "value": 1},
            {"key": ["p", "b"], "value": {"x": 2}},
        ]
        # size is scoped to the requested prefix (docker-channel.ts:197-199),
        # not the engine's global store
        assert _json.loads(post("state.size", {"prefix": ["p"]}))["size"] == 2
        assert _json.loads(post("state.size", {}))["size"] == 3

        # wrong token → 401
        req = urllib.request.Request(
            f"{rpc.url}/state.get",
            data=b"{}",
            headers={"Authorization": "Bearer nope"},
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req, timeout=5)
    finally:
        rpc.close()


def test_stdio_as_project_package(spark, testdata, tmp_path):
    """`package: stdio` + credentials.command makes external connectors
    first-class project destinations — resolved through the same registry
    dispatch as built-in sinks, with the connector's advertised
    defaultStream honored for the compiler's 'default' fallback."""
    from syncmaven_spark.project import project_from_files

    out = tmp_path / "proj_out.ndjson"
    model = tmp_path / "m.sql"
    model.write_text(
        "select event_id, event_type from events where event_id < 5 "
        "order by event_id asc"
    )
    conn = tmp_path / "c.yml"
    conn.write_text(
        "package: stdio\n"
        "credentials:\n"
        f"  filename: {out}\n"
        "  command:\n"
        f"    - {sys.executable}\n"
        f"    - {FAKE_CONNECTOR}\n"
    )
    project = project_from_files(str(model), str(conn))
    sync = next(iter(project.syncs.values()))
    # unknown package → compiler falls back to stream "default"; the
    # connector advertises defaultStream=raw and the adapter maps it
    assert sync.stream == "default"
    result = run_sync(spark, sync, InMemoryStore())
    assert result.stats.success == 5
    assert len(out.read_text().splitlines()) == 5


def test_get_destination_stdio_requires_command():
    from syncmaven_spark.sinks import get_destination

    with pytest.raises(ValueError, match="command"):
        get_destination("stdio", {})
    dest = get_destination("stdio", {"command": COMMAND})
    assert [s.name for s in dest.streams()] == ["raw"]


def test_get_destination_docker_url_shape():
    from syncmaven_spark.sinks import get_destination

    dest = get_destination("docker://syncmaven/connector-demo")
    assert dest.command[:4] == ["docker", "run", "-i", "--rm"]
    assert dest.command[-1] == "syncmaven/connector-demo"
    assert dest._rpc_advertise == "host.docker.internal"
    # env crosses into the container only through -e (container.ts:206-211);
    # name-only form so the bearer token never appears on the host argv
    assert "RPC_URL" in dest.command and "RPC_TOKEN" in dest.command


_FAKE_DOCKER = '''#!{python}
"""Fake `docker` CLI for the docker:// end-to-end test.

Emulates the three behaviors of the real runtime the engine depends on,
and FAILS (exit 125) if the engine's argv contract is violated:

- env isolation: ONLY variables named by -e flags cross into the
  "container" process (a docker run without -e RPC_URL/-e RPC_TOKEN
  would leave the connector without its state channel);
- the host-gateway alias: host.docker.internal in forwarded values is
  rewritten to 127.0.0.1, exactly what --add-host=...:host-gateway
  resolves to from inside a container on the host network;
- -i keeps stdin open for the NDJSON protocol.
"""
import os, sys

args = sys.argv[1:]


def fail(msg):
    sys.stderr.write("fake-docker: " + msg + chr(10))
    sys.exit(125)


if not args or args[0] != "run":
    fail("expected `docker run ...`, got " + repr(args))
flags, image = args[1:-1], args[-1]
for required in ("-i", "--rm", "--add-host=host.docker.internal:host-gateway"):
    if required not in flags:
        fail("missing required flag " + required)
if image != "syncmaven/fake-file":
    fail("unknown image " + image)

container_env = {{"PATH": os.environ.get("PATH", "")}}
for i, flag in enumerate(flags):
    if flag == "-e":
        name = flags[i + 1]
        if name in os.environ:
            container_env[name] = os.environ[name].replace(
                "host.docker.internal", "127.0.0.1"
            )
if "RPC_TOKEN" in os.environ and "RPC_TOKEN" not in container_env:
    fail("RPC_TOKEN set on the client but not forwarded via -e")

os.execve({python!r}, [{python!r}, {connector!r}], container_env)
'''


@pytest.fixture()
def fake_docker_path(tmp_path):
    """A PATH dir whose `docker` validates the engine's argv and execs the
    fake connector with docker-faithful env semantics."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    script = bin_dir / "docker"
    script.write_text(
        _FAKE_DOCKER.format(python=sys.executable, connector=FAKE_CONNECTOR)
    )
    script.chmod(0o755)
    old = os.environ["PATH"]
    os.environ["PATH"] = f"{bin_dir}:{old}"
    yield str(bin_dir)
    os.environ["PATH"] = old


def test_docker_destination_golden_two_phase(
    spark, testdata, tmp_path, fake_docker_path
):
    """The FULL docker:// path — argv construction, RPC env injection via
    -e, 0.0.0.0 bind + host-gateway advertise, NDJSON protocol loop, state
    RPC through the rewritten gateway address — executed end-to-end with
    docker mocked at the subprocess boundary (no docker installed). Output
    must be byte-identical to the in-process file sink and the second run
    must emit only the inclusive cursor-boundary row."""
    from syncmaven_spark.sinks import get_destination

    store = InMemoryStore()
    out1 = str(tmp_path / "docker1.ndjson")
    result = run_sync(
        spark,
        _sync(out1, get_destination("docker://syncmaven/fake-file")),
        store,
    )
    assert result.stats.received == result.stats.success > 0

    # marker written by the connector through the RPC side-channel reached
    # OUR store via the rewritten host-gateway URL
    assert store.get(["syncId=stdio_sync", "fake-connector-marker"]) == {
        "started": True
    }

    ref_store = InMemoryStore()
    file_out = str(tmp_path / "file.ndjson")
    run_sync(spark, _sync(file_out, "file"), ref_store)
    with open(out1) as f1, open(file_out) as f2:
        assert f1.read() == f2.read()

    # two-phase: second run sees the cursor in the shared store
    out2 = str(tmp_path / "docker2.ndjson")
    second = run_sync(
        spark,
        _sync(out2, get_destination("docker://syncmaven/fake-file")),
        store,
    )
    assert second.stats.success == 1


def test_check_halt_preserves_reply_order():
    """check_halt must not rotate a queued non-halt reply to the queue tail:
    a connector that emits stream-result and exits leaves [stream-result,
    _eof]; a get+put peek would turn that into [_eof, stream-result] and
    finish() would report a dead connector despite having its result."""
    from syncmaven_spark.sinks.stdio import _ConnectorProcess

    proc = _ConnectorProcess(
        [
            sys.executable,
            "-c",
            (
                "import json\n"
                "print(json.dumps({'type': 'stream-result', "
                "'payload': {'received': 3, 'success': 3}}), flush=True)\n"
            ),
        ]
    )
    try:
        proc.proc.wait(timeout=10)
        proc._reader.join(timeout=10)  # queue now holds [stream-result, _eof]
        proc.check_halt()  # no halt queued → must not reorder
        proc.check_halt()
        reply = proc.expect("stream-result")
        assert reply["payload"]["success"] == 3
    finally:
        proc.close()


def test_check_halt_consumes_queued_halt():
    from syncmaven_spark.sinks.stdio import _ConnectorProcess

    proc = _ConnectorProcess(
        [
            sys.executable,
            "-c",
            (
                "import json\n"
                "print(json.dumps({'type': 'halt', "
                "'payload': {'message': 'quota exceeded'}}), flush=True)\n"
            ),
        ]
    )
    try:
        proc.proc.wait(timeout=10)
        proc._reader.join(timeout=10)
        with pytest.raises(HaltError, match="quota exceeded"):
            proc.check_halt()
        proc.check_halt()  # halt consumed; _eof head must not raise here
    finally:
        proc.close()
