"""A stand-alone connector process speaking the reference's NDJSON stdio
protocol (packages/node-cdk/src/std.ts:31-186) — the child side of the
StdioDestination adapter test.

Behaves like the reference ``file`` connector
(packages/connectors/file/src/index.ts:16-46): appends each row as one JSON
line to ``credentials.filename``. Also exercises the state RPC side-channel
(std.ts:188-262): on start-stream it writes a marker key through RPC_URL
and reads it back, proving the loopback store works end-to-end.

Stdlib only — this file is executed as a subprocess, not imported.
"""

import json
import os
import sys
import urllib.request


def reply(msg_type, payload):
    sys.stdout.write(json.dumps({"type": msg_type, "payload": payload}) + "\n")
    sys.stdout.flush()


def log(level, message):
    reply("log", {"level": level, "message": message})


def rpc(method, body):
    req = urllib.request.Request(
        f"{os.environ['RPC_URL']}/{method}",
        data=json.dumps(body).encode(),
        headers={
            "Content-Type": "application/json",
            "Authorization": "Bearer " + os.environ.get("RPC_TOKEN", ""),
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.read().decode()


def main():
    out = None
    received = success = failed = 0
    for line in sys.stdin:
        line = line.strip()
        if not line:
            break
        message = json.loads(line)
        mtype = message.get("type")
        if mtype == "describe":
            reply(
                "spec",
                {
                    "description": "fake-file",
                    "roles": ["destination"],
                    "connectionCredentials": {
                        "type": "object",
                        "properties": {"filename": {"type": "string"}},
                        "required": ["filename"],
                    },
                },
            )
        elif mtype == "describe-streams":
            reply(
                "stream-spec",
                {
                    "roles": ["destination"],
                    "defaultStream": "raw",
                    "streams": [
                        {"name": "raw", "rowType": {"type": "object"}}
                    ],
                },
            )
        elif mtype == "start-stream":
            payload = message["payload"]
            filename = payload["connectionCredentials"]["filename"]
            out = open(filename, "a", encoding="utf-8")
            log("info", f"stream {payload['stream']} started -> {filename}")
            # state side-channel roundtrip: persist a marker the test asserts
            sync_id = payload.get("syncId", "sync")
            rpc(
                "state.set",
                {"key": [f"syncId={sync_id}", "fake-connector-marker"],
                 "value": {"started": True}},
            )
            got = json.loads(rpc(
                "state.get",
                {"key": [f"syncId={sync_id}", "fake-connector-marker"]},
            ))
            if got != {"started": True}:
                reply("halt", {"message": f"state roundtrip failed: {got}"})
                return
        elif mtype == "row":
            received += 1
            try:
                # compact separators = the reference file connector's
                # JSON.stringify byte format (golden-file comparable)
                out.write(
                    json.dumps(
                        message["payload"]["row"],
                        ensure_ascii=False,
                        separators=(",", ":"),
                    )
                    + "\n"
                )
                success += 1
            except Exception as e:  # noqa: BLE001
                failed += 1
                log("error", f"row failed: {e}")
        elif mtype == "end-stream":
            if out is not None:
                out.close()
            reply(
                "stream-result",
                {"received": received, "skipped": 0, "success": success,
                 "failed": failed},
            )
            return


if __name__ == "__main__":
    main()
