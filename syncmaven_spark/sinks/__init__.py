"""Destination sinks.

Each sink preserves the reference connector's semantics (SURVEY §2C) behind
an in-process Python interface that mirrors the reference's stdio protocol
shape: describe → streams → start-stream → rows → end-stream → stats
(``packages/node-cdk/src/std.ts:31-186``). The subprocess/NDJSON boundary
disappears; the interface stays pluggable.
"""

from syncmaven_spark.sinks.base import (  # noqa: F401
    BatchingOutputStream,
    DestinationProvider,
    HaltError,
    OutputStream,
    RateLimitError,
    StreamSpec,
    StreamStats,
)

_REGISTRY: dict[str, type] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_destination(
    name: str, credentials: dict | None = None
) -> "DestinationProvider":
    """Instantiate a destination provider by package name (reference
    dispatches on npm package / docker image — sync.ts:75-106).

    Two external-process forms resolve to the stdio protocol adapter:

    - ``stdio`` — ``credentials["command"]`` is the argv of a connector
      process speaking the NDJSON protocol;
    - ``docker://<image>`` — the reference's Docker packaging: runs the
      image with ``-i`` and the ``host.docker.internal`` host-gateway alias
      so the container can reach the engine's state RPC
      (container.ts:104-151,206-208).
    """
    import importlib

    if name.startswith("docker://"):
        from syncmaven_spark.sinks.stdio import StdioDestination

        image = name.removeprefix("docker://")
        return StdioDestination(
            [
                "docker", "run", "-i", "--rm",
                "--add-host=host.docker.internal:host-gateway",
                # name-only -e: docker forwards the values from the client
                # process env (which _ConnectorProcess sets per stream) into
                # the container — the reference passes the same pair via the
                # container Env config (container.ts:206-211); the name-only
                # form keeps the bearer token off the host argv/ps output
                "-e", "RPC_URL", "-e", "RPC_TOKEN",
                image,
            ],
            name=image,
            rpc_bind="0.0.0.0",
            rpc_advertise="host.docker.internal",
        )

    for mod in (
        "file",
        "http",
        "hubspot",
        "intercom",
        "facebook_ads",
        "twitter_ads",
        "resend",
        "google_sheets",
        "mixpanel",
    ):
        try:
            importlib.import_module(f"syncmaven_spark.sinks.{mod}")
        except ModuleNotFoundError:
            pass

    short = name.split("/")[-1].removeprefix("connector-")
    if short == "stdio":
        from syncmaven_spark.sinks.stdio import StdioDestination

        command = (credentials or {}).get("command")
        if not command:
            raise ValueError(
                "stdio destination needs credentials['command'] — the argv "
                "of a connector process speaking the NDJSON protocol"
            )
        return StdioDestination(list(command))
    if short not in _REGISTRY:
        raise KeyError(f"unknown destination {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[short]()
