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


def get_destination(name: str) -> "DestinationProvider":
    """Instantiate a registered destination provider by package name
    (reference dispatches on npm package / docker image — sync.ts:75-106)."""
    import importlib

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
    if short not in _REGISTRY:
        raise KeyError(f"unknown destination {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[short]()
