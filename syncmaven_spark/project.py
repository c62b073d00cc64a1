"""Project compilation: directory convention → validated sync definitions.

Reference: ``packages/core/src/lib/project.ts:131-278`` and ``template.ts`` —
- a project directory holds ``models/`` (``.sql``/``.yaml``/``.json``),
  ``syncs/`` and ``connections/`` (``.yaml``/``.json``); the file basename
  (before the first dot) is the object id unless the object declares one,
- inline destinations in syncs are unfolded into the connections section
  (project.ts:168-185),
- templating: ``{{ env.X }}`` (missing → empty string) and the legacy
  ``${env.X}`` / ``${env.X:default}`` syntax (missing without default →
  error) over every string leaf (template.ts:69-88),
- SQL model files may carry ``{{ config "field" "value" }}`` directives whose
  values are hoisted into model fields (e.g. cursor) (project.ts:196-226),
- connections are compiled with the ``result`` context mapping
  ``{{ result.rows }}`` → ``[RESULT_ROWS]`` etc. for the HTTP sink's body
  templates (project.ts:246-251),
- ``.env`` / ``.env.local`` are loaded without overriding the real
  environment (project.ts:55-74).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import yaml

from syncmaven_spark.runner import ModelDefinition, SyncDefinition

_ENV_NEW_RE = re.compile(r"\{\{\s*env\.([A-Za-z0-9_]+)\s*\}\}")
_ENV_LEGACY_RE = re.compile(r"\$\{([a-zA-Z0-9_.-]+)(?::([^}]*))?\}")
# one combined scan so a substituted VALUE is never re-parsed as a template
# (an env var containing '${cd}' used to abort loading, and one containing
# '${env.OTHER}' silently expanded — round-5 review)
_ENV_BOTH_RE = re.compile(
    rf"(?:{_ENV_NEW_RE.pattern})|(?:{_ENV_LEGACY_RE.pattern})"
)
_CONFIG_RE = re.compile(r"\{\{\s*config\s+\"([^\"]+)\"\s+\"([^\"]*)\"\s*\}\}")
_RESULT_RE = re.compile(r"\{\{\s*result\.(rows|row|length)\s*\}\}")
_RESULT_MACROS = {
    "rows": "[RESULT_ROWS]",
    "row": "[RESULT_ROW]",
    "length": "[RESULT_LENGTH]",
}


class ProjectError(ValueError):
    pass


def configure_env_vars(dirs: list[str]) -> None:
    """Load ``.env`` then ``.env.local`` into os.environ; real environment
    variables win (project.ts:55-74)."""
    for d in dirs:
        for name in (".env", ".env.local"):
            path = os.path.join(d, name)
            if not os.path.exists(path):
                continue
            for line in open(path, encoding="utf-8"):
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                key, _, value = line.partition("=")
                key, value = key.strip(), value.strip().strip("'\"")
                os.environ.setdefault(key, value)


def render_template(
    text: str,
    env: dict[str, str] | None = None,
    config_cb: Callable[[str, str], None] | None = None,
    result_macros: bool = False,
    file_name: str = "<inline>",
) -> str:
    """Apply the template syntaxes to one string leaf."""
    env = env if env is not None else dict(os.environ)

    def config_sub(m: re.Match) -> str:
        if config_cb is not None:
            config_cb(m.group(1), m.group(2))
        return ""

    text = _CONFIG_RE.sub(config_sub, text)
    if result_macros:
        text = _RESULT_RE.sub(lambda m: _RESULT_MACROS[m.group(1)], text)

    def env_sub(m: re.Match) -> str:
        if m.group(1) is not None:  # {{ env.NAME }}
            return env.get(m.group(1), "")
        var, default = m.group(2).strip(), m.group(3)  # ${env.NAME[:default]}
        prefix, _, name = var.partition(".")
        if prefix != "env":
            raise ProjectError(
                f"Unsupported placeholder ${{{var}}} in {file_name}. Only "
                f"${{env.NAME}} placeholders are supported."
            )
        value = env.get(name)
        if value is None:
            if default is None:
                raise ProjectError(
                    f"Environment variable {var} is not set. It's used in {file_name}"
                )
            return default.strip()
        return value

    # both syntaxes substitute in ONE pass over the original text: a value
    # containing '${...}' or '{{ env... }}' passes through verbatim
    return _ENV_BOTH_RE.sub(env_sub, text)


def _render_deep(obj: Any, **kw) -> Any:
    if isinstance(obj, str):
        return render_template(obj, **kw)
    if isinstance(obj, dict):
        return {k: _render_deep(v, **kw) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_render_deep(v, **kw) for v in obj]
    return obj


@dataclass
class ConnectionDefinition:
    id: str
    package: str  # destination package/name, e.g. "file", "hubspot"
    credentials: dict[str, Any] = field(default_factory=dict)


@dataclass
class Project:
    models: dict[str, ModelDefinition] = field(default_factory=dict)
    connections: dict[str, ConnectionDefinition] = field(default_factory=dict)
    syncs: dict[str, SyncDefinition] = field(default_factory=dict)


def _file_id(path: str) -> str:
    return os.path.basename(path).split(".")[0]


def _read_config_file(path: str) -> str | dict[str, Any]:
    if path.endswith(".sql"):
        return open(path, encoding="utf-8").read()
    if path.endswith((".yaml", ".yml")):
        return yaml.safe_load(open(path, encoding="utf-8"))
    if path.endswith(".json"):
        return json.load(open(path, encoding="utf-8"))
    raise ProjectError(f"unsupported config file type: {path}")


def _list_dir(dir_path: str) -> list[str]:
    if not os.path.isdir(dir_path):
        return []
    return sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.endswith((".sql", ".yaml", ".yml", ".json"))
    )


def _parse_model_file(path: str, env: dict[str, str]) -> ModelDefinition:
    content = _read_config_file(path)
    if isinstance(content, str):
        # SQL file: config directives hoist into model fields
        fields: dict[str, Any] = {}

        def config_cb(key: str, value: str) -> None:
            fields[key] = value

        query = render_template(
            content, env=env, config_cb=config_cb, file_name=path
        ).strip()
        fields = {
            k: render_template(v, env=env, file_name=path) if isinstance(v, str) else v
            for k, v in fields.items()
        }
        return ModelDefinition(
            id=fields.get("id", _file_id(path)),
            query=query,
            cursor=fields.get("cursor"),
            datasource=fields.get("datasource"),
            dialect=fields.get("dialect"),
            page_size=_opt_int(fields.get("pageSize")),
            pause_between_pages_ms=_opt_int(fields.get("pauseBetweenPagesMs")),
        )
    content = _render_deep(content, env=env, file_name=path)
    return ModelDefinition(
        id=content.get("id", _file_id(path)),
        query=content["query"],
        cursor=content.get("cursor"),
        datasource=content.get("datasource"),
        dialect=content.get("dialect"),
        page_size=_opt_int(content.get("pageSize")),
        pause_between_pages_ms=_opt_int(content.get("pauseBetweenPagesMs")),
    )


def _opt_int(v):
    return int(v) if v is not None else None


def _parse_connection_file(path: str, env: dict[str, str]) -> ConnectionDefinition:
    content = _read_config_file(path)
    if isinstance(content, str):
        raise ProjectError(
            f"Connection {path} should be defined in YAML or JSON format"
        )
    content = _render_deep(content, env=env, result_macros=True, file_name=path)
    conn_id = content.get("id", _file_id(path))
    return ConnectionDefinition(
        id=conn_id,
        # fallback chain ends at the resolved id (a bare credentials-only
        # file used to crash with a raw KeyError('id') here)
        package=content.get("package") or content.get("kind") or conn_id,
        credentials=content.get("credentials", {}),
    )


def read_project(project_dir: str, env: dict[str, str] | None = None) -> Project:
    """readProject + compileProject in one pass."""
    if not os.path.isdir(project_dir):
        raise ProjectError(f"Project directory {project_dir} does not exist")
    syncs_dir = os.path.join(project_dir, "syncs")
    if not os.path.isdir(syncs_dir):
        raise ProjectError(
            f"Sync directory ./syncs does not exist in the project directory {project_dir}"
        )
    configure_env_vars([project_dir])
    env = env if env is not None else dict(os.environ)

    project = Project()

    for path in _list_dir(os.path.join(project_dir, "models")):
        model = _parse_model_file(path, env)
        if model.id in project.models:
            # last-writer-wins would silently ignore one of the files
            # (e.g. users.sql + users.yaml both resolve to id 'users')
            raise ProjectError(f"Duplicate model id {model.id!r} ({path})")
        project.models[model.id] = model

    for path in _list_dir(os.path.join(project_dir, "connections")):
        conn = _parse_connection_file(path, env)
        if conn.id in project.connections:
            raise ProjectError(f"Duplicate connection id {conn.id!r} ({path})")
        project.connections[conn.id] = conn

    raw_syncs = []
    for path in _list_dir(syncs_dir):
        content = _read_config_file(path)
        if isinstance(content, str):
            raise ProjectError(f"Sync {path} should be defined in YAML or JSON format")
        content = _render_deep(content, env=env, file_name=path)
        content.setdefault("id", _file_id(path))
        raw_syncs.append(content)

    # unfold inline destinations (project.ts:168-185)
    for raw in raw_syncs:
        destination = raw.get("destination")
        if isinstance(destination, dict):
            package = destination.get("package") or destination.get("kind")
            if not package:
                raise ProjectError(
                    f"Sync {raw['id']}: inline destination needs a "
                    "'package' (or 'kind') field"
                )
            conn_id = raw["id"]
            while conn_id in project.connections:
                conn_id += "_conn"
            project.connections[conn_id] = ConnectionDefinition(
                id=conn_id,
                package=package,
                credentials=destination.get("credentials", {}),
            )
            raw["destination"] = conn_id

    for raw in raw_syncs:
        model_id = raw.get("model")
        conn_id = raw.get("destination")
        if model_id not in project.models:
            raise ProjectError(f"Sync {raw['id']} references unknown model {model_id!r}")
        if conn_id not in project.connections:
            raise ProjectError(
                f"Sync {raw['id']} references unknown connection {conn_id!r}"
            )
        conn = project.connections[conn_id]
        options = dict(raw.get("options") or {})
        # checkpointEvery is a TOP-LEVEL sync field in the reference
        # (objects.ts:55, read at sync.ts:359) — it used to be silently
        # dropped unless nested under options, disabling mid-run
        # checkpoints for reference-style projects
        if "checkpointEvery" in raw and "checkpointEvery" not in options:
            options["checkpointEvery"] = raw["checkpointEvery"]
        if raw["id"] in project.syncs:
            raise ProjectError(f"Duplicate sync id {raw['id']!r}")
        project.syncs[raw["id"]] = SyncDefinition(
            id=raw["id"],
            model=project.models[model_id],
            destination=conn.package,
            stream=raw.get("stream") or _default_stream(conn.package),
            credentials=conn.credentials,
            options=options,
            enrichments=_compile_enrichments(raw),
        )
    return project


def _compile_enrichments(raw_sync: dict[str, Any]) -> list[Any]:
    """Sync-level ``enrichment:`` / ``enrichments:`` entries → Enrichment
    instances (the reference accepts both keys, sync.ts:430-434). Supported
    form: ``{url: ..., timeout?: ms}`` → HTTP enrichment service."""
    from syncmaven_spark.enrich import HttpEnrichment

    # the reference's getEnrichments is enrichments OR enrichment
    # (objects.ts:59-61) — the plural key takes precedence; concatenating
    # both would run the same enrichment twice per row
    entries = raw_sync.get("enrichments")
    if not entries:
        single = raw_sync.get("enrichment")
        entries = [single] if single else []
    out = []
    for entry in entries:
        if isinstance(entry, dict) and entry.get("url"):
            out.append(
                HttpEnrichment(entry["url"], timeout_ms=entry.get("timeout", 10_000))
            )
        else:
            raise ProjectError(
                f"unsupported enrichment spec {entry!r}: expected {{url: ...}}"
            )
    return out


def _default_stream(package: str) -> str:
    defaults = {
        "file": "raw",
        "http": "default",
        "hubspot": "contacts",
        "intercom": "contacts",
        "facebook-ads": "audience",
        "twitter-ads": "audience",
        "resend": "audience",
        "google-sheets": "sheet",
        "mixpanel": "AdData",
    }
    return defaults.get(package.split("/")[-1].removeprefix("connector-"), "default")


def ad_hoc_project(
    model_query: str,
    package: str,
    credentials: dict[str, Any],
    cursor: str | None = None,
    stream: str | None = None,
    sync_id: str = "adhoc",
) -> Project:
    """CLI ad-hoc sync: synthesize a one-model/one-connection/one-sync project
    in memory (sync.ts:160-227)."""
    model = ModelDefinition(id=f"{sync_id}_model", query=model_query, cursor=cursor)
    conn = ConnectionDefinition(id=f"{sync_id}_conn", package=package, credentials=credentials)
    sync = SyncDefinition(
        id=sync_id,
        model=model,
        destination=package,
        stream=stream or _default_stream(package),
        credentials=credentials,
    )
    return Project(
        models={model.id: model},
        connections={conn.id: conn},
        syncs={sync.id: sync},
    )


def project_from_files(
    model_file: str,
    connection_file: str,
    sync: str | None = None,
    env: dict[str, str] | None = None,
) -> Project:
    """connector-dev's project synthesizer (connector-dev.ts:13-70): build a
    one-model/one-connection/one-sync project from explicit files.

    ``sync`` is either a path to a sync yaml/json file or a sync id; when it
    is an id (or omitted), a minimal ``{id, model, destination}`` sync is
    synthesized exactly like the reference (connector-dev.ts:39-52) — the
    same entry point the reference's golden-file integration harness drives
    (__tests__/integration/lib.ts:69-74).
    """
    env = env if env is not None else dict(os.environ)
    model = _parse_model_file(model_file, env)
    conn = _parse_connection_file(connection_file, env)

    if sync and os.path.exists(sync):
        content = _read_config_file(sync)
        if isinstance(content, str):
            raise ProjectError(f"Sync {sync} should be defined in YAML or JSON format")
        content = _render_deep(content, env=env, file_name=sync)
        content.setdefault("id", _file_id(sync))
    else:
        content = {"id": sync or "sync", "model": model.id, "destination": conn.id}

    # the sync file may omit model/destination (they're unambiguous here);
    # when present they must agree with the files provided
    if "model" in content and content["model"] != model.id:
        raise ProjectError(
            f"Sync references model {content['model']!r} but the model "
            f"file defines {model.id!r}"
        )
    if "destination" in content and content["destination"] not in (
        conn.id,
        conn.package,
    ):
        raise ProjectError(
            f"Sync references destination {content['destination']!r} but the "
            f"connection file defines {conn.id!r} (package {conn.package!r})"
        )
    options = dict(content.get("options") or {})
    # top-level checkpointEvery hoists into options exactly like
    # read_project (objects.ts:55) — the fix had been applied to only one
    # of the two sync-compilation paths (round-5 review)
    if "checkpointEvery" in content and "checkpointEvery" not in options:
        options["checkpointEvery"] = content["checkpointEvery"]
    sync_def = SyncDefinition(
        id=content["id"],
        model=model,
        destination=conn.package,
        stream=content.get("stream") or _default_stream(conn.package),
        credentials=conn.credentials,
        options=options,
        enrichments=_compile_enrichments(content),
    )
    return Project(
        models={model.id: model},
        connections={conn.id: conn},
        syncs={sync_def.id: sync_def},
    )
