"""Model server: HTTP inference over exported StableHLO artifacts.

The deployment story end-to-end: ``mrssm-export`` freezes a trained run
into ``*.jaxexport`` artifacts (io/export.py — weights baked in, no model
code needed), and this module serves them over HTTP so a robot controller
or logger can call the posterior filter / decoder / full agent step from
any language.  The reference has no serving path at all — its inference
lives inside ``check_model.ipynb`` against the live torch modules, so
deploying it means shipping the whole research codebase plus a torch
runtime.

Design:

- **Stateless**: the recurrent (belief, state) carry travels with the
  client, matching the artifact calling convention — the server scales
  horizontally and a controller can fail over mid-episode.
- **Binary npz protocol**: request body = ``.npz`` of named input arrays,
  response = ``.npz`` of named outputs.  Nested pytrees flatten to dotted
  keys (``obs.image_horizon``, ``posterior_states``); every language with
  a numpy-compatible reader can speak it, and there is no base64/JSON
  float overhead on megabyte image frames.
- **Threaded** stdlib ``http.server``: JAX dispatch is thread-safe and the
  per-call work is one device program; no external web framework needed.

Endpoints:

    GET  /healthz            -> {"status": "ok"}
    GET  /v1/info            -> artifact names, input/output signatures,
                                lowering platforms
    POST /v1/call/<artifact> -> npz in, npz out

Client sketch::

    buf = io.BytesIO(); np.savez(buf, h=h, s=s, action=a,
                                 **{"obs." + k: v for k, v in obs.items()},
                                 nonterminal=nt, key=key_data)
    r = urllib.request.urlopen(url + "/v1/call/filter_step", buf.getvalue())
    out = dict(np.load(io.BytesIO(r.read())))
"""

from __future__ import annotations

import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

SEP = "."


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Pytree of arrays -> flat {dotted key: array} dict (dict/list/tuple
    containers; leaves are array-likes)."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}{SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}{SEP}"))
    else:
        out[prefix[:-1] if prefix else "value"] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]):
    """Inverse of :func:`flatten_tree` (dict nodes only — positional
    artifact args are reassembled by the caller from known names)."""
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


class ArtifactStore:
    """Loads every ``*.jaxexport`` in a directory and dispatches calls.

    Each artifact's positional calling convention is recovered from its
    recorded input signature: a flat request dict is split into the
    positional args by argument name prefix (``h``, ``s``, ``action``,
    ``obs.*``, ``nonterminal``, ``key`` for filter/agent steps; ``h``,
    ``s`` for decode) — the signature travels with the artifact, so the
    server needs no model- or config-specific code.
    """

    # positional arg-name conventions per artifact (io/export.py)
    ARG_NAMES = {
        "filter_step": ("h", "s", "action", "obs", "nonterminal", "key"),
        "agent_step": ("h", "s", "action", "obs", "nonterminal", "key"),
        "plan_step": ("h", "s", "action", "obs", "nonterminal", "key"),
        "decode": ("h", "s"),
    }

    def __init__(self, artifact_dir: str):
        from multimodal_rssm_tpu.io.export import load_exported

        self.artifacts = {}
        for name in sorted(os.listdir(artifact_dir)):
            if name.endswith(".jaxexport"):
                self.artifacts[name[: -len(".jaxexport")]] = load_exported(
                    os.path.join(artifact_dir, name))
        if not self.artifacts:
            raise FileNotFoundError(
                f"no *.jaxexport artifacts in {artifact_dir} — run "
                "scripts/export_model.py first")
        self._locks = {n: threading.Lock() for n in self.artifacts}

    def info(self) -> Dict[str, Any]:
        out = {}
        for name, exp in self.artifacts.items():
            out[name] = {
                "platforms": list(exp.platforms),
                "arg_names": list(self.ARG_NAMES.get(name, ())),
                "in_avals": [str(a) for a in exp.in_avals],
                "out_avals": [str(a) for a in exp.out_avals],
            }
        return out

    def call(self, name: str, flat_inputs: Dict[str, np.ndarray]):
        if name not in self.artifacts:
            raise KeyError(
                f"unknown artifact {name!r}; have {sorted(self.artifacts)}")
        exp = self.artifacts[name]
        arg_names = self.ARG_NAMES.get(name)
        if arg_names is None:
            raise KeyError(f"no calling convention for {name!r}")
        tree = unflatten_tree(flat_inputs)
        missing = [a for a in arg_names if a not in tree]
        if missing:
            raise ValueError(
                f"{name}: missing inputs {missing}; got {sorted(tree)}")
        args = [tree[a] for a in arg_names]
        # one call at a time per artifact: exported calls are cheap to
        # queue and this keeps device memory bounded under client bursts
        with self._locks[name]:
            result = exp.call(*args)
        return flatten_tree(result)


class _Handler(BaseHTTPRequestHandler):
    store: ArtifactStore  # set by make_server
    quiet = True

    def log_message(self, fmt, *args):  # stdlib default logs every request
        if not self.quiet:
            super().log_message(fmt, *args)

    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj):
        self._send(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):
        if self.path == "/healthz":
            self._send_json(200, {"status": "ok"})
        elif self.path == "/v1/info":
            self._send_json(200, self.store.info())
        else:
            self._send_json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        prefix = "/v1/call/"
        if not self.path.startswith(prefix):
            self._send_json(404, {"error": f"unknown path {self.path}"})
            return
        name = self.path[len(prefix):]
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = self.rfile.read(length)
            with np.load(io.BytesIO(payload)) as z:
                flat = {k: z[k] for k in z.files}
            out = self.store.call(name, flat)
            buf = io.BytesIO()
            np.savez(buf, **out)
            self._send(200, buf.getvalue(), "application/octet-stream")
        except (KeyError, ValueError) as e:
            self._send_json(400, {"error": str(e)})
        except Exception as e:  # surface the failure to the client
            self._send_json(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(artifact_dir: str, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``.server_address`` has the
    bound port (port=0 picks a free one)."""
    store = ArtifactStore(artifact_dir)
    handler = type("Handler", (_Handler,), {"store": store})
    return ThreadingHTTPServer((host, port), handler)


def serve_forever(artifact_dir: str, host: str = "127.0.0.1",
                  port: int = 8000):
    httpd = make_server(artifact_dir, host, port)
    names = sorted(httpd.RequestHandlerClass.store.artifacts)
    print(f"serving artifacts {names} from {artifact_dir} "
          f"on http://{host}:{httpd.server_address[1]}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
