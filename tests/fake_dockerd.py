"""A minimal in-process Docker Engine API daemon + CLI shim for e2e tests.

No dockerd exists in this sandbox, so the closest honest proof for the
docker executor's state machine (chyme_spark/runner.py docker_executor,
parity target ref internal/core/executor_docker.go:36-128) is to drive
it end-to-end through the REAL wire protocol rather than a canned-output
stub: a threaded HTTP server speaks the handful of Docker Engine API
endpoints the executor's CLI calls reduce to (container list/inspect/
create/start/wait/kill/remove/logs, image pull), holding REAL container
state — named containers with binds/env/image, a simulated process with
a configurable runtime and exit code, blocking ``wait``, kill -> 137.

The ``docker`` CLI the executor shells out to is a stdlib-only shim
(written to a temp bin dir by the test fixture) that translates the
exact argv forms runner.py emits into Engine-API HTTP requests against
``DOCKER_HOST`` and prints what the real CLI prints (ids from ``ps -aq``,
format output from ``inspect -f``, the status code from ``wait``).  The
executor code itself is untouched and unaware it is not talking to a
real daemon.
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse


class _Container:
    def __init__(self, cid: str, name: str, image: str, binds: list[str],
                 env: list[str], user: str | None):
        self.id = cid
        self.name = name
        self.image = image
        self.binds = binds
        self.env = env
        self.user = user
        self.status = "created"          # created | running | exited
        self.exit_code: int | None = None
        self.done = threading.Event()    # set when the simulated process exits


class FakeDockerDaemon:
    """Threaded HTTP server holding real (simulated) container state.

    Knobs for tests:
      * ``exit_code`` — status the next simulated process exits with;
      * ``runtime_s`` — how long the simulated process runs after start;
      * ``requests`` — ordered log of (METHOD, path) pairs received;
      * ``create_count`` / ``pulled`` — wire-level counters.
    """

    def __init__(self) -> None:
        self.containers: dict[str, _Container] = {}
        self.exit_code = 0
        self.runtime_s = 0.0
        self.requests: list[tuple[str, str]] = []
        self.create_count = 0
        # last create body (name, image, binds, env, user): lets tests
        # assert what the wire actually carried without racing the
        # container's lifecycle (it may be deleted before a test looks)
        self.last_create: dict | None = None
        self.pulled: list[str] = []
        self._seq = 0
        self._lock = threading.Lock()
        daemon = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence test output
                pass

            def _reply(self, code: int, body=None):
                data = b"" if body is None else json.dumps(body).encode()
                self.send_response(code)
                if data:
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                if data:
                    self.wfile.write(data)

            def _route(self):
                url = urlparse(self.path)
                # strip the /v1.xx API version prefix the real CLI sends
                path = re.sub(r"^/v[\d.]+", "", url.path)
                daemon.requests.append((self.command, path))
                qs = parse_qs(url.query)
                body = {}
                n = int(self.headers.get("Content-Length") or 0)
                if n:
                    raw = self.rfile.read(n)
                    if raw.strip():
                        body = json.loads(raw)

                if self.command == "GET" and path == "/containers/json":
                    # docker ps -aq --filter name=^NAME$
                    filters = json.loads(unquote(qs.get("filters", ["{}"])[0]))
                    pats = [re.compile(p) for p in filters.get("name", [])]
                    out = [
                        {"Id": c.id, "Names": [f"/{c.name}"], "Image": c.image,
                         "State": c.status}
                        for c in daemon.containers.values()
                        if not pats or any(p.search(c.name) for p in pats)
                    ]
                    return self._reply(200, out)

                m = re.match(r"^/containers/([^/]+)(/.*)?$", path)
                if self.command == "POST" and path == "/containers/create":
                    name = qs.get("name", [""])[0]
                    if not body.get("Image"):
                        return self._reply(400, {"message": "Image required"})
                    if name in daemon.containers:
                        return self._reply(409, {"message": f"name {name} in use"})
                    with daemon._lock:
                        daemon._seq += 1
                        cid = f"f{daemon._seq:06d}" + "0" * 58
                    c = _Container(
                        cid, name, body["Image"],
                        list((body.get("HostConfig") or {}).get("Binds") or []),
                        list(body.get("Env") or []), body.get("User") or None,
                    )
                    daemon.containers[name] = c
                    daemon.create_count += 1
                    daemon.last_create = {
                        "name": name, "image": c.image, "binds": list(c.binds),
                        "env": list(c.env), "user": c.user,
                    }
                    return self._reply(201, {"Id": cid, "Warnings": []})

                if self.command == "POST" and path == "/images/create":
                    daemon.pulled.append(qs.get("fromImage", [""])[0])
                    return self._reply(200, {"status": "Download complete"})

                if not m:
                    return self._reply(404, {"message": f"no route {path}"})
                key, verb = m.group(1), (m.group(2) or "")
                c = daemon.containers.get(key) or next(
                    (x for x in daemon.containers.values() if x.id.startswith(key)),
                    None,
                )
                if c is None:
                    return self._reply(404, {"message": f"No such container: {key}"})

                if self.command == "GET" and verb == "/json":
                    return self._reply(200, {
                        "Id": c.id, "Name": f"/{c.name}",
                        "Config": {"Image": c.image, "Env": c.env, "User": c.user or ""},
                        "HostConfig": {"Binds": c.binds},
                        "State": {"Status": c.status, "ExitCode": c.exit_code or 0},
                    })
                if self.command == "GET" and verb == "/logs":
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.end_headers()
                    self.wfile.write(b"container log tail\n")
                    return None
                if self.command == "POST" and verb == "/start":
                    c.status = "running"
                    c.done.clear()
                    code, dur = daemon.exit_code, daemon.runtime_s

                    def finish():
                        if c.status == "running":  # not killed meanwhile
                            c.status, c.exit_code = "exited", code
                            c.done.set()

                    threading.Timer(dur, finish).start() if dur else finish()
                    return self._reply(204)
                if self.command == "POST" and verb == "/wait":
                    c.done.wait()
                    return self._reply(200, {"StatusCode": c.exit_code or 0})
                if self.command == "POST" and verb == "/kill":
                    c.status, c.exit_code = "exited", 137
                    c.done.set()
                    return self._reply(204)
                if self.command == "DELETE" and verb == "":
                    daemon.containers.pop(c.name, None)
                    return self._reply(204)
                return self._reply(404, {"message": f"no route {self.command} {path}"})

            do_GET = do_POST = do_DELETE = _route

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "FakeDockerDaemon":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # convenience for tests: pre-create a container through the public API
    # shape (same dict the CLI shim would POST)
    def seed(self, name: str, image: str, binds: list[str]) -> None:
        with self._lock:
            self._seq += 1
            cid = f"f{self._seq:06d}" + "0" * 58
        self.containers[name] = _Container(cid, name, image, binds, [], None)


# ---------------------------------------------------------------------------
# The CLI shim: translates runner.py's exact docker argv forms into Engine
# API requests against $DOCKER_HOST (tcp://127.0.0.1:PORT). stdlib only.
# ---------------------------------------------------------------------------
CLI_SHIM = r'''#!/usr/bin/env python3
import json, os, re, sys, urllib.request, urllib.error, urllib.parse

base = os.environ["DOCKER_HOST"].replace("tcp://", "http://")

def call(method, path, body=None, timeout=600):
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(base + path, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            raw = r.read()
            return r.status, (json.loads(raw) if raw.strip() else None)
    except urllib.error.HTTPError as e:
        msg = e.read().decode() or str(e)
        print(f"Error response from daemon: {msg}", file=sys.stderr)
        sys.exit(1)

args = sys.argv[1:]
cmd, rest = args[0], args[1:]

if cmd == "ps":
    # ps -aq --filter name=^NAME$
    pat = next((a.split("=", 1)[1] for a in rest if a.startswith("name=")), None)
    if pat is None:
        pat = next(a.split("=", 1)[1] for a in rest if "name=" in a)
    filters = urllib.parse.quote(json.dumps({"name": [pat]}))
    _, out = call("GET", f"/containers/json?all=1&filters={filters}")
    for c in out:
        print(c["Id"][:12])
elif cmd == "inspect":
    # inspect -f '{{range .HostConfig.Binds}}{{println .}}{{end}}' NAME
    name = rest[-1]
    _, c = call("GET", f"/containers/{name}/json")
    fmt = rest[rest.index("-f") + 1] if "-f" in rest else ""
    if ".HostConfig.Binds" in fmt:
        for b in c["HostConfig"]["Binds"]:
            print(b)
    else:
        print(json.dumps([c]))
elif cmd == "create":
    name = rest[rest.index("--name") + 1]
    binds = [rest[i + 1] for i, a in enumerate(rest) if a == "-v"]
    env = [rest[i + 1] for i, a in enumerate(rest) if a == "-e"]
    user = rest[rest.index("--user") + 1] if "--user" in rest else None
    image = rest[-1]
    body = {"Image": image, "Env": env, "HostConfig": {"Binds": binds}}
    if user:
        body["User"] = user
    q = urllib.parse.quote(name)
    _, out = call("POST", f"/containers/create?name={q}", body)
    print(out["Id"][:12])
elif cmd == "pull":
    img = rest[-1]
    q = urllib.parse.quote(img)
    call("POST", f"/images/create?fromImage={q}")
    print(f"Status: Image is up to date for {img}")
elif cmd == "start":
    call("POST", f"/containers/{rest[-1]}/start")
    print(rest[-1])
elif cmd == "wait":
    _, out = call("POST", f"/containers/{rest[-1]}/wait")
    print(out["StatusCode"])
elif cmd == "kill":
    call("POST", f"/containers/{rest[-1]}/kill")
    print(rest[-1])
elif cmd == "rm":
    name = rest[-1]
    call("DELETE", f"/containers/{name}?force=true")
    print(name)
elif cmd == "logs":
    name = rest[-1]
    req = urllib.request.Request(
        base + f"/containers/{name}/logs?stdout=1&stderr=1&tail=20")
    with urllib.request.urlopen(req, timeout=60) as r:
        sys.stdout.write(r.read().decode())
else:
    print(f"unknown command {cmd}", file=sys.stderr)
    sys.exit(1)
'''
