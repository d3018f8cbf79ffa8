"""Multi-model router: child server processes + request proxying.

The reference's router mode (tools/server/server-models.cpp,
server.cpp:130-170) spawns one child llama-server per model and proxies by
the request's "model" field. Same here: children are
`python -m tpullm.server` processes on loopback ports; the router forwards
bodies verbatim (incl. SSE streams) and exposes /models/load|unload plus an
aggregated /v1/models.
"""
from __future__ import annotations

import http.client
import json
import os
import socket
import subprocess
import sys
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


@dataclass
class ChildModel:
    name: str
    path: str
    port: int
    proc: subprocess.Popen
    started_at: float = field(default_factory=time.time)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


class Router:
    def __init__(self, extra_args: list[str] | None = None,
                 start_timeout: float = 300.0):
        self.children: dict[str, ChildModel] = {}
        self.lock = threading.Lock()
        self.extra_args = extra_args or []
        self.start_timeout = start_timeout

    def load(self, name: str, path: str, args: list[str] | None = None) -> ChildModel:
        with self.lock:
            if name in self.children:
                return self.children[name]
            port = _free_port()
            cmd = [sys.executable, "-m", "tpullm.server", "-m", path,
                   "--port", str(port), "--alias", name,
                   *self.extra_args, *(args or [])]
            env = dict(os.environ)
            proc = subprocess.Popen(cmd, env=env,
                                    stdout=subprocess.DEVNULL,
                                    stderr=subprocess.DEVNULL)
            child = ChildModel(name, path, port, proc)
            self.children[name] = child
        deadline = time.time() + self.start_timeout
        while time.time() < deadline:
            if proc.poll() is not None:
                with self.lock:
                    self.children.pop(name, None)
                raise RuntimeError(f"child for {name!r} exited at startup")
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                conn.request("GET", "/health")
                if conn.getresponse().status == 200:
                    return child
            except OSError:
                time.sleep(0.5)
        raise TimeoutError(f"child for {name!r} did not become healthy")

    def unload(self, name: str) -> bool:
        with self.lock:
            child = self.children.pop(name, None)
        if child is None:
            return False
        child.proc.terminate()
        try:
            child.proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            child.proc.kill()
        return True

    def pick(self, model: str | None) -> ChildModel | None:
        with self.lock:
            if model and model in self.children:
                return self.children[model]
            if not model and self.children:
                return next(iter(self.children.values()))
        return None

    def shutdown(self):
        for name in list(self.children):
            self.unload(name)


class RouterHandler(BaseHTTPRequestHandler):
    router: Router = None
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):
        pass

    def _json(self, code, obj):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        r = self.router
        path = self.path.split("?")[0]
        if path == "/health":
            return self._json(200, {"status": "ok",
                                    "models": sorted(r.children)})
        if path == "/v1/models" or path == "/models":
            return self._json(200, {"object": "list", "data": [
                {"id": n, "object": "model", "created": int(c.started_at),
                 "owned_by": "tpullm", "port": c.port}
                for n, c in sorted(r.children.items())]})
        self._proxy("GET", None)

    def do_POST(self):
        r = self.router
        path = self.path.split("?")[0]
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n) if n else b""
        if path == "/models/load":
            try:
                req = json.loads(body or b"{}")
                child = r.load(req["model"], req["path"], req.get("args"))
                return self._json(200, {"model": child.name, "port": child.port})
            except Exception as e:
                return self._json(400, {"error": str(e)})
        if path == "/models/unload":
            req = json.loads(body or b"{}")
            ok = r.unload(req.get("model", ""))
            return self._json(200 if ok else 404, {"unloaded": ok})
        self._proxy("POST", body)

    def _proxy(self, method: str, body: bytes | None):
        model = None
        if body:
            try:
                model = json.loads(body).get("model")
            except Exception:
                pass
        child = self.router.pick(model)
        if child is None:
            return self._json(404, {"error": f"no model loaded ({model!r})"})
        try:
            conn = http.client.HTTPConnection("127.0.0.1", child.port, timeout=600)
            conn.request(method, self.path, body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            self.send_response(resp.status)
            ctype = resp.getheader("Content-Type", "application/json")
            self.send_header("Content-Type", ctype)
            if ctype.startswith("text/event-stream"):
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                while True:
                    chunk = resp.read(4096)
                    if not chunk:
                        break
                    self.wfile.write(hex(len(chunk))[2:].encode() + b"\r\n"
                                     + chunk + b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
            else:
                data = resp.read()
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
        except OSError as e:
            try:
                self._json(502, {"error": f"upstream: {e}"})
            except Exception:
                pass


def serve_router(models: dict[str, str], host="127.0.0.1", port=8080,
                 extra_args=None, block=True):
    """models: {name: gguf_path} preloaded at startup."""
    router = Router(extra_args)
    for name, path in models.items():
        router.load(name, path)
    handler = type("BoundRouter", (RouterHandler,), {"router": router})
    srv = ThreadingHTTPServer((host, port), handler)
    if block:
        try:
            srv.serve_forever()
        finally:
            router.shutdown()
    else:
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, router


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("tpullm.server.router")
    ap.add_argument("-m", "--model", action="append", default=[],
                    help="name=path.gguf (repeatable)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args(argv)
    models = {}
    for spec in args.model:
        name, _, path = spec.partition("=")
        models[name] = path or name
    serve_router(models, args.host, args.port)


if __name__ == "__main__":
    main()
