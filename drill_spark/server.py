"""REST query API — the reference's primary client entry point.

Drill serves `POST /query.json` ({"queryType": "SQL", "query": ...} →
{"columns": [...], "rows": [{col: val}, ...]}) plus profile/storage/
option listings from its embedded web server (reference:
exec/java-exec/src/main/java/org/apache/drill/exec/server/rest/
QueryResources.java:85-138, ProfileResources.java, StorageResources.java).

This module exposes a DrillSession over the same wire shape using only
the standard library (ThreadingHTTPServer). The HTTP layer is
driver-side by nature — it is the session's front door, not a data
path; query execution underneath is ordinary distributed Catalyst, and
`autoLimit` (Drill's result-row cap, ExecConstants.QUERY_MAX_ROWS
analog) keeps driver materialization bounded.

Endpoints:
- POST /query.json   {"query": "...", "autoLimit": N?} → columns+rows
- GET  /profiles.json  recent statements (sys.profiles view)
- GET  /storage.json   workspaces (storage plugin configs analog)
- GET  /options.json   session options
"""

from __future__ import annotations

import datetime
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

DEFAULT_AUTO_LIMIT = 10_000


def _json_safe(v):
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        import base64

        return base64.b64encode(v).decode()
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    return v


class _Handler(BaseHTTPRequestHandler):
    session = None  # set by serve()

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet test output
        pass

    def do_GET(self):
        s = type(self).session
        if self.path.startswith("/profiles"):
            self._reply(200, {"profiles": _json_safe(
                [{**p, "start_ts": p["start_ts"].isoformat()} for p in s.profiles[-100:]]
            )})
        elif self.path.startswith("/storage"):
            self._reply(200, {"workspaces": [
                {"name": w.name, "path": w.path, "kind": w.kind,
                 "defaultFormat": w.default_format, "writable": w.writable}
                for w in s.workspaces.values()
            ]})
        elif self.path.startswith("/options"):
            self._reply(200, {"options": dict(s.options)})
        else:
            self._reply(404, {"errorMessage": f"no such resource {self.path}"})

    def do_POST(self):
        if not self.path.startswith("/query"):
            self._reply(404, {"errorMessage": f"no such resource {self.path}"})
            return
        s = type(self).session
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            limit = int(req.get("autoLimit") or DEFAULT_AUTO_LIMIT)
            df = s.sql(req["query"])
            rows = df.limit(limit).collect()
            self._reply(200, {
                "queryState": "COMPLETED",
                "columns": df.columns,
                "rows": [_json_safe(r.asDict(recursive=True)) for r in rows],
                "rowCount": len(rows),
            })
        except Exception as e:
            self._reply(400, {"queryState": "FAILED", "errorMessage": str(e)})


def serve(session, host: str = "127.0.0.1", port: int = 0):
    """Start the REST server on a daemon thread; returns (server, port).
    Stop with server.shutdown()."""
    handler = type("BoundHandler", (_Handler,), {"session": session})
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]
