"""REST query API (server/rest/QueryResources.java:85-138 analog):
POST /query.json over a real HTTP socket against a live session."""

from __future__ import annotations

import json
import urllib.request

import pytest

from drill_spark.server import serve


@pytest.fixture()
def rest(session, tmp_path):
    (tmp_path / "people.json").write_text(
        '{"name": "ada", "age": 36}\n{"name": "bob", "age": 41}\n'
    )
    session.register_workspace("dfs.web", str(tmp_path), "json")
    srv, port = serve(session)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_query_endpoint(rest):
    code, out = _post(
        f"{rest}/query.json",
        {"queryType": "SQL", "query": "select name, age from dfs.web.`people.json` where age > 40"},
    )
    assert code == 200 and out["queryState"] == "COMPLETED"
    assert out["columns"] == ["name", "age"]
    assert out["rows"] == [{"name": "bob", "age": 41}]


def test_query_auto_limit(rest):
    code, out = _post(
        f"{rest}/query.json",
        {"query": "select id from range(100)", "autoLimit": 7},
    )
    assert code == 200 and out["rowCount"] == 7


def test_query_error_shape(rest):
    code, out = _post(f"{rest}/query.json", {"query": "select * from no_such_table_xyz"})
    assert code == 400 and out["queryState"] == "FAILED"
    assert "no_such_table_xyz" in out["errorMessage"]


def test_metadata_endpoints(rest):
    with urllib.request.urlopen(f"{rest}/storage.json") as r:
        ws = {w["name"] for w in json.loads(r.read())["workspaces"]}
    assert "dfs.web" in ws
    with urllib.request.urlopen(f"{rest}/profiles.json") as r:
        profs = json.loads(r.read())["profiles"]
    assert any("people.json" in p["query"] or "range(100)" in p["query"] for p in profs)
