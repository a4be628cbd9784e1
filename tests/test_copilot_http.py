"""The copilot's real HTTP hop, exercised against a loopback stub server.

Real sockets, real HTTP framing, real timeout/retry behavior — only the
model behind the Ollama-shaped endpoint is fake (the sandbox has no
external network). End-to-end: OllamaTranslator → guardrails.ask →
spark.sql over a temp view.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from f1_lakehouse_spark.copilot.guardrails import GuardrailError, ask
from f1_lakehouse_spark.copilot.llm_client import LlmHttpError, OllamaTranslator


class _StubOllama(BaseHTTPRequestHandler):
    """Scriptable /api/generate: behavior keyed off the question text."""

    requests_seen: list[dict] = []
    fail_next: int = 0  # serve this many 500s before succeeding

    def do_POST(self):  # noqa: N802
        n = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(n))
        type(self).requests_seen.append(body)
        if type(self).fail_next > 0:
            type(self).fail_next -= 1
            self.send_response(500)
            self.end_headers()
            return
        prompt = body["prompt"]
        if "nonjson" in prompt:
            out = b"this is not json"
        elif "missingfield" in prompt:
            out = json.dumps({"oops": 1}).encode()
        elif "mutate" in prompt:
            out = json.dumps(
                {"response": "```sql\nDROP TABLE laps\n```"}
            ).encode()
        else:
            out = json.dumps(
                {
                    "response": "Here you go:\n```sql\n"
                    "SELECT flag, COUNT(*) AS n FROM demo GROUP BY flag\n```"
                }
            ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def stub_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubOllama)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _translator(stub_url, **kw):
    kw.setdefault("backoff_s", 0.01)
    return OllamaTranslator(base_url=stub_url, timeout_s=5.0, **kw)


def test_http_translate_and_execute_end_to_end(spark, stub_url):
    spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 3)], "flag string, v int"
    ).createOrReplaceTempView("demo")
    df = ask(spark, "count rows per flag", _translator(stub_url))
    got = {r["flag"]: r["n"] for r in df.collect()}
    assert got == {"A": 2, "B": 1}
    # the request that went over the wire carried the reference's shape
    body = _StubOllama.requests_seen[-1]
    assert body["stream"] is False
    assert "count rows per flag" in body["prompt"]


def test_http_model_output_still_hits_the_guard(spark, stub_url):
    with pytest.raises(GuardrailError):
        ask(spark, "please mutate things", _translator(stub_url))


def test_http_retries_5xx_then_succeeds(spark, stub_url):
    _StubOllama.fail_next = 2
    spark.createDataFrame([("A", 1)], "flag string, v int").createOrReplaceTempView(
        "demo"
    )
    df = ask(spark, "count rows per flag again", _translator(stub_url, max_retries=2))
    assert df.count() == 1


def test_http_exhausted_retries_raise_clean(stub_url):
    _StubOllama.fail_next = 5
    with pytest.raises(LlmHttpError, match="unreachable after 2 attempts"):
        _translator(stub_url, max_retries=1)("q", "s")
    _StubOllama.fail_next = 0


def test_http_bad_bodies_raise_clean(stub_url):
    with pytest.raises(LlmHttpError, match="non-JSON"):
        _translator(stub_url)("nonjson please", "s")
    with pytest.raises(LlmHttpError, match="missing the 'response'"):
        _translator(stub_url)("missingfield please", "s")


def test_http_connection_refused_raises_clean():
    t = OllamaTranslator(
        base_url="http://127.0.0.1:9", timeout_s=0.5, max_retries=0
    )
    with pytest.raises(LlmHttpError, match="unreachable"):
        t("q", "s")


# --- the API-source real network hop (S1/S2) over the same loopback trick ------------


class _StubApi(BaseHTTPRequestHandler):
    hits: list[str] = []

    def do_GET(self):  # noqa: N802
        type(self).hits.append(self.path)
        if "round=13" in self.path:  # the cursed round: not found
            self.send_response(404)
            self.end_headers()
            return
        if "round=66" in self.path:  # 200 but garbage body (contract break)
            out = b"<html>definitely not json</html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(out)
            return
        if "round=5" in self.path and type(self).hits.count(self.path) == 1:
            self.send_response(503)  # first attempt flakes; retry succeeds
            self.end_headers()
            return
        import urllib.parse

        q = dict(urllib.parse.parse_qsl(self.path.split("?", 1)[1]))
        rows = [
            {"season": int(q["season"]), "round": int(q["round"]),
             "driver": d, "laps": i + 1}
            for i, d in enumerate(["VER", "HAM"])
        ]
        out = json.dumps(rows).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def api_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubApi)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetcher_distributed_ingest_with_fault_isolation(spark, api_url):
    from f1_lakehouse_spark.sources.api_ingest import HttpJsonFetcher, ingest_tasks

    fetch = HttpJsonFetcher(base_url=api_url, path="/laps",
                            timeout_s=5.0, backoff_s=0.01)
    tasks = [{"season": 2024, "round": r} for r in (1, 5, 13)]
    df = ingest_tasks(
        spark, tasks, fetch,
        result_schema="season int, round int, driver string, laps int",
    )
    rows = df.collect()
    # rounds 1 and 5 (after a 503 retry) fetched; round 13 (404) isolated
    got = {(r["round"], r["driver"]) for r in rows}
    assert got == {(1, "VER"), (1, "HAM"), (5, "VER"), (5, "HAM")}


def test_http_fetcher_composes_with_response_cache(spark, api_url, tmp_path):
    from f1_lakehouse_spark.sources.api_ingest import CachedFetcher, HttpJsonFetcher

    fetch = CachedFetcher(
        HttpJsonFetcher(base_url=api_url, path="/laps", timeout_s=5.0),
        cache_dir=str(tmp_path / "rcache"),
    )
    task = {"season": 2023, "round": 2}
    before = len(_StubApi.hits)
    a = fetch(task)
    b = fetch(task)  # served from the on-disk cache, no second request
    assert a.to_dict(orient="records") == b.to_dict(orient="records")
    assert len([h for h in _StubApi.hits[before:] if "season=2023" in h]) == 1


def test_http_fetcher_bad_body_fast_fails_without_retry(api_url):
    """A 200 response with a non-JSON body is a permanent server-contract
    error: it must raise a distinct 'bad response body' error after ONE
    request (no retry/backoff burn), mirroring the 4xx fast-fail path."""
    from f1_lakehouse_spark.sources.api_ingest import HttpJsonFetcher

    fetch = HttpJsonFetcher(base_url=api_url, path="/laps",
                            timeout_s=5.0, max_retries=3, backoff_s=0.01)
    before = len(_StubApi.hits)
    with pytest.raises(RuntimeError, match="bad response body"):
        fetch({"season": 2024, "round": 66})
    assert len([h for h in _StubApi.hits[before:] if "round=66" in h]) == 1
