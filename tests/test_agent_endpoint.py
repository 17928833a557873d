"""R9 agentic translation through a real LLM endpoint (VERDICT r3
item 10): `llm_agent_translate` POSTs to an OpenAI-compatible
chat-completions server configured via NEURAL_SEARCH_AGENT_ENDPOINT.
The integration test runs only when an endpoint is configured; the
contract tests (fallback, parsing, engine wiring) run everywhere by
serving a one-shot local HTTP stub."""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from neural_search_spark.plans.compiler import (
    Engine,
    _agentic_translate,
    llm_agent_translate,
)

GOLDEN_QUESTIONS = [
    "find documents similar to spark window joins",
    "exact keyword match for merge sort",
    "documents about streams without batch processing",
    "either joins or windows",
    "autocomplete starting with spa",
]


def _serve_reply(payload: str):
    """One-shot OpenAI-compatible endpoint returning `payload` as the
    assistant message."""

    class _H(BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            body = json.dumps(
                {"choices": [{"message": {"content": payload}}]}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # noqa: D102
            pass

    srv = HTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


def test_parses_json_reply():
    srv, url = _serve_reply('{"match": {"field": "text", "query": "spark"}}')
    try:
        fn = llm_agent_translate(endpoint=url)
        assert fn("whatever") == {"match": {"field": "text", "query": "spark"}}
    finally:
        srv.shutdown()


def test_parses_fenced_reply():
    srv, url = _serve_reply(
        '```json\n{"neural": {"query_text": "spark joins"}}\n```'
    )
    try:
        fn = llm_agent_translate(endpoint=url)
        assert fn("q") == {"neural": {"query_text": "spark joins"}}
    finally:
        srv.shutdown()


def test_falls_back_to_rules_when_endpoint_dead():
    fn = llm_agent_translate(endpoint="http://127.0.0.1:9", timeout=0.3)
    q = "find documents similar to spark window joins"
    assert fn(q) == _agentic_translate(q)


def test_falls_back_on_invalid_reply():
    srv, url = _serve_reply("I cannot answer that.")
    try:
        fn = llm_agent_translate(endpoint=url)
        q = "exact keyword match for merge sort"
        assert fn(q) == _agentic_translate(q)
    finally:
        srv.shutdown()


def test_engine_picks_up_env_endpoint(spark, sf_dir, monkeypatch):
    srv, url = _serve_reply('{"match": {"field": "text", "query": "spark"}}')
    try:
        monkeypatch.setenv("NEURAL_SEARCH_AGENT_ENDPOINT", url)
        eng = Engine(spark, sf_dir)
        out = eng.search({"agentic": {"query_text": "anything"}})
        assert out.take(1)
        assert eng.last_agent_context["dsl_query"] == {
            "match": {"field": "text", "query": "spark"}
        }
    finally:
        srv.shutdown()


@pytest.mark.skipif(
    not os.environ.get("NEURAL_SEARCH_AGENT_ENDPOINT"),
    reason="no live LLM endpoint configured",
)
def test_live_endpoint_golden_questions(spark, sf_dir):
    """With a real endpoint configured: all five golden questions must
    produce a VALID DSL dict that the engine can execute."""
    eng = Engine(spark, sf_dir)
    for q in GOLDEN_QUESTIONS:
        spec = eng.agent_translate(q)
        assert isinstance(spec, dict) and len(spec) == 1
        assert eng.search(spec).take(1) is not None
