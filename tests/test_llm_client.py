"""llm_client HTTP behavior against a stdlib fake OpenAI endpoint.

Covers the reference behaviors of utils/llm.py:27-140 without network:
chat vs completion endpoint routing, bearer auth header, retry/backoff on
server errors, and get_parsed_layout's retry-until-parse loop.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from lmdx.text import llm_client
from lmdx.text.cache import LayoutCache

VALID_RESPONSE = (
    "[('a red cube', [100, 200, 120, 120])]\n"
    "Background prompt: A realistic scene\n"
    "Negative prompt: "
)


class _FakeOpenAI(BaseHTTPRequestHandler):
    """Scriptable fake endpoint: pops the next (status, text) from
    server.script and records each request."""

    def do_POST(self):
        length = int(self.headers["Content-Length"])
        body = json.loads(self.rfile.read(length))
        self.server.requests.append({
            "path": self.path,
            "body": body,
            "auth": self.headers.get("Authorization"),
        })
        status, text = (
            self.server.script.pop(0) if self.server.script else (200, VALID_RESPONSE)
        )
        if status != 200:
            self.send_response(status)
            self.end_headers()
            return
        if "chat" in self.path:
            payload = {"choices": [{"message": {"content": text}}]}
        else:
            payload = {"choices": [{"text": text}]}
        out = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *args):
        pass


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOpenAI)
    srv.script = []
    srv.requests = []
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()
    thread.join(timeout=5)


def _config(server, model):
    return llm_client.LLMConfig(
        model=model,
        api_base=f"http://127.0.0.1:{server.server_address[1]}/v1",
        api_key="sk-test",
    )


def test_chat_model_routes_to_chat_completions(server):
    text = llm_client.query_layout("a photo of a cube", _config(server, "gpt-4"))
    assert text == VALID_RESPONSE
    (req,) = server.requests
    assert req["path"] == "/v1/chat/completions"
    assert req["auth"] == "Bearer sk-test"
    assert req["body"]["model"] == "gpt-4"
    assert req["body"]["messages"][0]["role"] == "user"
    assert "a photo of a cube" in req["body"]["messages"][0]["content"]
    assert req["body"]["temperature"] == 0.25
    assert req["body"]["max_tokens"] == 900


def test_open_model_routes_to_completions(server):
    text = llm_client.query_layout("a photo of a cube", _config(server, "vicuna"))
    assert text == VALID_RESPONSE
    (req,) = server.requests
    assert req["path"] == "/v1/completions"
    assert req["body"]["model"] == "vicuna-13b"  # canonicalized alias
    assert "prompt" in req["body"] and "messages" not in req["body"]


def test_retry_backoff_then_success(server, monkeypatch):
    sleeps = []
    monkeypatch.setattr(llm_client.time, "sleep", sleeps.append)
    server.script = [(500, ""), (503, ""), (200, VALID_RESPONSE)]
    text = llm_client.query_layout("p", _config(server, "gpt-4"))
    assert text == VALID_RESPONSE
    assert len(server.requests) == 3
    assert sleeps == [2, 4]  # min(60, 2**attempts) backoff


def test_retry_gives_up_after_max_attempts(server, monkeypatch):
    monkeypatch.setattr(llm_client.time, "sleep", lambda s: None)
    server.script = [(500, "")] * 5
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        llm_client.query_layout("p", _config(server, "gpt-4"), max_attempts=3)


def test_get_parsed_layout_retries_until_parseable(server):
    server.script = [
        (200, "this is not a layout at all"),
        (200, VALID_RESPONSE),
    ]
    layout = llm_client.get_parsed_layout("p", _config(server, "gpt-4"))
    assert len(server.requests) == 2
    assert layout.bg_prompt == "A realistic scene"
    assert layout.gen_boxes == [
        {"name": "a red cube", "bounding_box": (100, 200, 120, 120)}
    ]


def test_cache_through(server, tmp_path):
    """Sequential multi-read semantics (reference utils/cache.py:42-58):
    successive reads of one prompt consume successive cached values, so a
    second read of a one-entry prompt re-queries; after reset_access the
    stored value is served again without touching the server."""
    cache = LayoutCache(str(tmp_path / "cache.json"))
    cfg = _config(server, "gpt-4")
    first = llm_client.query_layout_cached("p", cfg, cache)
    assert first == VALID_RESPONSE
    assert len(server.requests) == 1

    cache.reset_access()
    second = llm_client.query_layout_cached("p", cfg, cache)
    assert second == VALID_RESPONSE
    assert len(server.requests) == 1  # served from cache

    third = llm_client.query_layout_cached("p", cfg, cache)
    assert third == VALID_RESPONSE
    assert len(server.requests) == 2  # sequential read exhausted -> re-query
