"""WebUI HTTP-layer tests: index page, error surfacing, cached e2e generate.

Exercises lmdx/webui/server.py through real HTTP requests against a
ThreadingHTTPServer on an ephemeral port — the component the reference only
documents (webui/README.md points at its HuggingFace Space) but lmdx ships.
"""

import argparse
import threading
import urllib.parse
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from lmdx.webui.server import App, Handler

from .conftest import reference_cache_path

DEMO_CACHE = reference_cache_path("cache_demo_v0.1_gpt-4.json")
DEMO_PROMPT = ("In an indoor scene, a blue cube directly above a red cube "
               "with a vase on the left of them")


@pytest.fixture
def webui_server():
    import os

    if not os.path.exists(DEMO_CACHE):
        pytest.skip("reference demo cache not available")
    args = argparse.Namespace(
        host="127.0.0.1", port=0, sd_model="tiny-test", llm_model="gpt-4",
        cache_path=DEMO_CACHE, steps=50, cpu=False)
    prev_app = Handler.app
    Handler.app = App(args)
    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)
        Handler.app = prev_app


def _post(url, form):
    data = urllib.parse.urlencode(form).encode()
    with urllib.request.urlopen(url + "/generate", data=data, timeout=300) as r:
        return r.status, r.read().decode()


def test_index_page_lists_methods(webui_server):
    from lmdx import methods as methods_lib

    with urllib.request.urlopen(webui_server + "/", timeout=30) as r:
        assert r.status == 200
        body = r.read().decode()
    assert "<form" in body and 'action="/generate"' in body
    for name in methods_lib.METHODS:
        assert f'value="{name}"' in body


def test_post_error_is_surfaced_in_page(webui_server):
    # Non-integer seed raises before any model work; the handler must
    # return the page with the error block, not a 500.
    status, body = _post(webui_server, {
        "prompt": DEMO_PROMPT, "method": "sd", "seed": "abc", "steps": "2"})
    assert status == 200
    assert "Error:" in body


def test_unknown_method_error_surfaced(webui_server):
    status, body = _post(webui_server, {
        "prompt": DEMO_PROMPT, "method": "no-such-method", "seed": "1",
        "steps": "2"})
    assert status == 200
    assert "Error:" in body and "unknown method" in body


@pytest.mark.slow
def test_generate_end_to_end_from_cache(webui_server):
    # Full path: cached stage-1 layout -> filter -> tiny-test SD generate ->
    # layout + image tags in the response page.
    status, body = _post(webui_server, {
        "prompt": DEMO_PROMPT, "method": "sd", "seed": "3", "steps": "2"})
    assert status == 200
    assert "Error:" not in body
    assert "<h3>Layout</h3>" in body and "<h3>Image</h3>" in body
    assert body.count("data:image/png;base64,") >= 2
