"""HTTP serving endpoint tests (small models injected, real HTTP round trip)."""

import base64
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from deepmusicgeneration_tpu.app.server import MusicServer, make_handler
from deepmusicgeneration_tpu.models.config import small_multitask_config, small_test_config
from deepmusicgeneration_tpu.train.learner import MultitaskLearner, MusicLearner

FUR_ELISE = "/root/reference/fur_elise.mid"


@pytest.fixture(scope="module")
def http_server(vocab):
    server = MusicServer(
        genre_learner=MusicLearner(small_test_config(), vocab),
        multitask_learner=MultitaskLearner(small_multitask_config(), vocab),
        max_batch=4)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()
    server.close()


def _post(url, path, payload, timeout=600):
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _midi_b64():
    with open(FUR_ELISE, "rb") as f:
        return base64.b64encode(f.read()).decode()


def test_health(http_server):
    with urllib.request.urlopen(http_server + "/health") as r:
        assert json.loads(r.read()) == {"ok": True}


def test_tokenize_endpoint(http_server):
    out = _post(http_server, "/tokenize", {"midi_b64": _midi_b64()})
    assert out["n_tokens"] > 100
    assert out["text"].startswith("xxbos xxpad")


def test_generate_endpoint(http_server):
    out = _post(http_server, "/generate",
                {"midi_b64": _midi_b64(), "genre": "jazz", "n_words": 16,
                 "cutoff_beat": 8, "seed": 1})
    assert out["n_tokens"] > 0
    midi = base64.b64decode(out["midi_b64"])
    assert midi[:4] == b"MThd"


def test_remix_endpoint(http_server):
    out = _post(http_server, "/remix",
                {"midi_b64": _midi_b64(), "pred_type": "notes",
                 "mask_proportion": 0.4, "cutoff_beat": 8})
    assert out["n_tokens"] > 0
    assert base64.b64decode(out["midi_b64"])[:4] == b"MThd"


def test_generate_endpoint_continuous(vocab):
    """/generate backed by the continuous-batching engine: two concurrent
    requests with different sampling settings ride one resident batch."""
    server = MusicServer(
        genre_learner=MusicLearner(small_test_config(), vocab),
        max_batch=4, continuous=True)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        payloads = [
            {"midi_b64": _midi_b64(), "genre": "jazz", "n_words": 16,
             "cutoff_beat": 8, "seed": 1},
            {"midi_b64": _midi_b64(), "n_words": 24, "cutoff_beat": 8,
             "top_k": 10, "temperatures": (2.0, 2.0), "seed": 2},
        ]
        outs = [None, None]

        def go(i):
            outs[i] = _post(url, "/generate", payloads[i])

        threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(600)
        for out in outs:
            assert out is not None and out["n_tokens"] > 0
            assert base64.b64decode(out["midi_b64"])[:4] == b"MThd"
    finally:
        httpd.shutdown()
        server.close()


def test_bad_request(http_server):
    req = urllib.request.Request(http_server + "/generate", data=b"{}",
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "midi_b64" in json.loads(e.read())["error"]


def test_unknown_route(http_server):
    try:
        urllib.request.urlopen(http_server + "/nope", timeout=10)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
