"""HTTP serving endpoint (stdlib-only).

A production-shaped JSON API over the batched generation service — the
deployment surface the reference's Streamlit app is not:

    POST /generate   {"midi_b64": ..., "genre": "jazz", "n_words": 256, ...}
                   → {"tokens": [...], "midi_b64": ..., "n_tokens": N}
    POST /remix      {"midi_b64": ..., "pred_type": "notes", "mask_proportion": 0.6}
    POST /harmonize  {"midi_b64": ..., "pred_melody": false, "n_words": 200}
    POST /tokenize   {"midi_b64": ...} → {"tokens": [...], "text": "..."}
    GET  /health     → {"ok": true}

Concurrent /generate requests are coalesced into device batches by
:class:`..tasks.serve.GenerationService`. Run:

    python -m deepmusicgeneration_tpu.app.server --port 8711
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class MusicServer:
    def __init__(self, genre_learner=None, multitask_learner=None,
                 max_batch: int = 16, continuous: bool = False):
        """``continuous=True`` serves /generate from the continuous-batching
        engine (decode/continuous.py): requests join a resident device batch
        within one chunk of arriving — per-request sampling settings share a
        batch, early-stopping rows free their lane immediately — instead of
        the static coalescing service's batch-at-a-time schedule."""
        from ..vocab import MusicVocab
        self.vocab = MusicVocab.create()
        self._genre = genre_learner
        self._multi = multitask_learner
        self._service = None
        # RLock: service() holds it while calling genre(), which locks again
        self._lock = threading.RLock()
        self.max_batch = max_batch
        self.continuous = continuous

    # lazy model loading so /health works instantly
    def genre(self):
        with self._lock:
            if self._genre is None:
                from .app_utils import createGenreContinuationModel
                self._genre = createGenreContinuationModel()
            return self._genre

    def multi(self):
        with self._lock:
            if self._multi is None:
                from .app_utils import createRemixModel
                self._multi = createRemixModel()
            return self._multi

    def service(self):
        # same lock discipline as genre()/multi(): two concurrent first
        # /generate requests must not build two resident services
        with self._lock:
            return self._service_locked()

    def _service_locked(self):
        if self._service is None:
            if self.continuous:
                from ..decode.continuous import ContinuousGenerationService
                self._service = ContinuousGenerationService(
                    self.genre(), n_slots=self.max_batch)
            else:
                from ..tasks.serve import GenerationService
                self._service = GenerationService(self.genre(),
                                                  max_batch=self.max_batch)
        return self._service

    # -- handlers ------------------------------------------------------------
    def handle_tokenize(self, req: dict) -> dict:
        from ..codec.item import MusicItem
        midi = base64.b64decode(req["midi_b64"])
        item = MusicItem.from_file(midi, self.vocab, genre=req.get("genre"))
        return {"tokens": item.data.tolist(), "text": item.to_text(),
                "n_tokens": len(item)}

    def handle_generate(self, req: dict) -> dict:
        from ..codec.item import MusicItem
        from ..vocab import genre_prefix_token, BOS
        midi = base64.b64decode(req["midi_b64"])
        item = MusicItem.from_file(midi, self.vocab)
        seed = item.trim_to_beat(float(req.get("cutoff_beat", 32)))
        genre = req.get("genre")
        if genre:
            seed = seed.set_genre(genre if genre_prefix_token(genre) != BOS else None)
        seed = seed.remove_eos()
        fut = self.service().submit(
            seed.data,
            n_words=int(req.get("n_words", 256)),
            temperatures=tuple(req.get("temperatures", (1.8, 1.8, 1.0))),
            top_k=int(req.get("top_k", 30)),
            top_p=float(req.get("top_p", 0.65)),
            min_bars=int(req.get("min_bars", 12)),
            greedy=bool(req.get("greedy", False)),
            seed=int(req.get("seed", 0)))
        new = fut.result(timeout=float(req.get("timeout_s", 600)))
        full = seed.append(type(seed)(np.asarray(new, np.int64), self.vocab))
        return {"tokens": np.asarray(new).tolist(), "n_tokens": int(len(new)),
                "midi_b64": base64.b64encode(
                    full.to_midi_bytes(bpm=float(req.get("bpm", 120)))).decode()}

    def handle_remix(self, req: dict) -> dict:
        import tempfile, os
        from ..tasks.remix import predict_mask_remix
        midi = base64.b64decode(req["midi_b64"])
        with tempfile.NamedTemporaryFile(suffix=".mid", delete=False) as f:
            f.write(midi)
            path = f.name
        try:
            pred = predict_mask_remix(
                self.multi(), path, genre=req.get("genre", "auto"),
                pred_type=req.get("pred_type", "notes"),
                mask_proportion=float(req.get("mask_proportion", 0.6)),
                cutoff_beat=float(req.get("cutoff_beat", 32)),
                seed=int(req.get("seed", 0)))
        finally:
            os.unlink(path)
        return {"tokens": pred.data.tolist(), "n_tokens": len(pred),
                "midi_b64": base64.b64encode(
                    pred.to_midi_bytes(bpm=float(req.get("bpm", 120)))).decode()}

    def handle_harmonize(self, req: dict) -> dict:
        import tempfile, os
        from ..tasks.harmonize import s2s_predict_from_midi
        midi = base64.b64decode(req["midi_b64"])
        with tempfile.NamedTemporaryFile(suffix=".mid", delete=False) as f:
            f.write(midi)
            path = f.name
        try:
            multitrack = s2s_predict_from_midi(
                self.multi(), path, n_words=int(req.get("n_words", 200)),
                pred_melody=bool(req.get("pred_melody", True)),
                seed_len=req.get("seed_len"),
                seed=int(req.get("seed", 0)))
        finally:
            os.unlink(path)
        return {"midi_b64": base64.b64encode(
            multitrack.to_midi_bytes(bpm=float(req.get("bpm", 120)))).decode()}

    def close(self):
        if self._service is not None:
            self._service.close()


def make_handler(server: MusicServer):
    routes = {
        "/tokenize": server.handle_tokenize,
        "/generate": server.handle_generate,
        "/remix": server.handle_remix,
        "/harmonize": server.handle_harmonize,
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            fn = routes.get(self.path)
            if fn is None:
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                self._send(200, fn(req))
            except KeyError as e:
                self._send(400, {"error": f"missing field {e}"})
            except Exception as e:
                self._send(500, {"error": repr(e)})

    return Handler


def serve(port: int = 8711, host: str = "127.0.0.1", max_batch: int = 16,
          continuous: bool = False):
    # Request threads jit-compile the multitask engines on first use;
    # XLA:CPU's compiler recursion can overflow the default 8 MB pthread
    # stack (same hazard as tasks/serve.py). All ThreadingHTTPServer request
    # threads are spawned after this point, so the knob covers them.
    import threading
    threading.stack_size(256 * 1024 * 1024)
    server = MusicServer(max_batch=max_batch, continuous=continuous)
    httpd = ThreadingHTTPServer((host, port), make_handler(server))
    print(f"serving on http://{host}:{port} "
          f"(/health /tokenize /generate /remix /harmonize)")
    try:
        httpd.serve_forever()
    finally:
        server.close()


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8711)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--continuous", action="store_true",
                    help="serve /generate from the continuous-batching "
                         "engine (resident device batch, per-request "
                         "settings, chunk-latency admission)")
    a = ap.parse_args()
    from ..utils.compile_cache import enable
    enable()
    serve(a.port, a.host, a.max_batch, continuous=a.continuous)
