"""Minimal client for the HTTP generation service.

    # terminal 1
    python -m deepmusicgeneration_tpu.cli serve --port 8711
    # terminal 2
    python examples/serve_client.py --midi /root/reference/fur_elise.mid \
        --genre jazz --out continuation.mid
"""

import argparse
import base64
import json
import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8711")
    ap.add_argument("--midi", required=True)
    ap.add_argument("--genre", default="jazz")
    ap.add_argument("--n-words", type=int, default=256)
    ap.add_argument("--out", default="continuation.mid")
    args = ap.parse_args()

    with open(args.midi, "rb") as f:
        midi_b64 = base64.b64encode(f.read()).decode()
    payload = {"midi_b64": midi_b64, "genre": args.genre,
               "n_words": args.n_words}
    req = urllib.request.Request(
        args.url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        out = json.loads(r.read())
    with open(args.out, "wb") as f:
        f.write(base64.b64decode(out["midi_b64"]))
    print(f"generated {out['n_tokens']} tokens → {args.out}")


if __name__ == "__main__":
    main()
