#!/usr/bin/env python
"""CLI: serve the session web API (reference scripts/session_server.py)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from seesaw_tpu.web.app import SeesawServer


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--seesaw_root", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--config_path", default=None, help="yaml for yaml_* modes")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args()

    app = SeesawServer(args.seesaw_root, args.save_path, config_path=args.config_path)
    httpd = app.serve(host=args.host, port=args.port)
    print(f"seesaw-tpu session server listening on {args.host}:{args.port}")
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        httpd.shutdown()
