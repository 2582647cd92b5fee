"""HTTP serving demo: spin up the server on a trained tiny checkpoint and
fetch /, /generate, /grid, /meta."""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

from tartangan_tpu.train.cnn import CNNTrainer


def test_serve_endpoints(tiny_archive, tmp_path):
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", "srv",
        "--dtype", "f32", "--quiet-logs",
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    run = str(tmp_path / "out" / "srv")

    from tartangan_tpu.serve import _ServeApp, make_handler
    app = _ServeApp(_ServeApp.parse_cli_args([run, "--port", "0"]))
    app.load_generator()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"
        html = urllib.request.urlopen(f"{base}/").read().decode()
        assert "tartangan-tpu" in html

        png = urllib.request.urlopen(f"{base}/generate?seed=1").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        grid = urllib.request.urlopen(
            f"{base}/grid?n=3&seed=2&trunc=1.5").read()
        assert grid[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(grid) > len(png) // 2

        meta = json.loads(urllib.request.urlopen(f"{base}/meta").read())
        assert meta["image_size"] == 16
    finally:
        server.shutdown()
