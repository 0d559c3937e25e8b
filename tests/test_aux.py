"""Aux subsystem tests: profiling, debug utilities, stream demo plumbing."""

import os
import subprocess
import sys

import numpy as np

import grayskull_tpu as gs
from grayskull_tpu import debug, profiling


def test_timeit_and_throughput(rng):
    imgs = rng.integers(0, 256, (2, 32, 64), dtype=np.uint8)
    stats = profiling.throughput(lambda x: gs.blur(x, 1), imgs, iters=2, warmup=1)
    assert stats["frames_per_sec"] > 0
    assert stats["sec_per_batch"] > 0


def test_dump(tmp_path, rng):
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    paths = debug.dump(img, "t", directory=str(tmp_path))
    assert len(paths) == 1
    np.testing.assert_array_equal(gs.io.read_pgm(paths[0]), img)
    # float input gets normalized
    paths = debug.dump(np.linspace(0, 1, 64).reshape(8, 8), "f", directory=str(tmp_path))
    assert gs.io.read_pgm(paths[0]) is not None
    # batch input
    paths = debug.dump(np.stack([img, img]), "b", directory=str(tmp_path))
    assert len(paths) == 2


def test_draw_overlays(rng):
    img = np.zeros((32, 32), np.uint8)
    out = debug.draw_rects(img, [(2, 3, 10, 8)], color=200)
    assert out[3, 2] == 200 and out[3, 12] == 200 and out[11, 2] == 200
    out = debug.draw_crosses(img, [(16, 16)])
    assert out[16, 16] == 255 and out[14, 16] == 255 and out[16, 18] == 255
    assert img.max() == 0  # inputs untouched


def test_stream_demo_runs(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    proc = subprocess.run(
        [sys.executable, "examples/stream_demo.py", "--pipeline",
         "blur:1,threshold:otsu,blobs", "--frames", "2", "--size", "64x64",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "blobs:" in proc.stdout
    assert (tmp_path / "overlay.pgm").exists()


def test_pgm_header_fscanf_parity(oracle, tmp_path):
    """decode_pgm matches gs_read_pgm's fscanf header semantics byte-for-byte,
    including degenerate headers (zero separators after P5, greedy whitespace
    runs before the payload, whitespace-valued first pixel bytes eaten)."""
    import grayskull_tpu.io as gio

    payload = bytes(range(12))
    cases = [
        b"P5\n4 3\n255\n" + payload,             # normal
        b"P54 3 255 " + payload,                 # no whitespace after P5
        b"P5\n4 3\n255\n\n\n" + payload,          # greedy run before payload
        b"P5\n4 3\n255\n \t" + payload,           # mixed run
        b"P5\n4 3\n255\n" + b" " + payload,       # ws-valued first pixel eaten
        b"P5\n4 3\n254\n" + payload,              # wrong maxval
        b"P5\n4 3\n255\n" + payload[:-1],         # short payload
        b"P6\n4 3\n255\n" + payload,              # wrong magic
        b"P5\n4 3 255 " + payload,                # all on one run
        b"P5  4\t3\r255\n" + payload,             # arbitrary separators
    ]
    for i, buf in enumerate(cases):
        p = tmp_path / f"case_{i}.pgm"
        p.write_bytes(buf)
        ref = oracle.read_pgm(str(p))
        got = gio.decode_pgm(buf)
        if ref is None:
            assert got is None, f"case {i}: C rejects, we accept"
        else:
            assert got is not None, f"case {i}: C accepts, we reject"
            np.testing.assert_array_equal(got, ref, err_msg=f"case {i}")
        # native C loader agrees too
        try:
            from grayskull_tpu import native
            nd = native.probe_pgm(str(p))
            assert (nd is not None) == (ref is not None), f"case {i}: native probe"
        except RuntimeError:
            pass


def test_structlog_jsonl(tmp_path):
    """Structured logging: JSONL events with timing, GS_LOG sink selection."""
    import json

    from grayskull_tpu import structlog

    log = tmp_path / "events.jsonl"
    structlog.configure(str(log))
    assert structlog.enabled()
    structlog.event("unit.test", answer=42)
    with structlog.timed("unit.timer", tag="x"):
        pass
    structlog.configure(None)
    assert not structlog.enabled()
    structlog.event("dropped")  # no sink: must be a no-op
    lines = [json.loads(ln) for ln in log.read_text().splitlines()]
    assert lines[0]["event"] == "unit.test" and lines[0]["answer"] == 42
    assert lines[1]["event"] == "unit.timer" and lines[1]["elapsed_ms"] >= 0
    assert len(lines) == 2


def test_cli_emits_structured_log(tmp_path):
    """The CLI logs one cli.command event when GS_LOG is set."""
    import json

    import numpy as np

    import grayskull_tpu as gs
    from grayskull_tpu import cli, structlog

    img = (np.arange(32 * 32) % 256).astype(np.uint8).reshape(32, 32)
    src = tmp_path / "in.pgm"
    dst = tmp_path / "out.pgm"
    gs.io.write_pgm(img, str(src))
    log = tmp_path / "cli.jsonl"
    structlog.configure(str(log))
    try:
        rc = cli.main(["nanomagick", "blur", "2", str(src), str(dst)])
    finally:
        structlog.configure(None)
    assert rc == 0 and dst.exists()
    recs = [json.loads(ln) for ln in log.read_text().splitlines()]
    assert any(r["event"] == "cli.command" and r["command"] == "blur" for r in recs)


def test_live_demo_server(tmp_path):
    """The interactive demo's /frame endpoint serves a frame + overlay tables."""
    import base64
    import http.client
    import json
    import sys
    import threading

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import live_demo

    frames = live_demo.synth_frames(4, 64, 96)
    demo = live_demo.Demo(frames)
    srv = live_demo.ThreadingHTTPServer(("127.0.0.1", 0), live_demo.make_handler(demo))
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/")
        page = conn.getresponse().read().decode()
        assert "pipeline" in page and "canvas" in page
        conn.request(
            "GET", "/frame?i=1&pipeline=blur:1,threshold:otsu&analyzers=blobs,keypoints"
        )
        resp = conn.getresponse()
        assert resp.status == 200
        d = json.loads(resp.read())
        assert d["w"] == 96 and d["h"] == 64
        assert len(base64.b64decode(d["pixels"])) == 64 * 96
        assert "blobs" in d and "keypoints" in d
        # unknown ops surface as a 400 with an error body, not a crash
        conn.request("GET", "/frame?i=0&pipeline=nosuchop&analyzers=")
        resp = conn.getresponse()
        assert resp.status == 400 and "error" in json.loads(resp.read())
        # webcam path: POST a raw grayscale frame through the same pipeline
        body = np.asarray(frames[2]).tobytes()
        conn.request("POST", "/frame?pipeline=blur:1&analyzers=keypoints", body)
        resp = conn.getresponse()
        assert resp.status == 200
        d = json.loads(resp.read())
        assert len(base64.b64decode(d["pixels"])) == 64 * 96
        assert "keypoints" in d
        # template capture stores the posted frame for the orb analyzer
        conn.request("POST", "/frame?capture=1", body)
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["template_kps"] >= 0
        conn.request("POST", "/frame?pipeline=blur:1&analyzers=orb", body)
        d = json.loads(conn.getresponse().read())
        assert "matches" in d
        # wrong-size frames are a 400, not a crash
        conn.request("POST", "/frame?pipeline=blur:1", body[:100])
        resp = conn.getresponse()
        assert resp.status == 400 and "error" in json.loads(resp.read())
        # the served page carries the camera capture loop at the demo size
        assert "getUserMedia" in page and "CW = 96" in page
    finally:
        srv.shutdown()
        srv.server_close()
