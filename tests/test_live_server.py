"""LiveStreamingDaemon: the framed-TCP wire surface over StreamingServer.

The bar: frames received over the wire must equal the in-process solo
streaming run for the same clip (the decoder carry is exact; exactness
configs use lookahead=0 and chunk-multiple clips like test_multistream),
for one client and for concurrent clients sharing the pool — plus the
protocol error surface (bad hello, wrong rate, busy pool, ragged bytes).
"""

import json
import socket
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio2face_tpu.live_server import (
    LiveClient,
    LiveStreamingDaemon,
    recv_msg,
    send_msg,
)
from audio2face_tpu.models.faceformer import FaceFormer
from audio2face_tpu.multistream import StreamingServer
from audio2face_tpu.streaming import StreamingFaceFormerPredictor

SR = 16000
N_VERTS = 300
CHUNK_S = 0.8
CHUNK = int(CHUNK_S * SR)


@pytest.fixture(scope="module")
def variables():
    model = FaceFormer(n_verts=N_VERTS, n_onehot=12, dtype=None, decode_impl="scan")
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(1, SR)) * 0.1).astype(np.float32)
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    v = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(audio),
        jnp.asarray(np.eye(12, dtype=np.float32)[:1]), jnp.asarray(template)[None],
    )
    return jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(1).normal(size=p.shape).astype(np.float32),
        v,
    )


@pytest.fixture(scope="module")
def daemon(variables):
    d = LiveStreamingDaemon(
        server=StreamingServer(
            variables, N_VERTS, n_streams=3, chunk_seconds=CHUNK_S,
            left_seconds=0.8, lookahead_seconds=0.0,
        ),
        idle_poll_ms=20.0,
    )
    d.start()
    yield d
    d.stop()


def _solo(variables, one_hot, template, clip):
    pred = StreamingFaceFormerPredictor(
        variables, N_VERTS, chunk_seconds=CHUNK_S, left_seconds=0.8,
        lookahead_seconds=0.0,
    )
    pred.start_stream(one_hot, template)
    out = [pred.push(clip), pred.flush()]
    return np.concatenate([o for o in out if o.size])


def test_wire_roundtrip_matches_solo(daemon, variables):
    rng = np.random.default_rng(5)
    clip = (rng.normal(size=3 * CHUNK) * 0.1).astype(np.float32)
    want = _solo(variables, np.eye(12, dtype=np.float32)[2],
                 np.zeros((N_VERTS // 3, 3), np.float32), clip)

    with LiveClient(daemon.port, subject=2, sample_rate=SR) as c:
        assert c.info == {"verts": N_VERTS // 3, "fps": 60,
                          "sample_rate": SR, "streams": 3}
        got = [c.send(clip[:10000]), c.send(clip[10000:30000]),
               c.send(clip[30000:]), c.finish()]
    got = np.concatenate(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert daemon.stats()["frames_out"] >= want.shape[0]
    assert daemon.stats()["samples_in"] >= clip.size


@pytest.mark.slow
def test_concurrent_clients_match_solos(daemon, variables):
    """Two clients streaming at once share the batched pool; each receives
    exactly its own solo-run animation."""
    rng = np.random.default_rng(9)
    clips = [(rng.normal(size=k * CHUNK) * 0.1).astype(np.float32) for k in (3, 2)]
    tmpl = np.zeros((N_VERTS // 3, 3), np.float32)
    solos = [_solo(variables, np.eye(12, dtype=np.float32)[i], tmpl, clips[i])
             for i in range(2)]

    results, errors = [None, None], []

    def run(i):
        try:
            with LiveClient(daemon.port, subject=i, timeout=30.0) as c:
                parts = []
                for lo in range(0, len(clips[i]), 7000):
                    parts.append(c.send(clips[i][lo:lo + 7000]))
                parts.append(c.finish())
                results[i] = np.concatenate(parts)
        except Exception as e:  # pragma: no cover - surfaced by the assert
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors
    for i in range(2):
        assert results[i].shape == solos[i].shape
        np.testing.assert_allclose(results[i], solos[i], atol=1e-5)


def test_hello_errors(daemon):
    # wrong sample rate
    with pytest.raises(RuntimeError, match="16000 Hz"):
        LiveClient(daemon.port, sample_rate=44100)
    # subject out of range
    with pytest.raises(RuntimeError, match="subject"):
        LiveClient(daemon.port, subject=99)
    # first message is not a hello
    s = socket.create_connection(("127.0.0.1", daemon.port), timeout=30)
    send_msg(s, b"A", b"\x00" * 8)
    typ, payload = recv_msg(s)
    assert typ == b"X" and "hello" in json.loads(payload.decode())["error"]
    s.close()


def test_busy_pool_rejects_fast_fail(variables):
    d = LiveStreamingDaemon(
        server=StreamingServer(
            variables, N_VERTS, n_streams=1, chunk_seconds=CHUNK_S,
            left_seconds=0.8, lookahead_seconds=0.0,
        ),
    )
    d.start()
    try:
        holder = LiveClient(d.port)
        with pytest.raises(RuntimeError, match="busy"):
            LiveClient(d.port)  # timeout=0: fail fast
        assert d.stats()["rejected"] == 1
        holder.close()
        # slot released on close: a new client gets in (bounded wait covers
        # the server-side close racing this connect)
        c = LiveClient(d.port, timeout=10.0)
        c.close()
    finally:
        d.stop()


def test_ragged_audio_payload_is_an_error(daemon):
    c = LiveClient(daemon.port)
    send_msg(c._sock, b"A", b"\x00" * 6)  # not a whole float32 count
    with pytest.raises(RuntimeError, match="float32"):
        c.finish()
    c.close()


def test_serve_cli_dual_surface(tmp_path):
    """`a2f-serve --live-port` runs BOTH wire surfaces from one process and
    one set of weights: the offline HTTP daemon and the live TCP daemon
    must return the same animation for the same clip (the streaming pool
    is exact vs the offline predictor for chunk-multiple pushes)."""
    import http.client
    import io
    import os
    import subprocess
    import sys
    import time

    from audio2face_tpu.data.synthetic import generate_synthetic_face_obj

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sr = 22000
    cfg = tmp_path / "audio2mesh.yaml"
    cfg.write_text(
        "batch_size: 8\nmodelname: audio2mesh\nvertex_count: 300\n"
        "one_hot_size: 12\nsplit_frame: True\npercision: '32'\nlr: 1e-3\n"
        "feature_extractor: mfcc\nsample_rate: 22000\nn_feature: 32\n"
        "out_dim: 52\nwin_length: 440\n"
    )
    tmpl = str(tmp_path / "face.obj")
    generate_synthetic_face_obj(tmpl, n_verts=100)

    # ask the kernel for two free ports (a bound-then-closed port can be
    # re-bound immediately; the race window is acceptable for a test)
    ports = []
    for _ in range(2):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        ports.append(s.getsockname()[1])
        s.close()
    http_port, live_port = ports

    env = dict(os.environ)
    env["A2F_FORCE_PLATFORM"] = "cpu"  # hermetic: don't grab the TPU
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "audio2face_tpu.cli.serve",
         "--template", tmpl, "--config", str(cfg),
         "--port", str(http_port), "--live-port", str(live_port),
         "--live-streams", "2", "--batch", "2"],
        env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.monotonic() + 600  # CPU jit compiles dominate
        while True:
            assert proc.poll() is None, f"serve CLI died:\n{proc.stdout.read()}"
            try:
                c = http.client.HTTPConnection("127.0.0.1", http_port, timeout=5)
                c.request("GET", "/healthz")
                if c.getresponse().status == 200:
                    c.close()
                    break
                c.close()
            except OSError:
                pass
            assert time.monotonic() < deadline, "serve CLI never became healthy"
            time.sleep(1.0)

        rng = np.random.default_rng(7)
        clip = (rng.normal(size=int(0.9 * sr)) * 0.1).astype(np.float32)

        c = http.client.HTTPConnection("127.0.0.1", http_port, timeout=300)
        c.request("POST", "/v1/infer?subject=1", body=clip.tobytes(),
                  headers={"Content-Type": "application/octet-stream",
                           "X-Sample-Rate": str(sr)})
        r = c.getresponse()
        body = r.read()
        c.close()
        assert r.status == 200, body
        assert r.getheader("X-FPS") == "60"
        offline = np.load(io.BytesIO(body))

        with LiveClient(live_port, subject=1, sample_rate=sr,
                        timeout=30.0) as lc:
            assert lc.info["streams"] == 2 and lc.fps == 60
            live = np.concatenate([lc.send(clip), lc.finish()])

        assert live.shape == offline.shape
        np.testing.assert_allclose(live, offline, atol=1e-5)

        # GET /stats merges the live daemon's counters under "live"
        c = http.client.HTTPConnection("127.0.0.1", http_port, timeout=30)
        c.request("GET", "/stats")
        stats = json.loads(c.getresponse().read().decode())
        c.close()
        assert stats["ok"] >= 1
        assert stats["live"]["sessions"] == 1
        assert stats["live"]["frames_out"] == offline.shape[0]
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def test_frame_pool_over_the_wire():
    """The wire layer is pool-agnostic: a frame-model FrameStreamPool behind
    StreamingServer serves over TCP, and matches the offline predictor."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.frame_stream import FrameStreamPool
    from audio2face_tpu.serving import FramePredictor

    sr = 22000
    cfg = ExpConfig(
        batch_size=8, modelname="audio2mesh", vertex_count=N_VERTS,
        one_hot_size=12, feature_extractor="mfcc", sample_rate=sr,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-3,
    )
    pred = FramePredictor(cfg, max_batch=2, frame_batch=8, bucket_seconds=0.5, seed=3)
    pool = FrameStreamPool(cfg, variables=pred.variables, n_streams=2, frame_batch=8)
    tmpl = np.zeros((N_VERTS // 3, 3), np.float32)
    d = LiveStreamingDaemon(server=StreamingServer(pool=pool), template=tmpl)
    d.start()
    try:
        rng = np.random.default_rng(3)
        clip = (rng.normal(size=int(0.9 * sr)) * 0.1).astype(np.float32)
        want = pred([clip], np.eye(12, dtype=np.float32)[[1]], tmpl)[0]
        with LiveClient(d.port, subject=1, sample_rate=sr) as c:
            assert c.fps == 60 and c.info["sample_rate"] == sr
            got = np.concatenate([c.send(clip), c.finish()])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)
    finally:
        d.stop()
