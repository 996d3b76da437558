"""HTTP serving daemon (http_server.py): wire-level tests against a tiny
FaceFormer predictor — WAV and raw-PCM bodies, coalescing under concurrent
clients, error statuses, stats, and clean shutdown."""

import http.client
import io
import json
import threading
import time

import numpy as np
import pytest
import scipy.io.wavfile as wavfile

from audio2face_tpu.http_server import ServingDaemon, decode_audio_body
from audio2face_tpu.serving import FaceFormerPredictor

SR = 16000
N_VERTS = 300


@pytest.fixture(scope="module")
def daemon():
    predictor = FaceFormerPredictor(
        n_verts=N_VERTS, bf16=False, max_batch=4, bucket_seconds=0.5,
        decode_impl="scan",
    )
    d = ServingDaemon(
        predictor,
        np.random.default_rng(0).normal(size=(N_VERTS // 3, 3)).astype(np.float32),
        port=0, max_wait_ms=20.0, max_queue=16,
    )
    d.start()
    yield d
    d.stop()


def _conn(daemon):
    return http.client.HTTPConnection("127.0.0.1", daemon.port, timeout=300)


def _wav_bytes(audio: np.ndarray, sr: int = SR) -> bytes:
    buf = io.BytesIO()
    wavfile.write(buf, sr, (audio * 32768).clip(-32768, 32767).astype(np.int16))
    return buf.getvalue()


def _post_wav(daemon, audio, query="", headers=None):
    c = _conn(daemon)
    c.request("POST", f"/v1/infer{query}", body=_wav_bytes(audio),
              headers={"Content-Type": "audio/wav", **(headers or {})})
    r = c.getresponse()
    body = r.read()
    c.close()
    return r, body


def test_healthz(daemon):
    c = _conn(daemon)
    c.request("GET", "/healthz")
    r = c.getresponse()
    obj = json.loads(r.read())
    c.close()
    assert r.status == 200
    assert obj["status"] == "ok"
    assert obj["model"] == "FaceFormerPredictor"


def test_infer_wav_to_npy(daemon):
    rng = np.random.default_rng(1)
    audio = (rng.normal(size=int(0.4 * SR)) * 0.1).astype(np.float32)
    r, body = _post_wav(daemon, audio, query="?subject=3")
    assert r.status == 200, body
    assert r.getheader("Content-Type") == "application/x-npy"
    verts = np.load(io.BytesIO(body))
    n_frames = int(0.4 * SR) * 60 // SR
    assert verts.shape == (n_frames, N_VERTS // 3, 3)
    assert int(r.getheader("X-Frames")) == n_frames
    assert np.isfinite(verts).all()


def test_infer_raw_pcm_and_json_accept(daemon):
    rng = np.random.default_rng(2)
    audio = (rng.normal(size=int(0.3 * SR)) * 0.1).astype(np.float32)
    c = _conn(daemon)
    c.request("POST", "/v1/infer", body=audio.tobytes(),
              headers={"X-Sample-Rate": str(SR), "Accept": "application/json"})
    r = c.getresponse()
    obj = json.loads(r.read())
    c.close()
    assert r.status == 200
    got = np.asarray(obj["vertices"], np.float32)
    assert got.shape == tuple(obj["shape"]) == (int(0.3 * SR) * 60 // SR, N_VERTS // 3, 3)


def test_wav_and_pcm_agree(daemon):
    """The two body encodings must hit the same decode path (modulo the
    int16 quantization of the WAV container)."""
    rng = np.random.default_rng(3)
    audio = (rng.normal(size=int(0.3 * SR)) * 0.1).astype(np.float32)
    _, body_wav = _post_wav(daemon, audio)
    c = _conn(daemon)
    c.request("POST", "/v1/infer", body=audio.tobytes(),
              headers={"X-Sample-Rate": str(SR)})
    r = c.getresponse()
    body_pcm = r.read()
    c.close()
    v_wav = np.load(io.BytesIO(body_wav))
    v_pcm = np.load(io.BytesIO(body_pcm))
    np.testing.assert_allclose(v_wav, v_pcm, atol=5e-3)


@pytest.mark.slow
def test_concurrent_clients_coalesce(daemon):
    rng = np.random.default_rng(4)
    audios = [(rng.normal(size=int(0.3 * SR)) * 0.1).astype(np.float32)
              for _ in range(6)]
    results: list = [None] * 6
    solo = [np.load(io.BytesIO(_post_wav(daemon, a)[1])) for a in audios[:2]]

    def worker(i):
        r, body = _post_wav(daemon, audios[i], query=f"?subject={i}")
        results[i] = (r.status, body)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (status, body) in enumerate(results):
        assert status == 200
        v = np.load(io.BytesIO(body))
        assert v.shape == (int(0.3 * SR) * 60 // SR, N_VERTS // 3, 3)
    # subject=0/1 solo answers reproduce under concurrency (batch == solo)
    for i in range(2):
        _, body = _post_wav(daemon, audios[i], query=f"?subject={i}")
        np.testing.assert_allclose(np.load(io.BytesIO(body)),
                                   np.load(io.BytesIO(results[i][1])), atol=2e-3)
    del solo


def test_error_statuses(daemon):
    # empty body -> 400
    c = _conn(daemon)
    c.request("POST", "/v1/infer", body=b"",
              headers={"Content-Type": "audio/wav"})
    r = c.getresponse()
    assert r.status == 400 and b"empty" in r.read()
    # raw PCM without a rate header -> 400
    c.request("POST", "/v1/infer", body=np.zeros(100, np.float32).tobytes())
    r = c.getresponse()
    assert r.status == 400 and b"X-Sample-Rate" in r.read()
    # bad subject -> 400
    c.request("POST", "/v1/infer?subject=99",
              body=np.zeros(1600, np.float32).tobytes(),
              headers={"X-Sample-Rate": str(SR)})
    r = c.getresponse()
    assert r.status == 400 and b"subject" in r.read()
    # unknown path -> 404
    c.request("POST", "/v1/nope", body=b"x")
    r = c.getresponse()
    assert r.status == 404
    r.read()
    c.close()


def test_stats_counts(daemon):
    before = daemon.stats()
    audio = np.zeros(int(0.3 * SR), np.float32)
    r, _ = _post_wav(daemon, audio)
    assert r.status == 200
    after = daemon.stats()
    assert after["ok"] == before["ok"] + 1
    assert after["requests"] == before["requests"] + 1
    assert after["in_flight"] == 0
    assert after["latency_ms"]["window"] >= 1
    assert after["latency_ms"]["p95"] >= after["latency_ms"]["p50"] > 0


def test_decode_audio_body_wav_stereo_int16():
    rng = np.random.default_rng(5)
    stereo = (rng.normal(size=(800, 2)) * 0.1 * 32768).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, 22050, stereo)
    wav, sr = decode_audio_body(buf.getvalue(), "audio/wav", None)
    assert sr == 22050 and wav.shape == (800,) and wav.dtype == np.float32
    np.testing.assert_allclose(
        wav, (stereo / 32768.0).mean(axis=1).astype(np.float32), atol=1e-6
    )


def test_serve_cli_entry_point_importable():
    import importlib

    mod = importlib.import_module("audio2face_tpu.cli.serve")
    assert callable(mod.main)


def test_frame_model_daemon():
    """The daemon serves frame models through the same wire surface."""
    from audio2face_tpu.config import ExpConfig

    from audio2face_tpu.serving import FramePredictor

    cfg = ExpConfig(
        batch_size=4, modelname="audio2mesh", vertex_count=N_VERTS,
        one_hot_size=12, feature_extractor="mfcc", sample_rate=22000,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-4,
    )
    predictor = FramePredictor(cfg, max_batch=2, frame_batch=8, bucket_seconds=0.3)
    d = ServingDaemon(
        predictor,
        np.random.default_rng(8).normal(size=(N_VERTS // 3, 3)).astype(np.float32),
        port=0,
    )
    d.start()
    try:
        audio = (np.random.default_rng(9).normal(size=int(0.3 * 22000)) * 0.1
                 ).astype(np.float32)
        c = _conn(d)
        c.request("POST", "/v1/infer?subject=1", body=_wav_bytes(audio, sr=22000),
                  headers={"Content-Type": "audio/wav"})
        r = c.getresponse()
        body = r.read()
        c.close()
        assert r.status == 200, body
        verts = np.load(io.BytesIO(body))
        assert verts.shape == (int(0.3 * 22000) * 60 // 22000, N_VERTS // 3, 3)
        assert np.isfinite(verts).all()
    finally:
        d.stop()


class _StubPredictor:
    """Minimal predictor double: blocks until released, so tests can hold
    the dispatcher busy and saturate the queue deterministically."""

    n_onehot = 12
    max_batch = 1

    def __init__(self):
        self.gate = threading.Event()

    def __call__(self, audios, one_hot, template, sample_rate=16000):
        self.gate.wait(timeout=30)
        return [np.zeros((3, 100, 3), np.float32) for _ in audios]


def _post_async(daemon, results, i):
    c = _conn(daemon)
    c.request("POST", "/v1/infer", body=np.zeros(1600, np.float32).tobytes(),
              headers={"X-Sample-Rate": "16000"})
    r = c.getresponse()
    results[i] = (r.status, r.read())
    c.close()


def test_load_shed_returns_429():
    """queue_block=False: at max_queue depth new requests are rejected with
    429 immediately instead of holding the connection."""
    stub = _StubPredictor()
    d = ServingDaemon(
        stub, np.zeros((100, 3), np.float32), port=0,
        max_queue=1, queue_block=False, max_wait_ms=1.0,
    )
    d.start()
    try:
        results: list = [None] * 3
        threads = [threading.Thread(target=_post_async, args=(d, results, i))
                   for i in range(3)]
        for t in threads:
            t.start()
            time.sleep(0.3)  # first occupies the dispatcher, second the queue
        stub.gate.set()
        for t in threads:
            t.join()
        statuses = sorted(s for s, _ in results)
        assert statuses[0] == 200  # at least the first completes
        assert 429 in statuses, statuses
        assert d.stats()["rejected"] >= 1
    finally:
        d.stop()


def test_backpressure_timeout_returns_503():
    """queue_block=True (default): a saturated queue holds the request up
    to its timeout, then resolves 503."""
    stub = _StubPredictor()
    d = ServingDaemon(
        stub, np.zeros((100, 3), np.float32), port=0,
        max_queue=1, default_timeout=0.5, max_wait_ms=1.0,
    )
    d.start()
    try:
        results: list = [None] * 3
        threads = [threading.Thread(target=_post_async, args=(d, results, i))
                   for i in range(3)]
        for t in threads:
            t.start()
            time.sleep(0.3)
        # don't release the gate until the stragglers have timed out
        time.sleep(1.0)
        stub.gate.set()
        for t in threads:
            t.join()
        statuses = sorted(s for s, _ in results)
        assert 503 in statuses, statuses
        assert d.stats()["timeouts"] >= 1
    finally:
        d.stop()


def test_int32_and_uint8_wav_bodies_normalize(daemon):
    """24/32-bit and 8-bit PCM WAVs must decode to the same animation as the
    int16 encoding of the same signal — scipy returns raw container dtypes,
    so an unnormalized int32 body would feed ~1e9-amplitude samples in and
    return garbage with a 200."""
    rng = np.random.default_rng(11)
    audio = (rng.normal(size=int(0.3 * SR)) * 0.1).astype(np.float32)
    r16, body16 = _post_wav(daemon, audio)
    assert r16.status == 200
    ref = np.load(io.BytesIO(body16))

    buf = io.BytesIO()
    wavfile.write(buf, SR, (audio * 2147483648).clip(-2**31, 2**31 - 1).astype(np.int32))
    c = _conn(daemon)
    c.request("POST", "/v1/infer", body=buf.getvalue(),
              headers={"Content-Type": "audio/wav"})
    r = c.getresponse()
    v32 = np.load(io.BytesIO(r.read()))
    c.close()
    assert r.status == 200
    np.testing.assert_allclose(v32, ref, atol=1e-4)

    buf = io.BytesIO()
    wavfile.write(buf, SR, ((audio * 128) + 128).clip(0, 255).astype(np.uint8))
    c = _conn(daemon)
    c.request("POST", "/v1/infer", body=buf.getvalue(),
              headers={"Content-Type": "audio/wav"})
    r = c.getresponse()
    v8 = np.load(io.BytesIO(r.read()))
    c.close()
    assert r.status == 200
    assert np.isfinite(v8).all()
    # 8-bit quantization is coarse; just require the same ballpark
    assert np.abs(v8 - ref).max() < np.abs(ref).max() + 1.0


def test_keepalive_survives_errors_with_unread_bodies(daemon):
    """HTTP/1.1 keep-alive framing: an error reply must not leave the request
    body unread in the socket — otherwise the NEXT request on the same
    connection parses the leftover WAV bytes as its request line."""
    audio = np.zeros(int(0.3 * SR), np.float32)
    wav = _wav_bytes(audio)
    c = _conn(daemon)
    # bad subject param: fails BEFORE inference, with a large unread body
    c.request("POST", "/v1/infer?subject=notanint", body=wav,
              headers={"Content-Type": "audio/wav"})
    r = c.getresponse()
    assert r.status == 400
    r.read()
    # unknown path with a body
    c.request("POST", "/v1/nope", body=wav,
              headers={"Content-Type": "audio/wav"})
    r = c.getresponse()
    assert r.status == 404
    r.read()
    # the SAME connection must still serve a valid request
    c.request("POST", "/v1/infer", body=wav,
              headers={"Content-Type": "audio/wav"})
    r = c.getresponse()
    body = r.read()
    c.close()
    assert r.status == 200, body
    verts = np.load(io.BytesIO(body))
    assert verts.shape == (int(0.3 * SR) * 60 // SR, N_VERTS // 3, 3)
    assert r.getheader("X-FPS") == "60"
