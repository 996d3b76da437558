import threading
import time

import numpy as np
import pytest

import jax

from audio2face_tpu.serving import FaceFormerPredictor


@pytest.fixture(scope="module")
def predictor():
    return FaceFormerPredictor(
        n_verts=300, bf16=False, max_batch=4, bucket_seconds=0.5, decode_impl="scan"
    )


def test_variable_length_batch(predictor):
    rng = np.random.default_rng(0)
    audios = [
        (rng.normal(size=int(s * 16000)) * 0.1).astype(np.float32)
        for s in (0.3, 0.7, 0.45)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[0, 4, 9]]
    template = rng.normal(size=(100, 3)).astype(np.float32)
    out = predictor(audios, one_hot, template)
    assert len(out) == 3
    for a, v in zip(audios, out):
        assert v.shape == (len(a) * 60 // 16000, 100, 3)
    # only two bucket/batch-shape programs should have compiled (0.5s and 1.0s)
    assert len(predictor._fns) <= 2


def test_batch_matches_solo(predictor):
    rng = np.random.default_rng(1)
    a = (rng.normal(size=8000) * 0.1).astype(np.float32)
    one_hot = np.eye(12, dtype=np.float32)[[2]]
    template = rng.normal(size=(100, 3)).astype(np.float32)
    solo = predictor([a], one_hot, template)[0]

    batch = predictor(
        [a, (rng.normal(size=4000) * 0.1).astype(np.float32)],
        np.eye(12, dtype=np.float32)[[2, 7]],
        template,
    )
    np.testing.assert_allclose(batch[0], solo, atol=2e-3)


def test_resampling_path(predictor):
    rng = np.random.default_rng(2)
    a22 = (rng.normal(size=11000) * 0.1).astype(np.float32)
    out = predictor([a22], np.eye(12, dtype=np.float32)[[0]],
                    rng.normal(size=(100, 3)).astype(np.float32), sample_rate=22000)
    assert out[0].shape[0] == (11000 * 16000 // 22000) * 60 // 16000


@pytest.mark.slow
def test_from_checkpoint_matches_trainer_predict(tmp_path):
    """Unit-scale parity: a framework-trained orbax checkpoint served through
    FaceFormerPredictor must reproduce Audio2FaceExperiment.predict exactly.

    Checkpoints are trained with the x100 vertex convention
    (lightning_model.py:145-148); the predictor must feed template*100 and
    return output/100 (lightning_model.py:215-225). Round-1 served raw units
    — outputs were wrong by ~100x for any trained checkpoint; the zero-init
    vertice maps hide this at init, so we take real gradient steps first.
    """
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    n_verts = 300
    seconds = 0.25
    sr = 16000
    cfg = ExpConfig(
        batch_size=1, modelname="faceformer", vertex_count=n_verts,
        one_hot_size=12, feature_extractor=None, sample_rate=sr,
        split_frame=False, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-3,
    )
    exp = Audio2FaceExperiment(cfg, log_dir=str(tmp_path / "run"), tensorboard=False)

    rng = np.random.default_rng(0)
    n_samples = int(seconds * sr)
    n_frames = n_samples * 60 // sr
    audio = (rng.normal(size=(1, n_samples)) * 0.1).astype(np.float32)
    batch = {
        "audio": audio,
        "audio_lengths": np.array([n_samples], np.int32),
        "verts": rng.normal(size=(1, n_frames, n_verts // 3, 3)).astype(np.float32),
        "frame_lengths": np.array([n_frames], np.int32),
        "template_vert": rng.normal(size=(1, n_verts // 3, 3)).astype(np.float32),
        "one_hot": np.eye(12, dtype=np.float32)[[3]],
    }
    state = exp.init_state(batch)
    for i in range(2):  # move the zero-init vertice maps off zero
        state, _ = exp.train_step(state, batch, jax.random.PRNGKey(i))
    ckpt = exp.save_checkpoint(state, epoch=0)

    want, _ = exp.predict(state, batch)  # data units (/100)
    want = np.asarray(want)[0]

    pred = FaceFormerPredictor.from_checkpoint(
        ckpt, n_verts=n_verts, bf16=False, decode_impl="scan",
        bucket_seconds=seconds,
    )
    got = pred([audio[0]], batch["one_hot"], batch["template_vert"][0])[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
    # sanity: the learned offset is visibly nonzero, so scale bugs can't hide
    offset = np.abs(got - batch["template_vert"][0][None]).max()
    assert offset > 1e-6


def test_one_hot_batch_mismatch(predictor):
    with pytest.raises(ValueError, match="one_hot"):
        predictor([np.zeros(8000, np.float32)], np.eye(12, dtype=np.float32)[[0, 1]],
                  np.zeros((100, 3), np.float32))


def test_mesh_sharded_serving_matches_single_device(predictor):
    """Fleet serving: a (data, 1) mesh predictor shard_maps each call over
    the batch axis (Pallas kernels run per-chip on local slices) and must
    reproduce the single-device predictor exactly, including when the batch
    needs padding to the mesh width."""
    from audio2face_tpu.parallel.mesh import make_mesh

    mesh_pred = FaceFormerPredictor(
        n_verts=300, bf16=False, max_batch=4, bucket_seconds=0.5,
        decode_impl="scan", variables=predictor.variables,
        mesh=make_mesh((4, 1), devices=jax.devices()[:4]),
    )
    rng = np.random.default_rng(3)
    # 3 clips on a 4-wide mesh -> one dummy padding row
    audios = [
        (rng.normal(size=int(s * 16000)) * 0.1).astype(np.float32)
        for s in (0.3, 0.5, 0.25)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[1, 5, 8]]
    template = rng.normal(size=(100, 3)).astype(np.float32)

    want = predictor(audios, one_hot, template)
    got = mesh_pred(audios, one_hot, template)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_batching_server_coalesces_and_matches_direct(predictor):
    """Concurrent submissions through BatchingServer return exactly the
    direct predictor outputs, including across mixed lengths."""
    import threading

    from audio2face_tpu.serving_queue import BatchingServer

    rng = np.random.default_rng(7)
    audios = [
        (rng.normal(size=int(s * 16000)) * 0.1).astype(np.float32)
        for s in (0.3, 0.45, 0.25, 0.5, 0.35)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[0, 3, 5, 7, 9]]
    template = rng.normal(size=(100, 3)).astype(np.float32)
    want = predictor(audios, one_hot, template)

    server = BatchingServer(predictor, max_wait_ms=50.0)
    futures = [None] * len(audios)

    def submit(i):
        futures[i] = server.submit(audios[i], one_hot[i], template)

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(len(audios))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    got = [f.result(timeout=120) for f in futures]
    server.close()
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_batching_server_close_drains():
    from audio2face_tpu.serving_queue import BatchingServer

    class Fake:
        max_batch = 4

        def __call__(self, audios, one_hot, template, sample_rate=16000):
            return [np.full((3, 2, 3), float(len(a))) for a in audios]

    server = BatchingServer(Fake(), max_wait_ms=5.0)
    f = server.submit(np.zeros(100, np.float32), np.zeros(12), np.zeros((2, 3)))
    assert f.result(timeout=10).shape == (3, 2, 3)
    server.close()
    with pytest.raises(RuntimeError):
        server.submit(np.zeros(10, np.float32), np.zeros(12), np.zeros((2, 3)))


class _SlowFake:
    """Predictor stub whose calls block until released — lets tests park the
    dispatcher deterministically."""

    max_batch = 4

    def __init__(self):
        self.gate = threading.Event()
        self.calls = []

    def __call__(self, audios, one_hot, template, sample_rate=16000):
        self.calls.append([float(a[0]) for a in audios])
        self.gate.wait(timeout=30)
        if any(a[0] == -1.0 for a in audios):  # poison marker
            raise RuntimeError("bad batch")
        return [np.full((3, 2, 3), float(a[0])) for a in audios]


def _req(server, tag, **kw):
    return server.submit(
        np.full(100, float(tag), np.float32), np.zeros(12), np.zeros((2, 3)), **kw
    )


def test_queue_cancellation_skips_request():
    """future.cancel() before dispatch means the request never runs."""
    from audio2face_tpu.serving_queue import BatchingServer

    fake = _SlowFake()
    server = BatchingServer(fake, max_wait_ms=1.0)
    blocker = _req(server, 1)  # parks the dispatcher inside fake()
    time.sleep(0.1)
    victim = _req(server, 2)
    assert victim.cancel()  # still queued -> cancellable
    fake.gate.set()
    assert blocker.result(timeout=10)[0, 0, 0] == 1.0
    server.close()
    assert victim.cancelled()
    assert [1.0] in fake.calls and not any(2.0 in c for c in fake.calls)


def test_queue_timeout_resolves_with_timeouterror():
    """A request whose queue deadline passes resolves with TimeoutError
    instead of waiting forever behind a slow batch."""
    from audio2face_tpu.serving_queue import BatchingServer

    fake = _SlowFake()
    server = BatchingServer(fake, max_wait_ms=1.0)
    blocker = _req(server, 1)
    time.sleep(0.1)
    stale = _req(server, 3, timeout=0.05)
    time.sleep(0.2)  # deadline passes while the dispatcher is busy
    fake.gate.set()
    assert blocker.result(timeout=10)[0, 0, 0] == 1.0
    with pytest.raises(TimeoutError):
        stale.result(timeout=10)
    server.close()
    assert not any(3.0 in c for c in fake.calls)


def test_queue_submit_timeout_honored_at_backpressure_gate():
    """submit(timeout=) must bound the WAIT FOR A SLOT too: with the queue
    at max depth the caller gets TimeoutError after ~timeout seconds, not
    an unbounded block behind a stuck batch (the clock starts at submit)."""
    from audio2face_tpu.serving_queue import BatchingServer

    fake = _SlowFake()
    server = BatchingServer(fake, max_wait_ms=1.0, max_queue=1)
    blocker = _req(server, 1)  # parks the dispatcher inside fake()
    time.sleep(0.1)
    filler = _req(server, 2)  # takes the one depth slot
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        _req(server, 3, timeout=0.2)  # blocked at the gate -> timed out
    assert time.monotonic() - t0 < 5.0
    fake.gate.set()
    assert blocker.result(timeout=10)[0, 0, 0] == 1.0
    assert filler.result(timeout=10)[0, 0, 0] == 2.0
    server.close()
    assert not any(3.0 in c for c in fake.calls)


def test_queue_backpressure_bounded_depth():
    """max_queue bounds in-flight depth: non-blocking submits at the cap
    raise queue.Full; blocking submits proceed once the dispatcher drains."""
    import queue as queue_mod

    from audio2face_tpu.serving_queue import BatchingServer

    fake = _SlowFake()
    server = BatchingServer(fake, max_wait_ms=1.0, max_queue=2)
    blocker = _req(server, 1)
    time.sleep(0.1)  # dispatcher took it off the queue -> slot freed
    a = _req(server, 2, block=False)
    b = _req(server, 4, block=False)
    with pytest.raises(queue_mod.Full):
        _req(server, 5, block=False)
    # a blocking submit applies backpressure, then lands once a slot frees
    landed = []

    def blocked_submit():
        landed.append(_req(server, 6))

    t = threading.Thread(target=blocked_submit)
    t.start()
    time.sleep(0.1)
    assert not landed  # still backpressured
    fake.gate.set()  # dispatcher drains; slots free up
    t.join(timeout=10)
    assert landed
    for f, want in [(blocker, 1.0), (a, 2.0), (b, 4.0), (landed[0], 6.0)]:
        assert f.result(timeout=10)[0, 0, 0] == want
    server.close()


def test_requeue_slotless_straggler_never_overreleases():
    """Regression: a rate-mismatched straggler requeued while concurrent
    submits hold every depth slot rides slotless; taking it later must NOT
    release a slot it doesn't own (the BoundedSemaphore over-release used
    to raise ValueError inside _run and kill the dispatcher thread)."""
    from concurrent.futures import Future

    from audio2face_tpu.serving_queue import BatchingServer, _Request

    fake = _SlowFake()
    fake.gate.set()
    server = BatchingServer(fake, max_wait_ms=1.0, max_queue=1)
    server.close()  # park the dispatcher; drive the internals directly

    def mk(rate):
        return _Request(
            np.zeros(8, np.float32), np.zeros(12, np.float32),
            np.zeros((2, 3), np.float32), rate, Future(),
        )

    assert server._slots.acquire(blocking=False)  # r1's submit takes the slot
    r1 = mk(8000)
    server._q.put(r1)
    assert server._take() is r1  # pop frees the slot
    assert server._slots.acquire(blocking=False)  # concurrent submit grabs it
    r2 = mk(16000)
    server._q.put(r2)
    server._requeue(r1)  # no slot free -> rides slotless
    assert not r1.holds_slot
    assert server._take() is r2  # releases r2's slot
    assert server._take() is r1  # previously: ValueError (over-release)
    # depth invariant intact: exactly one slot available afterwards
    assert server._slots.acquire(blocking=False)
    assert not server._slots.acquire(blocking=False)
    server._slots.release()


def test_queue_mixed_rates_under_bounded_depth():
    """Concurrent submitters with alternating sample rates against a small
    max_queue: every future resolves and the dispatcher survives the
    rate-change requeue churn."""
    from audio2face_tpu.serving_queue import BatchingServer

    fake = _SlowFake()
    fake.gate.set()
    server = BatchingServer(fake, max_wait_ms=5.0, max_queue=2)
    futs = [None] * 12

    def worker(i):
        futs[i] = server.submit(
            np.full(100, float(i + 1), np.float32), np.zeros(12),
            np.zeros((2, 3)), sample_rate=16000 if i % 2 == 0 else 8000,
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for i, f in enumerate(futs):
        assert f.result(timeout=30)[0, 0, 0] == float(i + 1)
    server.close()


def test_queue_failing_batch_does_not_wedge_dispatcher():
    """A predictor exception resolves that group's futures; later requests
    are still served — under concurrent submitters."""
    from audio2face_tpu.serving_queue import BatchingServer

    fake = _SlowFake()
    fake.gate.set()  # run at full speed
    server = BatchingServer(fake, max_wait_ms=1.0)
    bad = _req(server, -1)  # poison: its batch raises
    with pytest.raises(RuntimeError, match="bad batch"):
        bad.result(timeout=10)

    futs = {}
    lock = threading.Lock()

    def submit_many(base):
        for i in range(5):
            f = _req(server, base + i)
            with lock:
                futs[base + i] = f

    threads = [threading.Thread(target=submit_many, args=(10 * k,)) for k in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for tag, f in futs.items():
        assert f.result(timeout=30)[0, 0, 0] == float(tag)
    server.close()


def test_warmup_precompiles_all_buckets(predictor):
    """warmup(max_seconds) compiles every (batch, bucket) program up front:
    afterwards, serving any clip <= max_seconds adds NO new decode programs
    (first-request latency is bounded by execution, not Mosaic compiles)."""
    calls = predictor.warmup(1.0)  # 2 buckets (0.5s grid) x batch grid {1, 2, 4}
    assert calls == 6
    keys_after_warmup = set(predictor._fns)

    rng = np.random.default_rng(7)
    audios = [
        (rng.normal(size=int(s * 16000)) * 0.1).astype(np.float32)
        for s in (0.2, 0.6, 0.9, 1.0, 0.4)
    ]
    one_hot = np.eye(12, dtype=np.float32)[[0, 1, 2, 3, 4]]
    template = rng.normal(size=(100, 3)).astype(np.float32)
    out = predictor(audios, one_hot, template)
    decode_keys = {k for k in predictor._fns if not (isinstance(k[0], str) and k[0] == "vh")}
    warm_decode = {k for k in keys_after_warmup if not (isinstance(k[0], str) and k[0] == "vh")}
    assert decode_keys == warm_decode, "serving compiled a new decode program after warmup"
    for a, v in zip(audios, out):
        assert v.shape == (len(a) * 60 // 16000, 100, 3)


def test_batch_grid_idempotent_and_complete():
    """The batch grid is closed under padding (warmup enumerates EXACTLY the
    shapes live traffic pads to) for any mesh data axis — including
    non-power-of-two axes, where the earlier pow2-then-round-up formula
    padded a grid size past itself (n_data=3: pad(3) -> 6) and warmup
    silently missed programs."""
    from audio2face_tpu.serving import _batch_grid, _pad_batch

    for max_batch, n_data in [(8, 1), (6, 3), (10, 5), (12, 3), (16, 4), (6, 6)]:
        grid = _batch_grid(max_batch, n_data)
        assert grid[-1] == max_batch
        for g in grid:
            assert _pad_batch(g, max_batch, n_data) == g, (max_batch, n_data, g)
            assert g % n_data == 0
        for b in range(1, max_batch + 1):
            p = _pad_batch(b, max_batch, n_data)
            assert p in grid and p >= b, (max_batch, n_data, b, p)
        assert len(grid) <= max_batch.bit_length() + 1


@pytest.mark.slow
def test_biwi_predictor_plumbing():
    """dataset="biwi" serves at the 25 fps clock, and a checkpoint/predictor
    dataset mismatch is an error instead of silent garbage (flax would
    ignore the unused cross_q/cross_k params and run the wrong alignment)."""
    biwi = FaceFormerPredictor(
        n_verts=300, bf16=False, max_batch=2, bucket_seconds=0.5,
        dataset="biwi",
    )
    assert biwi.fps == 25 and biwi.model.dataset == "biwi" and biwi.model.period == 25
    assert "cross_q_kernel" in biwi.variables["params"]

    rng = np.random.default_rng(3)
    a = (rng.normal(size=8000) * 0.1).astype(np.float32)
    out = biwi([a], np.eye(12, dtype=np.float32)[[1]],
               rng.normal(size=(100, 3)).astype(np.float32))
    assert out[0].shape == (8000 * 25 // 16000, 100, 3)
    assert np.isfinite(out[0]).all()

    with pytest.raises(ValueError, match="dataset='biwi'"):
        FaceFormerPredictor(n_verts=300, variables=biwi.variables)
    voca = FaceFormerPredictor(
        n_verts=300, bf16=False, max_batch=2, bucket_seconds=0.5,
        decode_impl="scan",
    )
    with pytest.raises(ValueError, match="dataset='vocaset'"):
        FaceFormerPredictor(n_verts=300, variables=voca.variables, dataset="biwi")

    # sequence-parallel serving of BIWI checkpoints: the pre-layers BIWI
    # trim branch is window-local, so the time-sharded stack reproduces the
    # single-device predictor (round 3 shipped this as NotImplementedError)
    from audio2face_tpu.parallel.mesh import make_mesh

    sp = FaceFormerPredictor(
        n_verts=300, bf16=False, max_batch=2, bucket_seconds=0.5,
        dataset="biwi", variables=biwi.variables,
        sp_mesh=make_mesh((2, 1), devices=jax.devices()[:2]),
    )
    template = rng.normal(size=(100, 3)).astype(np.float32)
    want = biwi([a], np.eye(12, dtype=np.float32)[[1]], template)
    got = sp([a], np.eye(12, dtype=np.float32)[[1]], template)
    np.testing.assert_allclose(got[0], want[0], atol=2e-5, rtol=1e-5)

    # the streaming paths assume the vocaset 60 fps adapter — they must
    # reject BIWI checkpoints instead of running the wrong alignment
    from audio2face_tpu.multistream import MultiStreamFaceFormerPredictor
    from audio2face_tpu.streaming import StreamingFaceFormerPredictor

    with pytest.raises(ValueError, match="BIWI"):
        StreamingFaceFormerPredictor(biwi.variables, n_verts=300)
    with pytest.raises(ValueError, match="BIWI"):
        MultiStreamFaceFormerPredictor(biwi.variables, n_verts=300, n_streams=2)
