"""FrameStreamPool: live multi-stream serving for the frame models.

Oracle is the offline ``FramePredictor`` (itself pinned against the
host-side dataset fragmenter + trained-checkpoint trainer predict in
test_frame_serving.py): because each frame depends only on its 0.52 s
audio window, live chunked pushes reproduce the offline output for the
same clip to float32 round-off (bitwise when the pool's batch shape
coincides with the offline chunk shape; ~1e-8 otherwise from XLA's
batch-shape-dependent reduction order) — including ragged tails, which
the flush zero-pads just like the offline fragmenter.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audio2face_tpu.config import ExpConfig
from audio2face_tpu.data.vocaset import FPS
from audio2face_tpu.frame_stream import FrameStreamPool
from audio2face_tpu.serving import FramePredictor

SR = 22000
N_VERTS = 300


def _cfg(modelname: str, **over) -> ExpConfig:
    base = dict(
        batch_size=8, modelname=modelname, vertex_count=N_VERTS,
        one_hot_size=12, feature_extractor="mfcc", sample_rate=SR,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="32", lr=1e-3,
    )
    if modelname == "voca":
        base.update(n_feature=16, out_dim=29, win_length=790)
    base.update(over)
    return ExpConfig(**base)


@pytest.fixture(scope="module", params=["audio2mesh", "voca", "song2face"])
def stack(request):
    pred = FramePredictor(
        _cfg(request.param), max_batch=4, frame_batch=16, bucket_seconds=0.5,
        seed=3,
    )
    pool = FrameStreamPool(
        pred.config, variables=pred.variables, n_streams=3, frame_batch=8
    )
    return pred, pool


def _clips(rng, seconds):
    return [
        (rng.normal(size=int(s * SR)) * 0.1).astype(np.float32)
        for s in seconds
    ]


def test_interleaved_streams_match_offline(stack):
    """Three concurrent streams pushed in ragged interleaved packets each
    reproduce the offline whole-clip prediction to float32 round-off,
    including flush tails that are not a multiple of frame_batch."""
    pred, pool = stack
    rng = np.random.default_rng(0)
    clips = _clips(rng, (0.9, 0.37, 0.61))
    one_hot = np.eye(12, dtype=np.float32)[[0, 4, 9]]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    want = pred(clips, one_hot, template)

    slots = [pool.open_stream(one_hot[i], template) for i in range(3)]
    got = [[] for _ in range(3)]
    cursors = [0, 0, 0]
    packet = [3001, 1203, 7777]  # ragged, different per stream
    rr = 0
    while any(cursors[i] < len(clips[i]) for i in range(3)):
        i = rr % 3
        rr += 1
        if cursors[i] >= len(clips[i]):
            continue
        chunk = clips[i][cursors[i] : cursors[i] + packet[i]]
        cursors[i] += packet[i]
        out = pool.push(slots[i], chunk, last=cursors[i] >= len(clips[i]))
        got[i].append(out)
    for i in range(3):
        got[i].append(pool.poll(slots[i]))
        pool.close_stream(slots[i])
        res = np.concatenate(got[i])
        assert res.shape == want[i].shape
        np.testing.assert_allclose(res, want[i], atol=1e-6, rtol=0)
    # shape discipline: ONE compiled program regardless of push raggedness
    assert pool._fn is not None and pool._fn._cache_size() == 1


def test_slot_lifecycle_and_reuse(stack):
    """Pool exhaustion raises; closing a stream frees its slot; a reused
    slot starts a fresh clip with fresh identity and still matches
    offline."""
    pred, pool = stack
    rng = np.random.default_rng(1)
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    one_hot = np.eye(12, dtype=np.float32)

    held = [pool.open_stream(one_hot[i], template) for i in range(3)]
    with pytest.raises(RuntimeError, match="busy"):
        pool.open_stream(one_hot[3], template)
    for s in held:
        pool.close_stream(s)

    clip = _clips(rng, (0.45,))[0]
    want = pred([clip], one_hot[[7]], template)[0]
    s = pool.open_stream(one_hot[7], template)
    out = pool.push(s, clip, last=True)
    np.testing.assert_allclose(out, want, atol=1e-6, rtol=0)
    with pytest.raises(RuntimeError, match="flushed"):
        pool.push(s, clip)
    pool.close_stream(s)
    with pytest.raises(RuntimeError, match="not open"):
        pool.push(s, clip)


def test_poll_collects_frames_driven_by_other_streams(stack):
    """A silent-but-open stream's decodable frames advance when OTHER
    streams push (shared batched step); poll() hands them over."""
    pred, pool = stack
    rng = np.random.default_rng(2)
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    one_hot = np.eye(12, dtype=np.float32)
    long_clip, short_clip = _clips(rng, (0.8, 0.3))
    want_long = pred([long_clip], one_hot[[1]], template)[0]

    a = pool.open_stream(one_hot[1], template)
    b = pool.open_stream(one_hot[2], template)
    # stream a receives all audio up front but its caller never re-pushes
    first = pool.push(a, long_clip, last=True)
    # stream b's pushes drive shared steps that also advance a's tail
    for lo in range(0, len(short_clip), 900):
        pool.push(b, short_clip[lo : lo + 900],
                  last=lo + 900 >= len(short_clip))
    rest = pool.poll(a)
    got = np.concatenate([first, rest])
    np.testing.assert_allclose(got, want_long, atol=1e-6, rtol=0)
    pool.close_stream(a)
    pool.close_stream(b)


def test_small_pushes_buffer_until_a_frame_batch_is_ready(stack):
    """Packets smaller than a frame_batch worth of samples emit nothing
    until enough audio accumulates — then everything decodable at once."""
    pred, pool = stack
    rng = np.random.default_rng(3)
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    one_hot = np.eye(12, dtype=np.float32)
    clip = _clips(rng, (0.6,))[0]
    want = pred([clip], one_hot[[5]], template)[0]

    s = pool.open_stream(one_hot[5], template)
    outs = []
    emitted_early = 0
    for lo in range(0, len(clip), 500):
        out = pool.push(s, clip[lo : lo + 500], last=lo + 500 >= len(clip))
        if lo == 0:
            emitted_early = len(out)
        outs.append(out)
    assert emitted_early == 0  # 500 samples < one frame window
    got = np.concatenate(outs)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)
    pool.close_stream(s)


def test_fleet_mesh_pool_matches_solo(stack):
    """A (2, 1)-mesh pool (slot axis shard_mapped over two chips, weights
    replicated) reproduces the solo pool / offline prediction; slot counts
    not divisible by the data axis are rejected."""
    import jax

    from audio2face_tpu.parallel.mesh import make_mesh

    pred, _ = stack
    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="divisible"):
        FrameStreamPool(
            pred.config, variables=pred.variables, n_streams=3,
            frame_batch=8, mesh=mesh,
        )
    pool = FrameStreamPool(
        pred.config, variables=pred.variables, n_streams=4, frame_batch=8,
        mesh=mesh,
    )
    rng = np.random.default_rng(5)
    clips = _clips(rng, (0.55, 0.4))
    one_hot = np.eye(12, dtype=np.float32)[[3, 6]]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    want = pred(clips, one_hot, template)

    slots = [pool.open_stream(one_hot[i], template) for i in range(2)]
    got = [[] for _ in range(2)]
    for lo in range(0, max(map(len, clips)), 2000):
        for i in range(2):
            if lo < len(clips[i]):
                chunk = clips[i][lo : lo + 2000]
                got[i].append(pool.push(
                    slots[i], chunk, last=lo + 2000 >= len(clips[i])
                ))
    for i in range(2):
        got[i].append(pool.poll(slots[i]))
        res = np.concatenate(got[i])
        np.testing.assert_allclose(res, want[i], atol=1e-6, rtol=0)


def test_streaming_server_fronts_frame_pool(stack):
    """StreamingServer composes with FrameStreamPool: concurrent live
    sessions of a frame model share the chip and each matches offline."""
    from audio2face_tpu.multistream import StreamingServer

    pred, _ = stack
    pool = FrameStreamPool(
        pred.config, variables=pred.variables, n_streams=2, frame_batch=8
    )
    server = StreamingServer(pool=pool)
    assert server.n_streams == 2
    with pytest.raises(TypeError, match="not both"):
        StreamingServer(pred.variables, pool=pool)
    with pytest.raises(TypeError, match="pool"):
        StreamingServer()

    rng = np.random.default_rng(7)
    clips = _clips(rng, (0.5, 0.7))
    one_hot = np.eye(12, dtype=np.float32)[[2, 8]]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    want = pred(clips, one_hot, template)

    sessions = [server.open_session(one_hot[i], template) for i in range(2)]
    got = [[] for _ in range(2)]
    for lo in range(0, max(map(len, clips)), 1500):
        for i, sess in enumerate(sessions):
            if lo < len(clips[i]):
                got[i].append(sess.push(
                    clips[i][lo : lo + 1500],
                    last=lo + 1500 >= len(clips[i]),
                ))
    for i, sess in enumerate(sessions):
        got[i].append(sess.poll())
        sess.close()
        res = np.concatenate(got[i])
        np.testing.assert_allclose(res, want[i], atol=1e-6, rtol=0)
    # freed slots accept a new session
    server.open_session(one_hot[0], template).close()


def test_streaming_server_concurrent_frame_sessions(stack):
    """Concurrent threaded callers through StreamingServer(pool=FrameStreamPool)
    each reproduce the offline prediction (different packet sizes per
    caller exercise the shared-step routing under the server lock)."""
    import threading

    from audio2face_tpu.multistream import StreamingServer

    pred, _ = stack
    rng = np.random.default_rng(11)
    clips = _clips(rng, (0.8, 0.5, 0.65))
    one_hot = np.eye(12, dtype=np.float32)[[1, 4, 10]]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    want = pred(clips, one_hot, template)

    server = StreamingServer(pool=FrameStreamPool(
        pred.config, variables=pred.variables, n_streams=3, frame_batch=8
    ))
    outs = [None] * 3
    errs = []

    def run(i):
        try:
            sess = server.open_session(one_hot[i], template)
            got = []
            step = 1000 + 700 * i
            for off in range(0, len(clips[i]), step):
                got.append(sess.push(clips[i][off : off + step],
                                     last=off + step >= len(clips[i])))
            got.append(sess.poll())
            outs[i] = np.concatenate([g for g in got if g.size])
            sess.close()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    for i in range(3):
        assert outs[i].shape == want[i].shape
        np.testing.assert_allclose(outs[i], want[i], atol=1e-6, rtol=0,
                                   err_msg=f"session {i}")


def test_window_gather_depends_only_on_f0_mod_fps(stack):
    """The in-graph fragment gather must be a function of f0 % 60 only
    (exact identity rel = (r+j)*sr//fps - r*sr//fps): identical windows at
    f0 and f0 + k*60 — including f0 past the old int32 wrap point of
    (f0*sr) — decode identical vertices."""
    pred, pool = stack
    rng = np.random.default_rng(7)
    fn = pool._get_fn()
    windows = jnp.asarray(
        (rng.normal(size=(pool.n_streams, pool.span)) * 0.1).astype(np.float32)
    )
    one_hot = jnp.asarray(np.eye(12, dtype=np.float32)[: pool.n_streams])
    template = jnp.asarray(
        rng.normal(size=(pool.n_streams, pool.n_verts // 3, 3)).astype(np.float32) * 0.01
    )
    fe = pool._base._fe_params or {}
    base = np.asarray([17, 3, 59], np.int64)[: pool.n_streams]
    small = fn(pool.variables, fe, windows, one_hot, template,
               jnp.asarray(base, jnp.int32))
    huge_frames = (2**31 // pool.sr // 60 + 7) * 60  # past the old wrap
    big = fn(pool.variables, fe, windows, one_hot, template,
             jnp.asarray(base + huge_frames, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(big, np.float32), np.asarray(small, np.float32), atol=1e-6
    )
