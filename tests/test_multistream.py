"""Multi-stream pool vs solo streams.

The bar (round-2 verdict, top_next): N interleaved live streams through
``MultiStreamFaceFormerPredictor`` must reproduce N solo
``StreamingFaceFormerPredictor`` runs — the decoder carry is exact (same
scan step, per-stream absolute positions), the encoder windows identical,
so outputs match to float tolerance; idle and late-joining slots must not
perturb running streams at all.

Exactness configs use lookahead=0 and chunk-multiple clips so the pool
and the solo predictor consume identical windows (the solo flush uses
grain-bucketed exact-width tails; the pool masks full-width tails — only
tails differ between the two, and only approximately).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio2face_tpu.models.faceformer import FaceFormer, frame_count
from audio2face_tpu.multistream import MultiStreamFaceFormerPredictor
from audio2face_tpu.streaming import StreamingFaceFormerPredictor

SR = 16000
N_VERTS = 300
CHUNK_S = 0.8  # 12800 samples = 48 frames


@pytest.fixture(scope="module")
def setup():
    model = FaceFormer(n_verts=N_VERTS, n_onehot=12, dtype=None, decode_impl="scan")
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=(1, SR)) * 0.1).astype(np.float32)
    one_hot = np.eye(12, dtype=np.float32)
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(audio),
        jnp.asarray(one_hot[:1]), jnp.asarray(template)[None],
    )
    variables = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(1).normal(size=p.shape).astype(np.float32),
        variables,
    )
    return variables, one_hot, template


def _solo(variables, one_hot, template, clip, *, left=0.8, lookahead=0.0, pushes=None):
    pred = StreamingFaceFormerPredictor(
        variables, N_VERTS, chunk_seconds=CHUNK_S, left_seconds=left,
        lookahead_seconds=lookahead,
    )
    pred.start_stream(one_hot, template)
    outs = []
    for lo, hi in pushes or [(0, len(clip))]:
        outs.append(pred.push(clip[lo:hi]))
    outs.append(pred.flush())
    return np.concatenate([o for o in outs if o.size])


@pytest.mark.slow
def test_interleaved_streams_match_solo(setup):
    """Three concurrent streams, interleaved in different packet sizes,
    each == its solo run."""
    variables, one_hot, template = setup
    rng = np.random.default_rng(7)
    chunk = int(CHUNK_S * SR)
    clips = [
        (rng.normal(size=k * chunk) * 0.1).astype(np.float32) for k in (3, 2, 3)
    ]
    solos = [
        _solo(variables, one_hot[i], template, clips[i]) for i in range(3)
    ]

    pool = MultiStreamFaceFormerPredictor(
        variables, N_VERTS, n_streams=4, chunk_seconds=CHUNK_S,
        left_seconds=0.8, lookahead_seconds=0.0,
    )
    slots = [pool.open_stream(one_hot[i], template) for i in range(3)]
    got = [[] for _ in range(3)]
    # interleave pushes at stream-specific granularities
    steps = [5120, 12800, 3200]
    offs = [0, 0, 0]
    while any(offs[i] < len(clips[i]) for i in range(3)):
        for i in range(3):
            if offs[i] < len(clips[i]):
                j = min(offs[i] + steps[i], len(clips[i]))
                got[i].append(pool.push(slots[i], clips[i][offs[i]:j],
                                        last=j == len(clips[i])))
                offs[i] = j
    for i in range(3):
        got[i].append(pool.poll(slots[i]))
        out = np.concatenate([o for o in got[i] if o.size])
        assert out.shape == solos[i].shape, (i, out.shape, solos[i].shape)
        np.testing.assert_allclose(out, solos[i], atol=2e-5, rtol=1e-5,
                                   err_msg=f"stream {i}")


@pytest.mark.slow
def test_late_joining_stream_is_exact_and_harmless(setup):
    """A stream that joins mid-flight decodes exactly like a solo run, and
    the already-running stream's remaining frames are unchanged by the
    newcomer (idle/masked steps freeze state bit-exactly)."""
    variables, one_hot, template = setup
    rng = np.random.default_rng(11)
    chunk = int(CHUNK_S * SR)
    clip_a = (rng.normal(size=4 * chunk) * 0.1).astype(np.float32)
    clip_b = (rng.normal(size=2 * chunk) * 0.1).astype(np.float32)
    solo_a = _solo(variables, one_hot[0], template, clip_a)
    solo_b = _solo(variables, one_hot[5], template, clip_b)

    pool = MultiStreamFaceFormerPredictor(
        variables, N_VERTS, n_streams=2, chunk_seconds=CHUNK_S,
        left_seconds=0.8, lookahead_seconds=0.0,
    )
    a = pool.open_stream(one_hot[0], template)
    out_a = [pool.push(a, clip_a[: 2 * chunk])]  # A runs 2 chunks alone
    b = pool.open_stream(one_hot[5], template)  # B joins late
    out_b = [pool.push(b, clip_b, last=True)]
    out_a.append(pool.push(a, clip_a[2 * chunk :], last=True))
    out_a.append(pool.poll(a))
    got_a = np.concatenate([o for o in out_a if o.size])
    got_b = np.concatenate([o for o in out_b if o.size])
    np.testing.assert_allclose(got_a, solo_a, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(got_b, solo_b, atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_masked_tail_flush_frame_count_and_quality(setup):
    """A non-chunk-multiple tail flushes through the SAME compiled decoder
    (full-width window, n_valid-masked) with the exact offline frame count."""
    variables, one_hot, template = setup
    rng = np.random.default_rng(13)
    chunk = int(CHUNK_S * SR)
    n = 2 * chunk + 4000  # 15 extra frames of tail
    clip = (rng.normal(size=n) * 0.1).astype(np.float32)
    pool = MultiStreamFaceFormerPredictor(
        variables, N_VERTS, n_streams=2, chunk_seconds=CHUNK_S,
        left_seconds=0.8, lookahead_seconds=0.0,
    )
    s = pool.open_stream(one_hot[2], template)
    out = pool.push(s, clip, last=True)
    assert out.shape == (frame_count(n), N_VERTS // 3, 3)
    assert np.isfinite(out).all()
    # tail windows differ from the solo path (full-width zero pad vs
    # grain-bucketed), so compare against solo loosely on the tail
    solo = _solo(variables, one_hot[2], template, clip)
    np.testing.assert_allclose(out[: 2 * 48], solo[: 2 * 48], atol=2e-5, rtol=1e-5)
    scale = np.abs(solo - template[None]).max()
    assert np.abs(out[2 * 48 :] - solo[2 * 48 :]).max() < 0.3 * scale


@pytest.mark.slow
def test_pool_lifecycle_capacity_and_reuse(setup):
    variables, one_hot, template = setup
    pool = MultiStreamFaceFormerPredictor(
        variables, N_VERTS, n_streams=2, chunk_seconds=CHUNK_S,
        left_seconds=0.0, lookahead_seconds=0.0, max_seconds=2.0,
    )
    a = pool.open_stream(one_hot[0], template)
    b = pool.open_stream(one_hot[1], template)
    with pytest.raises(RuntimeError, match="busy"):
        pool.open_stream(one_hot[2], template)
    # capacity accounting is per-slot and raises before corrupting state
    with pytest.raises(RuntimeError, match="max_seconds"):
        pool.push(a, np.zeros(3 * SR, np.float32))
    pool.close_stream(a)
    c = pool.open_stream(one_hot[2], template)  # slot reused
    rng = np.random.default_rng(3)
    clip = (rng.normal(size=int(CHUNK_S * SR)) * 0.1).astype(np.float32)
    out = pool.push(c, clip, last=True)
    assert out.shape[0] == frame_count(len(clip))
    solo = _solo(variables, one_hot[2], template, clip, left=0.0)
    np.testing.assert_allclose(out, solo, atol=2e-5, rtol=1e-5)
    # b, idle throughout, still works
    out_b = pool.push(b, clip, last=True)
    np.testing.assert_allclose(
        out_b, _solo(variables, one_hot[1], template, clip, left=0.0),
        atol=2e-5, rtol=1e-5,
    )


def test_single_compiled_program_pair(setup):
    """The pool compiles exactly one encoder and one decoder program no
    matter how streams start, stop, or end on ragged tails."""
    variables, one_hot, template = setup
    pool = MultiStreamFaceFormerPredictor(
        variables, N_VERTS, n_streams=2, chunk_seconds=CHUNK_S,
        left_seconds=0.8, lookahead_seconds=0.4,
    )
    rng = np.random.default_rng(5)
    chunk = int(CHUNK_S * SR)
    s1 = pool.open_stream(one_hot[0], template)
    pool.push(s1, (rng.normal(size=2 * chunk + 777) * 0.1).astype(np.float32), last=True)
    enc1, dec1 = pool._encode, pool._decode
    s2 = pool.open_stream(one_hot[1], template)
    pool.push(s2, (rng.normal(size=chunk + 123) * 0.1).astype(np.float32), last=True)
    assert pool._encode is enc1 and pool._decode is dec1
    assert enc1 is not None and dec1 is not None


@pytest.mark.slow
def test_fleet_mesh_pool_matches_solo(setup):
    """A mesh-sharded pool (slot axis over the data axis) reproduces solo
    streams; the KV caches actually live sharded; an indivisible pool size
    is rejected."""
    from audio2face_tpu.parallel.mesh import make_mesh

    variables, one_hot, template = setup
    mesh = make_mesh((2, 1), devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="divisible"):
        MultiStreamFaceFormerPredictor(
            variables, N_VERTS, n_streams=3, mesh=mesh,
        )
    pool = MultiStreamFaceFormerPredictor(
        variables, N_VERTS, n_streams=4, chunk_seconds=CHUNK_S,
        left_seconds=0.8, lookahead_seconds=0.0, mesh=mesh,
    )
    assert not pool._k_cache.sharding.is_fully_replicated
    rng = np.random.default_rng(17)
    chunk = int(CHUNK_S * SR)
    clips = [
        (rng.normal(size=k * chunk) * 0.1).astype(np.float32) for k in (2, 3, 1)
    ]
    solos = [_solo(variables, one_hot[i], template, clips[i]) for i in range(3)]
    slots = [pool.open_stream(one_hot[i], template) for i in range(3)]
    got = [[] for _ in range(3)]
    offs = [0, 0, 0]
    while any(offs[i] < len(clips[i]) for i in range(3)):
        for i in range(3):
            if offs[i] < len(clips[i]):
                j = min(offs[i] + chunk, len(clips[i]))
                got[i].append(pool.push(slots[i], clips[i][offs[i]:j],
                                        last=j == len(clips[i])))
                offs[i] = j
    for i in range(3):
        got[i].append(pool.poll(slots[i]))
        out = np.concatenate([o for o in got[i] if o.size])
        np.testing.assert_allclose(out, solos[i], atol=2e-5, rtol=1e-5,
                                   err_msg=f"fleet stream {i}")


@pytest.mark.slow
def test_streaming_server_concurrent_sessions(setup):
    """Concurrent threaded callers through StreamingServer each reproduce
    their solo stream; pool-full open_session raises; wait=True blocks
    until a slot frees."""
    import threading

    from audio2face_tpu.multistream import StreamingServer

    variables, one_hot, template = setup
    rng = np.random.default_rng(21)
    chunk = int(CHUNK_S * SR)
    clips = [
        (rng.normal(size=k * chunk) * 0.1).astype(np.float32) for k in (3, 2, 2)
    ]
    solos = [_solo(variables, one_hot[i], template, clips[i]) for i in range(3)]

    server = StreamingServer(
        variables, N_VERTS, n_streams=3, chunk_seconds=CHUNK_S,
        left_seconds=0.8, lookahead_seconds=0.0,
    )
    outs = [None] * 3
    errs = []

    def run(i):
        try:
            sess = server.open_session(one_hot[i], template)
            got = []
            step = 4000 + 1000 * i  # different packet sizes per caller
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
        assert outs[i].shape == solos[i].shape
        np.testing.assert_allclose(outs[i], solos[i], atol=2e-5, rtol=1e-5,
                                   err_msg=f"session {i}")

    # pool exhaustion semantics
    s1 = server.open_session(one_hot[0], template)
    s2 = server.open_session(one_hot[1], template)
    s3 = server.open_session(one_hot[2], template)
    with pytest.raises(RuntimeError, match="busy"):
        server.open_session(one_hot[3], template)
    with pytest.raises(TimeoutError):
        server.open_session(one_hot[3], template, wait=True, timeout=0.05)
    releaser = threading.Timer(0.2, s1.close)
    releaser.start()
    s4 = server.open_session(one_hot[3], template, wait=True, timeout=10.0)
    for s in (s2, s3, s4):
        s.close()
