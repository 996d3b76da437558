"""Streaming (chunked) FaceFormer vs the offline pipeline.

Two bars:
- **exact**: one window covering the whole clip (left=lookahead=0,
  chunk=clip) must reproduce the offline FaceFormer output to float
  tolerance — the decoder carry, running normalization, fps adapter, and
  vertex head are all exercised with no context truncation;
- **approximate**: real chunking with bounded context must stay within
  tolerance of the offline output away from the stream start (the encoder
  is bidirectional, so truncated context is inherently approximate — the
  reference cannot stream at all: it decodes whole clips offline,
  src/model/faceformer.py:137-188).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio2face_tpu.models.faceformer import FaceFormer, frame_count
from audio2face_tpu.streaming import StreamingFaceFormerPredictor

SR = 16000
N_VERTS = 300


@pytest.fixture(scope="module")
def setup():
    model = FaceFormer(n_verts=N_VERTS, n_onehot=12, dtype=None, decode_impl="scan")
    rng = np.random.default_rng(0)
    n = int(3.0 * SR)  # multiple of 800 -> frame-exact chunk boundaries
    audio = (rng.normal(size=(1, n)) * 0.1).astype(np.float32)
    one_hot = np.eye(12, dtype=np.float32)[[3]]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(audio[:, :SR]),
        jnp.asarray(one_hot), jnp.asarray(template)[None],
    )
    # move the zero-init vertice maps off zero so outputs carry signal
    variables = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(1).normal(size=p.shape).astype(np.float32),
        variables,
    )
    # offline reference, trainer-predict unit convention (x100 in, /100 out)
    offline = model.apply(
        variables, jnp.asarray(audio), jnp.asarray(one_hot),
        jnp.asarray(template)[None] * 100.0,
    )
    offline = np.asarray(offline)[0] / 100.0
    return variables, audio, one_hot, template, offline


def test_single_window_matches_offline_exactly(setup):
    variables, audio, one_hot, template, offline = setup
    pred = StreamingFaceFormerPredictor(
        variables, N_VERTS, chunk_seconds=3.0, left_seconds=0.0,
        lookahead_seconds=0.0,
    )
    pred.start_stream(one_hot, template)
    out = pred.push(audio[0], last=True)
    assert out.shape == offline.shape
    scale = np.abs(offline - template[None]).max()
    err = np.abs(out - offline).max()
    assert err < 1e-5 + 1e-4 * scale, (err, scale)


@pytest.mark.slow
def test_chunked_matches_offline_within_tolerance(setup):
    """0.8 s chunks, 1.6 s left context, 0.4 s lookahead: mid-stream frames
    track the offline output; incremental emission covers every frame."""
    variables, audio, one_hot, template, offline = setup
    pred = StreamingFaceFormerPredictor(
        variables, N_VERTS, chunk_seconds=0.8, left_seconds=1.6,
        lookahead_seconds=0.4,
    )
    pred.start_stream(one_hot, template)
    outs = []
    step = int(0.4 * SR)
    for i in range(0, audio.shape[1], step):
        outs.append(pred.push(audio[0, i : i + step]))
    outs.append(pred.flush())
    out = np.concatenate([o for o in outs if o.size])
    n_frames = frame_count(audio.shape[1])
    assert out.shape == (n_frames, N_VERTS // 3, 3)

    # offsets (the actual animation signal) on mid-stream frames where the
    # sliding window has full context
    off_s = out - template[None]
    off_f = offline - template[None]
    mid = slice(60, n_frames - 30)
    scale = np.abs(off_f[mid]).max()
    err = np.abs(off_s[mid] - off_f[mid]).max()
    # measured on this fixture: err = 0.124 * scale (the truncated-context
    # approximation at 1.6 s left / 0.4 s lookahead — the bidirectional
    # encoder sees a different window, so this is inherent, not a bug; the
    # bench's streaming-fidelity sweep tracks the same gap as LVE/MVE on
    # the 5023-vert model). Bound set at 1.5x measured.
    assert err < 0.18 * scale, (err, scale)
    # and the two signals are strongly correlated, not just small
    # (measured corr = 0.9962 on this fixture)
    a = off_s[mid].ravel()
    b = off_f[mid].ravel()
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert corr > 0.99, corr


def test_streaming_latency_bound(setup):
    """Frames for chunk k arrive after at most chunk+lookahead audio beyond
    the chunk — the algorithmic latency contract."""
    variables, audio, one_hot, template, offline = setup
    pred = StreamingFaceFormerPredictor(
        variables, N_VERTS, chunk_seconds=0.8, left_seconds=0.8,
        lookahead_seconds=0.4,
    )
    pred.start_stream(one_hot, template)
    # push exactly chunk+lookahead: the first chunk must be emitted
    n = pred.chunk + pred.lookahead
    out = pred.push(audio[0, :n])
    assert out.shape[0] == frame_count(pred.chunk)
    # pushing less than a chunk more produces nothing yet
    out2 = pred.push(audio[0, n : n + 400])
    assert out2.shape[0] == 0


def test_flush_emits_exact_offline_frame_count(setup):
    """Clips whose length is NOT a multiple of the 800-sample grain must
    still stream out frame_count(n) frames (regression: the sub-grain tail
    was silently dropped, losing up to 2 frames)."""
    variables, audio, one_hot, template, offline = setup
    n = audio.shape[1] - 480  # 160... not a grain multiple
    pred = StreamingFaceFormerPredictor(
        variables, N_VERTS, chunk_seconds=0.8, left_seconds=0.8,
        lookahead_seconds=0.4,
    )
    pred.start_stream(one_hot, template)
    out1 = pred.push(audio[0, :n])
    out2 = pred.flush()
    got = out1.shape[0] + out2.shape[0]
    assert got == frame_count(n), (got, frame_count(n))
    # pushing after the flush is an error (the stream is finished)
    with pytest.raises(RuntimeError, match="flushed"):
        pred.push(audio[0, :800])


@pytest.mark.slow
def test_push_granularity_does_not_change_output(setup):
    """Emitted vertices are a deterministic function of (audio, config):
    feeding the same clip in 100 ms packets vs one big push must produce
    bitwise-identical chunks (normalization stats are frozen per chunk at
    chunk_end + lookahead, not at whatever has been pushed so far)."""
    variables, audio, one_hot, template, offline = setup

    def run(step):
        pred = StreamingFaceFormerPredictor(
            variables, N_VERTS, chunk_seconds=0.8, left_seconds=0.8,
            lookahead_seconds=0.4,
        )
        pred.start_stream(one_hot, template)
        outs = []
        for i in range(0, audio.shape[1], step):
            outs.append(pred.push(audio[0, i : i + step]))
        outs.append(pred.flush())
        return np.concatenate([o for o in outs if o.size])

    small = run(int(0.1 * SR))
    big = run(audio.shape[1])
    np.testing.assert_array_equal(small, big)


@pytest.mark.slow
def test_flush_tail_widths_are_grain_bucketed(setup):
    """Flush windows are padded to the 800-sample grain: two clips whose
    tails round to the same grain bucket must reuse ONE compiled encoder
    program (Mosaic compiles cost minutes per shape on TPU)."""
    variables, audio, one_hot, template, offline = setup
    widths = set()
    for cut in (430, 170):  # distinct sub-grain tail lengths, same bucket
        pred = StreamingFaceFormerPredictor(
            variables, N_VERTS, chunk_seconds=0.8, left_seconds=0.8,
            lookahead_seconds=0.4,
        )
        pred.start_stream(one_hot, template)
        pred.push(audio[0, : audio.shape[1] - cut], last=True)
        widths |= {k[1] for k in pred._fns if k[0] == "enc"}
    # steady-state width + exactly one shared flush width
    assert len(widths) == 2, widths
    for w in widths:
        assert w % 800 == 0, w


def test_cache_capacity_overflow_raises(setup):
    """Exceeding max_seconds must raise, not silently clamp-corrupt the KV
    cache."""
    variables, audio, one_hot, template, offline = setup
    pred = StreamingFaceFormerPredictor(
        variables, N_VERTS, chunk_seconds=0.5, left_seconds=0.5,
        lookahead_seconds=0.0, max_seconds=1.0,
    )
    pred.start_stream(one_hot, template)
    with pytest.raises(RuntimeError, match="max_seconds"):
        for i in range(0, audio.shape[1], 8000):
            pred.push(audio[0, i : i + 8000])
