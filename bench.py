"""Benchmark harness with a wall-clock budget.

Prints one JSON line per metric:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

The driver parses the LAST stdout line, so the flagship metric closes the
stream unconditionally; it is also printed FIRST so a mid-suite crash can
never lose it. Between the two, suite entries run under a wall-clock budget
(``A2F_BENCH_BUDGET_S``, default 450 s): each entry runs in a SUBPROCESS
with a hard timeout (remote compiles through the axon tunnel occasionally
hang for minutes; an in-process watchdog cannot preempt a blocked PJRT
call), and entries that no longer fit the remaining budget are skipped with
an explicit ``{"metric": ..., "skipped": "budget"}`` line instead of
silently overrunning the driver's kill timer (round 4 died at rc=124 with
five entries and the closing flagship line unprinted).

Headline benchmark (BASELINE.md config #4 / north star): long-form decode —
60 s of audio, batch of 8 speakers, full FaceFormer (wav2vec2-base encoder
+ KV-cached autoregressive scan, 5,023-vertex output) on one chip.

value  = mesh frames/sec/chip (5023 verts, 60 fps animation clock)
vs_baseline = real-time factor / 30 (target: >=30x faster than real time;
the reference cannot run this config at all — it is hard-capped at 10 s and
batch 1, and recomputes the full prefix every frame,
src/model/faceformer.py:139-188).

Every metric's detail carries achieved TFLOP/s and %-of-peak (MFU) from
XLA's compiled cost analysis (Pallas kernels contribute their CostEstimate),
so per-round regressions anywhere in the suite are visible — not just the
flagship number. --flagship-only restores the single-line mode.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from audio2face_tpu.utils.cache import enable_persistent_cache

# Device init is DEFERRED to the --only/--in-process paths: the scheduler
# parent must never attach to the TPU — the axon terminal is single-tenant
# and a parent holding a claim alongside its entry subprocess is a second
# concurrent attachment (a third reliably wedges the terminal; observed
# live). enable_persistent_cache() calls jax.default_backend(), which
# initializes the backend, so even that waits until an entry actually runs.
_DEVICE_READY = False


def _init_device():
    global _DEVICE_READY
    if not _DEVICE_READY:
        enable_persistent_cache()
        _DEVICE_READY = True


T_START = time.monotonic()
BUDGET_S = float(os.environ.get("A2F_BENCH_BUDGET_S", "700"))
# seconds held back for the closing flagship line + scheduler overhead
RESERVE_S = 20.0

FPS = 60
SR = 16000
N_VERTS = 15069
N_ONEHOT = 12


def elapsed() -> float:
    return time.monotonic() - T_START


def remaining() -> float:
    return BUDGET_S - elapsed()


def child_deadline() -> float:
    """Seconds left for work inside a suite entry (children read
    A2F_BENCH_DEADLINE_S to trim their own sweeps)."""
    try:
        return float(os.environ.get("A2F_BENCH_DEADLINE_S", "inf"))
    except ValueError:
        return float("inf")


# MXU peak by generation (dense, per chip). v5e: 197 TFLOP/s bf16; f32
# runs the MXU in passes, ~1/4 rate.
_PEAK_BY_GEN = {"v5e": 197e12, "v5p": 459e12, "v4": 275e12}
PEAK_FLOPS_BF16 = _PEAK_BY_GEN.get(os.environ.get("PALLAS_AXON_TPU_GEN", "v5e"), 197e12)


def xla_flops(jitfn, *args, **kwargs):
    """Analytic FLOPs of a jitted call from XLA's compiled cost analysis
    (Pallas kernels contribute the CostEstimate passed at pallas_call).

    Call this only AFTER the jit fn has executed once: the dispatch-path
    compile populates the cache this AOT lookup reads, so the second
    lower+compile is free in-process. (Calling it first would pay a full
    second compile — ~70-500 s per program through the remote tunnel.)
    Returns None when the backend exposes no cost model."""
    try:
        cost = jitfn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        f = cost.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def perf_detail(flops, wall_seconds, bf16=True):
    """{tflops, pct_peak} for a measured wall time, or {} when unknown."""
    if not flops or not wall_seconds:
        return {}
    peak = PEAK_FLOPS_BF16 if bf16 else PEAK_FLOPS_BF16 / 4
    achieved = flops / wall_seconds
    out = {"tflops": round(achieved / 1e12, 2)}
    if jax.default_backend() == "tpu":
        out["pct_peak"] = round(100 * achieved / peak, 1)
    return out


def _sync(x) -> float:
    """Force completion with a host transfer — on the axon TPU tunnel,
    block_until_ready can return before execution finishes; a scalar
    device->host read cannot."""
    return float(jnp.sum(x[..., :1, :].astype(jnp.float32)))


def timed(fn, n: int) -> float:
    """Per-call wall time with the device->host round trip amortized away.

    The tunnel's scalar fetch costs ~40 ms RTT, so per-iteration syncing
    swamps small kernels. TPU execution is in-order: dispatching n calls and
    fetching from the last output drains the whole queue with ONE round trip.
    """
    _sync(fn())  # compile + warm + drain
    tic = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - tic) / n


_FF_VARIABLES = None


def _ff_variables():
    """Shared FaceFormer init, nudged +0.01*N(0,1) off the ZERO-init
    vertice maps (reference faceformer.py:132-135) — a raw-init model
    emits exactly the template, degenerating fidelity metrics to 0/0."""
    global _FF_VARIABLES
    if _FF_VARIABLES is None:
        from audio2face_tpu.models.faceformer import FaceFormer

        model = FaceFormer(n_verts=N_VERTS, n_onehot=N_ONEHOT)
        init = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, SR), jnp.float32),
            jnp.zeros((1, N_ONEHOT), jnp.float32),
            jnp.zeros((1, N_VERTS // 3, 3), jnp.float32))
        _FF_VARIABLES = _perturb_tree(init)
    return _FF_VARIABLES


def _decode_metric_name(seconds: float, batch: int) -> str:
    """Unique per (seconds, batch): round 4 reused the 60s/batch-8 string
    for a 10s/batch-1 run, putting two contradictory numbers under one
    name in the driver record."""
    return (
        f"faceformer {seconds:g}s batch-{batch} KV-cached decode, "
        "mesh frames/sec/chip (5023 verts)"
    )


def bench_faceformer_decode(seconds: float = 60.0, batch: int = 8, bf16: bool = True):
    from audio2face_tpu.models.faceformer import FaceFormer

    n_samples = int(seconds * SR)
    n_frames = n_samples * FPS // SR
    dtype = jnp.bfloat16 if bf16 else None
    model = FaceFormer(n_verts=N_VERTS, n_onehot=N_ONEHOT, dtype=dtype)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(batch, n_samples)).astype(np.float32) * 0.1)
    one_hot = jnp.asarray(np.eye(N_ONEHOT, dtype=np.float32)[rng.integers(0, N_ONEHOT, batch)])
    template = jnp.asarray(rng.normal(size=(batch, N_VERTS // 3, 3)).astype(np.float32))

    variables = _ff_variables()

    fwd = jax.jit(lambda v, a, o, t: model.apply(v, a, o, t))
    wall = timed(lambda: fwd(variables, audio, one_hot, template), n=5)

    total_frames = batch * n_frames
    frames_per_sec = total_frames / wall
    rtf = (batch * seconds) / wall  # audio-seconds processed per wall-second
    detail = {
        "wall_seconds_per_batch": round(wall, 4),
        "real_time_factor": round(rtf, 1),
        "batch": batch,
        "clip_seconds": seconds,
        "frames_per_clip": n_frames,
        "backend": jax.default_backend(),
        "bf16": bf16,
    }
    detail.update(perf_detail(
        xla_flops(fwd, variables, audio, one_hot, template), wall, bf16
    ))
    return {
        "metric": _decode_metric_name(seconds, batch),
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(rtf / 30.0, 3),
        "detail": detail,
    }


def bench_audio2mesh(batch: int = 512):
    from audio2face_tpu.models.audio2mesh import Audio2Mesh
    from audio2face_tpu.models.extractor import MFCCExtractor

    model = Audio2Mesh(n_verts=N_VERTS, n_onehot=N_ONEHOT, dtype=jnp.bfloat16)
    fe = MFCCExtractor(22000, 32, 52, 440, None, 1024)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(batch, 11440)).astype(np.float32) * 0.1)
    one_hot = jnp.asarray(np.eye(N_ONEHOT, dtype=np.float32)[rng.integers(0, N_ONEHOT, batch)])
    template = jnp.asarray(rng.normal(size=(batch, N_VERTS // 3, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), fe(audio[:2]), one_hot[:2], template[:2])

    fwd = jax.jit(lambda v, a, o, t: model.apply(v, fe(a), o, t))
    wall = timed(lambda: fwd(variables, audio, one_hot, template), n=10)
    fps = batch / wall
    detail = {"batch": batch, "wall_ms": round(wall * 1e3, 3)}
    detail.update(perf_detail(
        xla_flops(fwd, variables, audio, one_hot, template), wall
    ))
    return {
        "metric": "audio2mesh fused MFCC+conv forward, frames/sec/chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / FPS / 30.0, 3),
        "detail": detail,
    }


def bench_voca(batch: int = 512):
    from audio2face_tpu.models.voca import Voca
    from audio2face_tpu.models.extractor import MFCCExtractor

    model = Voca(n_verts=N_VERTS, n_onehot=N_ONEHOT, dtype=jnp.bfloat16)
    fe = MFCCExtractor(22000, 16, 29, 790, None, 1024)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(batch, 11440)).astype(np.float32) * 0.1)
    one_hot = jnp.asarray(np.eye(N_ONEHOT, dtype=np.float32)[rng.integers(0, N_ONEHOT, batch)])
    template = jnp.asarray(rng.normal(size=(batch, N_VERTS // 3, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), fe(audio[:2]), one_hot[:2], template[:2])
    fwd = jax.jit(lambda v, a, o, t: model.apply(v, fe(a), o, t))
    wall = timed(lambda: fwd(variables, audio, one_hot, template), n=10)
    fps = batch / wall
    detail = {"batch": batch, "wall_ms": round(wall * 1e3, 3)}
    detail.update(perf_detail(
        xla_flops(fwd, variables, audio, one_hot, template), wall
    ))
    return {
        "metric": "voca fused MFCC+conv forward, frames/sec/chip",
        "value": round(fps, 1), "unit": "frames/sec/chip",
        "vs_baseline": round(fps / FPS / 30.0, 3),
        "detail": detail,
    }


def bench_train_step(batch: int = 128):
    """BASELINE config #5: full training-step throughput (audio2mesh,
    position+velocity loss, torch-Adam, x100 scaling) on one chip."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.training.trainer import Audio2FaceExperiment

    cfg = ExpConfig(
        batch_size=batch, modelname="audio2mesh", vertex_count=N_VERTS,
        one_hot_size=N_ONEHOT, feature_extractor="mfcc", sample_rate=22000,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="16-mixed", lr=1e-4,
    )
    exp = Audio2FaceExperiment(cfg, log_dir="/tmp/bench_train", tensorboard=False)
    rng = np.random.default_rng(0)
    b = {
        "audio": rng.normal(size=(batch, 11440)).astype(np.float32) * 0.1,
        "verts": rng.normal(size=(batch, N_VERTS // 3, 3)).astype(np.float32) * 0.01,
        "template_vert": rng.normal(size=(batch, N_VERTS // 3, 3)).astype(np.float32) * 0.01,
        "one_hot": np.eye(N_ONEHOT, dtype=np.float32)[rng.integers(0, N_ONEHOT, batch)],
    }
    state = exp.init_state(b)
    # stage the batch on device once: steady-state training overlaps H2D with
    # compute (Prefetcher); the tunnel transfer is not part of the step
    from audio2face_tpu.parallel.mesh import shard_batch

    b = shard_batch(exp.mesh, b)
    key = jax.random.PRNGKey(0)
    state, m = exp.train_step(state, b, key)
    float(m["loss"])  # compile + drain
    n = 20
    tic = time.perf_counter()
    for i in range(n):
        state, m = exp.train_step(state, b, key)
    loss = float(m["loss"])  # one sync drains the in-order queue
    wall = (time.perf_counter() - tic) / n
    detail = {"wall_ms": round(wall * 1e3, 2), "loss": round(loss, 4)}
    jit_step = next(f for k, f in exp._jit_cache.items() if k[0] == "train")
    detail.update(perf_detail(
        xla_flops(jit_step, state, b, key, exp._fe_params), wall
    ))
    return {
        "metric": "audio2mesh train step (bs=128, fused MFCC, fwd+bwd+adam)",
        "value": round(batch / wall, 1), "unit": "frames/sec/chip",
        "vs_baseline": None,
        "detail": detail,
    }


def bench_faceformer_train(seconds: float = 10.0):
    """Training step through the autoregressive scan on a 10 s clip — the
    configuration where the reference pays O(T^3) recompute (and caps at
    10 s). bs=1 whole-clip, reference training regime (train.py:30-34).
    Not in the default suite (the batched entry below is the training
    headline); run with --only faceformer_train."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.training.trainer import Audio2FaceExperiment
    from audio2face_tpu.parallel.mesh import shard_batch

    n_samples = int(seconds * SR)
    n_frames = n_samples * FPS // SR
    cfg = ExpConfig(
        batch_size=1, modelname="faceformer", vertex_count=N_VERTS,
        one_hot_size=N_ONEHOT, feature_extractor=None, sample_rate=SR,
        split_frame=False, n_feature=32, out_dim=52, win_length=440,
        percision="16-mixed", lr=1e-4,
    )
    exp = Audio2FaceExperiment(cfg, log_dir="/tmp/bench_fftrain", tensorboard=False)
    rng = np.random.default_rng(0)
    b = {
        "audio": rng.normal(size=(1, n_samples)).astype(np.float32) * 0.1,
        "audio_lengths": np.asarray([n_samples], np.int32),
        "verts": rng.normal(size=(1, n_frames, N_VERTS // 3, 3)).astype(np.float32) * 0.01,
        "frame_lengths": np.asarray([n_frames], np.int32),
        "template_vert": rng.normal(size=(1, N_VERTS // 3, 3)).astype(np.float32) * 0.01,
        "one_hot": np.eye(N_ONEHOT, dtype=np.float32)[[0]],
    }
    state = exp.init_state(b)
    b = shard_batch(exp.mesh, b)
    key = jax.random.PRNGKey(0)
    state, m = exp.train_step(state, b, key)
    float(m["loss"])  # compile + drain
    n = 10
    tic = time.perf_counter()
    for i in range(n):
        state, m = exp.train_step(state, b, key)
    loss = float(m["loss"])
    wall = (time.perf_counter() - tic) / n
    detail = {"frames": n_frames, "loss": round(loss, 4)}
    jit_step = next(f for k, f in exp._jit_cache.items() if k[0] == "train")
    detail.update(perf_detail(
        xla_flops(jit_step, state, b, key, exp._fe_params), wall
    ))
    return {
        "metric": "faceformer train step (10s clip, bs=1, fwd+bwd through the AR scan)",
        "value": round(wall * 1e3, 1), "unit": "ms/step",
        "vs_baseline": None,
        "detail": detail,
    }


def bench_faceformer_train_batched(seconds: float = 10.0, batch: int | None = None):
    """Padded whole-clip B>1 FaceFormer training — the capability the
    reference's bs=1 cap (train.py:30-34) forecloses. Variable lengths
    exercise the masked loss + length-aware encoder. The default batch is
    the measured-best point of the bs sweep (DESIGN.md §"Training batch
    sweep"; override with A2F_FF_TRAIN_BS)."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.training.trainer import Audio2FaceExperiment
    from audio2face_tpu.parallel.mesh import shard_batch

    if batch is None:
        batch = int(os.environ.get("A2F_FF_TRAIN_BS", "0")) or \
            int(_costs().get("ff_train_bs", 16))
    n_samples = int(seconds * SR)
    n_frames = n_samples * FPS // SR
    cfg = ExpConfig(
        batch_size=batch, modelname="faceformer", vertex_count=N_VERTS,
        one_hot_size=N_ONEHOT, feature_extractor=None, sample_rate=SR,
        split_frame=False, n_feature=32, out_dim=52, win_length=440,
        percision="16-mixed", lr=1e-4,
    )
    exp = Audio2FaceExperiment(cfg, log_dir="/tmp/bench_fftrain_b", tensorboard=False)
    rng = np.random.default_rng(0)
    lens = np.linspace(0.7 * n_samples, n_samples, batch).astype(np.int32)
    b = {
        "audio": rng.normal(size=(batch, n_samples)).astype(np.float32) * 0.1,
        "audio_lengths": lens,
        "verts": rng.normal(size=(batch, n_frames, N_VERTS // 3, 3)).astype(np.float32) * 0.01,
        "frame_lengths": (lens.astype(np.int64) * FPS // SR).astype(np.int32),
        "template_vert": rng.normal(size=(batch, N_VERTS // 3, 3)).astype(np.float32) * 0.01,
        "one_hot": np.eye(N_ONEHOT, dtype=np.float32)[rng.integers(0, N_ONEHOT, batch)],
    }
    state = exp.init_state(b)
    b = shard_batch(exp.mesh, b)
    key = jax.random.PRNGKey(0)
    state, m = exp.train_step(state, b, key)
    float(m["loss"])  # compile + drain
    n = 10
    tic = time.perf_counter()
    for i in range(n):
        state, m = exp.train_step(state, b, key)
    loss = float(m["loss"])
    wall = (time.perf_counter() - tic) / n
    clips_per_sec = batch / wall
    detail = {
        "clips_per_sec": round(clips_per_sec, 2),
        "frames": n_frames, "loss": round(loss, 4),
    }
    jit_step = next(f for k, f in exp._jit_cache.items() if k[0] == "train")
    detail.update(perf_detail(
        xla_flops(jit_step, state, b, key, exp._fe_params), wall
    ))
    return {
        "metric": f"faceformer train step (10s clips, bs={batch} padded, masked loss)",
        "value": round(wall * 1e3, 1), "unit": "ms/step",
        "vs_baseline": None,
        "detail": detail,
    }


def bench_streaming(seconds: float = 10.0, chunk_s: float = 1.0):
    """Steady-state COMPUTE latency of the streaming decoder: the jitted
    encoder-window + decoder-chunk pair that advances one live stream by
    one chunk. The ~3.6 MB/chunk vertex D2H is timed separately in detail
    — on a tunneled TPU the ~20 MB/s link would otherwise dominate a
    number that is a property of this dev setup, not of the chip
    (round-4 verdict: a compute benchmark's value must not be a transport
    artifact). Matches the offline loop it approximates,
    src/model/faceformer.py:154-185."""
    from audio2face_tpu.streaming import StreamingFaceFormerPredictor

    stream = StreamingFaceFormerPredictor(
        _ff_variables(), n_verts=N_VERTS, chunk_seconds=chunk_s,
        left_seconds=2.0, lookahead_seconds=0.5, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=int(seconds * SR)) * 0.1).astype(np.float32)
    one_hot = np.eye(N_ONEHOT, dtype=np.float32)[0]
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32)
    stream.start_stream(one_hot, template)

    # drive the public API into steady state (compiles the program pair,
    # fills history/caches) and record per-push e2e wall including D2H
    feed = int(0.1 * SR)
    e2e = []
    consumed = 0
    for off in range(0, len(audio), feed):
        tic = time.perf_counter()
        got = stream.push(audio[off : off + feed])
        if got.size:
            e2e.append(time.perf_counter() - tic)
        consumed = off + feed
        if len(e2e) >= 4:
            break

    # steady-state compute: the exact steady program pair on the live
    # carried state, rebinding the donated (emb, k, v) like push() does
    window = stream.left + stream.chunk + stream.lookahead
    from audio2face_tpu.models.faceformer import FEATURE_DIM, frame_count

    n_new = frame_count(stream.chunk)
    keep_from = frame_count(stream.left)
    ekey = ("enc", window, keep_from, keep_from + n_new)
    dkey = ("dec", n_new)
    enc, dec = stream._fns[ekey], stream._fns[dkey]
    norm = jnp.asarray((rng.normal(size=window) * 0.1).astype(np.float32))[None]
    one_hot_j, template_j = stream._style_ctx
    style = one_hot_j @ stream.params["obj_vector_kernel"]
    t0 = stream._t0
    state = [stream._emb, stream._k_cache, stream._v_cache]

    def call():
        cross = enc(stream.params, norm)
        emb, kc, vc, hs = dec(
            stream.params, cross, style.astype(jnp.float32),
            state[0], state[1], state[2], t0,
        )
        state[0], state[1], state[2] = emb, kc, vc
        verts = hs.reshape(-1, FEATURE_DIM) @ stream.params["vertice_map_r_kernel"]
        return verts[None]

    wall = timed(call, n=10)
    stream._emb, stream._k_cache, stream._v_cache = state
    ms = wall * 1e3
    e2e_ms = float(np.mean(e2e) * 1e3) if e2e else None
    return {
        "metric": f"streaming decode compute, {chunk_s:.1f}s chunks + 0.5s lookahead",
        "value": round(ms, 1), "unit": "ms compute/chunk",
        "vs_baseline": None,
        "detail": {
            "compute_rtf": round(chunk_s / (ms / 1e3), 1),
            "algorithmic_latency_s": round(chunk_s + 0.5, 2),
            "e2e_ms_per_chunk_incl_d2h": round(e2e_ms, 1) if e2e_ms else None,
            "d2h_bytes_per_chunk": int(n_new * N_VERTS * 4),
            "note": "value is the jitted encoder+decoder pair on-chip; the "
                    "e2e number includes the ~3.6 MB vertex D2H, which "
                    "dominates on a tunneled TPU (~20 MB/s link) but is "
                    "~2 ms on a PCIe host",
        },
    }


def bench_streaming_fidelity(seconds: float = 12.0, chunk_s: float = 1.0):
    """Streamed-vs-offline FIDELITY (not speed): LVE + MVE of the chunked
    streaming decode against the same model's offline decode on
    speech-like audio, swept over lookahead sizes.

    The encoder is bidirectional, so bounded context is inherently
    approximate; this sweep turns the approximation into a measured
    latency-vs-fidelity curve (the lookahead IS the algorithmic latency).
    value = MVE of the default serving config (2 s left, 0.5 s lookahead)
    as a fraction of the offline animation's own mean displacement scale.
    Sweep points beyond the default run only while the bench deadline
    allows (each distinct window size is its own compiled program); the
    full 5-point left-context x lookahead sweep is recorded in DESIGN.md
    §"Streaming fidelity" from the round-4 measurement."""
    from audio2face_tpu.data.synthetic import (
        generate_synthetic_face_obj,
        synthesize_speech_like,
    )
    from audio2face_tpu.evaluation import (
        infer_regions,
        lip_vertex_error,
        mean_vertex_error,
    )
    from audio2face_tpu.models.faceformer import FaceFormer
    from audio2face_tpu.streaming import StreamingFaceFormerPredictor
    from audio2face_tpu.utils.facemesh import FaceMesh
    import tempfile

    deadline = time.monotonic() + child_deadline() - 10.0

    variables = _ff_variables()
    audio = synthesize_speech_like(seconds, SR).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        mesh = FaceMesh.load(generate_synthetic_face_obj(os.path.join(d, "f.obj")))
    template = np.asarray(mesh.verts, np.float32)
    one_hot = np.eye(N_ONEHOT, dtype=np.float32)[0]
    regions = infer_regions(template)

    # offline reference at the same compute dtype as serving (bf16)
    model = FaceFormer(n_verts=N_VERTS, n_onehot=N_ONEHOT, dtype=jnp.bfloat16)
    offline = np.asarray(
        jax.jit(model.apply)(
            variables, jnp.asarray(audio[None]), jnp.asarray(one_hot[None]),
            jnp.asarray(template[None] * 100.0),
        )
    )[0] / 100.0
    scale = float(np.mean(np.linalg.norm(offline - template[None], axis=-1)))

    def run(left_s, look_s):
        stream = StreamingFaceFormerPredictor(
            variables, n_verts=N_VERTS, chunk_seconds=chunk_s,
            left_seconds=left_s, lookahead_seconds=look_s, dtype=jnp.bfloat16,
        )
        stream.start_stream(one_hot, template)
        outs = []
        feed = int(0.5 * SR)
        for off in range(0, len(audio), feed):
            got = stream.push(audio[off : off + feed])
            if got.size:
                outs.append(got)
        tail = stream.flush()
        if tail.size:
            outs.append(tail)
        out = np.concatenate(outs)[: len(offline)]
        lve = float(lip_vertex_error(jnp.asarray(out), jnp.asarray(offline[: len(out)]), regions.lip))
        mve = float(mean_vertex_error(jnp.asarray(out), jnp.asarray(offline[: len(out)])))
        return {
            "left_s": left_s, "lookahead_s": look_s,
            "lve_mm2": round(lve * 1e6, 4),  # m^2 -> mm^2
            "mve_mm": round(mve * 1e3, 4),  # m -> mm
            "mve_over_signal": round(mve / max(scale, 1e-12), 4),
        }

    # default serving config first; extra lookahead points as time allows
    sweep = [run(2.0, 0.5)]
    skipped = []
    for left_s, look_s in [(2.0, 0.25), (2.0, 1.0)]:
        if time.monotonic() > deadline:
            skipped.append({"left_s": left_s, "lookahead_s": look_s,
                            "skipped": "budget"})
            continue
        sweep.append(run(left_s, look_s))
    default = sweep[0]  # 2 s left, 0.5 s lookahead — the serving default
    return {
        "metric": "streaming fidelity vs offline decode (chunked, bf16)",
        "value": default["mve_over_signal"],
        "unit": "MVE / signal scale",
        "vs_baseline": None,
        "detail": {
            "signal_scale_mm": round(scale * 1e3, 4),
            "clip_seconds": seconds,
            "chunk_seconds": chunk_s,
            "sweep": sweep + skipped,
            "note": "LVE/MVE against the same model's offline output; the "
                    "reference cannot stream at all (whole-clip decode "
                    "only); full 5-point sweep in DESIGN.md",
        },
    }


def bench_multistream(n_streams: int = 8, chunk_s: float = 1.0):
    """N concurrent LIVE streams on one chip (round-3 capability): one
    batched (encoder, decoder) step advances every stream by one chunk.
    value = on-chip compute per chunk-round; real-time serving of all N
    streams requires value <= chunk_s * 1000."""
    from audio2face_tpu.multistream import MultiStreamFaceFormerPredictor

    pool = MultiStreamFaceFormerPredictor(
        _ff_variables(), N_VERTS, n_streams=n_streams, chunk_seconds=chunk_s,
        left_seconds=2.0, lookahead_seconds=0.5, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    one_hot = np.eye(N_ONEHOT, dtype=np.float32)
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32)
    slots = [pool.open_stream(one_hot[i % N_ONEHOT], template) for i in range(n_streams)]
    packet = lambda: (rng.normal(size=int(chunk_s * SR)) * 0.1).astype(np.float32)
    # lockstep warm-up through the public API (compiles the program pair)
    for _ in range(2):
        for s in slots:
            pool.feed(s, packet())
        pool.pump()
        for s in slots:
            pool.poll(s)

    # steady-state ON-CHIP time per chunk-round: the two jitted halves
    # back-to-back (the host-side D2H vertex fetch is benched separately —
    # on a tunneled TPU the ~29 MB/round transfer would swamp the number)
    window = pool.left + pool.chunk + pool.lookahead
    norm = jnp.asarray((rng.normal(size=(n_streams, window)) * 0.1).astype(np.float32))
    t0 = jnp.asarray(pool._t0, jnp.int32)
    n_valid = jnp.full((n_streams,), pool.chunk_frames, jnp.int32)
    enc, dec = pool._encode_fn(), pool._decode_fn()

    # analytic flops BEFORE the timing loop: dec donates its cache args, so
    # lowering must see live buffers
    flops = None
    try:
        cross = enc(pool.params, norm)
        fe = xla_flops(enc, pool.params, norm)
        fd = xla_flops(
            dec, pool.params, cross, pool._styles, pool._templates,
            pool._emb, pool._k_cache, pool._v_cache, t0, n_valid,
        )
        flops = (fe or 0) + (fd or 0) or None
    except Exception:
        pass

    # dec DONATES (emb, k_cache, v_cache): each call consumes the previous
    # buffers, so the timing loop must rebind them from the outputs exactly
    # like the pool's pump() does — re-passing donated arrays poisons the
    # program (InvalidArgument at the next fetch)
    state = [pool._emb, pool._k_cache, pool._v_cache]

    def call():
        cross = enc(pool.params, norm)
        emb, kc, vc, verts = dec(
            pool.params, cross, pool._styles, pool._templates,
            state[0], state[1], state[2], t0, n_valid,
        )
        state[0], state[1], state[2] = emb, kc, vc
        return verts

    wall = timed(call, n=5)
    ms = wall * 1e3
    pool._emb, pool._k_cache, pool._v_cache = state
    detail = {
        "streams": n_streams,
        "chunk_seconds": chunk_s,
        "audio_seconds_per_wall_second": round(n_streams * chunk_s / wall, 1),
        "realtime_margin": round(chunk_s / wall, 1),
        "max_seconds": 120.0,
        "note": "compute-only; each round also returns ~29 MB of vertices "
                "(D2H ~2 ms on PCIe hosts, dominant on a tunneled TPU)",
    }
    detail.update(perf_detail(flops, wall))
    return {
        "metric": f"multistream live decode, {n_streams} concurrent streams, "
                  f"{chunk_s:.1f}s chunks + 0.5s lookahead",
        "value": round(ms, 1), "unit": "ms compute/chunk-round",
        "vs_baseline": None,
        "detail": detail,
    }


def bench_max_streams(chunk_s: float = 1.0, sizes=None):
    """Live-serving capacity envelope: how many concurrent real-time streams
    one chip sustains. Measures the multistream chunk-round at increasing
    pool sizes until a round no longer fits inside the chunk
    (realtime_margin < 1) or the bench deadline nears. value = the largest
    MEASURED stream count still real-time; detail carries the sweep and a
    linear-model capacity estimate (rounds are fixed-cost decode scan +
    per-stream encoder work, so ms(n) is ~affine)."""
    if sizes is None:
        sizes = tuple(
            int(s) for s in
            os.environ.get("A2F_MAXSTREAMS_SIZES", "64,256").split(",")
        )
    deadline = time.monotonic() + child_deadline() - 10.0
    sweep = []
    best = None
    for n in sizes:
        if sweep and time.monotonic() > deadline:
            sweep.append({"streams": n, "skipped": "budget"})
            break
        try:
            r = bench_multistream(n, chunk_s)
        except Exception as e:  # OOM / compile limits end the sweep
            sweep.append({"streams": n, "error": repr(e)})
            break
        margin = r["detail"]["realtime_margin"]
        point = {
            "streams": n,
            "ms_per_round": r["value"],
            "realtime_margin": margin,
            "pct_peak": r["detail"].get("pct_peak"),
        }
        sweep.append(point)
        if margin >= 1.0:
            best = point
        else:
            break
    est = None
    pts = [p for p in sweep if "ms_per_round" in p]
    if len(pts) >= 2:
        (n1, m1), (n2, m2) = (
            (pts[-2]["streams"], pts[-2]["ms_per_round"]),
            (pts[-1]["streams"], pts[-1]["ms_per_round"]),
        )
        if m2 > m1:
            slope = (m2 - m1) / (n2 - n1)
            est = int(n1 + (chunk_s * 1e3 - m1) / slope) if slope > 0 else None
    return {
        "metric": f"max concurrent real-time streams/chip, {chunk_s:.1f}s chunks",
        "value": best["streams"] if best else 0,
        "unit": "streams",
        "vs_baseline": None,
        "detail": {
            "chunk_seconds": chunk_s,
            "sweep": sweep,
            "capacity_estimate_streams": est,
            "note": "compute-only (the ~3.6 MB/stream/chunk vertex D2H is "
                    "host-link-bound on a tunneled TPU); margin >= 1 means "
                    "every stream keeps up with its own audio rate",
        },
    }


def bench_frame_stream(n_streams: int = 8, frame_batch: int = 32):
    """N concurrent LIVE frame-model streams (audio2mesh) on one chip: one
    batched step advances every stream by frame_batch frames through the
    fused MFCC+conv forward. Real-time serving of all N streams requires
    value <= frame_batch/60fps * 1000 ms."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.frame_stream import FrameStreamPool

    cfg = ExpConfig(
        batch_size=8, modelname="audio2mesh", vertex_count=N_VERTS,
        one_hot_size=N_ONEHOT, feature_extractor="mfcc", sample_rate=22000,
        split_frame=True, n_feature=32, out_dim=52, win_length=440,
        percision="16-mixed", lr=1e-4,
    )
    pool = FrameStreamPool(cfg, n_streams=n_streams, frame_batch=frame_batch)
    rng = np.random.default_rng(0)
    one_hot = np.eye(N_ONEHOT, dtype=np.float32)
    template = rng.normal(size=(N_VERTS // 3, 3)).astype(np.float32) * 0.01
    slots = [
        pool.open_stream(one_hot[i % N_ONEHOT], template)
        for i in range(n_streams)
    ]
    # warm through the public API (compiles the one program)
    packet = (rng.normal(size=int(1.5 * 22000)) * 0.1).astype(np.float32)
    for s in slots:
        pool.push(s, packet)
        pool.poll(s)

    # steady-state ON-CHIP time per batched step with staged inputs (the
    # host-side slot bookkeeping + D2H fetch are not part of the step)
    fn = pool._get_fn()
    windows = jnp.asarray(
        (rng.normal(size=(n_streams, pool.span)) * 0.1).astype(np.float32)
    )
    oh = jnp.asarray(pool._one_hot)
    tmpl = jnp.asarray(pool._template)
    f0 = jnp.full((n_streams,), 17, jnp.int32)
    fe = pool._base._fe_params or {}
    wall = timed(lambda: fn(pool.variables, fe, windows, oh, tmpl, f0), n=10)
    ms = wall * 1e3
    frames_per_round = n_streams * frame_batch
    detail = {
        "streams": n_streams,
        "frame_batch": frame_batch,
        "frames_per_sec_per_chip": round(frames_per_round / wall, 1),
        "audio_seconds_per_wall_second": round(frames_per_round / FPS / wall, 1),
        "realtime_margin": round((frame_batch / FPS) / wall, 1),
        "note": "compute-only; each round also returns ~"
                f"{frames_per_round * N_VERTS * 4 / 1e6:.0f} MB of vertices "
                "(dominant on a tunneled TPU's ~20 MB/s D2H link)",
    }
    detail.update(perf_detail(
        xla_flops(fn, pool.variables, fe, windows, oh, tmpl, f0), wall
    ))
    return {
        "metric": f"frame-model live streaming, {n_streams} concurrent "
                  f"audio2mesh streams, {frame_batch}-frame steps",
        "value": round(ms, 1), "unit": "ms compute/step-round",
        "vs_baseline": None,
        "detail": detail,
    }


def bench_render(n_frames: int = 64):
    """Offscreen software-rasterizer throughput — the predict→video path.

    The reference's pyrender/EGL renderer rebuilds the scene every frame and
    prints its own s/frame (src/utils/renderer.py:109-112) but records no
    number. value = device-step frames/sec at the full 800×800 target
    (batched local-patch rasterizer, device-resident verts — same timing
    convention as every other suite entry); detail carries the end-to-end
    ``Renderer.render`` fps including host↔device transfers and the numpy
    image unpack. vs_baseline = real-time factor against the 60 fps
    animation clock (>= 1 means the video renders faster than it plays)."""
    import tempfile

    from audio2face_tpu.data.synthetic import (
        generate_demo_animation,
        generate_synthetic_face_obj,
    )
    from audio2face_tpu.utils.facemesh import FaceMesh
    from audio2face_tpu.utils.renderer import (
        FRAME_BATCH,
        PATCH_TIERS,
        Renderer,
        render_frames_tiled,
        render_frames_u8,
    )

    with tempfile.TemporaryDirectory() as d:
        obj = generate_synthetic_face_obj(os.path.join(d, "face.obj"))
        verts_path = generate_demo_animation(
            obj, os.path.join(d, "verts.npy"), seconds=n_frames / FPS, fps=FPS
        )
        mesh = FaceMesh.load(obj)
        verts = np.load(verts_path)[:n_frames]

    renderer = Renderer(mesh)
    vd = jnp.asarray(verts[:FRAME_BATCH], jnp.float32)
    if jax.default_backend() == "tpu":
        # Pallas tile rasterizer: exact at any triangle size, no fit flag
        step = lambda v: render_frames_tiled(  # noqa: E731
            v, renderer._faces_padded, renderer._face_valid, renderer.lights,
        )
        step(vd).block_until_ready()
        wall = timed(lambda: step(vd), n=5)
    else:
        # scatter path: find the first patch tier that holds every frame so
        # the timed step measures a COMPLETE render (tier 0 drops the bench
        # mesh's largest triangles; timing it would overstate frames/sec)
        for patch_h, patch_w in PATCH_TIERS:
            step = lambda v: render_frames_u8(  # noqa: E731
                v, renderer._faces_padded, renderer._face_valid,
                renderer.lights, patch_h=patch_h, patch_w=patch_w,
            )
            _, step_fit = step(vd)
            if bool(np.asarray(step_fit).all()):
                break
        else:
            raise AssertionError(
                "bench mesh fits no patch tier; frames/sec would be bogus"
            )
        wall = timed(lambda: step(vd)[0], n=5)
    fps = FRAME_BATCH / wall

    # warm the e2e path's program set (pipelined TRANSFER_BATCH shape) so
    # the metric reports steady-state throughput, not one-time compiles —
    # consistent with every other suite entry's timing convention
    renderer.render(verts[:1])
    tic = time.perf_counter()
    images = renderer.render(verts)
    e2e_wall = time.perf_counter() - tic
    assert len(images) == n_frames
    on_tpu = jax.default_backend() == "tpu"
    return {
        "metric": "offscreen render (Pallas tile rasterizer, "
                  "800x800, 5023-vert mesh)",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / FPS, 3),
        "detail": {
            "n_frames": n_frames,
            "device_ms_per_frame": round(wall / FRAME_BATCH * 1e3, 3),
            "e2e_fps_incl_transfers": round(n_frames / e2e_wall, 1),
            "path": "tiled" if on_tpu else "scatter",
            "backend": jax.default_backend(),
        },
    }


# ---------------------------------------------------------------------------
# scheduler
# ---------------------------------------------------------------------------

FLAGSHIP_NAME = "flagship"

# (name, fn, est_warm_s, tier). est_warm_s is the measured wall of a
# warm-cache subprocess run on the dev chip; the scheduler scales
# estimates by the observed actual/est ratio so a loaded compile server
# degrades to skips, not overruns. tier 0 entries carry the round's
# headline capabilities and run first (cheapest first within a tier);
# tier 1 entries fill remaining budget.
#
# Measured costs live in bench_costs.json, NOT here: the Pallas kernel
# payload inside every compiled program embeds the full source-location
# stack (jax's cache-key canonicalization strips module-level debug info
# but not the tpu_custom_call backend_config), so ANY edit to this file
# shifts line numbers and orphans every cached bench program — a full
# re-warm costs hours through the remote-compile tunnel. Tunables that
# must survive measurement updates therefore live outside the file.
_COSTS = None


def _costs() -> dict:
    global _COSTS
    if _COSTS is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_costs.json")
        try:
            with open(path) as f:
                _COSTS = json.load(f)
        except Exception:
            _COSTS = {}
    return _COSTS


def _suite():
    # tier 0: the headline-capability entries (render, streaming compute,
    # streaming fidelity, serving capacity) run FIRST so a tunnel-hang
    # budget drain (one hang costs its timeout even with the retry)
    # starves the tail, not them. tier 1: the two training entries.
    # tier 1.5: breadth extras. Cheapest-first within a tier.
    defaults = [
        ("render", bench_render, 70.0, 0),
        ("streaming", bench_streaming, 50.0, 0),
        ("streaming_fidelity", bench_streaming_fidelity, 90.0, 0),
        ("max_streams", bench_max_streams, 110.0, 0),
        ("train_step", bench_train_step, 45.0, 1),
        ("faceformer_train_batched", bench_faceformer_train_batched, 80.0, 1),
        ("voca", bench_voca, 25.0, 1.5),
        ("audio2mesh", bench_audio2mesh, 30.0, 1.5),
        ("frame_stream", bench_frame_stream, 40.0, 1.5),
        ("faceformer_10s_bs1", lambda: bench_faceformer_decode(10.0, 1), 60.0, 1.5),
        ("multistream", bench_multistream, 60.0, 1.5),
        # not scheduled by default (headline training number is the batched
        # entry); run with --only faceformer_train
        ("faceformer_train", bench_faceformer_train, 90.0, 2),
    ]
    est = _costs().get("est_s", {})
    return [(n, f, float(est.get(n, e)), t) for n, f, e, t in defaults]


def _print_line(obj):
    print(json.dumps(obj), flush=True)


def _flagship_line(result, with_detail=True):
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }
    if with_detail and result.get("detail"):
        line["detail"] = result["detail"]
    return line


def _run_subprocess(name: str, timeout_s: float):
    """Run one entry as ``bench.py --only name`` with a hard timeout.
    Returns (parsed_json_or_None, error_str_or_None, wall_s)."""
    env = dict(os.environ)
    env["A2F_BENCH_DEADLINE_S"] = str(max(timeout_s - 5.0, 5.0))
    tic = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", name],
            capture_output=True, text=True, timeout=timeout_s, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s:.0f}s", time.perf_counter() - tic
    wall = time.perf_counter() - tic
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        return None, f"rc={proc.returncode}: {' | '.join(tail)[-300:]}", wall
    try:
        return json.loads(lines[-1]), None, wall
    except json.JSONDecodeError as e:
        return None, f"bad json: {e}", wall


def main():
    global BUDGET_S
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--suite", action="store_true",
        help="(default behavior; kept for compatibility)",
    )
    parser.add_argument(
        "--flagship-only", action="store_true",
        help="print just the flagship line (skip the suite)",
    )
    parser.add_argument("--seconds", type=float, default=60.0)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument(
        "--only", type=str, default=None, metavar="NAME",
        help="run a single suite entry in-process and exit "
             "(NAME=flagship runs the headline config)",
    )
    parser.add_argument(
        "--in-process", action="store_true",
        help="run suite entries in this process instead of subprocesses "
             "(no hang protection; for debugging)",
    )
    parser.add_argument(
        "--budget", type=float, default=None,
        help=f"wall-clock budget in seconds (default {BUDGET_S:.0f}, "
             "env A2F_BENCH_BUDGET_S)",
    )
    args = parser.parse_args()

    if args.budget is not None:
        BUDGET_S = args.budget

    if args.only:
        _init_device()
        if args.only == FLAGSHIP_NAME:
            _print_line(bench_faceformer_decode(
                args.seconds, args.batch, bf16=not args.f32))
            return
        table = {name: fn for name, fn, _, _ in _suite()}
        _print_line(table[args.only]())
        return

    # the one value that must survive anything: initialized to an explicit
    # failure record, replaced by the real measurement, printed LAST always
    flagship = {
        "metric": _decode_metric_name(args.seconds, args.batch),
        "value": None, "unit": "frames/sec/chip", "vs_baseline": None,
        "detail": {"error": "flagship did not complete"},
    }

    def _emit_flagship_and_exit(signum, frame):
        # driver kill (SIGTERM from timeout(1)): close stdout with the
        # flagship line so the parsed record is never a mid-suite entry
        _print_line(_flagship_line(flagship))
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _emit_flagship_and_exit)
    signal.signal(signal.SIGINT, _emit_flagship_and_exit)

    # ── flagship FIRST (subprocess: a hung remote compile must not eat the
    # whole budget; retry once with whatever budget remains) ──────────────
    flagship_timeout = min(max(150.0, 0.25 * BUDGET_S),
                           max(remaining() - 60.0, 60.0))
    for attempt in range(2):
        r, err, wall = _run_subprocess(FLAGSHIP_NAME, flagship_timeout)
        if r is not None:
            flagship = r
            flagship.setdefault("detail", {})["bench_seconds"] = round(wall, 1)
            break
        flagship["detail"] = {"error": err, "attempt": attempt + 1}
        flagship_timeout = remaining() - RESERVE_S
        if flagship_timeout < 60.0:
            break
    _print_line(_flagship_line(flagship, with_detail=False))
    print(json.dumps(flagship.get("detail", {})), file=sys.stderr, flush=True)

    if args.flagship_only:
        _print_line(_flagship_line(flagship))
        return

    # ── suite under the remaining budget ─────────────────────────────────
    entries = [e for e in _suite() if e[3] < 2]
    entries.sort(key=lambda e: (e[3], e[2]))
    load_factor = 1.0  # observed actual/est, updated per entry
    for name, fn, est, tier in entries:
        est_scaled = est * load_factor
        if remaining() - RESERVE_S < est_scaled:
            _print_line({
                "metric": name, "value": None, "unit": None,
                "vs_baseline": None,
                "detail": {"skipped": "budget",
                           "est_s": round(est_scaled, 1),
                           "remaining_s": round(remaining(), 1)},
            })
            continue
        timeout_s = min(max(2.5 * est_scaled, est_scaled + 60.0, 120.0),
                        remaining() - RESERVE_S)
        if args.in_process:
            _init_device()
            tic = time.perf_counter()
            try:
                r, err = fn(), None
            except Exception as e:
                r, err = None, repr(e)
            wall = time.perf_counter() - tic
        else:
            r, err, wall = _run_subprocess(name, timeout_s)
            if r is None and remaining() - RESERVE_S > est_scaled:
                # one retry: subprocess hangs (remote attach/compile stalls,
                # ~5-20% of launches on a moody tunnel) reliably resolve on
                # relaunch; losing the entry hurts the record more than the
                # extra budget
                retry_t = min(timeout_s, remaining() - RESERVE_S)
                r2, err2, wall2 = _run_subprocess(name, retry_t)
                wall += wall2
                if r2 is not None:
                    r, err = r2, None
                else:
                    err = f"{err}; retry: {err2}"
        if r is None:
            r = {"metric": name, "value": None, "unit": None,
                 "vs_baseline": None, "detail": {"error": err}}
        r.setdefault("detail", {})["bench_seconds"] = round(wall, 1)
        _print_line(r)
        # adapt to the compile server's current mood, bounded so one
        # outlier doesn't zero out the rest of the suite
        load_factor = min(max(0.5 * load_factor + 0.5 * (wall / est), 0.5), 4.0)

    # ── flagship LAST: the driver parses the final stdout JSON line ──────
    _print_line(_flagship_line(flagship))


def _perturb_tree(tree, scale: float = 0.01):
    """+scale*N(0,1) on every leaf, computed ON DEVICE: a host-side numpy
    perturb (the tests' convention, test_streaming.py:40-44) would push
    ~380 MB of fresh params back through the ~20 MB/s tunnel. One jitted
    elementwise program, persistent-cached like everything else. Defined
    below main() so the function bodies above keep their line numbers
    (compiled Pallas payloads embed source locations — see the scheduler
    comment at _COSTS)."""

    @jax.jit
    def go(t):
        leaves, td = jax.tree.flatten(t)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        return jax.tree.unflatten(td, [
            p + scale * jax.random.normal(k, p.shape, p.dtype)
            for p, k in zip(leaves, keys)
        ])

    return go(tree)


if __name__ == "__main__":
    main()
