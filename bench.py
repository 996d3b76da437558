"""Benchmark harness. Prints the flagship metric as the FIRST and LAST stdout line
(driver-parsed), then the full suite, one JSON line per metric:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Headline benchmark (BASELINE.md config #4 / north star): long-form streaming
decode — 60 s of audio, batch of 8 speakers, full FaceFormer (wav2vec2-base
encoder + KV-cached autoregressive scan, 5,023-vertex output) on one chip.

value  = mesh frames/sec/chip (5023 verts, 60 fps animation clock)
vs_baseline = real-time factor / 30 (target: >=30x faster than real time;
the reference cannot run this config at all — it is hard-capped at 10 s and
batch 1, and recomputes the full prefix every frame).

Every metric's detail carries achieved TFLOP/s and %-of-peak (MFU) from
XLA's compiled cost analysis (Pallas kernels contribute their CostEstimate),
so per-round regressions anywhere in the suite are visible — not just the
flagship number. --flagship-only restores the single-line mode.
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from audio2face_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

FPS = 60
SR = 16000
N_VERTS = 15069
N_ONEHOT = 12

# MXU peak by generation (dense, per chip). v5e: 197 TFLOP/s bf16; f32
# runs the MXU in passes, ~1/4 rate.
_PEAK_BY_GEN = {"v5e": 197e12, "v5p": 459e12, "v4": 275e12}
PEAK_FLOPS_BF16 = _PEAK_BY_GEN.get(os.environ.get("PALLAS_AXON_TPU_GEN", "v5e"), 197e12)


def xla_flops(jitfn, *args, **kwargs):
    """Analytic FLOPs of a jitted call from XLA's compiled cost analysis
    (Pallas kernels contribute the CostEstimate passed at pallas_call).
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
    """FaceFormer init shared across suite entries: one ~95M-param init +
    one ~380 MB H2D upload instead of one per entry (the tunnel moves
    ~20 MB/s, so each re-init costs ~20 s of pure transfer)."""
    global _FF_VARIABLES
    if _FF_VARIABLES is None:
        from audio2face_tpu.models.faceformer import FaceFormer

        model = FaceFormer(n_verts=N_VERTS, n_onehot=N_ONEHOT)
        _FF_VARIABLES = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, SR), jnp.float32),
            jnp.zeros((1, N_ONEHOT), jnp.float32),
            jnp.zeros((1, N_VERTS // 3, 3), jnp.float32),
        )
    return _FF_VARIABLES


def bench_faceformer_streaming(seconds: float = 60.0, batch: int = 8, bf16: bool = True):
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
    wall = timed(lambda: fwd(variables, audio, one_hot, template), n=10)

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
        "metric": "faceformer 60s batch-8 KV-cached decode, mesh frames/sec/chip (5023 verts)",
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
    wall = timed(lambda: fwd(variables, audio, one_hot, template), n=30)
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
    wall = timed(lambda: fwd(variables, audio, one_hot, template), n=30)
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
    10 s). bs=1 whole-clip, reference training regime (train.py:30-34)."""
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


def bench_faceformer_train_batched(seconds: float = 10.0, batch: int = 8):
    """Padded whole-clip B>1 FaceFormer training — the capability the
    reference's bs=1 cap (train.py:30-34) forecloses. Variable lengths
    exercise the masked loss + length-aware encoder."""
    from audio2face_tpu.config import ExpConfig
    from audio2face_tpu.training.trainer import Audio2FaceExperiment
    from audio2face_tpu.parallel.mesh import shard_batch

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


def bench_streaming(seconds: float = 30.0, chunk_s: float = 1.0):
    """Steady-state latency of the streaming decoder: audio arrives in
    100 ms packets, vertices leave chunk_s at a time with 0.5 s lookahead."""
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

    feed = int(0.1 * SR)
    lats = []
    for off in range(0, len(audio), feed):
        tic = time.perf_counter()
        got = stream.push(audio[off : off + feed])
        if got.size:
            lats.append(time.perf_counter() - tic)
    stream.flush()
    steady = lats[2:] if len(lats) > 4 else lats
    ms = float(np.mean(steady) * 1e3)
    return {
        "metric": f"streaming decode, {chunk_s:.1f}s chunks + 0.5s lookahead",
        "value": round(ms, 1), "unit": "ms compute/chunk",
        "vs_baseline": None,
        "detail": {
            "chunks": len(lats),
            "compute_rtf": round(chunk_s / (ms / 1e3), 1),
            "algorithmic_latency_s": round(chunk_s + 0.5, 2),
            "note": "each chunk synchronously returns 3.6 MB of vertices; "
                    "on a tunneled TPU the D2H transfer dominates this wall "
                    "number (~20 MB/s link)",
        },
    }


def bench_streaming_fidelity(seconds: float = 12.0, chunk_s: float = 1.0):
    """Streamed-vs-offline FIDELITY (not speed): LVE + MVE of the chunked
    streaming decode against the same model's offline decode on
    speech-like audio, swept over lookahead and left-context sizes.

    The encoder is bidirectional, so bounded context is inherently
    approximate; this sweep turns the approximation into a measured
    latency-vs-fidelity curve (the lookahead IS the algorithmic latency).
    value = MVE of the default serving config (2 s left, 0.5 s lookahead)
    as a fraction of the offline animation's own mean displacement scale.
    """
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

    sweep = [
        run(2.0, 0.25), run(2.0, 0.5), run(2.0, 1.0),
        run(1.0, 0.5), run(4.0, 0.5),
    ]
    default = sweep[1]  # 2 s left, 0.5 s lookahead — the serving default
    return {
        "metric": "streaming fidelity vs offline decode (chunked, bf16)",
        "value": default["mve_over_signal"],
        "unit": "MVE / signal scale",
        "vs_baseline": None,
        "detail": {
            "signal_scale_mm": round(scale * 1e3, 4),
            "clip_seconds": seconds,
            "chunk_seconds": chunk_s,
            "sweep": sweep,
            "note": "LVE/MVE against the same model's offline output; the "
                    "reference cannot stream at all (whole-clip decode only)",
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
    for _ in range(3):
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

    wall = timed(call, n=10)
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


def bench_max_streams(chunk_s: float = 1.0, sizes=(64, 256, 512)):
    """Live-serving capacity envelope: how many concurrent real-time streams
    one chip sustains. Measures the multistream chunk-round at increasing
    pool sizes until a round no longer fits inside the chunk
    (realtime_margin < 1). value = the largest MEASURED stream count still
    real-time; detail carries the sweep and a linear-model capacity
    estimate (rounds are fixed-cost decode scan + per-stream encoder work,
    so ms(n) is ~affine)."""
    sweep = []
    best = None
    for n in sizes:
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
    wall = timed(lambda: fn(pool.variables, fe, windows, oh, tmpl, f0), n=30)
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
        wall = timed(lambda: step(vd), n=10)
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
        wall = timed(lambda: step(vd)[0], n=10)
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


def _suite():
    return [
        ("audio2mesh", bench_audio2mesh),
        ("voca", bench_voca),
        ("faceformer_10s_bs1", lambda: bench_faceformer_streaming(10.0, 1)),
        ("train_step", bench_train_step),
        ("faceformer_train", bench_faceformer_train),
        ("faceformer_train_batched", bench_faceformer_train_batched),
        ("streaming", bench_streaming),
        ("streaming_fidelity", bench_streaming_fidelity),
        ("multistream", bench_multistream),
        ("frame_stream", bench_frame_stream),
        ("max_streams", bench_max_streams),
        ("render", bench_render),
    ]


def main():
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
        help="run a single suite entry by name and exit (skips the flagship)",
    )
    args = parser.parse_args()
    import sys

    if args.only:
        table = dict(_suite())
        print(json.dumps(table[args.only]()), flush=True)
        return

    # flagship FIRST — the driver parses stdout line 1 — flushed before the
    # suite runs so a suite failure can never lose the headline number
    result = bench_faceformer_streaming(args.seconds, args.batch, bf16=not args.f32)
    print(json.dumps({
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
    }), flush=True)
    print(json.dumps(result["detail"]), file=sys.stderr, flush=True)

    if args.flagship_only:
        return

    for name, fn in _suite():
        tic = time.perf_counter()
        try:
            r = fn()
        except Exception as e:  # a broken suite entry must not hide the rest
            r = {"metric": name, "value": None, "unit": None,
                 "vs_baseline": None, "detail": {"error": repr(e)}}
        r.setdefault("detail", {})["bench_seconds"] = round(
            time.perf_counter() - tic, 1
        )
        print(json.dumps(r), flush=True)

    # flagship LAST as well — the driver parses the final stdout JSON line,
    # so the headline metric must close the stream (the first-line copy above
    # protects against a suite crash losing it entirely)
    print(json.dumps({
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "detail": result["detail"],
    }), flush=True)


if __name__ == "__main__":
    main()
