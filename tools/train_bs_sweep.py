"""Sweep the FaceFormer whole-clip training batch size on the real chip.

Round-4 verdict item #8: bs=16 already edged bs=8 (62.4 vs 60.3 clips/s)
once the chunked head landed; this sweep measures bs in {8, 16, 24, 32}
(10 s padded clips, masked loss) and reports ms/step, clips/s and the
step-0 loss at each point. The best point becomes the bench default via
bench_costs.json:ff_train_bs (read at runtime — editing it does not orphan
cached programs).

The scan's per-step cost is nearly batch-invariant ((B, 64) operands sit
far under the 128-sublane tile), while the encoder scales linearly with B,
so clips/s should rise toward the encoder-bound asymptote until HBM runs
out. Loss equivalence across bs is separately covered by
tests/test_batched_training.py (padded batch == solo to 1e-4); the loss
printed here is a same-data sanity value, not that test.

Usage: python tools/train_bs_sweep.py [--sizes 8,16,24,32] [--seconds 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio2face_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np

FPS = 60
SR = 16000
N_VERTS = 15069
N_ONEHOT = 12


def run_point(batch: int, seconds: float, n: int = 10):
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
    exp = Audio2FaceExperiment(cfg, log_dir=f"/tmp/bs_sweep_{batch}", tensorboard=False)
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
    loss0 = float(m["loss"])  # compile + drain
    tic = time.perf_counter()
    for _ in range(n):
        state, m = exp.train_step(state, b, key)
    loss = float(m["loss"])
    wall = (time.perf_counter() - tic) / n
    return {
        "batch": batch,
        "ms_per_step": round(wall * 1e3, 1),
        "clips_per_sec": round(batch / wall, 1),
        "loss_step0": round(loss0, 4),
        "loss": round(loss, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="8,16,24,32")
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()
    out = []
    for bs in [int(s) for s in args.sizes.split(",")]:
        try:
            r = run_point(bs, args.seconds)
        except Exception as e:
            r = {"batch": bs, "error": repr(e)[:300]}
            print(json.dumps(r), flush=True)
            break
        print(json.dumps(r), flush=True)
        out.append(r)
    best = max((r for r in out if "clips_per_sec" in r),
               key=lambda r: r["clips_per_sec"], default=None)
    if best:
        print(json.dumps({"best_bs": best["batch"],
                          "clips_per_sec": best["clips_per_sec"]}), flush=True)


if __name__ == "__main__":
    main()
