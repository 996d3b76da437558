"""Decompose the FaceFormer train step wall time on the real chip.

Times, at a given batch size / clip length:
  1. encoder-only fwd+bwd   (wav2vec2 + feature map, summed-output loss)
  2. decoder-only fwd+bwd   (scan + chunked head/loss, encoder_hidden given)
  3. full train step        (trainer program — the bench entry's workload)

The split tells us which of the two named round-4 ideas (fused decoder-step
backward vs encoder/scan backward overlap) is worth building: verdict item
#4 wants >=25% peak or >=90 clips/s, or a roofline note with this profile
attached.

Usage: python tools/train_profile.py [--batch 8] [--seconds 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio2face_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

FPS = 60
SR = 16000
N_VERTS = 15069
N_ONEHOT = 12


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32).ravel()[:1]))


def timed(fn, n=10):
    _sync(fn())
    tic = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - tic) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()
    B, seconds = args.batch, args.seconds

    from audio2face_tpu.models.faceformer import FaceFormer, frame_count, normalize_waveform
    from audio2face_tpu.models.layers import dot_precision
    from audio2face_tpu.losses import chunked_faceformer_head_loss

    n_samples = int(seconds * SR)
    T = frame_count(n_samples)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(B, n_samples)).astype(np.float32) * 0.1)
    lens = jnp.asarray(
        np.linspace(0.7 * n_samples, n_samples, B).astype(np.int32))
    one_hot = jnp.asarray(np.eye(N_ONEHOT, dtype=np.float32)[rng.integers(0, N_ONEHOT, B)])
    template = jnp.asarray(rng.normal(size=(B, N_VERTS // 3, 3)).astype(np.float32) * 0.01)
    verts_gt = jnp.asarray(
        rng.normal(size=(B, T, N_VERTS // 3, 3)).astype(np.float32) * 0.01)

    model = FaceFormer(n_verts=N_VERTS, n_onehot=N_ONEHOT, dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), audio[:1], one_hot[:1], template[:1])
    params = variables["params"]
    key = jax.random.PRNGKey(1)
    prec = dot_precision(jnp.bfloat16)

    # ---- 1. encoder-only fwd+bwd -------------------------------------
    from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    enc = Wav2Vec2Encoder(Wav2Vec2Config(), dtype=jnp.bfloat16)
    enc_vars = {"params": params["audio_encoder"]}
    frame_lengths = frame_count(lens)
    norm = normalize_waveform(audio, lens)

    def enc_loss(p):
        h = enc.apply(
            {"params": p}, norm, output_len=T, lengths=lens,
            output_lengths=frame_lengths, train=True, apply_spec_augment=True,
            rngs={"dropout": key, "spec_augment": key},
        )
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    enc_grad = jax.jit(jax.grad(enc_loss))
    t_enc = timed(lambda: enc_grad(enc_vars["params"]), args.n)

    def enc_fwd(p):
        return enc.apply(
            {"params": p}, norm, output_len=T, lengths=lens,
            output_lengths=frame_lengths, train=True, apply_spec_augment=True,
            rngs={"dropout": key, "spec_augment": key},
        )

    enc_fwd_j = jax.jit(enc_fwd)
    t_enc_fwd = timed(lambda: enc_fwd_j(enc_vars["params"]), args.n)
    hidden = enc_fwd_j(enc_vars["params"])

    # ---- 2. decoder-only fwd+bwd (encoder_hidden given) ---------------
    # big arrays (verts_gt is ~290 MB f32 at bs=8) must be jit ARGUMENTS:
    # closed-over constants embed in the HLO and blow the remote-compile
    # request-size limit (HTTP 413)
    def dec_loss(p, hidden, verts_gt, audio, template, one_hot):
        hs, fmask = model.apply(
            {"params": p}, audio, one_hot, template, lengths=lens,
            train=True, rngs={"dropout": key}, return_hidden=True,
            encoder_hidden=hidden,
        )
        loss, err = chunked_faceformer_head_loss(
            hs, p["vertice_map_r_kernel"], p["vertice_map_r_bias"], template,
            verts_gt, fmask, n_verts=N_VERTS // 3, precision=prec,
        )
        return loss["loss"]

    dec_grad = jax.jit(jax.grad(dec_loss))
    t_dec = timed(
        lambda: dec_grad(params, hidden, verts_gt, audio, template, one_hot),
        args.n)

    dec_fwd_j = jax.jit(dec_loss)
    t_dec_fwd = timed(
        lambda: dec_fwd_j(params, hidden, verts_gt, audio, template, one_hot),
        args.n)

    # ---- 3. full fwd+bwd (what the trainer runs, minus adam) -----------
    def full_loss(p, verts_gt, audio, template, one_hot):
        hs, fmask = model.apply(
            {"params": p}, audio, one_hot, template, lengths=lens,
            train=True, rngs={"dropout": key, "spec_augment": key},
            return_hidden=True,
        )
        loss, err = chunked_faceformer_head_loss(
            hs, p["vertice_map_r_kernel"], p["vertice_map_r_bias"], template,
            verts_gt, fmask, n_verts=N_VERTS // 3, precision=prec,
        )
        return loss["loss"]

    full_grad = jax.jit(jax.grad(full_loss))
    t_full = timed(
        lambda: full_grad(params, verts_gt, audio, template, one_hot), args.n)

    print(f"batch={B} seconds={seconds} T={T} backend={jax.default_backend()}")
    print(f"encoder fwd            : {t_enc_fwd*1e3:8.1f} ms")
    print(f"encoder fwd+bwd        : {t_enc*1e3:8.1f} ms")
    print(f"decoder fwd (scan+loss): {t_dec_fwd*1e3:8.1f} ms")
    print(f"decoder fwd+bwd        : {t_dec*1e3:8.1f} ms")
    print(f"full fwd+bwd           : {t_full*1e3:8.1f} ms")
    print(f"sum enc+dec fwd+bwd    : {(t_enc+t_dec)*1e3:8.1f} ms")
    print(f"clips/s (full fwd+bwd) : {B/t_full:8.1f}")


if __name__ == "__main__":
    main()
