"""Inference entry point: wav file(s) -> vertex animation (+ optional video).

A dedicated serving CLI the reference lacks (its only predict path runs
inside train.py's Lightning predict pass, batch 1, 10 s cap). Decodes any
number of clips of any length in padded batches on one chip.

Example:
    python infer.py --audio clip.wav --subject 3 \
        --template assets/FLAME_sample.obj --checkpoint logs/.../checkpoints/epoch=7-step=123 \
        --output out/ --video

Defaults to FaceFormer; pass --config configs/<audio2mesh|voca|song2face>.yaml
to serve a frame model instead (offline batches or, with --streaming, the
live FrameStreamPool path).
"""

import argparse
import os

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--audio", nargs="+", required=True, help="input wav file(s)")
    parser.add_argument("--subject", type=int, nargs="+", default=None,
                        help="style one-hot index per clip (default 0)")
    parser.add_argument("--template", required=True, help="FLAME template .obj/.ply")
    parser.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    parser.add_argument("--torch-checkpoint", default=None, help="reference .ckpt/.pt")
    parser.add_argument("--output", default="output")
    parser.add_argument("--video", action="store_true", help="render mp4 per clip")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--streaming", action="store_true",
                        help="decode incrementally with bounded lookahead "
                             "(simulated live input; prints per-chunk latency)")
    parser.add_argument("--chunk-seconds", type=float, default=1.0)
    parser.add_argument("--left-seconds", type=float, default=2.0)
    parser.add_argument("--lookahead-seconds", type=float, default=0.5)
    parser.add_argument("--config", default=None,
                        help="experiment YAML for a frame model "
                             "(audio2mesh/voca/song2face); omit for faceformer")
    parser.add_argument("--dataset", choices=["vocaset", "biwi"], default=None,
                        help="faceformer dataset family (orbax checkpoints "
                             "auto-detect; REQUIRED as 'biwi' for BIWI-trained "
                             "torch checkpoints — frames run at 25 fps)")
    args = parser.parse_args()

    from audio2face_tpu.serving import FaceFormerPredictor
    from audio2face_tpu.utils.audio_io import read_wav
    from audio2face_tpu.utils.cache import enable_persistent_cache
    from audio2face_tpu.utils.facemesh import FaceMesh

    enable_persistent_cache()

    mesh = FaceMesh.load(args.template)
    if args.config:
        from audio2face_tpu.config import ExpConfig
        from audio2face_tpu.serving import FramePredictor

        cfg = ExpConfig.from_yaml(args.config)
        if cfg.modelname == "faceformer":
            raise SystemExit("--config is for the frame models; omit it for faceformer")
        fkw = dict(max_batch=args.batch)
        if args.torch_checkpoint:
            predictor = FramePredictor.from_torch_checkpoint(
                args.torch_checkpoint, cfg, **fkw)
        elif args.checkpoint:
            predictor = FramePredictor.from_checkpoint(args.checkpoint, cfg, **fkw)
        else:
            print("WARNING: no checkpoint given — using random weights (smoke mode)")
            predictor = FramePredictor(cfg, **fkw)
    else:
        kwargs = dict(max_batch=args.batch, bf16=not args.f32)
        if args.dataset:
            kwargs["dataset"] = args.dataset
        if args.torch_checkpoint:
            predictor = FaceFormerPredictor.from_torch_checkpoint(args.torch_checkpoint, **kwargs)
        elif args.checkpoint:
            predictor = FaceFormerPredictor.from_checkpoint(args.checkpoint, **kwargs)
        else:
            print("WARNING: no checkpoint given — using random weights (smoke mode)")
            predictor = FaceFormerPredictor(**kwargs)

    audios, rates = [], set()
    for path in args.audio:
        wav, sr = read_wav(path)
        audios.append(wav)
        rates.add(sr)
    if len(rates) != 1:
        raise ValueError(f"all clips must share one sample rate, got {rates}")

    subjects = args.subject or [0] * len(audios)
    one_hot = np.eye(predictor.n_onehot, dtype=np.float32)[subjects]
    template = np.asarray(mesh.verts, np.float32)

    sr = rates.pop()
    if args.streaming and args.config:
        results = _stream_frames(predictor, audios, one_hot, template, sr)
    elif args.streaming:
        if getattr(predictor, "dataset", "vocaset") == "biwi":
            raise SystemExit(
                "--streaming supports only vocaset faceformer checkpoints "
                "(the streaming windows assume the 60 fps adapter)"
            )
        results = _stream(predictor, audios, one_hot, template, sr, args)
    else:
        results = predictor(audios, one_hot, template, sample_rate=sr)

    os.makedirs(args.output, exist_ok=True)
    for path, verts in zip(args.audio, results):
        stem = os.path.splitext(os.path.basename(path))[0]
        out_npy = os.path.join(args.output, f"{stem}_verts.npy")
        np.save(out_npy, verts)
        print(f"{path}: {verts.shape[0]} frames -> {out_npy}")
        if args.video:
            from audio2face_tpu.utils.renderer import Renderer, images_to_video

            renderer = Renderer(mesh)
            images = renderer.render(verts)
            clip_dir = os.path.join(args.output, stem)
            images_to_video(images, clip_dir)


def _stream_frames(predictor, audios, one_hot, template, sr):
    """Live frame-model path: feed clips in 100 ms packets through a
    FrameStreamPool slot each, reporting per-packet compute latency."""
    import time

    import jax.numpy as jnp

    from audio2face_tpu.frame_stream import FrameStreamPool
    from audio2face_tpu.ops.dsp import resample

    pool = FrameStreamPool(
        predictor.config, variables=predictor.variables,
        n_streams=min(len(audios), 8),
    )
    results = []
    model_sr = predictor.config.sample_rate
    feed = int(0.1 * model_sr)
    for clip_i, audio in enumerate(audios):
        if sr != model_sr:
            audio = np.asarray(resample(jnp.asarray(audio)[None], sr, model_sr)[0])
        slot = pool.open_stream(one_hot[clip_i], template)
        outs, n_pk, lat = [], 0, 0.0
        for off in range(0, len(audio), feed):
            tic = time.perf_counter()
            got = pool.push(slot, audio[off : off + feed],
                            last=off + feed >= len(audio))
            lat += time.perf_counter() - tic
            n_pk += 1
            if got.size:
                outs.append(got)
        tail = pool.poll(slot)
        if tail.size:
            outs.append(tail)
        pool.close_stream(slot)
        results.append(
            np.concatenate(outs)
            if outs
            else np.zeros((0, predictor.n_verts // 3, 3), np.float32)
        )
        if n_pk:
            print(
                f"clip {clip_i}: {len(results[-1])} frames live, "
                f"{lat / n_pk * 1e3:.1f} ms compute/100 ms packet"
            )
    return results


def _stream(predictor, audios, one_hot, template, sr, args):
    """Feed each clip chunk-by-chunk through the streaming predictor,
    reporting wall latency per emitted chunk."""
    import time

    import jax.numpy as jnp

    from audio2face_tpu.ops.dsp import resample
    from audio2face_tpu.streaming import AUDIO_SR, StreamingFaceFormerPredictor

    stream = StreamingFaceFormerPredictor(
        predictor.variables, n_verts=predictor.n_verts,
        n_onehot=predictor.n_onehot,
        chunk_seconds=args.chunk_seconds, left_seconds=args.left_seconds,
        lookahead_seconds=args.lookahead_seconds,
        dtype=None if args.f32 else jnp.bfloat16,
        unit_scale=predictor.unit_scale,
    )
    results = []
    feed = int(0.1 * AUDIO_SR)  # simulated 100 ms microphone packets
    for clip_i, audio in enumerate(audios):
        if sr != AUDIO_SR:
            audio = np.asarray(resample(jnp.asarray(audio)[None], sr, AUDIO_SR)[0])
        stream.start_stream(one_hot[clip_i], template)
        outs, n_chunks, lat = [], 0, 0.0
        for off in range(0, len(audio), feed):
            tic = time.perf_counter()
            got = stream.push(audio[off : off + feed])
            dt = time.perf_counter() - tic
            if got.size:
                outs.append(got)
                n_chunks += 1
                lat += dt
        outs.append(stream.flush())
        outs = [o for o in outs if o.size]
        results.append(
            np.concatenate(outs)
            if outs
            else np.zeros((0, predictor.n_verts // 3, 3), np.float32)
        )
        if n_chunks:
            print(
                f"clip {clip_i}: {n_chunks} chunks, "
                f"{lat / n_chunks * 1e3:.1f} ms compute/chunk "
                f"({args.chunk_seconds * 1e3:.0f} ms audio each, "
                f"lookahead {args.lookahead_seconds:.1f}s)"
            )
    return results


if __name__ == "__main__":
    main()
