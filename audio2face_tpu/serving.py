"""Inference/serving API: bucketed, batched, checkpoint-driven prediction.

The reference has no dedicated inference surface — prediction happens inside
train.py's Lightning predict pass, one clip at a time, recompiling nothing
because it's eager PyTorch. Under jit, variable-length audio would retrace
per length; this module gives the production path:

- shape buckets (audio seconds rounded up to a grid) so a handful of
  compiled programs cover any clip length, with per-item ``lengths`` masking
  inside the graph (exact: the fps adapter and group norm are length-aware);
- padded batching up to ``max_batch`` speakers per call (BASELINE config #4);
- weights from an orbax checkpoint, a converted PyTorch/Lightning
  checkpoint, or random init for benchmarking;
- optional multi-chip fleet serving: pass a ``(data, 1)``
  ``jax.sharding.Mesh`` and each call is sharded over the batch axis with
  ``shard_map`` — every chip runs the full model (including the Pallas
  decode/attention kernels, which GSPMD cannot partition on its own) on its
  local slice of the batch;
- outputs in data units: checkpoints — from this trainer AND from the
  reference (src/model/lightning_model.py:145-148) — are trained with the
  x100 vertex-unit convention, so the predictor feeds ``template * 100``
  and returns ``output / 100``, exactly matching ``trainer.predict``
  (lightning_model.py:215-225). Override ``unit_scale=1.0`` for weights
  trained in raw data units.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audio2face_tpu.models.faceformer import AUDIO_SR, FaceFormer
from audio2face_tpu.utils.shapes import round_up as _round_up


def _fit_max_batch(max_batch: int, n_data: int) -> int:
    """Largest batch cap <= max_batch that splits evenly over the mesh's
    data axis (each chip gets a whole share). Rounds DOWN — never exceeds
    the caller's per-call cap (a memory ceiling on long clips) — and
    warns; a cap smaller than the data axis cannot be honored at all
    (every sharded call pads to a multiple of the axis), so that raises."""
    if max_batch % n_data == 0:
        return max_batch
    if max_batch < n_data:
        raise ValueError(
            f"max_batch={max_batch} is smaller than the mesh data axis "
            f"({n_data}): every mesh-sharded call is padded to a multiple "
            f"of the axis, so the cap cannot be honored — raise max_batch "
            f"to >= {n_data} or serve on a smaller mesh"
        )
    import warnings

    new = (max_batch // n_data) * n_data
    warnings.warn(
        f"max_batch={max_batch} is not divisible by the "
        f"mesh data axis ({n_data}); rounding down to max_batch={new}",
        stacklevel=3,
    )
    return new


def _batch_grid(max_batch: int, n_data: int = 1) -> list[int]:
    """The batch-shape grid: powers of two, each rounded up to a whole
    multiple of the mesh data axis and capped at ``max_batch`` (itself a
    multiple of the axis after ``_fit_max_batch``).

    Without a grid, every distinct group size jit-compiles its own program —
    a 3-clip request after a warmed {1, max_batch} deployment still stalls
    minutes on Mosaic. The grid bounds that to <= log2(max_batch)+1 shapes
    per audio bucket. Grid membership is closed under ``_pad_batch``
    (every grid size pads to itself), so ``warmup()`` compiles EXACTLY the
    reachable program set — with the earlier pow2-then-round-up formula,
    padding was not idempotent off power-of-two mesh axes (n_data=3:
    pad(3) -> 6) and warmup silently missed shapes live traffic hits."""
    grid = set()
    p = 1
    while p < max_batch:
        grid.add(min(_round_up(p, n_data), max_batch))
        p *= 2
    grid.add(max_batch)
    return sorted(grid)


def _pad_batch(b: int, max_batch: int, n_data: int = 1) -> int:
    """Smallest grid batch size >= the request group's size ``b``."""
    for g in _batch_grid(max_batch, n_data):
        if g >= b:
            return g
    raise ValueError(f"group of {b} clips exceeds max_batch={max_batch}")


def _warmup_predictor(
    predictor, max_seconds: float, batches: Optional[Sequence[int]],
    sample_rate: int,
) -> int:
    """Shared warmup driver for both predictors: run every (batch, bucket)
    program once on zero audio so it lands in the persistent compile cache.
    ``batches=None`` covers the full batch grid — every shape ``__call__``
    can pad a request group to."""
    if batches is None:
        batches = _batch_grid(
            predictor.max_batch,
            predictor.mesh.shape["data"] if predictor.mesh is not None else 1,
        )
    bucket = predictor.bucket_samples
    n_buckets = max(1, -(-int(max_seconds * sample_rate) // bucket))
    template = np.zeros((predictor.n_verts // 3, 3), np.float32)
    calls = 0
    for b in batches:
        for k in range(1, n_buckets + 1):
            audios = [np.zeros(k * bucket, np.float32)] * b
            one_hot = np.zeros((b, predictor.n_onehot), np.float32)
            predictor(audios, one_hot, template)
            calls += 1
    return calls


class FaceFormerPredictor:
    """Batched speech -> vertex-animation inference for FaceFormer."""

    def __init__(
        self,
        n_verts: int = 15069,
        n_onehot: int = 12,
        variables: Optional[dict] = None,
        *,
        bf16: bool = True,
        max_batch: int = 8,
        bucket_seconds: float = 5.0,
        seed: int = 0,
        decode_impl: Optional[str] = None,
        unit_scale: float = 100.0,
        dataset: str = "vocaset",
        mesh=None,
        sp_mesh=None,
    ):
        if mesh is not None and sp_mesh is not None:
            raise ValueError(
                "mesh= (data-parallel clip batches) and sp_mesh= "
                "(time-sharded encoder) are mutually exclusive"
            )
        self.sp_mesh = sp_mesh
        self.dataset = dataset
        # animation clock of the returned (T, V, 3) tracks (faceformer.py
        # frame_count: VOCASET animates at 60 fps, BIWI at 25)
        self.fps = 25 if dataset == "biwi" else 60
        self.model = FaceFormer(
            n_verts=n_verts,
            n_onehot=n_onehot,
            dtype=jnp.bfloat16 if bf16 else None,
            decode_impl=decode_impl,
            # BIWI animates at 25 fps; the upstream FaceFormer uses the frame
            # rate as the PPE/ALiBi period (matches the trainer's model_kwargs)
            **({"dataset": "biwi", "period": 25} if dataset == "biwi" else {}),
        )
        self.n_onehot = n_onehot
        self.n_verts = n_verts
        self.max_batch = max_batch
        self.unit_scale = float(unit_scale)
        self.bucket_samples = int(bucket_seconds * AUDIO_SR)
        if variables is not None:
            # a BIWI checkpoint served as vocaset would "work" silently —
            # flax ignores the unused cross_q/cross_k params, frames run at
            # the wrong clock, and the diagonal cross attention replaces the
            # trained 2-way softmax — so the mismatch is an error, not UB
            has_cross = "cross_q_kernel" in variables.get("params", {})
            if has_cross != (dataset == "biwi"):
                want = "biwi" if has_cross else "vocaset"
                raise ValueError(
                    f"checkpoint is a dataset={want!r} FaceFormer (cross_q/"
                    f"cross_k params {'present' if has_cross else 'absent'}) "
                    f"but the predictor was built with dataset={dataset!r} — "
                    f"pass dataset={want!r}"
                )
        if variables is None:
            dummy = jnp.zeros((1, AUDIO_SR), jnp.float32)
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), dummy,
                jnp.zeros((1, n_onehot), jnp.float32),
                jnp.zeros((1, n_verts // 3, 3), jnp.float32),
            )
        self.mesh = mesh
        if sp_mesh is not None:
            from audio2face_tpu.parallel.mesh import replicate

            variables = replicate(sp_mesh, variables)
        if mesh is not None:
            from audio2face_tpu.parallel.mesh import replicate

            self.max_batch = _fit_max_batch(self.max_batch, mesh.shape["data"])
            variables = replicate(mesh, variables)
        self.variables = variables
        self._fns: dict = {}

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kwargs) -> "FaceFormerPredictor":
        """Load a reference PyTorch/Lightning checkpoint. Pass
        ``dataset="biwi"`` for BIWI-trained weights — the converter then
        also carries the live cross-attention q/k projections."""
        from audio2face_tpu.compat.faceformer_convert import convert_faceformer
        from audio2face_tpu.compat.torch_convert import load_torch_checkpoint

        variables = jax.tree.map(
            jnp.asarray,
            convert_faceformer(
                load_torch_checkpoint(path),
                dataset=kwargs.get("dataset", "vocaset"),
            ),
        )
        return cls(variables=variables, **kwargs)

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs) -> "FaceFormerPredictor":
        """Load an orbax checkpoint written by the training loop. The
        dataset family is auto-detected from the param tree (BIWI
        checkpoints carry live cross_q/cross_k projections; vocaset's
        diagonal cross attention has none)."""
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(path)
        variables = {"params": jax.tree.map(jnp.asarray, restored["params"])}
        kwargs.setdefault(
            "dataset",
            "biwi" if "cross_q_kernel" in variables["params"] else "vocaset",
        )
        return cls(variables=variables, **kwargs)

    def _get_fn(self, batch: int, samples: int):
        key = (batch, samples)
        if key not in self._fns:

            scale = self.unit_scale

            def fn(variables, audio, one_hot, template, lengths):
                # returns decoder HIDDEN states (B, T, 64) + frame mask; the
                # vertex head runs per time-chunk in __call__ — its (B, T,
                # V, 3) f32 output is the one tensor that outgrows HBM on
                # long clips (~17 GB for 8x 3-minute clips)
                encoder_hidden = None
                if self.sp_mesh is not None:
                    # sequence parallelism: the wav2vec2 stack (the O(T^2)
                    # bulk) time-shards over the mesh; the tiny d=64 decoder
                    # runs on the gathered hidden states
                    from audio2face_tpu.models.faceformer import (
                        frame_count,
                        normalize_waveform,
                    )
                    from audio2face_tpu.parallel.sequence import (
                        sequence_parallel_encode,
                    )

                    # gather_output: the hidden states leave the shard_map
                    # REPLICATED, so everything downstream (the d=64 decoder,
                    # including the fused Pallas decode kernel — which GSPMD
                    # cannot partition) sees replicated operands and runs
                    # identically on every chip
                    encoder_hidden = sequence_parallel_encode(
                        {"params": variables["params"]["audio_encoder"]},
                        normalize_waveform(audio, lengths),
                        self.sp_mesh,
                        output_len=frame_count(audio.shape[1], self.fps),
                        lengths=lengths,
                        output_lengths=(
                            # BIWI keeps raw 50 fps latents (trim branch) —
                            # valid latent counts come from the conv stack,
                            # computed inside the encoder; only vocaset's
                            # interp needs explicit output frame counts
                            None if self.dataset == "biwi"
                            else frame_count(lengths, self.fps)
                        ),
                        dtype=self.model.dtype,
                        gather_output=True,
                        dataset=self.dataset,
                    )
                hs, mask = self.model.apply(
                    variables, audio, one_hot, template * scale,
                    lengths=lengths, return_hidden=True,
                    encoder_hidden=encoder_hidden,
                )
                return hs, mask

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                from audio2face_tpu.parallel.mesh import shard_map_data

                # manual SPMD: each chip runs the whole model (Pallas
                # kernels included) on its local batch slice; no collectives
                # are needed — serving is embarrassingly data-parallel.
                fn = shard_map_data(
                    self.mesh, fn,
                    in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
                    out_specs=(P("data"), P("data")),
                )
            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    # device-memory budget for one (B, chunk, V, 3) f32 vertex-head output;
    # chunking keeps serving O(1) in clip length (the full tensor is ~17 GB
    # for 8x 3-minute clips — past HBM)
    _VERTEX_CHUNK_BYTES = 512 * 1024 * 1024

    def _vertex_fn(self, batch: int, width: int):
        key = ("vh", batch, width)
        if key not in self._fns:
            from audio2face_tpu.models.layers import dot_precision

            scale = self.unit_scale
            prec = dot_precision(self.model.dtype)

            def fn(variables, hs, template):
                # exactly FaceFormer._vertex_head on a time slice, with the
                # predictor's x100-in / /100-out unit convention
                p = variables["params"]
                v = (
                    jnp.matmul(hs.reshape(-1, 64), p["vertice_map_r_kernel"], precision=prec)
                    + p["vertice_map_r_bias"]
                ).reshape(batch, width, -1)
                v = v.astype(jnp.float32) + template.reshape(batch, 1, -1) * scale
                return (v / scale).reshape(batch, width, -1, 3)

            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def _emit_vertices(self, hs, tmpl, idx, n_valid, results):
        """Apply the vertex head per time-chunk, fetching each chunk to its
        clip's output buffer — device memory and D2H stay bounded no matter
        the clip length (the final window is realigned, not re-compiled)."""
        b_pad, t, _ = hs.shape
        for j, i in enumerate(idx):
            results[i] = np.empty((int(n_valid[j]), self.n_verts // 3, 3), np.float32)
        t_need = int(n_valid.max()) if len(n_valid) else 0
        width = min(t, max(1, self._VERTEX_CHUNK_BYTES // (b_pad * self.n_verts * 4)))
        fn = self._vertex_fn(b_pad, width)
        for lo in range(0, t_need, width):
            start = min(lo, t - width)  # realign the tail window
            chunk = np.asarray(fn(self.variables, hs[:, start : start + width], tmpl), np.float32)
            off = lo - start
            for j, i in enumerate(idx):
                m = min(int(n_valid[j]), lo + width - off) - lo
                if m > 0:
                    results[i][lo : lo + m] = chunk[j, off : off + m]

    def _put(self, x):
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.mesh, P("data")))

    def __call__(
        self,
        audios: Sequence[np.ndarray],
        one_hot: np.ndarray,
        template: np.ndarray,
        sample_rate: int = AUDIO_SR,
    ) -> list[np.ndarray]:
        """Decode a batch of clips.

        audios: list of 1-D float waveforms (any lengths); one_hot: (N, 12);
        template: (N, V, 3) or (V, 3) shared. Returns per-clip (T_i, V, 3)
        vertex animations at 60 fps.
        """
        n = len(audios)
        if one_hot.shape[0] != n:
            raise ValueError(f"one_hot batch {one_hot.shape[0]} != {n} clips")
        if template.ndim == 2:
            template = np.broadcast_to(template[None], (n, *template.shape))

        if sample_rate != AUDIO_SR:
            from audio2face_tpu.ops.dsp import resample

            audios = [
                np.asarray(resample(jnp.asarray(a, jnp.float32), sample_rate, AUDIO_SR))
                for a in audios
            ]

        results: list[Optional[np.ndarray]] = [None] * n
        order = sorted(range(n), key=lambda i: len(audios[i]))
        for lo in range(0, n, self.max_batch):
            idx = order[lo : lo + self.max_batch]
            group = [audios[i] for i in idx]
            max_len = max(len(a) for a in group)
            samples = _round_up(max(max_len, self.bucket_samples), self.bucket_samples)
            b = len(group)
            b_pad = _pad_batch(
                b, self.max_batch,
                self.mesh.shape["data"] if self.mesh is not None else 1,
            )
            audio_pad = np.zeros((b_pad, samples), np.float32)
            # dummy rows (batch-grid/mesh padding) get a short valid length —
            # 800 samples decode 3 frames each, whose outputs are discarded
            # below (mask-based n_valid only covers real rows)
            lengths = np.full((b_pad,), min(800, samples), np.int32)
            oh = np.zeros((b_pad, one_hot.shape[1]), one_hot.dtype)
            tmpl = np.zeros((b_pad,) + template.shape[1:], np.float32)
            for j, a in enumerate(group):
                audio_pad[j, : len(a)] = a
                lengths[j] = len(a)
            oh[:b] = one_hot[idx]
            tmpl[:b] = template[idx].astype(np.float32)
            fn = self._get_fn(b_pad, samples)
            tmpl_dev = self._put(jnp.asarray(tmpl))
            hs, mask = fn(
                self.variables,
                self._put(jnp.asarray(audio_pad)),
                self._put(jnp.asarray(oh)),
                tmpl_dev,
                self._put(jnp.asarray(lengths)),
            )
            n_valid = np.asarray(mask).sum(axis=1).astype(int)
            self._emit_vertices(hs, tmpl_dev, idx, n_valid, results)
        return results  # type: ignore[return-value]

    def warmup(self, max_seconds: float = 60.0, *, batches: Optional[Sequence[int]] = None) -> int:
        """Precompile (and persistently cache) every (batch, bucket) decode
        program a deployment will hit, so no live request ever waits on a
        compile — Mosaic kernels take minutes per new shape on a cold cache.

        Covers every audio bucket up to ``max_seconds`` for each batch size
        in ``batches`` (default: the full batch grid ``__call__`` pads to —
        complete coverage; pass e.g. ``batches=[self.max_batch]`` to trade
        coverage for warmup time). Runs each program once on zero audio,
        which also exercises the chunked vertex head. Returns the number of
        warm calls made.
        """
        return _warmup_predictor(self, max_seconds, batches, AUDIO_SR)

    def realtime_factor(self, seconds: float = 60.0, batch: Optional[int] = None) -> float:
        """Measured decode throughput in multiples of real time."""
        import time

        batch = batch or self.max_batch
        rng = np.random.default_rng(0)
        audios = [rng.normal(size=int(seconds * AUDIO_SR)).astype(np.float32) * 0.1] * batch
        one_hot = np.eye(self.n_onehot, dtype=np.float32)[
            rng.integers(0, self.n_onehot, batch)
        ]
        template = rng.normal(size=(self.n_verts // 3, 3)).astype(np.float32)
        self(audios, one_hot, template)  # compile + warm
        tic = time.perf_counter()
        self(audios, one_hot, template)
        wall = time.perf_counter() - tic
        return batch * seconds / wall


class FramePredictor:
    """Batched speech -> per-frame vertex inference for the frame models
    (audio2mesh / voca / song2face — every registry model except faceformer).

    The reference predicts these only inside the Lightning predict pass, one
    pre-fragmented dataset sentence at a time (train.py:73-76,
    lightning_model.py:215-225). This is the raw-audio serving surface:

    - clips are fragmented into the dataset's 0.52 s per-frame windows
      (semantics of src/dataset/vocaset.py:408-430) ON DEVICE — the host
      uploads each clip once and a gather materializes the 60-fps windows
      in-graph, instead of shipping the ~60x-overlapping window tensor
      through the host link;
    - MFCC/wav2vec features are extracted in-graph and fused into the model
      forward (the reference runs torchaudio DSP on the host per item);
    - shapes stay compiled-program-friendly: audio buckets on a
      ``bucket_seconds`` grid, frames advance in fixed ``frame_batch``
      chunks with a traced chunk offset — one program per audio bucket
      covers any clip length;
    - unit convention matches ``FaceFormerPredictor``: checkpoints train
      against x100 vertices (lightning_model.py:145-148), so templates feed
      ``*100`` and outputs return ``/100``;
    - optional fleet serving: with ``mesh=`` the clip batch shards over the
      data axis via ``shard_map`` (BatchNorm runs in eval mode, so rows are
      independent and no collectives are needed).
    """

    def __init__(
        self,
        config,
        variables: Optional[dict] = None,
        *,
        max_batch: int = 8,
        frame_batch: int = 128,
        bucket_seconds: float = 5.0,
        seed: int = 0,
        unit_scale: float = 100.0,
        mesh=None,
    ):
        from audio2face_tpu.data.vocaset import FPS, FRAGMENT_SECONDS
        from audio2face_tpu.registry import get_extractor, get_model

        if config.modelname == "faceformer":
            raise ValueError("use FaceFormerPredictor for faceformer")
        self.config = config
        self.fps = FPS
        self.sample_rate = config.sample_rate
        self.n_verts = config.vertex_count
        self.n_onehot = config.one_hot_size
        self.max_batch = max_batch
        self.frame_batch = frame_batch
        self.unit_scale = float(unit_scale)
        self.bucket_samples = int(bucket_seconds * config.sample_rate)
        self.n_pad = int(config.sample_rate * FRAGMENT_SECONDS / 2)
        self.window = 2 * self.n_pad

        dtype = jnp.bfloat16 if getattr(config, "bf16_compute", True) else None
        self.model = get_model(config.modelname)(
            n_verts=config.vertex_count, n_onehot=config.one_hot_size, dtype=dtype
        )
        self.extractor = get_extractor(config.feature_extractor)(
            sample_rate=config.sample_rate,
            n_feature=config.n_feature,
            out_dim=config.out_dim,
            win_length=config.win_length,
            hop_length=config.hop_length,
            n_fft=1024,
        )
        # parameterized extractors (wav2vec2) thread their params as traced
        # arguments — closures bake the tree into the compile payload
        self._fe_params = getattr(self.extractor, "params", None)

        if variables is None:
            feats = self._features(jnp.zeros((1, self.window), jnp.float32))
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), feats,
                jnp.zeros((1, self.n_onehot), jnp.float32),
                jnp.zeros((1, self.n_verts // 3, 3), jnp.float32),
            )
        self.mesh = mesh
        if mesh is not None:
            from audio2face_tpu.parallel.mesh import replicate

            self.max_batch = _fit_max_batch(self.max_batch, mesh.shape["data"])
            variables = replicate(mesh, variables)
            if self._fe_params is not None:
                self._fe_params = replicate(mesh, self._fe_params)
        self.variables = variables
        self._fns: dict = {}

    @classmethod
    def from_torch_checkpoint(cls, path: str, config, **kwargs) -> "FramePredictor":
        """Load a reference PyTorch/Lightning checkpoint for this model."""
        from audio2face_tpu.compat.torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        variables = jax.tree.map(
            jnp.asarray, convert_state_dict(config.modelname, load_torch_checkpoint(path))
        )
        return cls(config, variables=variables, **kwargs)

    @classmethod
    def from_checkpoint(cls, path: str, config, **kwargs) -> "FramePredictor":
        """Load an orbax checkpoint written by the training loop."""
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(path)
        variables = {"params": jax.tree.map(jnp.asarray, restored["params"])}
        if restored.get("batch_stats"):
            variables["batch_stats"] = jax.tree.map(
                jnp.asarray, restored["batch_stats"]
            )
        return cls(config, variables=variables, **kwargs)

    def _features(self, x, fe_params=None):
        if fe_params:
            return self.extractor(x, params=fe_params)
        return self.extractor(x)

    def _get_fn(self, batch: int, samples: int):
        key = (batch, samples)
        if key not in self._fns:
            scale = self.unit_scale
            fb, window, n_pad = self.frame_batch, self.window, self.n_pad
            sr, fps = self.sample_rate, self.fps

            def fn(variables, fe_params, audio, one_hot, template, frame0):
                b = audio.shape[0]
                # device-side fragmenter == data/vocaset.py:batch_audio_fragments
                # (shift=0): window centers at idx*sr/fps, half-window padding
                # both sides; out-of-clip frames clamp into the pad (discarded
                # on the host by each clip's true frame count)
                padded = jnp.pad(audio, ((0, 0), (n_pad, window)))
                # starts = f*sr//fps via f = q*fps + r (exact): the naive
                # int32 product f*sr wraps past frame ~97k (~27 min of
                # clip); the decomposition is overflow-free for any clip
                # that fits int32 sample indexing at all
                f = frame0 + jnp.arange(fb)
                starts = (f // fps) * sr + (f % fps) * sr // fps
                gather = starts[:, None] + jnp.arange(window)[None, :]
                frags = jnp.take(padded, gather, axis=1, mode="clip")
                frags = frags.reshape(b * fb, window)
                feats = self._features(frags, fe_params)
                oh = jnp.repeat(one_hot, fb, axis=0)
                tmpl = jnp.repeat(template * scale, fb, axis=0)
                out = self.model.apply(variables, feats, oh, tmpl, train=False)
                return out.reshape(b, fb, -1, 3) / scale

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P

                from audio2face_tpu.parallel.mesh import shard_map_data

                fn = shard_map_data(
                    self.mesh, fn,
                    in_specs=(P(), P(), P("data"), P("data"), P("data"), P()),
                    out_specs=P("data"),
                )
            self._fns[key] = jax.jit(fn)
        return self._fns[key]

    def _put(self, x):
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.mesh, P("data")))

    def warmup(self, max_seconds: float = 60.0, *, batches: Optional[Sequence[int]] = None) -> int:
        """Precompile (and persistently cache) every (batch, bucket) frame
        program a deployment will hit — same contract as
        ``FaceFormerPredictor.warmup``. One program per audio bucket covers
        any clip length (the frame chunk offset is traced), so this is cheap:
        len(batches) x ceil(max_seconds / bucket_seconds) compiles."""
        return _warmup_predictor(self, max_seconds, batches, self.sample_rate)

    def __call__(
        self,
        audios: Sequence[np.ndarray],
        one_hot: np.ndarray,
        template: np.ndarray,
        sample_rate: Optional[int] = None,
    ) -> list[np.ndarray]:
        """Decode a batch of clips to per-frame vertices.

        audios: list of 1-D float waveforms (any lengths) at ``sample_rate``
        (default: the config's rate; other rates are resampled); one_hot:
        (N, one_hot_size); template: (N, V, 3) or (V, 3) shared. Returns
        per-clip (T_i, V, 3) vertex animations at 60 fps in data units.
        """
        n = len(audios)
        if one_hot.shape[0] != n:
            raise ValueError(f"one_hot batch {one_hot.shape[0]} != {n} clips")
        if template.ndim == 2:
            template = np.broadcast_to(template[None], (n, *template.shape))
        if sample_rate is not None and sample_rate != self.sample_rate:
            from audio2face_tpu.ops.dsp import resample

            audios = [
                np.asarray(
                    resample(jnp.asarray(a, jnp.float32), sample_rate, self.sample_rate)
                )
                for a in audios
            ]

        results: list[Optional[np.ndarray]] = [None] * n
        order = sorted(range(n), key=lambda i: len(audios[i]))
        for lo in range(0, n, self.max_batch):
            idx = order[lo : lo + self.max_batch]
            group = [audios[i] for i in idx]
            max_len = max(len(a) for a in group)
            samples = _round_up(max(max_len, self.bucket_samples), self.bucket_samples)
            b = len(group)
            b_pad = _pad_batch(
                b, self.max_batch,
                self.mesh.shape["data"] if self.mesh is not None else 1,
            )
            audio_pad = np.zeros((b_pad, samples), np.float32)
            for j, a in enumerate(group):
                audio_pad[j, : len(a)] = a
            oh = np.zeros((b_pad, one_hot.shape[1]), np.float32)
            tmpl = np.zeros((b_pad,) + template.shape[1:], np.float32)
            oh[:b] = one_hot[idx]
            tmpl[:b] = template[idx].astype(np.float32)
            n_frames = [len(a) * self.fps // self.sample_rate for a in group]
            for j, i in enumerate(idx):
                results[i] = np.empty(
                    (n_frames[j], self.n_verts // 3, 3), np.float32
                )
            fn = self._get_fn(b_pad, samples)
            audio_dev = self._put(jnp.asarray(audio_pad))
            oh_dev = self._put(jnp.asarray(oh))
            tmpl_dev = self._put(jnp.asarray(tmpl))
            t_need = max(n_frames) if n_frames else 0
            for f0 in range(0, t_need, self.frame_batch):
                chunk = np.asarray(
                    fn(
                        self.variables, self._fe_params or {}, audio_dev,
                        oh_dev, tmpl_dev, jnp.int32(f0),
                    ),
                    np.float32,
                )
                for j, i in enumerate(idx):
                    m = min(n_frames[j], f0 + self.frame_batch) - f0
                    if m > 0:
                        results[i][f0 : f0 + m] = chunk[j, :m]
        return results  # type: ignore[return-value]
