"""Live multi-stream serving for the frame models (audio2mesh / voca /
song2face): N concurrent callers share one chip and ONE compiled program.

The frame models are per-frame functions of a 0.52 s audio window
(src/dataset/vocaset.py:408-430 geometry), so — unlike FaceFormer's
autoregressive pool (multistream.py) — live streaming needs no carried
decoder state and is exact: every emitted frame sees the same audio
window, features, and weights as the offline ``serving.FramePredictor``
for the same clip — outputs agree to float32 round-off (bitwise when the
pool batch shape coincides with the offline chunk shape), including tail
frames (the offline fragmenter zero-pads past the clip end, and so does
the pool's flush).

Shape discipline: each batched step advances ``frame_batch`` frames for
every ready slot through one fixed (n_streams, span) program. The audio
window for frames [f0, f0+fb) spans ``(fb-1)*sr//fps + 2*n_pad + 1``
samples regardless of f0; per-slot frame offsets ride in as traced
(S,) vectors and the per-frame fragment gather happens in-graph, so the
pool compiles exactly ONE program per configuration no matter how
streams start, stop, or end on ragged tails.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio2face_tpu.data.vocaset import FPS, FRAGMENT_SECONDS


class _FrameSlot:
    """Host-side per-stream bookkeeping."""

    __slots__ = ("active", "finished", "flushed", "buffer", "h0",
                 "n_total", "f_done", "pending")

    def __init__(self):
        self.active = False
        self.reset()

    def reset(self):
        self.finished = False
        self.flushed = False
        self.buffer = np.zeros((0,), np.float32)
        self.h0 = 0  # absolute sample index of buffer[0]
        self.n_total = 0  # samples received so far
        self.f_done = 0  # frames emitted so far
        self.pending: list[np.ndarray] = []


class FrameStreamPool:
    """Fixed pool of ``n_streams`` live frame-model streams on one chip.

    Usage::

        pool = FrameStreamPool(config, variables, n_streams=8)
        a = pool.open_stream(one_hot_a, template_a)
        frames = pool.push(a, audio_chunk)            # (T_new, V, 3)
        tail = pool.push(a, more_audio, last=True)
        pool.close_stream(a)

    ``push`` advances EVERY slot with ``frame_batch`` decodable frames in
    one batched step; frames produced for other slots are buffered and
    returned by their own next ``push``/``poll``.
    """

    def __init__(
        self,
        config,
        variables: Optional[dict] = None,
        *,
        n_streams: int = 8,
        frame_batch: int = 32,
        seed: int = 0,
        unit_scale: float = 100.0,
        mesh=None,
    ):
        from audio2face_tpu.serving import FramePredictor

        # reuse FramePredictor's model/extractor construction + init
        self._base = FramePredictor(
            config, variables=variables, frame_batch=frame_batch, seed=seed,
            unit_scale=unit_scale,
        )
        self.mesh = mesh
        if mesh is not None:
            from audio2face_tpu.parallel.mesh import DATA_AXIS, replicate

            n_data = mesh.shape[DATA_AXIS]
            if int(n_streams) % n_data != 0:
                raise ValueError(
                    f"n_streams={n_streams} must be divisible by the mesh "
                    f"data axis ({n_data}) so each chip hosts a whole slot "
                    "slice"
                )
            self._base.variables = replicate(mesh, self._base.variables)
            if self._base._fe_params is not None:
                self._base._fe_params = replicate(mesh, self._base._fe_params)
        self.config = config
        self.sr = config.sample_rate
        self.fps = FPS  # vocaset animation clock (frame models are 60 fps)
        self.n_verts = config.vertex_count
        self.n_onehot = config.one_hot_size
        self.n_streams = int(n_streams)
        self.fb = int(frame_batch)
        self.unit_scale = float(unit_scale)
        self.n_pad = int(self.sr * FRAGMENT_SECONDS / 2)
        # fixed window covering fb frames at any offset (floor-div jitter +1)
        self.span = (self.fb - 1) * self.sr // FPS + 2 * self.n_pad + 1
        self._slots = [_FrameSlot() for _ in range(self.n_streams)]
        self._one_hot = np.zeros((self.n_streams, self.n_onehot), np.float32)
        self._template = np.zeros(
            (self.n_streams, self.n_verts // 3, 3), np.float32
        )
        self._fn = None

    @property
    def variables(self):
        return self._base.variables

    # ------------------------------------------------------------------
    # stream lifecycle
    # ------------------------------------------------------------------

    def open_stream(self, one_hot: np.ndarray, template: np.ndarray) -> int:
        free = next((i for i, s in enumerate(self._slots) if not s.active), None)
        if free is None:
            raise RuntimeError(
                f"all {self.n_streams} stream slots are busy; close_stream() "
                "one or provision a larger pool"
            )
        sl = self._slots[free]
        sl.active = True
        sl.reset()
        self._one_hot[free] = np.asarray(one_hot, np.float32).reshape(self.n_onehot)
        self._template[free] = np.asarray(template, np.float32).reshape(-1, 3)
        return free

    def close_stream(self, slot: int) -> None:
        self._slots[slot].active = False

    def poll(self, slot: int) -> np.ndarray:
        """Collect frames produced for ``slot`` by other streams' pushes."""
        return self._drain(slot)

    # ------------------------------------------------------------------
    # data path
    # ------------------------------------------------------------------

    def push(self, slot: int, audio: np.ndarray, *, last: bool = False) -> np.ndarray:
        sl = self._slots[slot]
        if not sl.active:
            raise RuntimeError(f"slot {slot} is not open")
        if sl.finished:
            raise RuntimeError("stream was flushed (last=True); open a new one")
        audio = np.asarray(audio, np.float32).reshape(-1)
        sl.buffer = np.concatenate([sl.buffer, audio])
        sl.n_total += len(audio)
        if last:
            sl.finished = True
        while any(
            self._ready_frames(s) >= self.fb or self._flush_ready(s)
            for s in self._slots
        ):
            self._step()
        return self._drain(slot)

    def flush(self, slot: int) -> np.ndarray:
        return self.push(slot, np.zeros((0,), np.float32), last=True)

    # ------------------------------------------------------------------

    def _total_frames(self, sl: _FrameSlot) -> int:
        # offline frame-count convention (FramePredictor.__call__)
        return sl.n_total * FPS // self.sr

    def _ready_frames(self, sl: _FrameSlot) -> int:
        """Frames decodable from the buffered samples (window fully real)."""
        if not sl.active:
            return 0
        # frame f needs samples through f*sr//FPS + n_pad
        f_hi = max((sl.n_total - self.n_pad) * FPS // self.sr + 2, 0)
        while f_hi > 0 and (f_hi - 1) * self.sr // FPS + self.n_pad > sl.n_total:
            f_hi -= 1
        return min(f_hi, self._total_frames(sl)) - sl.f_done

    def _flush_ready(self, sl: _FrameSlot) -> bool:
        return (
            sl.active and sl.finished and not sl.flushed
            and sl.f_done < self._total_frames(sl)
        )

    def _step(self) -> None:
        """One batched step: every ready slot advances ``fb`` frames."""
        s, fb, span, n_pad = self.n_streams, self.fb, self.span, self.n_pad
        windows = np.zeros((s, span), np.float32)
        f0 = np.zeros((s,), np.int64)
        n_valid = np.zeros((s,), np.int32)

        for i, sl in enumerate(self._slots):
            ready = self._ready_frames(sl)
            if ready >= fb:
                n = fb
            elif self._flush_ready(sl):
                # tail: at most fb frames per step; windows past the clip
                # end are zero-filled exactly like the offline fragmenter
                n = min(self._total_frames(sl) - sl.f_done, fb)
                if sl.f_done + n == self._total_frames(sl):
                    sl.flushed = True
            else:
                continue
            f0[i] = sl.f_done
            n_valid[i] = n
            origin = sl.f_done * self.sr // FPS - n_pad  # may be < 0 early
            # copy the buffered samples overlapping [origin, origin+span);
            # zeros elsewhere reproduce the offline fragmenter's pad
            lo = max(origin, sl.h0)
            hi = min(origin + span, sl.h0 + len(sl.buffer), sl.n_total)
            if hi > lo:
                windows[i, lo - origin : hi - origin] = sl.buffer[
                    lo - sl.h0 : hi - sl.h0
                ]
            sl.f_done += n
            # drop samples no later window can need
            keep_from = sl.f_done * self.sr // FPS - n_pad
            if keep_from > sl.h0:
                sl.buffer = sl.buffer[keep_from - sl.h0 :]
                sl.h0 = keep_from

        if not n_valid.any():
            return

        out = self._get_fn()(
            self.variables, self._base._fe_params or {},
            jnp.asarray(windows), jnp.asarray(self._one_hot),
            jnp.asarray(self._template), jnp.asarray(f0, jnp.int32),
        )
        out_np = None  # fetched lazily once per step
        for i, sl in enumerate(self._slots):
            if n_valid[i] > 0:
                if out_np is None:
                    out_np = np.asarray(out, np.float32)
                sl.pending.append(out_np[i, : n_valid[i]])

    def _drain(self, slot: int) -> np.ndarray:
        sl = self._slots[slot]
        if not sl.pending:
            return np.zeros((0, self.n_verts // 3, 3), np.float32)
        got = np.concatenate(sl.pending)
        sl.pending = []
        return got

    # ------------------------------------------------------------------
    # the one compiled program
    # ------------------------------------------------------------------

    def _get_fn(self):
        if self._fn is not None:
            return self._fn
        fb, span, n_pad = self.fb, self.span, self.n_pad
        window = 2 * n_pad
        sr, scale = self.sr, self.unit_scale
        base = self._base

        def fn(variables, fe_params, windows, one_hot, template, f0):
            s = windows.shape[0]
            # per-frame fragment gather, relative to each slot's window
            # origin f0*sr//FPS - n_pad (same geometry as the offline
            # FramePredictor; mode="clip" is inert — rel is in range by
            # construction of span)
            j = jnp.arange(fb)
            # window for frame f covers samples [f*sr//FPS - n_pad,
            # f*sr//FPS + n_pad); windows[i, k] holds sample origin+k with
            # origin = f0*sr//FPS - n_pad, so the window start lands at
            # rel = (f0+j)*sr//FPS - f0*sr//FPS. Computed via r = f0 % FPS:
            # with f0 = q*FPS + r both floors share the q*sr term, so
            # rel = (r+j)*sr//FPS - r*sr//FPS EXACTLY — tiny operands, no
            # int32 overflow no matter how long a live stream runs (the
            # naive (f0+j)*sr product wraps at ~27 min of 22 kHz audio)
            r = (f0 % FPS)[:, None]
            rel = (r + j[None, :]) * sr // FPS - r * sr // FPS  # (S, fb)
            gather = rel[..., None] + jnp.arange(window)[None, None, :]
            frags = jnp.take_along_axis(
                windows[:, None, :], gather.reshape(s, fb * window)[:, None, :],
                axis=2,
            ).reshape(s * fb, window)
            feats = base._features(frags, fe_params)
            oh = jnp.repeat(one_hot, fb, axis=0)
            tmpl = jnp.repeat(template * scale, fb, axis=0)
            out = base.model.apply(variables, feats, oh, tmpl, train=False)
            return out.reshape(s, fb, -1, 3) / scale

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from audio2face_tpu.parallel.mesh import DATA_AXIS, shard_map_data

            # weights replicate; every slot-axis array shards on data. The
            # fn derives its slot count from windows.shape, so under
            # shard_map each chip traces with its local slice.
            fn = shard_map_data(
                self.mesh, fn,
                in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS),
                          P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(DATA_AXIS),
            )

        self._fn = jax.jit(fn)
        return self._fn
