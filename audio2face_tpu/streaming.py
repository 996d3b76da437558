"""Streaming (chunked, bounded-lookahead) FaceFormer inference.

The reference has no streaming story at all: it decodes a whole (<=10 s)
clip offline inside its predict pass (src/model/faceformer.py:137-188,
driven one clip at a time from train.py). This module adds true
incremental decoding — audio goes in chunk by chunk, vertex frames come
out with bounded latency — built from two halves:

- **encoder (approximate, bounded context).** wav2vec2 is bidirectional, so
  exact streaming is impossible; each chunk is encoded inside a sliding
  [left_context | chunk | lookahead] window and only the chunk's center
  frames are kept. Audio normalization (the Wav2Vec2Processor zero-mean/
  unit-var the reference applies per whole clip, faceformer.py:142-144)
  uses statistics over exactly the audio up to the chunk's window end
  (chunk_end + lookahead) — causally consistent, DETERMINISTIC in
  (audio, config) regardless of push granularity, and exactly equal to
  the offline statistics at the final chunk. With a single window
  covering a grain-aligned clip the encoder output is bit-identical to
  the offline path.
- **decoder (exact).** The autoregressive decoder is causal, so streaming
  is exact: the KV cache, the feedback embedding, and the absolute frame
  counter carry across chunks. Chunk boundaries land on whole frames by
  construction (window sizes are multiples of 800 samples = 3 frames at
  60 fps / 16 kHz).

All shapes are static per (window, chunk) bucket: steady state compiles
one encoder + one decoder program; the final flush adds at most one more
of each (tail windows are zero-padded to the next 800-sample grain so
flush widths are bucketed, not per-clip — a Mosaic encoder compile costs
minutes per distinct shape on a tunneled TPU). Clips that end exactly on
the grain flush with zero padding, i.e. bit-exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio2face_tpu.models.faceformer import (
    AUDIO_SR,
    FEATURE_DIM,
    FPS,
    N_HEADS,
    frame_count,
)
from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

# frame-exact granularity: 800 samples == 3 frames (800 * 60 / 16000)
GRAIN = 800

# one frame-count rule for the whole pipeline (faceformer.py:frame_count)
samples_to_frames = frame_count


def _ceil_grain(n: int) -> int:
    return ((n + GRAIN - 1) // GRAIN) * GRAIN


class StreamingFaceFormerPredictor:
    """Incremental FaceFormer decoding with bounded lookahead.

    Parameters
    ----------
    variables: FaceFormer variables (``{"params": ...}``) — the same tree
        ``FaceFormerPredictor`` uses, so any trained/converted checkpoint
        streams unchanged.
    chunk_seconds: audio consumed per emission step.
    left_seconds: encoder left context (larger -> closer to offline output).
    lookahead_seconds: encoder right context — the algorithmic latency.
    max_seconds: decoder KV-cache capacity.
    unit_scale: the x100 training-unit convention (template*scale in,
        vertices/scale out) — pass 1.0 for raw-unit models.
    """

    def __init__(
        self,
        variables: dict,
        n_verts: int,
        *,
        n_onehot: int = 12,
        chunk_seconds: float = 1.0,
        left_seconds: float = 2.0,
        lookahead_seconds: float = 0.5,
        max_seconds: float = 120.0,
        dtype=None,
        unit_scale: float = 100.0,
    ):
        if "cross_q_kernel" in variables["params"]:
            raise ValueError(
                "streaming supports only dataset='vocaset' checkpoints (the "
                "sliding windows assume the 60 fps adapter); this is a "
                "BIWI-trained FaceFormer — decode it offline via "
                "FaceFormerPredictor(dataset='biwi')"
            )
        self.params = variables["params"]
        self.n_verts = n_verts
        self.n_onehot = n_onehot
        self.dtype = dtype
        self.unit_scale = float(unit_scale)
        self.chunk = _ceil_grain(int(chunk_seconds * AUDIO_SR))
        self.left = _ceil_grain(int(left_seconds * AUDIO_SR))
        self.lookahead = _ceil_grain(int(lookahead_seconds * AUDIO_SR))
        self.t_max = samples_to_frames(_ceil_grain(int(max_seconds * AUDIO_SR)))
        self.encoder = Wav2Vec2Encoder(Wav2Vec2Config(), dtype=dtype)
        self._fns: dict = {}
        self.reset()

    # ------------------------------------------------------------------
    # stream state
    # ------------------------------------------------------------------

    def reset(self) -> None:
        hd = FEATURE_DIM // N_HEADS
        self._buffer = np.zeros((0,), np.float32)  # unconsumed audio
        self._history = np.zeros((0,), np.float32)  # encoder left context
        self._finished = False  # set by a last=True push/flush
        self._consumed = 0  # samples already encoded into frames
        # normalization base statistics over consumed samples [0, consumed);
        # each emission extends them with its own window tail so the stats
        # are a pure function of (audio, config), never of push granularity
        self._base_sum = 0.0
        self._base_sqsum = 0.0
        self._base_n = 0
        self._t0 = 0  # absolute frame counter
        self._emb = None  # decoder feedback carry (set on first chunk)
        self._k_cache = jnp.zeros((1, N_HEADS, self.t_max, hd), jnp.float32)
        self._v_cache = jnp.zeros((1, N_HEADS, self.t_max, hd), jnp.float32)
        self._style_ctx = None  # (one_hot, template) bound at start_stream

    def start_stream(self, one_hot: np.ndarray, template: np.ndarray) -> None:
        """Bind speaker identity + template; resets any previous stream."""
        self.reset()
        self._style_ctx = (
            jnp.asarray(one_hot, jnp.float32).reshape(1, self.n_onehot),
            jnp.asarray(template, jnp.float32).reshape(1, -1) * self.unit_scale,
        )

    # ------------------------------------------------------------------
    # jitted halves
    # ------------------------------------------------------------------

    def _encode_fn(self, window: int, n_frames: int, keep_from: int, keep_to: int):
        """Window audio (already normalized) -> cross/memory slice for the
        chunk's frames. Exactly FaceFormer.__call__'s encoder block
        (models/faceformer.py:114-139,169-174) on the window.

        Params are jit ARGUMENTS, not closure constants — closed-over arrays
        bake ~380 MB of literals into the compile payload (a remote-compile
        link rejects it outright)."""

        @jax.jit
        def run(p, norm_audio):
            hidden = self.encoder.apply(
                {"params": p["audio_encoder"]}, norm_audio, output_len=n_frames
            )
            memory = (
                hidden.astype(jnp.float32) @ p["audio_feature_map_kernel"]
                + p["audio_feature_map_bias"]
            )
            cross = (
                memory @ p["cross_v_kernel"] + p["cross_v_bias"]
            ) @ p["cross_out_kernel"] + p["cross_out_bias"]
            return cross[:, keep_from:keep_to].astype(jnp.float32)

        return run

    def _decode_fn(self, n_frames: int):
        """Continue the exact causal decode for ``n_frames`` new frames.
        The per-frame math is the shared ``models.decoder_step`` step (also
        scanned by the multi-stream pool) at S=1, all frames active."""
        from audio2face_tpu.models.decoder_step import make_decoder_step

        # donate the carried state: the stream rebinds emb/k/v from the
        # outputs every chunk, so donation updates the caches in place
        # instead of copying them per chunk (TPU only; CPU warns + ignores)
        donate = (3, 4, 5) if jax.default_backend() == "tpu" else ()

        @functools.partial(jax.jit, donate_argnums=donate)
        def run(p, cross_chunk, style, emb0, k_cache, v_cache, t0):
            step = make_decoder_step(
                p, styles=style, t0=jnp.asarray(t0, jnp.int32).reshape(1)
            )
            xs = (jnp.arange(n_frames), jnp.swapaxes(cross_chunk, 0, 1))
            (emb, k_cache, v_cache), hs = jax.lax.scan(
                step, (emb0, k_cache, v_cache), xs
            )
            return emb, k_cache, v_cache, jnp.swapaxes(hs, 0, 1)

        return run

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def push(self, audio: np.ndarray, *, last: bool = False) -> np.ndarray:
        """Feed audio; returns newly decoded vertices (T_new, V, 3) in data
        units (possibly empty). ``last=True`` flushes the remainder."""
        if self._style_ctx is None:
            raise RuntimeError("call start_stream(one_hot, template) first")
        if self._finished:
            raise RuntimeError(
                "stream was flushed (last=True); start_stream() a new one"
            )
        audio = np.asarray(audio, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, audio])

        outs = []
        while len(self._buffer) >= self.chunk + self.lookahead:
            outs.append(self._emit(self.chunk))
        if last:
            self._finished = True
        if last and len(self._buffer) > 0:
            # flush the exact remainder: since consumed samples are always
            # GRAIN-aligned, frame_count(consumed + n) - frames_emitted ==
            # frame_count(n), so any tail length yields the offline frame
            # count (a sub-frame tail of < 267 samples yields 0 frames,
            # exactly as offline)
            n = len(self._buffer)
            if samples_to_frames(n) > 0:
                outs.append(self._emit(n, final=True))
            else:
                self._buffer = self._buffer[:0]
        if not outs:
            return np.zeros((0, self.n_verts // 3, 3), np.float32)
        return np.concatenate(outs)

    def flush(self) -> np.ndarray:
        """Decode everything still buffered (end of stream)."""
        return self.push(np.zeros((0,), np.float32), last=True)

    def _emit(self, n_chunk: int, final: bool = False) -> np.ndarray:
        lookahead = 0 if final else self.lookahead
        # the window is ALWAYS full-width: missing left context at stream
        # start is zero-padded (normalized zeros are a constant the encoder
        # contextualizes away within a few frames). A growing warm-up window
        # would be slightly closer to offline but costs one encoder
        # compilation per distinct width — minutes each on TPU.
        left = self.left
        # the final tail is zero-padded to the next grain so flush window
        # widths come from a bounded bucket set, not one per clip length
        # (kept frames stay the TRUE frame count; grain-aligned tails get
        # zero padding, i.e. stay bit-exact)
        n_pad = _ceil_grain(n_chunk) if final else n_chunk
        window = left + n_pad + lookahead

        # normalization statistics over audio [0, chunk_end + lookahead):
        # deterministic in (audio, config) — independent of push granularity
        win = self._buffer[: n_chunk + lookahead]
        tot_n = self._base_n + win.size
        tot_sum = self._base_sum + float(win.sum(dtype=np.float64))
        tot_sq = self._base_sqsum + float(np.square(win, dtype=np.float64).sum())
        mean = tot_sum / max(tot_n, 1)
        var = max(tot_sq / max(tot_n, 1) - mean * mean, 0.0)
        hist = self._history_tail(left)
        raw = np.concatenate(
            [hist, win, np.zeros(n_pad - n_chunk, np.float32)]
        )
        norm = (raw - mean) / np.sqrt(var + 1e-7)

        n_frames = samples_to_frames(window)
        keep_from = samples_to_frames(left)
        keep_to = keep_from + samples_to_frames(n_chunk)
        if self._t0 + (keep_to - keep_from) > self.t_max:
            raise RuntimeError(
                f"stream exceeds max_seconds capacity ({self.t_max} frames): "
                f"decoded {self._t0}, next chunk adds {keep_to - keep_from}; "
                "raise max_seconds or reset()/start_stream() a new stream"
            )
        ekey = ("enc", window, keep_from, keep_to)
        if ekey not in self._fns:
            self._fns[ekey] = self._encode_fn(window, n_frames, keep_from, keep_to)
        cross = self._fns[ekey](self.params, jnp.asarray(norm)[None])

        one_hot, template = self._style_ctx
        style = one_hot @ self.params["obj_vector_kernel"]
        if self._emb is None:
            # MUST be a fresh buffer: ``astype`` to the same dtype is a
            # no-op returning the same array, and the first decode call
            # would then pass one buffer BOTH as the donated emb0 and as
            # the live style argument — donated-alias reads poison the
            # program on TPU (InvalidArgument at the next D2H fetch)
            self._emb = jnp.array(style, dtype=jnp.float32, copy=True)

        n_new = keep_to - keep_from
        dkey = ("dec", n_new)
        if dkey not in self._fns:
            self._fns[dkey] = self._decode_fn(n_new)
        self._emb, self._k_cache, self._v_cache, hs = self._fns[dkey](
            self.params, cross, style.astype(jnp.float32), self._emb,
            self._k_cache, self._v_cache, self._t0,
        )
        self._t0 += n_new

        verts = hs.reshape(-1, FEATURE_DIM) @ self.params["vertice_map_r_kernel"]
        verts = verts + self.params["vertice_map_r_bias"]
        verts = (verts + template) / self.unit_scale
        out = np.asarray(verts, np.float32).reshape(n_new, -1, 3)

        consumed_now = self._buffer[:n_chunk]
        self._base_n += consumed_now.size
        self._base_sum += float(consumed_now.sum(dtype=np.float64))
        self._base_sqsum += float(np.square(consumed_now, dtype=np.float64).sum())
        self._consumed += n_chunk
        if self.left:
            self._history = np.concatenate(
                [self._history, consumed_now]
            )[-self.left :]
        self._buffer = self._buffer[n_chunk:]
        return out

    def _history_tail(self, left: int) -> np.ndarray:
        if left == 0:
            return np.zeros((0,), np.float32)
        have = self._history[-left:]
        if len(have) < left:  # stream start: zero-pad the missing context
            have = np.concatenate([np.zeros(left - len(have), np.float32), have])
        return have
