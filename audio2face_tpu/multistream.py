"""Multi-stream (batched) live FaceFormer serving: N concurrent streams
share one chip and ONE pair of compiled programs.

The single-stream ``StreamingFaceFormerPredictor`` (streaming.py) carries
one KV cache / feedback embedding / frame counter, so one chip serves one
live caller. This module batches that state over a fixed pool of
``n_streams`` slots:

- **encoder**: all slots' sliding windows are encoded in one (S, window)
  batch per step — the same [left | chunk | lookahead] windows, per-slot
  deterministic normalization statistics (audio up to chunk_end+lookahead,
  as in streaming.py).
- **decoder**: the KV caches (S, H, T_max+1, hd), feedback embeddings
  (S, d) and absolute frame counters (S,) advance together in one jitted
  lax.scan, even though every stream sits at a DIFFERENT absolute frame:
  the ALiBi bias/causal mask take per-item positions
  (ops/attention.decode_step_attention with a (B,) step vector) and each
  stream writes its cache row at its own t. Slots that have no full chunk
  buffered ride along with ``n_valid = 0``: their writes land in a scratch
  cache row (index T_max, never attended — the causal mask only admits
  rows <= t < T_max) and their carried state is ``where``-frozen, so an
  idle or late-joining stream is bit-identical to one that never stepped.
- **flush**: stream tails are zero-padded to the full window width and
  masked with ``n_valid = frame_count(tail)`` — the pool never compiles a
  tail-specific program; total compiled programs stay at exactly two
  (one encoder, one decoder) per pool configuration.
- **fleet scaling**: pass a ``(data, 1)`` ``jax.sharding.Mesh`` and the
  slot axis is sharded over the chips with ``shard_map`` (the counterpart
  of ``FaceFormerPredictor(mesh=...)`` for live streams): each chip runs
  the full encoder+decoder (Pallas kernels included) on its
  ``n_streams / n_data`` local slots, the KV caches live sharded on their
  home chip, and no collectives are needed — live serving is
  embarrassingly slot-parallel.

Semantics per stream match the reference's autoregressive loop
(src/model/faceformer.py:154-185) exactly on the decoder side — the scan
step is the KV-cached equivalent proven in test_faceformer.py — and the
bounded-context approximation on the encoder side is identical to
streaming.py (the reference cannot stream at all). N interleaved streams
reproduce N solo streams (tests/test_multistream.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio2face_tpu.models.decoder_step import make_decoder_step
from audio2face_tpu.models.faceformer import (
    AUDIO_SR,
    FEATURE_DIM,
    N_HEADS,
    frame_count,
)
from audio2face_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from audio2face_tpu.streaming import _ceil_grain


class _SlotState:
    """Host-side per-stream bookkeeping (audio buffers + norm stats)."""

    __slots__ = (
        "active", "finished", "flushed", "buffer", "history",
        "base_sum", "base_sqsum", "base_n", "pending",
    )

    def __init__(self):
        self.active = False
        self.reset()

    def reset(self):
        self.finished = False  # saw last=True
        self.flushed = False  # tail emitted; stream complete
        self.buffer = np.zeros((0,), np.float32)
        self.history = np.zeros((0,), np.float32)
        self.base_sum = 0.0
        self.base_sqsum = 0.0
        self.base_n = 0
        self.pending: list[np.ndarray] = []


class MultiStreamFaceFormerPredictor:
    """Fixed pool of ``n_streams`` concurrent live streams on one chip.

    Usage::

        pool = MultiStreamFaceFormerPredictor(variables, n_verts, n_streams=8)
        a = pool.open_stream(one_hot_a, template_a)
        b = pool.open_stream(one_hot_b, template_b)
        frames_a = pool.push(a, audio_chunk)          # may be empty
        frames_b = pool.push(b, more_audio, last=True)
        pool.close_stream(a)

    ``push`` advances EVERY slot that has a full chunk buffered (one
    batched step serves the whole pool); frames produced for other slots
    are buffered and returned by their own next ``push``/``poll``.
    """

    def __init__(
        self,
        variables: dict,
        n_verts: int,
        *,
        n_streams: int = 8,
        n_onehot: int = 12,
        chunk_seconds: float = 1.0,
        left_seconds: float = 2.0,
        lookahead_seconds: float = 0.5,
        max_seconds: float = 120.0,
        dtype=None,
        unit_scale: float = 100.0,
        mesh=None,
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
        self.n_streams = int(n_streams)
        self.sr = AUDIO_SR  # ingest clock (wire surfaces validate against it)
        self.fps = 60  # vocaset animation clock
        self.dtype = dtype
        self.unit_scale = float(unit_scale)
        self.chunk = _ceil_grain(int(chunk_seconds * AUDIO_SR))
        self.left = _ceil_grain(int(left_seconds * AUDIO_SR))
        self.lookahead = _ceil_grain(int(lookahead_seconds * AUDIO_SR))
        self.t_max = frame_count(_ceil_grain(int(max_seconds * AUDIO_SR)))
        self.chunk_frames = frame_count(self.chunk)
        self.encoder = Wav2Vec2Encoder(Wav2Vec2Config(), dtype=dtype)
        self._encode = None
        self._decode = None

        self.mesh = mesh
        if mesh is not None:
            from audio2face_tpu.parallel.mesh import DATA_AXIS, replicate

            n_data = mesh.shape[DATA_AXIS]
            if self.n_streams % n_data != 0:
                raise ValueError(
                    f"n_streams={self.n_streams} must be divisible by the "
                    f"mesh data axis ({n_data}) so each chip hosts a whole "
                    "slot slice"
                )
            self.params = replicate(mesh, self.params)

        s, hd = self.n_streams, FEATURE_DIM // N_HEADS
        self._slots = [_SlotState() for _ in range(s)]
        self._emb = self._put(jnp.zeros((s, FEATURE_DIM), jnp.float32))
        # row t_max is the scratch row idle slots write to (never attended)
        self._k_cache = self._put(
            jnp.zeros((s, N_HEADS, self.t_max + 1, hd), jnp.float32)
        )
        self._v_cache = self._put(
            jnp.zeros((s, N_HEADS, self.t_max + 1, hd), jnp.float32)
        )
        self._styles = self._put(jnp.zeros((s, FEATURE_DIM), jnp.float32))
        self._templates = self._put(jnp.zeros((s, n_verts), jnp.float32))
        self._t0 = np.zeros((s,), np.int64)

    def _put(self, x):
        """Place a slot-axis array on the mesh (sharded on ``data``)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        from audio2face_tpu.parallel.mesh import DATA_AXIS

        return jax.device_put(x, NamedSharding(self.mesh, P(DATA_AXIS)))

    # ------------------------------------------------------------------
    # stream lifecycle
    # ------------------------------------------------------------------

    def open_stream(self, one_hot: np.ndarray, template: np.ndarray) -> int:
        """Claim a free slot for a new stream; returns its slot id."""
        free = next((i for i, sl in enumerate(self._slots) if not sl.active), None)
        if free is None:
            raise RuntimeError(
                f"all {self.n_streams} stream slots are busy; close_stream() "
                "one or provision a larger pool"
            )
        sl = self._slots[free]
        sl.active = True
        sl.reset()
        one_hot = jnp.asarray(one_hot, jnp.float32).reshape(self.n_onehot)
        style = one_hot @ self.params["obj_vector_kernel"]
        self._styles = self._styles.at[free].set(style)
        self._emb = self._emb.at[free].set(style)  # emb_0 = obj embedding
        self._templates = self._templates.at[free].set(
            jnp.asarray(template, jnp.float32).reshape(-1) * self.unit_scale
        )
        self._t0[free] = 0
        return free

    def close_stream(self, slot: int) -> None:
        """Release a slot (pending frames are discarded)."""
        self._slots[slot].active = False

    def poll(self, slot: int) -> np.ndarray:
        """Collect frames produced for ``slot`` by other streams' pushes."""
        return self._drain(slot)

    # ------------------------------------------------------------------
    # data path
    # ------------------------------------------------------------------

    def feed(self, slot: int, audio: np.ndarray, *, last: bool = False) -> None:
        """Buffer audio for ``slot`` WITHOUT stepping the pool — callers
        coordinating several streams (lockstep serving, benches) feed every
        slot first, then ``pump()`` once so each batched step carries all
        of them instead of the first-ready one alone."""
        sl = self._slots[slot]
        if not sl.active:
            raise RuntimeError(f"slot {slot} is not open")
        if sl.finished:
            raise RuntimeError("stream was flushed (last=True); open a new one")
        audio = np.asarray(audio, np.float32).reshape(-1)
        if frame_count(sl.base_n + len(sl.buffer) + len(audio)) > self.t_max:
            raise RuntimeError(
                f"stream exceeds max_seconds capacity ({self.t_max} frames); "
                "raise max_seconds or open a new stream"
            )
        sl.buffer = np.concatenate([sl.buffer, audio])
        if last:
            sl.finished = True

    def pump(self) -> None:
        """Advance the pool until no stream has a full chunk buffered (and
        every flushing stream's tail is emitted)."""
        while any(
            self._chunk_ready(sl) or self._flush_ready(sl) for sl in self._slots
        ):
            self._step()

    def push(self, slot: int, audio: np.ndarray, *, last: bool = False) -> np.ndarray:
        """Feed audio into ``slot``; advances every chunk-ready stream in
        the pool by batched steps. Returns this slot's newly decoded
        vertices (T_new, V, 3) in data units (possibly empty)."""
        self.feed(slot, audio, last=last)
        self._pump(slot)
        return self._drain(slot)

    def flush(self, slot: int) -> np.ndarray:
        """Decode everything still buffered for ``slot`` (end of stream)."""
        return self.push(slot, np.zeros((0,), np.float32), last=True)

    # ------------------------------------------------------------------

    def _chunk_ready(self, sl: _SlotState) -> bool:
        return (
            sl.active
            and len(sl.buffer) >= self.chunk + self.lookahead
        )

    def _flush_ready(self, sl: _SlotState) -> bool:
        return sl.active and sl.finished and not sl.flushed

    def _pump(self, slot: int) -> None:
        sl = self._slots[slot]
        while self._chunk_ready(sl) or self._flush_ready(sl):
            self._step()

    def _step(self) -> None:
        """One batched (encoder, decoder) step over the whole pool."""
        s = self.n_streams
        window = self.left + self.chunk + self.lookahead
        norm = np.zeros((s, window), np.float32)
        n_valid = np.zeros((s,), np.int32)

        for i, sl in enumerate(self._slots):
            if self._chunk_ready(sl):
                n_chunk, span = self.chunk, self.chunk + self.lookahead
            elif self._flush_ready(sl) and len(sl.buffer) > self.chunk:
                # end-of-stream with more than a chunk left but less than
                # full lookahead: consume a whole chunk against the partial
                # (zero-padded) lookahead — n_valid stays chunk_frames
                n_chunk, span = self.chunk, len(sl.buffer)
            elif self._flush_ready(sl):
                n_chunk = span = len(sl.buffer)
                sl.flushed = True
                if frame_count(n_chunk) == 0:  # sub-frame tail: drop
                    sl.buffer = sl.buffer[:0]
                    continue
            else:
                continue
            win = sl.buffer[:span]
            tot_n = sl.base_n + win.size
            tot_sum = sl.base_sum + float(win.sum(dtype=np.float64))
            tot_sq = sl.base_sqsum + float(np.square(win, dtype=np.float64).sum())
            mean = tot_sum / max(tot_n, 1)
            var = max(tot_sq / max(tot_n, 1) - mean * mean, 0.0)
            hist = sl.history[-self.left:] if self.left else sl.history[:0]
            if len(hist) < self.left:
                hist = np.concatenate(
                    [np.zeros(self.left - len(hist), np.float32), hist]
                )
            raw = np.concatenate(
                [hist, win, np.zeros(window - self.left - win.size, np.float32)]
            )
            norm[i] = (raw - mean) / np.sqrt(var + 1e-7)
            n_valid[i] = frame_count(n_chunk)
            # advance host-side stream state
            chunk_samples = sl.buffer[:n_chunk]
            sl.base_n += chunk_samples.size
            sl.base_sum += float(chunk_samples.sum(dtype=np.float64))
            sl.base_sqsum += float(np.square(chunk_samples, dtype=np.float64).sum())
            if self.left:
                sl.history = np.concatenate([sl.history, chunk_samples])[-self.left:]
            sl.buffer = sl.buffer[n_chunk:]

        if not n_valid.any():
            return

        cross = self._encode_fn()(self.params, self._put(jnp.asarray(norm)))
        t0 = self._put(jnp.asarray(self._t0, jnp.int32))
        (self._emb, self._k_cache, self._v_cache, verts) = self._decode_fn()(
            self.params, cross, self._styles, self._templates, self._emb,
            self._k_cache, self._v_cache, t0, self._put(jnp.asarray(n_valid)),
        )
        verts_np = None  # fetched lazily; most steps serve several slots
        for i, sl in enumerate(self._slots):
            if n_valid[i] > 0:
                if verts_np is None:
                    verts_np = np.asarray(verts, np.float32)
                sl.pending.append(
                    verts_np[i, : n_valid[i]].reshape(int(n_valid[i]), -1, 3)
                )
        self._t0 += n_valid.astype(np.int64)

    def _drain(self, slot: int) -> np.ndarray:
        sl = self._slots[slot]
        if not sl.pending:
            return np.zeros((0, self.n_verts // 3, 3), np.float32)
        out = np.concatenate(sl.pending)
        sl.pending = []
        return out

    # ------------------------------------------------------------------
    # jitted halves (compiled once per pool configuration)
    # ------------------------------------------------------------------

    def _fleet(self, fn, *, n_out: int):
        """With a mesh, ``shard_map`` ``fn`` over the slot axis: arg 0
        (params) replicates, every other arg and every output shards on
        ``data``. ``fn`` must derive slot counts from input shapes — under
        shard_map each chip traces with its LOCAL slice."""
        if self.mesh is None:
            return fn
        import inspect

        from jax.sharding import PartitionSpec as P

        from audio2face_tpu.parallel.mesh import DATA_AXIS, shard_map_data

        n_args = len(inspect.signature(fn).parameters)
        out = P(DATA_AXIS) if n_out == 1 else tuple(P(DATA_AXIS) for _ in range(n_out))
        return shard_map_data(
            self.mesh, fn,
            in_specs=(P(),) + tuple(P(DATA_AXIS) for _ in range(n_args - 1)),
            out_specs=out,
        )

    def _encode_fn(self):
        if self._encode is not None:
            return self._encode
        window = self.left + self.chunk + self.lookahead
        n_frames = frame_count(window)
        keep_from = frame_count(self.left)
        keep_to = keep_from + self.chunk_frames

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

        run = jax.jit(self._fleet(run, n_out=1))
        self._encode = run
        return run

    def _decode_fn(self):
        if self._decode is not None:
            return self._decode
        d = FEATURE_DIM
        n_frames = self.chunk_frames
        t_scratch = self.t_max  # scratch cache row for masked-off steps
        scale = self.unit_scale

        def run(p, cross, styles, templates, emb0, k_cache, v_cache, t0, n_valid):
            # slot count from the input, NOT the pool: under shard_map this
            # traces with each chip's local slice (n_streams / n_data)
            s = emb0.shape[0]
            # the per-frame decode math is the shared models.decoder_step
            # step (also scanned by the single-stream predictor); masked-off
            # streams write the scratch cache row (never attended — the
            # causal mask only admits rows <= t < t_scratch) and their
            # carried state is where-frozen, so an idle or late-joining
            # stream is bit-identical to one that never stepped
            step = make_decoder_step(
                p, styles=styles, t0=t0, n_valid=n_valid, t_scratch=t_scratch
            )

            xs = (jnp.arange(n_frames), jnp.swapaxes(cross, 0, 1))
            (emb, kc, vc), hs = jax.lax.scan(step, (emb0, k_cache, v_cache), xs)
            hs = jnp.swapaxes(hs, 0, 1)  # (S, F, d)
            verts = hs.reshape(-1, d) @ p["vertice_map_r_kernel"] + p["vertice_map_r_bias"]
            verts = verts.reshape(s, n_frames, -1) + templates[:, None, :]
            return emb, kc, vc, verts / scale

        # donate the carried state (emb, k/v caches): the pool rebinds all
        # three from the outputs every pump, so without donation every
        # chunk-round COPIES both (S, H, t_max+1, hd) caches in HBM —
        # ~2x470 MB per round at n_streams=64/max_seconds=600. TPU only:
        # CPU ignores donation and warns.
        donate = (4, 5, 6) if jax.default_backend() == "tpu" else ()
        run = jax.jit(self._fleet(run, n_out=4), donate_argnums=donate)
        self._decode = run
        return run


class StreamingSession:
    """One live caller's handle onto a ``StreamingServer`` slot."""

    def __init__(self, server: "StreamingServer", slot: int):
        self._server = server
        self._slot = slot
        self._chunks: list[np.ndarray] = []  # frames routed by others' pushes
        self._closed = False

    def push(self, audio: np.ndarray, *, last: bool = False) -> np.ndarray:
        """Feed audio; returns every frame decoded for THIS session so far
        not yet returned (its own chunks plus any produced while other
        sessions' pushes advanced the shared pool)."""
        if self._closed:
            raise RuntimeError("session is closed")
        return self._server._push(self, audio, last)

    def flush(self) -> np.ndarray:
        return self.push(np.zeros((0,), np.float32), last=True)

    def poll(self) -> np.ndarray:
        """Collect piggybacked frames without feeding audio."""
        if self._closed:
            raise RuntimeError("session is closed")
        return self._server._poll(self)

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._server._close(self)


class StreamingServer:
    """Thread-safe live-serving front end over a shared multi-stream pool.

    Concurrent callers each open a session; every push is serialized onto
    the pool (the TPU runs one batched program at a time anyway) and each
    batched step advances EVERY chunk-ready session — so N live callers
    share one chip at full batch efficiency, the streaming counterpart of
    ``serving_queue.BatchingServer`` for offline clips. Frames a step
    produces for sessions other than the pusher are routed to those
    sessions immediately and returned by their next push()/poll().

    ``open_session`` raises when all slots are busy unless ``wait=True``
    (bounded-pool backpressure, like BatchingServer's max_queue).

    The server is pool-agnostic: any object with the shared pool protocol
    (``n_streams``/``n_verts``/``open_stream``/``close_stream``/``push``/
    ``poll``) serves — pass ``pool=`` to front a
    ``frame_stream.FrameStreamPool`` (audio2mesh/voca/song2face live
    serving) instead of the default FaceFormer pool built from
    ``variables``/``n_verts``.
    """

    def __init__(
        self,
        variables: Optional[dict] = None,
        n_verts: Optional[int] = None,
        *,
        pool=None,
        **pool_kwargs,
    ):
        if pool is None:
            if variables is None or n_verts is None:
                raise TypeError(
                    "StreamingServer needs either a prebuilt pool= or "
                    "variables + n_verts for the FaceFormer pool"
                )
            pool = MultiStreamFaceFormerPredictor(
                variables, n_verts, **pool_kwargs
            )
        elif variables is not None or n_verts is not None or pool_kwargs:
            raise TypeError("pass either pool= or FaceFormer pool arguments, not both")
        self._pool = pool
        import threading

        self._lock = threading.Lock()
        self._free = threading.Condition(self._lock)
        self._sessions: dict[int, StreamingSession] = {}

    @property
    def n_streams(self) -> int:
        return self._pool.n_streams

    @property
    def n_verts(self) -> int:
        return self._pool.n_verts

    @property
    def n_onehot(self) -> int:
        return self._pool.n_onehot

    @property
    def sample_rate(self) -> int:
        """The pool's ingest clock — wire clients must send PCM at it."""
        return int(getattr(self._pool, "sr", 16000))

    @property
    def fps(self) -> int:
        return int(getattr(self._pool, "fps", 60))

    def open_session(
        self, one_hot: np.ndarray, template: np.ndarray,
        *, wait: bool = False, timeout: Optional[float] = None,
    ) -> StreamingSession:
        with self._free:
            if wait:
                ok = self._free.wait_for(
                    lambda: len(self._sessions) < self._pool.n_streams,
                    timeout=timeout,
                )
                if not ok:
                    raise TimeoutError("no free stream slot")
            slot = self._pool.open_stream(one_hot, template)
            sess = StreamingSession(self, slot)
            self._sessions[slot] = sess
            return sess

    # ------------------------------------------------------------------

    def _route(self, pusher_slot: int) -> None:
        """Move frames other sessions produced this step into their queues."""
        for slot, sess in self._sessions.items():
            if slot != pusher_slot:
                got = self._pool.poll(slot)
                if got.size:
                    sess._chunks.append(got)

    def _push(self, sess: StreamingSession, audio, last: bool) -> np.ndarray:
        with self._lock:
            got = self._pool.push(sess._slot, audio, last=last)
            self._route(sess._slot)
            mine = sess._chunks
            sess._chunks = []
            mine.append(got)
            return np.concatenate([c for c in mine if c.size]) if any(
                c.size for c in mine
            ) else got

    def _poll(self, sess: StreamingSession) -> np.ndarray:
        with self._lock:
            sess._chunks.append(self._pool.poll(sess._slot))
            mine = [c for c in sess._chunks if c.size]
            sess._chunks = []
            if not mine:
                return np.zeros((0, self._pool.n_verts // 3, 3), np.float32)
            return np.concatenate(mine)

    def _close(self, sess: StreamingSession) -> None:
        with self._free:
            self._pool.close_stream(sess._slot)
            self._sessions.pop(sess._slot, None)
            self._free.notify_all()
