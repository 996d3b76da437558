"""Host-side request batching for production serving.

The reference serves one clip at a time from inside its Lightning predict
loop; this module provides the fleet-style front end: concurrent callers
submit single clips, a dispatcher thread coalesces them (up to the
predictor's ``max_batch``, waiting at most ``max_wait_ms`` for stragglers)
and issues one padded, bucketed ``FaceFormerPredictor`` call per group —
so chip utilization tracks offered load instead of per-caller batch size.

Pure host-side threading: the TPU sees only the predictor's jitted calls.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass(eq=False)  # identity semantics; field-wise eq over arrays is a trap
class _Request:
    audio: np.ndarray
    one_hot: np.ndarray
    template: np.ndarray
    sample_rate: int
    future: Future


class BatchingServer:
    """Coalesce concurrent single-clip requests into batched predictor calls.

    Usage::

        server = BatchingServer(predictor)
        fut = server.submit(audio, one_hot, template)   # thread-safe
        vertices = fut.result()
        server.close()
    """

    def __init__(self, predictor, *, max_wait_ms: float = 10.0):
        self.predictor = predictor
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._closed = False
        # serializes the closed-check against close()'s sentinel enqueue:
        # without it a submit could land BEHIND the shutdown sentinel and
        # its future would never resolve
        self._lock = threading.Lock()
        self._thread.start()

    def submit(
        self,
        audio: np.ndarray,
        one_hot: np.ndarray,
        template: np.ndarray,
        sample_rate: int = 16000,
    ) -> Future:
        """Enqueue one clip; returns a Future resolving to (T, V, 3)."""
        fut: Future = Future()
        req = _Request(
            np.asarray(audio, np.float32),
            np.asarray(one_hot, np.float32),
            np.asarray(template, np.float32),
            int(sample_rate),
            fut,
        )
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._q.put(req)
        return fut

    def close(self) -> None:
        """Drain outstanding requests and stop the dispatcher."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._thread.join()

    # ------------------------------------------------------------------

    def _run(self) -> None:
        import time

        stop = False
        while not stop:
            first = self._q.get()
            if first is None:
                break
            group = [first]
            deadline = time.monotonic() + self.max_wait
            # same-rate requests batch together; a rate change flushes
            while len(group) < self.predictor.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                if nxt.sample_rate != first.sample_rate:
                    self._q.put(nxt)  # re-enqueue; next group picks it up
                    break
                group.append(nxt)
            self._dispatch(group)
        # drain requests that slipped behind the shutdown sentinel (e.g. a
        # rate-change requeue) — close() promises every future resolves
        leftovers: list[_Request] = []
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                leftovers.append(r)
        while leftovers:
            rate = leftovers[0].sample_rate
            group: list[_Request] = []
            rest: list[_Request] = []
            for r in leftovers:
                if r.sample_rate == rate and len(group) < self.predictor.max_batch:
                    group.append(r)
                else:
                    rest.append(r)
            leftovers = rest
            self._dispatch(group)

    def _dispatch(self, group: list[_Request]) -> None:
        try:
            results = self.predictor(
                [r.audio for r in group],
                np.stack([r.one_hot for r in group]),
                np.stack([r.template for r in group]),
                sample_rate=group[0].sample_rate,
            )
            for r, v in zip(group, results):
                r.future.set_result(v)
        except Exception as e:  # pragma: no cover - surfaced via futures
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)
