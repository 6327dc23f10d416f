"""Serving daemon: a micro-batching request front over :class:`ServingEngine`.

The reference has no serving story at all (training ends at Lightning
``.test()``, run.py:179-326); ``core/serve.py`` built the compiled-program
side (fused inference program, static batch buckets, ``jax.export``
artifacts). This module adds the operational front a production host runs:

- concurrent clients submit requests of any row count and get a
  :class:`concurrent.futures.Future` back (or block via :meth:`infer`);
- a single dispatcher thread coalesces queued requests into ONE device
  call per batch — padding to the engine's static buckets means the
  marginal cost of riding along in a batch is ~zero (docs/PERF.md
  §Serving: bucket 1 and bucket 1024 cost the same wall-clock through the
  relay), so batching converts queue depth into throughput at no latency
  cost;
- a **flush deadline** bounds the wait: the dispatcher launches as soon as
  the oldest queued request has waited ``max_delay_ms``, OR earlier the
  moment queued rows fill the bucket the batch would round up to anyway
  (waiting past a bucket boundary buys nothing until the next one);
- per-request results are sliced back out row-exactly, so clients are
  oblivious to the batching. All served programs are row-independent in
  eval mode (pinned by tests/test_serve.py), which is what makes the
  concat/split sound.

TPU-first design note: there is deliberately exactly ONE dispatcher thread
talking to the device. TPU programs are not concurrency-friendly —
throughput comes from bigger batches (the MXU is underfed at small B),
not from overlapping small programs. The dispatcher holds the Python side
only as long as enqueueing the call; the device call releases the GIL, so
clients keep queueing the next batch while the current one runs — a
2-deep pipeline without explicit double-buffering.

CLI: ``python -m ...runners.serve --daemon`` runs a sustained
concurrent-client load test (throughput + p50/p95/p99 latency); measured
numbers live in docs/PERF.md §Serving.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Optional, Sequence

import jax
import numpy as np

__all__ = ["ServingDaemon", "QueueFullError"]


class QueueFullError(RuntimeError):
    """Raised by submit() when the queue is at max_queue_rows — the
    backpressure signal (an HTTP front maps it to 503)."""


class _Request:
    __slots__ = ("xs", "n", "future", "t_in")

    def __init__(self, xs, n):
        self.xs = xs
        self.n = n
        self.future: Future = Future()
        self.t_in = time.perf_counter()


class ServingDaemon:
    """Micro-batching dispatcher over a :class:`~.serve.ServingEngine`.

    engine
        A ``ServingEngine`` (or any callable taking a views tuple and
        returning a pytree with leading batch axis; it must also expose
        ``bucket_for`` for the early-flush heuristic — absent that, only
        the deadline flush applies).
    max_delay_ms
        Flush deadline: the longest the oldest queued request waits before
        its batch launches. The daemon's latency floor is roughly
        ``device_call + max_delay_ms`` under light load and pure
        ``device_call`` under saturation (the previous call's duration
        exceeds the deadline, so batches are always full).
    max_batch
        Hard cap on coalesced rows per device call (defaults to the
        engine's top bucket when available, else 1024).
    max_queue_rows
        Backpressure bound: submit() raises :class:`QueueFullError` when
        the queue already holds this many rows (default 64× max_batch —
        deep enough to ride out a slow batch, bounded enough that
        overload surfaces as rejection, not OOM + divergent latency).
    """

    def __init__(self, engine, max_delay_ms: float = 2.0,
                 max_batch: Optional[int] = None,
                 max_queue_rows: Optional[int] = None):
        if max_delay_ms < 0:
            raise ValueError(f"max_delay_ms must be >= 0: {max_delay_ms}")
        self.engine = engine
        self.max_delay = max_delay_ms / 1e3
        buckets = getattr(engine, "buckets", None)
        if max_batch is None:
            max_batch = max(buckets) if buckets else 1024
        self.max_batch = int(max_batch)
        if self.max_batch <= 0:
            raise ValueError(f"max_batch must be positive: {self.max_batch}")
        self.max_queue_rows = int(
            64 * self.max_batch if max_queue_rows is None else max_queue_rows
        )
        if self.max_queue_rows <= 0:
            raise ValueError(
                f"max_queue_rows must be positive: {self.max_queue_rows}"
            )
        self._queue: deque = deque()
        self._queued_rows = 0
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._closed = False
        # operational counters (read via stats())
        self._n_requests = 0
        self._n_batches = 0
        self._n_rows = 0
        self._latencies: deque = deque(maxlen=100_000)
        self._thread = threading.Thread(
            target=self._loop, name="serving-daemon", daemon=True
        )
        self._thread.start()

    # ---- client side ----------------------------------------------------

    def submit(self, xs: Sequence) -> Future:
        """Enqueue one request (tuple of per-view arrays, shared leading
        row axis) and return a Future resolving to the engine's output
        dict sliced to exactly this request's rows."""
        xs = tuple(np.asarray(x) for x in xs)
        n = int(xs[0].shape[0])
        if n == 0:
            raise ValueError("empty batch")
        if any(int(x.shape[0]) != n for x in xs):
            raise ValueError(
                f"views disagree on rows: {[int(x.shape[0]) for x in xs]}"
            )
        req = _Request(xs, n)
        with self._wake:
            if self._closed:
                raise RuntimeError("daemon is closed")
            if self._queued_rows >= self.max_queue_rows:
                raise QueueFullError(
                    f"queue at {self._queued_rows} rows "
                    f"(max_queue_rows={self.max_queue_rows}); retry later"
                )
            self._queue.append(req)
            self._queued_rows += n
            self._wake.notify()
        return req.future

    def infer(self, xs: Sequence):
        """Blocking convenience: submit + wait."""
        return self.submit(xs).result()

    # ---- dispatcher -----------------------------------------------------

    def _take_batch(self):
        """Block until a batch is due, then drain it. Returns [] on close.

        Flush policy: launch when the oldest request has aged
        ``max_delay``, or immediately once queued rows reach the bucket
        they would round up to (or ``max_batch``) — waiting longer could
        not make the current batch cheaper.
        """
        bucket_for = getattr(self.engine, "bucket_for", None)
        with self._wake:
            while True:
                if self._closed and not self._queue:
                    return []
                if self._queue:
                    rows = self._queued_rows
                    full = rows >= self.max_batch or (
                        bucket_for is not None and rows == bucket_for(rows)
                    )
                    deadline = self._queue[0].t_in + self.max_delay
                    timeout = deadline - time.perf_counter()
                    if full or timeout <= 0 or self._closed:
                        # Never overshoot max_batch (an oversize coalesced
                        # total would round to a bucket multiple the engine
                        # never warmed up -> a surprise XLA compile in the
                        # request path). A single request larger than
                        # max_batch still dispatches alone.
                        batch, taken = [], 0
                        while self._queue and (
                            taken == 0
                            or taken + self._queue[0].n <= self.max_batch
                        ):
                            batch.append(self._queue.popleft())
                            taken += batch[-1].n
                        self._queued_rows -= taken
                        return batch
                    self._wake.wait(timeout)
                else:
                    self._wake.wait()

    def _loop(self):
        try:
            self._loop_inner()
        finally:
            # If the dispatcher dies for ANY reason (including a
            # BaseException the batch handler re-raised), don't leave the
            # daemon half-alive: refuse further submits and fail everything
            # still queued so no client blocks forever on a Future that can
            # never resolve.
            with self._wake:
                self._closed = True
                dead = list(self._queue)
                self._queue.clear()
                self._queued_rows = 0
            for r in dead:
                if r.future.set_running_or_notify_cancel():
                    r.future.set_exception(
                        RuntimeError("serving daemon dispatcher exited")
                    )

    def _loop_inner(self):
        while True:
            batch = self._take_batch()
            if not batch:
                return
            # Transition every rider to RUNNING first: a pending Future can
            # be cancel()ed by its client, and set_result/set_exception on a
            # cancelled Future raises InvalidStateError — which would kill
            # this thread and hang every later request. After this call the
            # Future can no longer be cancelled; riders whose client already
            # cancelled are dropped from the batch.
            batch = [r for r in batch
                     if r.future.set_running_or_notify_cancel()]
            if not batch:
                continue
            try:
                if len(batch) == 1:
                    xs = tuple(batch[0].xs)
                else:
                    xs = tuple(
                        np.concatenate([r.xs[v] for r in batch], axis=0)
                        for v in range(len(batch[0].xs))
                    )
                out = self.engine(xs)
                # ServingEngine already returns host numpy (its pad/slice
                # runs in numpy; see core/serve.py) — this is then a no-op
                # traversal. It stays for the generic-callable contract: a
                # bare jitted fn returns device arrays, and the slice-back
                # below must not pay one transfer per rider.
                out = jax.device_get(out)
            except BaseException as e:  # engine failure fails every rider
                for r in batch:
                    r.future.set_exception(e)
                if not isinstance(e, Exception):
                    raise  # KeyboardInterrupt/SystemExit: die loudly
                continue
            t_done = time.perf_counter()
            off = 0
            with self._lock:  # counters/latencies shared with stats()
                for r in batch:
                    sl = jax.tree.map(lambda a, o=off, m=r.n: a[o:o + m], out)
                    off += r.n
                    r.future.set_result(sl)
                    self._latencies.append(t_done - r.t_in)
                self._n_requests += len(batch)
                self._n_batches += 1
                self._n_rows += off

    # ---- lifecycle / observability --------------------------------------

    def stats(self) -> dict:
        # snapshot under the dispatcher's lock: iterating the latency deque
        # while _loop appends to it raises "deque mutated during iteration"
        with self._lock:
            lats = sorted(self._latencies)
            n_req, n_batch, n_rows = self._n_requests, self._n_batches, self._n_rows
            queued = self._queued_rows

        def pct(p):
            return round(lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3, 3) \
                if lats else None

        return {
            "requests": n_req,
            "batches": n_batch,
            "rows": n_rows,
            "mean_batch_rows": round(n_rows / max(1, n_batch), 2),
            "queued_rows": queued,  # backpressure visibility
            "latency_ms": {"p50": pct(0.5), "p95": pct(0.95), "p99": pct(0.99)},
        }

    def close(self, timeout: float = 30.0) -> None:
        """Drain the queue, stop the dispatcher. Further submits raise."""
        with self._wake:
            self._closed = True
            self._wake.notify_all()
        self._thread.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
