"""Multi-process JPEG decode with shared-memory batch assembly.

Why this exists: the thread-pool path (``pipeline.py``) releases the GIL
inside the native C++ decode, but every *other* per-image cost — the Python
dispatch, the file read, the numpy row assignment — serializes on the GIL.
Measured on this host that caps the loader at roughly one core's worth of
Python no matter how many threads run. The reference sidesteps the same
problem with torch's 12-process DataLoader (``dataset/imagenet_group.py:105``);
this is the TPU-native equivalent: ``num_workers`` OS processes, each
decoding a contiguous row-slice of the batch straight into a shared-memory
buffer, one task message per worker per batch (IPC amortized over the slice,
not per image).

Also the measurement instrument for the host-feed budget: workers report
``time.process_time`` per slice, so the pool exposes ``cpu_s_per_image`` —
multiply by the device eval rate to get the cores-per-chip requirement
(docs/SCALING.md "Feeding the chip").
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import time
from multiprocessing import shared_memory
from typing import Sequence

import numpy as np


def _worker_main(task_q, done_q, shm_name, shape, dtype_str,
                 resolution, image_root, raw_uint8, poll_s=30.0):
    """Worker loop: decode a row-slice of the batch into shared memory.

    Imports stay inside the worker so a forked child never touches jax.
    The corrupt-image fallback (reference ``dataset/imagenet.py:149-152``)
    lives inside ``FileImageSource.load`` and therefore applies here too.

    Workers are spawn daemons, which survive a SIGKILLed parent (daemon
    cleanup runs via atexit, which SIGKILL skips) — observed as orphaned
    processes + leaked /dev/shm after a watchdog killed a bench child. So
    the queue wait polls every ``poll_s`` and exits when the parent is
    gone (``getppid`` reparented to init).
    """
    import os
    import queue as _queue

    from .pipeline import FileImageSource

    src = FileImageSource(resolution, image_root=image_root,
                          native=True, raw_uint8=raw_uint8)
    shm = shared_memory.SharedMemory(name=shm_name)
    buf = np.ndarray(shape, dtype=np.dtype(dtype_str), buffer=shm.buf)
    ppid = os.getppid()
    try:
        while True:
            try:
                task = task_q.get(timeout=poll_s)
            except _queue.Empty:
                if os.getppid() != ppid:
                    # parent died without close(): exit, and reclaim the
                    # segment's name — the creator's resource tracker died
                    # with it, so nobody else will unlink /dev/shm
                    try:
                        shm.unlink()
                    except FileNotFoundError:
                        pass
                    break
                continue
            if task is None:
                break
            row0, pairs = task                # per-row (path, fallback) pairs
            t0 = time.process_time()
            try:
                for j, (path, fb) in enumerate(pairs):
                    # load([fb, path], 1): try `path`, corrupt-fallback to
                    # `fb` (the row's class's first image)
                    buf[row0 + j] = src.load("", [fb, path], 1)
            except BaseException as e:  # noqa: BLE001 — must cross process
                done_q.put(("err", f"{type(e).__name__}: {e}"))
                continue
            done_q.put(("ok", len(pairs), time.process_time() - t0))
    finally:
        shm.close()


class ProcessDecodePool:
    """Decode image batches across ``num_workers`` processes into shared
    memory. Synchronous per batch: :meth:`decode` dispatches one contiguous
    row-slice per worker, waits for all acks, and returns a copy of the
    decoded rows (the copy is ~ms against the decode's ~s, and lets the
    single buffer be reused immediately). Cross-batch overlap comes from the
    loaders' ``Prefetcher`` thread, exactly as on the thread-pool path."""

    def __init__(
        self,
        resolution: int,
        batch_size: int,
        image_root: str = "",
        num_workers: int = 2,
        raw_uint8: bool = True,
        timeout_s: float = 300.0,
        orphan_poll_s: float = 30.0,
    ):
        self.resolution = resolution
        self.batch_size = batch_size
        self.num_workers = max(1, int(num_workers))
        self.timeout_s = timeout_s
        dtype = np.dtype(np.uint8 if raw_uint8 else np.float32)
        self._shape = (batch_size, resolution, resolution, 3)
        nbytes = int(np.prod(self._shape)) * dtype.itemsize
        self._shm = shared_memory.SharedMemory(create=True, size=nbytes)
        self._buf = np.ndarray(self._shape, dtype, buffer=self._shm.buf)
        # spawn, not fork: the parent has usually initialized JAX (which is
        # multithreaded — fork risks deadlock and warns). Spawned workers
        # re-import only pipeline/PIL/ctypes (~1s one-time each), never jax.
        ctx = mp.get_context("spawn")
        self._task_q = ctx.Queue()
        self._done_q = ctx.Queue()
        self._procs = [
            ctx.Process(
                target=_worker_main,
                args=(self._task_q, self._done_q, self._shm.name,
                      self._shape, dtype.name,
                      resolution, image_root, raw_uint8, orphan_poll_s),
                daemon=True,
            )
            for _ in range(self.num_workers)
        ]
        for p in self._procs:
            p.start()
        self._closed = False
        self._broken = False  # set on ack timeout; see _run
        # per-image CPU accounting (for the cores-per-chip budget)
        self.cpu_seconds = 0.0
        self.images_decoded = 0

    def decode(self, cls: str, paths: Sequence[str], idxs: Sequence[int]) -> np.ndarray:
        """Decode ``paths[idxs]`` of one class -> [len(idxs), H, W, 3] copy.
        (``cls`` is unused — kept to mirror ``ImageSource.load``'s shape.)"""
        return self.decode_pairs([(paths[i], paths[0]) for i in idxs])

    def decode_pairs(self, pairs: Sequence) -> np.ndarray:
        """Decode ``[(path, fallback_path), ...]`` rows (any class mix) ->
        [len(pairs), H, W, 3] copy. Only the strings each worker needs cross
        the IPC boundary — two per row, never whole class path lists."""
        return self._run(
            len(pairs), lambda lo, hi: (lo, list(pairs[lo:hi]))
        )

    def _run(self, k: int, make_task) -> np.ndarray:
        if self._broken:
            raise RuntimeError(
                "decode pool unusable after an ack timeout: a slow worker's "
                "late ack would be mis-attributed to this batch and return "
                "rows it never wrote — close() and build a new pool"
            )
        if k == 0:
            return np.empty((0,) + self._shape[1:], self._buf.dtype)
        if k > self.batch_size:
            raise ValueError(f"batch of {k} rows > pool capacity {self.batch_size}")
        per = (k + self.num_workers - 1) // self.num_workers
        n_tasks = 0
        for w in range(self.num_workers):
            lo, hi = w * per, min((w + 1) * per, k)
            if lo >= hi:
                break
            self._task_q.put(make_task(lo, hi))
            n_tasks += 1
        # Collect ALL n_tasks acks before raising on any error: leaving the
        # surviving workers' 'ok' acks queued would let the NEXT decode()
        # on this pool consume stale acks and return rows its own workers
        # hadn't finished writing.
        errors = []
        for _ in range(n_tasks):
            try:
                ack = self._done_q.get(timeout=self.timeout_s)
            except queue_mod.Empty:
                # unlike the error path (which drains all acks), a timeout
                # leaves an unknown number of acks in flight — poison the
                # pool so reuse fails loudly instead of corrupting batches
                self._broken = True
                raise RuntimeError(
                    f"decode worker timed out after {self.timeout_s}s "
                    "(pool marked unusable; create a new pool)"
                ) from None
            if ack[0] == "err":
                errors.append(ack[1])
                continue
            self.images_decoded += ack[1]
            self.cpu_seconds += ack[2]
        if errors:
            raise RuntimeError(f"decode worker failed: {'; '.join(errors)}")
        return self._buf[:k].copy()

    @property
    def cpu_s_per_image(self) -> float:
        """Mean worker CPU seconds per decoded image (0 before first batch)."""
        if self.images_decoded == 0:
            return 0.0
        return self.cpu_seconds / self.images_decoded

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()
        self._shm.close()
        try:
            self._shm.unlink()
        except FileNotFoundError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # best-effort; close() is the real contract
        try:
            self.close()
        except Exception:
            pass
