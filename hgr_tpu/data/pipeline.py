"""Grouped episodic data pipeline: single-class batches for OM training/eval.

Behavioural rebuild of the reference's grouped loaders
(``dataset/imagenet_group.py:37-184``, ``dataset/imagenet_group_test.py:
40-163``) with the quirks fixed and a TPU-friendly prefetching design:

- **single-class batches** (the critical invariant — every hierarchy op uses
  the batch's one target class, reference ``main.py:84,152``)
- train: shuffled class order, one batch per episode,
  ``n_episodes = num_data // batch_size + 1`` by default
  (``imagenet_group.py:61-64``); per-class *infinite* shuffled iterators —
  fixing the reference's broken exhaustion fallback
  (``iter(exhausted_iterator)`` is identity, ``imagenet_group.py:137-141``)
- test: deterministic enumeration of every batch of every class in order;
  ``num_batches`` = sum of per-class ceil-divisions
  (``imagenet_group_test.py:150-163``); final per-class partial batches are
  zero-padded with a validity mask so device shapes stay static
- corrupt-image fallback: a failed decode silently substitutes the class's
  first image (``dataset/imagenet.py:149-152``)
- k-shot subsampling of unseen classes for low-shot training
  (``imagenet_group.py:79-93``; the reference's hard-coded absolute path at
  ``:80`` is replaced by an explicit ``unseen`` argument)
- host-side decode in a thread pool with a bounded prefetch queue
  (double-buffering the H2D edge), replacing torch's 12-process DataLoader.

Sources are pluggable: ``FileImageSource`` (PIL decode + CLIP transform) or
``SyntheticImageSource`` (deterministic arrays, no files needed).
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Protocol, Sequence, Tuple

import numpy as np


@dataclass
class GroupBatch:
    images: np.ndarray   # [B, H, W, 3] float32 (zero-padded rows possible)
    target: int          # class id (position in node ordering)
    valid: np.ndarray    # [B] bool
    paths: Optional[List[str]] = None


class ImageSource(Protocol):
    def load(self, class_name: str, paths: Sequence[str], idx: int) -> np.ndarray:
        ...


class FileImageSource:
    """Image decode + CLIP transform with the corrupt-image fallback.

    Fast path: the native C++ decoder (libjpeg + fused bicubic resize +
    normalize, see ``native/``) called via ctypes — releases the GIL so the
    thread pool scales across cores. Falls back to PIL for non-JPEG files or
    when the native library is unavailable.
    """

    def __init__(self, resolution: int, image_root: str = "",
                 native: bool = True, raw_uint8: bool = True):
        # raw_uint8: emit [H, W, 3] uint8 and let the jitted device step
        # normalize (models/clip.py:encode_image) — 4x less H2D transfer
        # than pre-normalized float32 and less host CPU per image.
        self.resolution = resolution
        self.image_root = image_root
        self.native = native
        self.raw_uint8 = raw_uint8
        if native:
            from .native import load_native

            self.native = load_native() is not None

    def _path(self, path: str) -> str:
        if self.image_root:
            import os

            path = os.path.join(self.image_root, path)
        return path

    def _load_one(self, path: str) -> np.ndarray:
        path = self._path(path)
        if self.native and path.lower().endswith((".jpg", ".jpeg")):
            from .native import decode_resize, decode_resize_u8

            with open(path, "rb") as f:
                data = f.read()
            fn = decode_resize_u8 if self.raw_uint8 else decode_resize
            out = fn(data, self.resolution)
            if out is not None:
                return out
            # fall through to PIL on native decode failure
        from PIL import Image

        from .transforms import preprocess_pil, preprocess_pil_uint8

        img = Image.open(path).convert("RGB")
        if self.raw_uint8:
            return preprocess_pil_uint8(img, self.resolution)
        return preprocess_pil(img, self.resolution)

    def load(self, class_name: str, paths: Sequence[str], idx: int) -> np.ndarray:
        try:
            return self._load_one(paths[idx])
        except Exception:
            # reference semantics: fall back to the class's first image
            # (dataset/imagenet.py:149-152)
            return self._load_one(paths[0])


class SyntheticImageSource:
    """Deterministic pseudo-images keyed by (class, idx) — for tests/bench."""

    def __init__(self, resolution: int):
        self.resolution = resolution

    def load(self, class_name: str, paths: Sequence[str], idx: int) -> np.ndarray:
        seed = (hash(class_name) ^ idx) & 0xFFFFFFFF
        rng = np.random.default_rng(seed)
        return rng.standard_normal(
            (self.resolution, self.resolution, 3)
        ).astype(np.float32)


def load_manifest(
    path: str, candidates: Optional[Sequence[str]] = None
) -> Dict[str, List[str]]:
    """Read a ``{split}_split.json`` manifest ({wnid: [image paths]}),
    optionally filtered to candidate classes (``imagenet_group.py:67-77``)."""
    with open(path) as f:
        data = json.load(f)
    if candidates is None:
        return data
    return {c: data[c] for c in candidates}


def kshot_subsample(
    grouped: Dict[str, List[str]],
    unseen: Sequence[str],
    k_shots: int,
    seed: int = 0,
) -> Dict[str, List[str]]:
    """Cap unseen classes at ``k_shots`` random images
    (``imagenet_group.py:79-93``)."""
    rng = np.random.default_rng(seed)
    unseen_set = set(unseen)
    out: Dict[str, List[str]] = {}
    for cls, paths in grouped.items():
        if cls in unseen_set and len(paths) > k_shots:
            idx = rng.choice(len(paths), size=k_shots, replace=False)
            out[cls] = [paths[i] for i in sorted(idx)]
        else:
            out[cls] = list(paths)
    return out


def _maybe_mp_pool(source, num_procs: int, batch_size: int):
    """A ProcessDecodePool when multi-process decode applies (file-backed
    source, num_procs > 0), else None. The process path replaces torch's
    12-worker DataLoader boundary (``imagenet_group.py:105``) — the thread
    pool serializes the per-image Python on the GIL; processes do not
    (see mp_decode.py)."""
    if num_procs > 0 and isinstance(source, FileImageSource):
        from .mp_decode import ProcessDecodePool

        return ProcessDecodePool(
            source.resolution,
            batch_size,
            image_root=source.image_root,
            num_workers=num_procs,
            raw_uint8=source.raw_uint8,
        )
    return None


def _decode_rows(source, thread_pool, mp_pool, cls, paths, idxs):
    """Decode ``paths[idxs]`` -> list of [H, W, 3] rows via whichever pool."""
    if mp_pool is not None:
        return list(mp_pool.decode(cls, paths, idxs))
    return list(thread_pool.map(lambda i: source.load(cls, paths, i), idxs))


class Prefetcher:
    """Bounded-queue background producer.

    Producer-thread exceptions are captured and re-raised in the consumer —
    a silently-truncated stream would otherwise look like a clean (shorter)
    epoch, corrupting training/eval without any signal."""

    def __init__(self, gen_fn, depth: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(gen_fn,), daemon=True
        )
        self._thread.start()

    def _run(self, gen_fn):
        try:
            for item in gen_fn():
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — must cross the thread
            self._error = e
        finally:
            # never block forever here: after stop() drains the queue the
            # producer may have refilled it, and a plain put(_done) on a
            # full queue would deadlock the join in stop()
            while True:
                try:
                    self._q.put(self._done, timeout=0.1)
                    break
                except queue.Full:
                    if self._stop.is_set():
                        try:
                            self._q.get_nowait()
                        except queue.Empty:
                            pass

    def stop(self, join_timeout: float = 30.0) -> None:
        """Stop the producer thread and wait for it to exit. Needed before
        tearing down resources the generator still uses (e.g. a process
        decode pool): a consumer that breaks out of the loop early leaves
        the thread mid-produce, and closing the pool under it would strand
        it in a long IPC wait."""
        self._stop.set()
        while True:  # unblock a producer stuck on a full queue
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=join_timeout)
        # the drain above may have swallowed an already-queued _done while
        # a SEPARATE consumer thread sits in __iter__'s blocking get()
        # (e.g. the driver's step-prefetch thread iterating this loader as
        # run_train's finally closes it) — re-post the sentinel so that
        # consumer terminates instead of hanging forever. The producer is
        # dead, so only consumers drain the queue and this loop converges.
        while True:
            try:
                self._q.put_nowait(self._done)
                break
            except queue.Full:
                try:
                    self._q.get_nowait()
                except queue.Empty:
                    pass

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                if self._error is not None:
                    raise RuntimeError(
                        "data pipeline producer thread failed"
                    ) from self._error
                return
            yield item


def _stop_live_prefetcher(loader) -> None:
    """Stop a loader's still-running producer before starting a new one.

    A consumer that abandons an epoch early (exception, ``break``) leaves
    the old Prefetcher mid-produce; re-entering ``__iter__`` without
    stopping it would run two producers concurrently over the loader's
    shared mutable state (rng/cursors, and the mp pool's single shm buffer).
    """
    p = getattr(loader, "_live_prefetcher", None)
    if p is not None:
        loader._live_prefetcher = None
        p.stop()


class GroupedTrainLoader:
    """Infinite-per-class episodic train loader (one class per batch)."""

    def __init__(
        self,
        grouped: Dict[str, List[str]],
        class_ids: Dict[str, int],
        source: ImageSource,
        batch_size: int,
        n_episodes: int = -1,
        seed: int = 0,
        num_threads: int = 8,
        prefetch: int = 4,
        serial_batches: bool = True,
        num_procs: int = 0,
    ):
        # serial_batches=False reproduces the reference's non-serial mode
        # (imagenet_group.py:142-143): every episode draws a FRESH random
        # batch from the class instead of walking a shuffled stream
        self.serial_batches = serial_batches
        self.grouped = {c: p for c, p in grouped.items() if len(p) > 0}
        self.class_ids = class_ids
        self.source = source
        self.batch_size = batch_size
        self.num_data = sum(len(p) for p in self.grouped.values())
        self.n_episodes = (
            n_episodes if n_episodes > 0 else self.num_data // batch_size + 1
        )
        self._seed = seed
        self._epoch = 0
        self.rng = np.random.default_rng(seed)
        self.classes = list(self.grouped.keys())
        self._cursors: Dict[str, List[int]] = {}
        self._pool = ThreadPoolExecutor(max_workers=num_threads)
        self.mp_pool = _maybe_mp_pool(source, num_procs, batch_size)
        self._prefetch = prefetch

    def _next_indices(self, cls: str) -> List[int]:
        """Next batch of indices from the class's infinite shuffled stream.

        Classes smaller than the batch size yield all their images per batch
        (the reference inner DataLoader's drop_last=False behaviour)."""
        n = len(self.grouped[cls])
        take_n = min(self.batch_size, n)
        if not self.serial_batches:
            return [int(i) for i in self.rng.choice(n, take_n, replace=False)]
        buf = self._cursors.get(cls, [])
        if len(buf) < take_n:
            buf.extend(int(i) for i in self.rng.permutation(n))
        take = buf[:take_n]
        self._cursors[cls] = buf[take_n:]
        return take

    def _episode_classes(self) -> Iterator[str]:
        while True:
            order = self.rng.permutation(len(self.classes))
            for g in order:
                yield self.classes[int(g)]

    def close(self) -> None:
        p = getattr(self, "_live_prefetcher", None)
        if p is not None:
            p.stop()  # before the pool: a live producer mid-decode would
            self._live_prefetcher = None  # strand on a closed pool's IPC
        if self.mp_pool is not None:
            self.mp_pool.close()

    def set_epoch(self, epoch: int) -> None:
        """Pin the NEXT ``__iter__``'s streams to ``epoch``: the episode
        class order and per-class index streams are derived from
        ``(seed, epoch)`` alone, so epoch e's batch sequence is identical
        across loader instances and process restarts. This is what makes
        mid-epoch resume exact (``skip_next`` on a fresh process skips
        precisely the episodes the preempted process already trained), and
        it mirrors the reference's per-epoch DataLoader reshuffle
        (``dataset/imagenet_group.py:105`` — each epoch's iterator
        reshuffles independently). Without a call, epochs auto-advance
        0, 1, 2, ... per ``__iter__``."""
        self._epoch = int(epoch)

    def skip_next(self, k: int) -> None:
        """Advance the NEXT ``__iter__`` by ``k`` episodes without decoding
        a single image: the class-order and per-class index streams move
        exactly as if the batches had been served. With ``set_epoch``'s
        per-epoch deterministic streams, a fresh process skips EXACTLY the
        episodes the preempted process already trained. Mid-epoch resume
        uses this to re-enter a preempted epoch at the saved step instead
        of dropping the epoch's remaining data (utils/preempt.py pairs
        with the driver's ``--resume``)."""
        self._pending_skip = max(0, int(k))

    def _make_batch(self, cls: str) -> GroupBatch:
        paths = self.grouped[cls]
        idxs = self._next_indices(cls)
        imgs = _decode_rows(self.source, self._pool, self.mp_pool, cls, paths, idxs)
        B = self.batch_size
        h, w, c = imgs[0].shape
        out = np.zeros((B, h, w, c), imgs[0].dtype)
        valid = np.zeros(B, bool)
        for j, im in enumerate(imgs):
            out[j] = im
            valid[j] = True
        return GroupBatch(
            images=out, target=self.class_ids[cls], valid=valid,
            paths=[paths[i] for i in idxs],
        )

    def __len__(self) -> int:
        return self.n_episodes

    def __iter__(self) -> Iterator[GroupBatch]:
        # per-epoch deterministic streams (see set_epoch): reseed and reset
        _stop_live_prefetcher(self)
        # the per-class cursors so epoch e is a pure function of (seed, e)
        self.rng = np.random.default_rng([self._seed, self._epoch])
        self._cursors = {}
        self._epoch += 1
        class_iter = self._episode_classes()
        skip = getattr(self, "_pending_skip", 0)
        self._pending_skip = 0
        for _ in range(skip):  # advance streams, no decode (skip_next)
            self._next_indices(next(class_iter))
        remaining = self.n_episodes - skip

        def gen():
            for _ in range(remaining):
                yield self._make_batch(next(class_iter))

        p = Prefetcher(gen, depth=self._prefetch)
        self._live_prefetcher = p
        return iter(p)


class FlatTrainLoader:
    """Shuffled multi-class batches (images + per-row labels) — the
    reference's plain ``ImageNet`` Dataset + DataLoader path used by the
    flat fine-tune / FREE / CNZSL baselines (``dataset/imagenet.py:63-161``,
    ``baseline/FREE/train_free.py:246-247``)."""

    def __init__(
        self,
        grouped: Dict[str, List[str]],
        class_ids: Dict[str, int],
        source: ImageSource,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 8,
        prefetch: int = 4,
        drop_last: bool = True,
        num_procs: int = 0,
    ):
        self.items: List[Tuple[str, int, int]] = []  # (cls, idx, label)
        self.grouped = grouped
        for cls, paths in grouped.items():
            for i in range(len(paths)):
                self.items.append((cls, i, class_ids[cls]))
        self.batch_size = batch_size
        self.source = source
        self._seed = seed
        self._epoch = 0
        self.rng = np.random.default_rng(seed)
        self._pool = ThreadPoolExecutor(max_workers=num_threads)
        self.mp_pool = _maybe_mp_pool(source, num_procs, batch_size)
        self._prefetch = prefetch
        self.drop_last = drop_last
        n = len(self.items)
        self.num_batches = n // batch_size if drop_last else (n + batch_size - 1) // batch_size

    def __len__(self) -> int:
        return self.num_batches

    def close(self) -> None:
        p = getattr(self, "_live_prefetcher", None)
        if p is not None:
            p.stop()
            self._live_prefetcher = None
        if self.mp_pool is not None:
            self.mp_pool.close()

    def _decode(self, rows):
        if self.mp_pool is not None:
            return list(self.mp_pool.decode_pairs([
                (self.grouped[r[0]][r[1]], self.grouped[r[0]][0]) for r in rows
            ]))
        return list(
            self._pool.map(
                lambda r: self.source.load(r[0], self.grouped[r[0]], r[1]),
                rows,
            )
        )

    def set_epoch(self, epoch: int) -> None:
        """Pin the NEXT ``__iter__``'s shuffle to ``(seed, epoch)`` —
        same restart-deterministic contract as GroupedTrainLoader."""
        self._epoch = int(epoch)

    def __iter__(self):
        _stop_live_prefetcher(self)
        self.rng = np.random.default_rng([self._seed, self._epoch])
        self._epoch += 1
        order = self.rng.permutation(len(self.items))

        def gen():
            B = self.batch_size
            for s in range(self.num_batches):
                idxs = order[s * B : (s + 1) * B]
                rows = [self.items[i] for i in idxs]
                imgs = self._decode(rows)
                h, w, c = imgs[0].shape
                out = np.zeros((B, h, w, c), imgs[0].dtype)
                valid = np.zeros(B, bool)
                labels = np.zeros(B, np.int32)
                for j, (im, r) in enumerate(zip(imgs, rows)):
                    out[j] = im
                    labels[j] = r[2]
                    valid[j] = True
                yield out, labels, valid

        p = Prefetcher(gen, depth=self._prefetch)
        self._live_prefetcher = p
        return iter(p)


class GroupedTestLoader:
    """Deterministic eval loader: every batch of every class, in order."""

    def __init__(
        self,
        grouped: Dict[str, List[str]],
        class_ids: Dict[str, int],
        source: ImageSource,
        batch_size: int,
        num_threads: int = 8,
        prefetch: int = 4,
        num_procs: int = 0,
    ):
        self.grouped = {c: p for c, p in grouped.items() if len(p) > 0}
        self.class_ids = class_ids
        self.source = source
        self.batch_size = batch_size
        self._pool = ThreadPoolExecutor(max_workers=num_threads)
        self.mp_pool = _maybe_mp_pool(source, num_procs, batch_size)
        self._prefetch = prefetch
        self.num_batches = sum(
            (len(p) + batch_size - 1) // batch_size
            for p in self.grouped.values()
        )
        self.num_images = sum(len(p) for p in self.grouped.values())

    def __len__(self) -> int:
        return self.num_batches

    def close(self) -> None:
        p = getattr(self, "_live_prefetcher", None)
        if p is not None:
            # an early-exiting consumer (max_test_batches, exceptions)
            # leaves the producer mid-decode; stop it before the pool goes
            p.stop()
            self._live_prefetcher = None
        if self.mp_pool is not None:
            self.mp_pool.close()

    def __iter__(self) -> Iterator[GroupBatch]:
        _stop_live_prefetcher(self)

        def gen():
            B = self.batch_size
            for cls, paths in self.grouped.items():
                n = len(paths)
                for start in range(0, n, B):
                    idxs = list(range(start, min(start + B, n)))
                    imgs = _decode_rows(
                        self.source, self._pool, self.mp_pool, cls, paths, idxs
                    )
                    h, w, c = imgs[0].shape
                    out = np.zeros((B, h, w, c), imgs[0].dtype)
                    valid = np.zeros(B, bool)
                    for j, im in enumerate(imgs):
                        out[j] = im
                        valid[j] = True
                    yield GroupBatch(
                        images=out,
                        target=self.class_ids[cls],
                        valid=valid,
                        paths=[paths[i] for i in idxs],
                    )

        p = Prefetcher(gen, depth=self._prefetch)
        self._live_prefetcher = p
        return iter(p)
