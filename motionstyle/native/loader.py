"""Native-backed data loaders.

`NativeStyleLoader` is a drop-in for `data.collate.DataLoader` +
`t2m_style_collate` over a `StyleMotionDataset`: the per-item random
decisions run through the dataset's own `sample_spec` (identical `random`
stream), while the array work — crop, normalize, pad, transpose, stack,
mask build — happens in one multithreaded C++ call (native/ingest.py).
Batches match the numpy path to float32 rounding (tests/test_native.py).

`PrefetchLoader` overlaps host batch assembly with device compute: a
background thread keeps up to `depth` ready batches in a queue, so the
accelerator never waits on the host between steps — the role torch's
DataLoader worker pool plays for the reference (get_data.py:43-53), done
TPU-style (one producer feeding one dispatch thread).
"""
from __future__ import annotations

import queue
import threading

import numpy as np

from motionstyle.data.collate import DataLoader
from motionstyle.native.ingest import lengths_to_mask, window_normalize_collate


class NativeStyleLoader(DataLoader):
    """Shuffled batch iterator over a StyleMotionDataset with fused native
    batch assembly. Interface-compatible with data.collate.DataLoader
    (subclasses it for the shared shuffle/len/drop_last semantics)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0, nthreads: int = 0):
        super().__init__(dataset, batch_size, collate_fn=None,
                         shuffle=shuffle, drop_last=drop_last, seed=seed)
        self.nthreads = nthreads

    def _assemble(self, idx_chunk) -> tuple:
        ds = self.dataset
        specs = [ds.sample_spec(int(i)) for i in idx_chunk]
        motion = window_normalize_collate(
            [d["motion"] for d, _, _, _ in specs],
            [start for _, _, start, _ in specs],
            [m_len for _, _, _, m_len in specs],
            ds.max_motion_length, ds.mean, ds.std, nthreads=self.nthreads)
        lengths = np.asarray([m_len for _, _, _, m_len in specs])
        cond = {"y": {
            "mask": lengths_to_mask(lengths, ds.max_motion_length),
            "lengths": lengths,
            "text": [caption for _, caption, _, _ in specs],
            "style": [d["style_name"] for d, _, _, _ in specs],
        }}
        return motion, cond

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = len(idx) - (self.batch_size - 1 if self.drop_last else 0)
        for s in range(0, stop, self.batch_size):
            yield self._assemble(idx[s:s + self.batch_size])


class PrefetchLoader:
    """Wrap any batch iterable: a producer thread stays `depth` batches
    ahead, so batch assembly overlaps the device step. Exceptions from the
    producer re-raise at the consuming site; iteration order unchanged."""

    _DONE = object()

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        return self.loader.dataset

    @property
    def batch_size(self):
        return self.loader.batch_size

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        err: list = []

        def put(item) -> bool:
            # bounded put that aborts when the consumer abandoned iteration
            # (training loops `break` on the last step) — without this the
            # producer would block on a full queue forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for batch in self.loader:
                    if not put(batch):
                        return
            except BaseException as ex:  # noqa: BLE001 — re-raised below
                err.append(ex)
            finally:
                put(self._DONE)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # runs on GeneratorExit / consumer break: unblock + end producer
            stop.set()
            t.join(timeout=5)
