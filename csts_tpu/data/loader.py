"""Input pipeline: multi-worker host loading with device prefetch.

Replaces the reference's torch DataLoader stack (``loader.py:44-130`` +
DistributedSampler + 8 worker processes per GPU) with a TPU-shaped design:

* a thread pool decodes/augments clips (numpy work releases the GIL in cv2/np);
* per-epoch shuffling is seeded (epoch, RNG_SEED) — ``shuffle_dataset``/
  ``DistributedSampler.set_epoch`` equivalence (loader.py:112-130);
* multi-host sharding: each jax process takes a contiguous stripe of every batch
  (DistributedSampler semantics) via ``process_index/process_count``;
* per-sample RNG is seeded by (seed, epoch, sample-index) — augmentations are
  reproducible regardless of worker count, unlike the reference;
* batches are collated into pinned numpy arrays and prefetched ``PREFETCH_DEPTH``
  deep so host decode overlaps device compute (double-buffering).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from csts_tpu.config import Config
from csts_tpu.data.datasets import AVGazeDataset, build_dataset


def _collate(samples) -> Dict[str, np.ndarray]:
    batch = {
        key: np.stack([s[key] for s in samples])
        for key in ("video", "audio", "labels", "labels_hm")
    }
    batch["index"] = np.asarray([s["index"] for s in samples])
    return batch


class GazeLoader:
    """Iterable over collated numpy batches for one split."""

    def __init__(
        self,
        dataset: AVGazeDataset,
        batch_size: int,
        shuffle: bool,
        num_workers: int = 8,
        seed: int = 0,
        drop_last: bool = False,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.global_batch_size = batch_size
        assert batch_size % process_count == 0
        self.local_batch_size = batch_size // process_count
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0
        self._start_iter = 0

    def set_epoch(self, epoch: int, start_iter: int = 0):
        """Seeded epoch shuffle (shuffle_dataset, loader.py:112-130).

        ``start_iter`` resumes the epoch mid-way: iteration skips the first
        ``start_iter`` batches of the (seed, epoch)-keyed order. Because both
        the shuffle and every per-sample augmentation RNG are keyed by absolute
        sample position, the resumed stream is bit-identical to the tail of an
        uninterrupted epoch — the basis of mid-epoch preemption resume
        (train/trainer.py), which the reference cannot do (its DataLoader
        restarts the epoch)."""
        self._epoch = epoch
        self._start_iter = start_iter

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return (n + self.global_batch_size - 1) // self.global_batch_size

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(order)
        return order

    def _batch_stripe(self, order: np.ndarray, b: int):
        """(this host's sample indices, their global positions) for batch ``b``."""
        lo = b * self.global_batch_size
        batch_idx = order[lo : lo + self.global_batch_size]
        if len(batch_idx) < self.global_batch_size:
            # pad by wrapping (keeps batch shapes static for jit); np.resize
            # repeats cyclically, so a dataset SMALLER than the pad still
            # fills the batch (order[:pad] alone would come up short)
            pad = self.global_batch_size - len(batch_idx)
            batch_idx = np.concatenate([batch_idx, np.resize(order, pad)])
        lo_host = lo + self.process_index * self.local_batch_size
        stripe = batch_idx[
            self.process_index * self.local_batch_size
            : (self.process_index + 1) * self.local_batch_size
        ]
        return stripe, lo_host

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        n_batches = len(self)

        def fetch(global_idx: int, sample_pos: int):
            rng = np.random.default_rng((self.seed, self._epoch, int(sample_pos)))
            return self.dataset.__getitem__(int(global_idx), rng=rng)

        def submit(pool, b: int):
            stripe, lo_host = self._batch_stripe(order, b)
            return [pool.submit(fetch, g, lo_host + i) for i, g in enumerate(stripe)]

        # Bounded look-ahead: submitting the whole epoch up front would let the
        # workers decode arbitrarily far past the consumer (host RAM grows
        # toward the epoch) and would force generator close to decode every
        # still-queued batch. A window of enough batches to keep all workers
        # busy (+1 for the one being consumed) bounds both.
        window = 1 + max(
            1, -(-self.num_workers // max(self.local_batch_size, 1))
        )
        todo = list(range(self._start_iter, n_batches))  # len() already floors under drop_last
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = [submit(pool, b) for b in todo[:window]]
            next_i = len(pending)
            try:
                while pending:
                    futures = pending.pop(0)
                    if next_i < len(todo):
                        pending.append(submit(pool, todo[next_i]))
                        next_i += 1
                    yield _collate([f.result() for f in futures])
            finally:
                # abandoned mid-epoch (DevicePrefetcher.close, an eval error):
                # cancel not-yet-started fetches so pool shutdown doesn't
                # decode the remaining window
                for futures in pending:
                    for f in futures:
                        f.cancel()


def construct_loader(cfg: Config, split: str, seed_offset: int = 0) -> GazeLoader:
    """(reference construct_loader, loader.py:44-109)"""
    import jax

    assert split in ("train", "val", "test")
    if split == "train":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = True, True
    elif split == "val":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = False, False
    else:
        dataset_name = cfg.TEST.DATASET
        batch_size = cfg.TEST.BATCH_SIZE
        shuffle, drop_last = False, False

    dataset = build_dataset(dataset_name, cfg, "train" if split == "train" else split)
    return GazeLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        num_workers=cfg.DATA_LOADER.NUM_WORKERS,
        seed=cfg.RNG_SEED + seed_offset,
        drop_last=drop_last,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )


class DevicePrefetcher:
    """Background thread moving host batches to device ``depth`` ahead.

    The TPU equivalent of pin_memory + cuda(non_blocking): keeps HBM fed while the
    current step runs, hiding host→device transfer latency.
    """

    def __init__(self, iterator, place_fn, depth: int = 2):
        self._it = iterator
        self._place = place_fn
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._stop = threading.Event()
        self._error = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                if self._stop.is_set():
                    break
                self._q.put(self._place(item))
        except BaseException as exc:  # noqa: BLE001 — re-raised in __next__
            # a decode/placement failure must surface in the consumer, not
            # silently truncate the epoch (the iteration would otherwise just
            # end and eval/train would report stats over a partial dataset)
            self._error = exc
        finally:
            self._q.put(self._done)

    def close(self):
        """Stop prefetching early (mid-epoch preemption): unblock the producer
        and join it so abandoned loader thread pools don't keep decoding."""
        self._stop.set()
        # keep draining until the producer exits — a single drain could leave it
        # re-blocked on put() (the in-flight item plus the _done sentinel)
        while self._thread.is_alive():
            try:
                self._q.get(timeout=0.1)
            except queue.Empty:
                pass
        self._thread.join()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._error is not None and not self._stop.is_set():
                raise self._error
            raise StopIteration
        return item
