"""Dataset splitting, batching, and host->device feeding.

Replaces the reference's ad-hoc loop machinery: seeded ``random_split``
(reference train_SOccDPT.py:206-229) and the manual ``get_batch`` concat
with no shuffling or workers (utils/__init__.py:768-780; SURVEY.md §2.3
"Manual batching"). Here: a deterministic split, an epoch-shuffling
batcher with a background prefetch thread, and per-host sharding for
multi-process training (``jax.process_index``).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np


class Subset:
    def __init__(self, dataset, indices: Sequence[int]) -> None:
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]


def random_split(dataset, lengths: Sequence[int], seed: int = 0) -> List[Subset]:
    """Deterministic split (same role as torch random_split with a seeded
    generator, reference train_SOccDPT.py:209-226)."""
    n = len(dataset)
    if sum(lengths) != n:
        raise ValueError(f"lengths {lengths} must sum to dataset size {n}")
    perm = np.random.default_rng(seed).permutation(n)
    out, start = [], 0
    for ln in lengths:
        out.append(Subset(dataset, perm[start : start + ln].tolist()))
        start += ln
    return out


def split_train_val(
    dataset, val_percent: float, dataset_percentage: float = 1.0, seed: int = 0
) -> Tuple[Subset, Subset]:
    """dataset_percentage subsample then train/val split
    (reference train_SOccDPT.py:206-229)."""
    total = len(dataset)
    use = int(round(total * dataset_percentage))
    used, _ = random_split(dataset, [use, total - use], seed=seed)
    n_val = max(1, int(len(used) * val_percent))
    n_train = len(used) - n_val
    if n_train <= 0:
        raise ValueError("dataset too small for the requested split")
    train, val = random_split(used, [n_train, n_val], seed=seed)
    return train, val


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts into a batch dict."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


def iterate_batches(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = True,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield collated batches; each host sees its own index shard."""
    n = len(dataset)
    order = (
        np.random.default_rng(seed + epoch).permutation(n)
        if shuffle
        else np.arange(n)
    )
    order = order[process_index::process_count]
    stop = len(order) - (len(order) % batch_size if drop_last else 0)
    for start in range(0, stop, batch_size):
        idx = order[start : start + batch_size]
        if drop_last and len(idx) < batch_size:
            return
        yield collate([dataset[int(i)] for i in idx])


def device_prefetch(iterator: Iterator, put_fn, depth: int = 2) -> Iterator:
    """Keep ``depth`` device batches in flight.

    ``jax.device_put`` is asynchronous: issuing batch N+1's transfer
    before batch N is consumed overlaps wire time with compute. The
    train step is transfer-bound through tunneled devices (PERF.md
    "Training step"), so this double-buffering hides most of the
    host->device copy behind the previous step.
    """
    import collections

    q: "collections.deque" = collections.deque()
    for item in iterator:
        q.append(put_fn(item))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def prefetch(
    iterator: Iterator, size: int = 2
) -> Iterator:
    """Background-thread prefetch so host decode overlaps device compute."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
