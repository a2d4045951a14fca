"""Loader: dataset + sampler -> prefetched, device-sharded numpy batches.

Replaces the reference's 16-worker torch DataLoader with a single background
prefetch thread (this host has one core; augmentation is cheap numpy) feeding
``jax.device_put`` with an optional ``NamedSharding`` so each batch lands
already sharded across the mesh's data axis.

Integer arrays ship at their narrowest width — segmentation class ids fit
uint8, an 8x cut vs the int64 numpy default (``jax.nn.one_hot`` and integer
comparisons accept any int dtype on device). This matters on PCIe and 10x
more through the axon tunnel (measured ~34 MB/s). Transfers stay in the
consumer: moving them into the producer thread was measured WORSE through
the tunnel (e2e 54 -> 34 slices/s — the background device_put contends with
the step's RPC dispatch).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def _compact_int(a: np.ndarray) -> np.ndarray:
    """Narrowest safe integer dtype for device transfer (class-id arrays)."""
    if a.size == 0 or a.dtype.itemsize <= 1:
        return a
    lo, hi = a.min(), a.max()
    if 0 <= lo and hi < 256:
        return a.astype(np.uint8)
    if np.iinfo(np.int32).min <= lo and hi <= np.iinfo(np.int32).max:
        return a.astype(np.int32)
    return a


def _collate(samples) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], (int, np.integer)):
            out[key] = np.asarray(vals)
        else:
            out[key] = np.stack(vals)
        if np.issubdtype(out[key].dtype, np.integer):
            out[key] = _compact_int(out[key])
    return out


class Loader:
    def __init__(
        self,
        dataset,
        batch_sampler,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
        epochs: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.sharding = sharding
        self.prefetch = prefetch
        self.epochs = epochs  # None = iterate sampler epochs forever

    def __len__(self):
        return len(self.batch_sampler)

    def _produce(self, q: queue.Queue, stop: threading.Event):
        try:
            epoch = 0
            while not stop.is_set() and (self.epochs is None or epoch < self.epochs):
                for idxs in self.batch_sampler:
                    if stop.is_set():
                        return
                    q.put(_collate([self.dataset[i] for i in idxs]))
                epoch += 1
        finally:
            q.put(None)

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        thread = threading.Thread(target=self._produce, args=(q, stop), daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if self.sharding is not None:
                    batch = {
                        k: jax.device_put(v, self.sharding) for k, v in batch.items()
                    }
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            try:
                while q.get_nowait() is not None:
                    pass
            except queue.Empty:
                pass
