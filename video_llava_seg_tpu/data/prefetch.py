"""Host->device input prefetching (double buffering).

The reference relies on torch DataLoader workers (num_workers=4,
llava/train/llava_trainer.py) for pipeline overlap; the TPU-native
equivalent is a small background thread that keeps `size` batches ahead:
CPU collation overlaps device compute, and `jax.device_put` starts the
host->device DMA early so the train step never waits on input."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterator, size: int = 2,
                       sharding=None,
                       transform: Optional[Callable] = None) -> Iterator:
    """Wrap `iterator` with a daemon thread that stays `size` batches ahead.

    sharding: optional jax.sharding.Sharding (or device) passed to
    device_put — use the batch's data sharding under a mesh.
    transform: optional host-side fn applied before the transfer."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def worker():
        try:
            for batch in iterator:
                if transform is not None:
                    batch = transform(batch)
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        except Exception as exc:  # surfaced in the consumer
            q.put(exc)
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()

    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, Exception):
            raise item
        yield item
