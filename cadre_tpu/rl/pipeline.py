"""Async host->device pipeline: double-buffered uploads.

The BASELINE north star calls for CARLA workers "streaming observations
through an async host-to-device pipeline": while the device computes on
batch k, batch k+1 is already uploading from a background thread. Works for
any iterator of array pytrees (perception loaders, vec-env tick streams).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wraps an iterator; yields device-resident pytrees with overlap.

    depth=2 gives classic double buffering; higher depths smooth jittery
    producers (e.g. env workers with variable step time).
    """

    _END = object()

    def __init__(self, iterable: Iterable[Any], depth: int = 2,
                 device: Optional[Any] = None,
                 sharding: Optional[Any] = None):
        self._it = iter(iterable)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._device = device
        self._sharding = sharding
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _put(self, tree):
        target = self._sharding or self._device
        if target is not None:
            return jax.tree.map(lambda x: jax.device_put(x, target), tree)
        return jax.tree.map(jax.device_put, tree)

    def _producer(self):
        try:
            for item in self._it:
                self._q.put(self._put(item))
        except BaseException as e:  # noqa: BLE001 - surfaced on next()
            self._err = e
        finally:
            self._q.put(self._END)

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_to_device(iterable: Iterable[Any], depth: int = 2,
                       sharding: Optional[Any] = None) -> DevicePrefetcher:
    return DevicePrefetcher(iterable, depth=depth, sharding=sharding)
