"""Donkey pool — async host-side batch production.

Rebuild of the reference's thread pool (`data.lua:15-38`): n worker
threads produce numpy batches while the main thread feeds the device;
``n_donkeys=0`` degrades to a synchronous in-process pool for debugging
(`data.lua:32-37`). Determinism: every job carries its own integer seed
derived from (manualSeed, epoch, iteration), so results are identical
for any pool size — stronger than the reference, whose batch *order*
was donkey-completion-dependent."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator


class DonkeyPool:
    def __init__(self, n_donkeys: int = 2):
        self.n = n_donkeys
        self._pool = ThreadPoolExecutor(max_workers=n_donkeys) if n_donkeys > 0 else None

    def imap(self, jobs: Iterable[Callable[[], object]]) -> Iterator[object]:
        """Run jobs preserving order with a lookahead window of n+1."""
        if self._pool is None:
            for job in jobs:
                yield job()
            return
        pending = []
        it = iter(jobs)
        try:
            for _ in range(self.n + 1):
                pending.append(self._pool.submit(next(it)))
        except StopIteration:
            pass
        while pending:
            fut = pending.pop(0)
            try:
                pending.append(self._pool.submit(next(it)))
            except StopIteration:
                pass
            yield fut.result()

    def shutdown(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
