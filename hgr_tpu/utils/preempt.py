"""Graceful-shutdown handling for preemptible TPU workers.

Production TPU pools are preempted routinely (spot/defragmentation); the
scheduler sends SIGTERM and gives the process a grace window. The reference
has no story for this — a killed run loses everything since its last
per-epoch ``torch.save`` and restarts with fresh optimizer moments
(SURVEY §5 "failure detection: absent"). Here the train loops convert
SIGTERM into a *step-boundary* stop: finish the in-flight step, checkpoint
params + optimizer state + step through the normal saver, log where the run
stopped, and exit cleanly so ``--resume --from_epoch N`` continues.
"""

from __future__ import annotations

import signal
from typing import Iterable


class GracefulShutdown:
    """Context manager that latches shutdown signals instead of dying.

    Inside the context, SIGTERM (by default) sets :attr:`requested`; loops
    poll it at step boundaries. Previous handlers are restored on exit, so
    a signal arriving after the guarded region falls through to whatever
    the caller had installed.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._old = {}
        self.requested = False

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        for s in self._signals:
            try:
                self._old[s] = signal.signal(s, self._handler)
            except ValueError:
                # not the main thread (e.g. a test harness): poll-only mode
                pass
        return self

    def __exit__(self, *exc) -> None:
        for s, old in self._old.items():
            signal.signal(s, old)
