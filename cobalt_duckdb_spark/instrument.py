"""Timing instrumentation (SURVEY.md §2.10 U3).

The reference's only perf tooling is a wall-clock decorator
(``/root/reference/model/utils/timer.py:8-19``) applied to index build and
search. Same shape here, plus a context manager used by bench.py — results
go to a dict instead of a logger so harnesses can emit structured JSON.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from contextlib import contextmanager


def stop_watch(sink: dict[str, float] | None = None, name: str | None = None):
    """Decorator recording wall-clock seconds per call (last call wins).

    >>> timings = {}
    >>> @stop_watch(timings)
    ... def build(): ...
    """

    def deco(fn: Callable) -> Callable:
        key = name or fn.__name__

        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            try:
                return fn(*args, **kwargs)
            finally:
                if sink is not None:
                    sink[key] = round(time.perf_counter() - t0, 4)

        wrapper.__name__ = fn.__name__
        wrapper.__doc__ = fn.__doc__
        return wrapper

    return deco


@contextmanager
def timed(sink: dict[str, float], key: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink[key] = round(time.perf_counter() - t0, 4)
