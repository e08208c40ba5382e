"""Observability: structured JSONL run logs + TPU profiler hooks.

The reference's only observability is tqdm bars and print statements
(SURVEY.md §5); its only fault tolerance is the per-image skip-existing
contract. Here:

- ``RunLogger`` appends one JSON object per event (image start/finish/error,
  timings, method) to a run log — greppable, resumable, and safe under the
  multi-process sweep (append-only, one line per write).
- ``profile_trace`` wraps ``jax.profiler.trace`` for xprof captures of the
  jitted phases (inspect Pallas kernels and fusion decisions).
- ``phase_timer`` measures device wall-clock of a jitted callable (blocks on
  the result) for per-phase breakdowns.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax


class RunLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, event: str, **fields: Any) -> None:
        if not self.path:
            return
        rec: Dict[str, Any] = {"ts": time.time(), "event": event}
        rec.update(fields)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    @contextlib.contextmanager
    def image(self, key: str, method: str) -> Iterator[None]:
        t0 = time.perf_counter()
        self.log("image_start", key=key, method=method)
        try:
            yield
        except Exception as e:  # noqa: BLE001 - recorded then re-raised
            self.log("image_error", key=key, method=method, error=repr(e),
                     seconds=round(time.perf_counter() - t0, 4))
            raise
        self.log("image_done", key=key, method=method,
                 seconds=round(time.perf_counter() - t0, 4))


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """xprof trace of the enclosed block (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def phase_timer(fn, *args, iters: int = 1, **kwargs) -> float:
    """Device wall-clock seconds per call of a jitted function."""
    out = fn(*args, **kwargs)
    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, out)
    return (time.perf_counter() - t0) / iters
