"""Multi-host sweep wiring.

The reference's only distributed artifact is the vendored InstructDiffusion
trainer's torch.distributed launch (SURVEY.md §2.14, unused by the
benchmark). For multi-host TPU pods the sweep is embarrassingly parallel:
initialize the JAX distributed runtime, give each process a disjoint slice of
the mapping file, and let the file-based skip-existing contract handle
restarts; metric aggregation reduces with one psum.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize passthrough (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_shard(items: Sequence, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> List:
    """Deterministic per-process slice of the sweep items."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [it for i, it in enumerate(items) if i % pc == pi]


def allreduce_metrics(local_sums: np.ndarray, local_count: int) -> np.ndarray:
    """Mean of per-image metric sums across all hosts (one allgather)."""
    if jax.process_count() == 1:
        return np.asarray(local_sums) / max(local_count, 1)

    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(jnp.asarray(local_sums, jnp.float32))
    counts = multihost_utils.process_allgather(jnp.asarray([local_count], jnp.int32))
    return np.asarray(total).sum(0) / max(int(np.asarray(counts).sum()), 1)
