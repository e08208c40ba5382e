"""Worker for tests/test_multihost.py: joins a 2-process JAX distributed
cluster on localhost CPU, shards items, allreduces metrics, dumps JSON."""
import json
import sys

import numpy as np


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    addr, out_path = sys.argv[3], sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pnpinversion_tpu.parallel.multihost import (
        allreduce_metrics,
        initialize,
        process_shard,
    )

    initialize(coordinator_address=addr, num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc, jax.process_count()

    items = list(range(7))
    shard = process_shard(items)
    local_sums = np.array([float(sum(shard)), float(sum(x * x for x in shard))],
                          np.float32)
    mean = allreduce_metrics(local_sums, len(shard))
    json.dump({"process_index": jax.process_index(),
               "shard": shard,
               "mean": [float(v) for v in np.asarray(mean)]},
              open(out_path, "w"))


if __name__ == "__main__":
    main()
