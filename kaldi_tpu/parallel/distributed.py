"""Multi-process distributed runtime.

Parity target: the reference's cross-machine story is a shared
filesystem + queue.pl job dispatch (SURVEY.md §2.4 comm-backend row);
the TPU-native equivalent is jax.distributed.initialize — one process
per host, devices federated into one global mesh, collectives over
ICI/DCN instead of ark files on NFS.

`worker_main` is the per-process entry (the run.pl "job"): it joins
the coordinator, builds a global mesh over all processes' devices,
shards a global batch across processes with
make_array_from_process_local_data, and runs psum-reduced computations
under shard_map — the gmm-sum-accs / nnet3-average role.  The test
suite launches two local CPU processes against it
(tests/test_distributed.py), which is exactly how the reference
exercises "cluster" paths locally (run.pl backgrounds jobs on one
machine).
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np

from kaldi_tpu.core.logging import get_logger

log = get_logger(__name__)


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """jax.distributed.initialize wrapper (idempotent per process)."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info("distributed: process %d/%d up, %d local / %d global devices",
             process_id, num_processes, jax.local_device_count(),
             jax.device_count())


def global_mesh(axis_name: str = "data"):
    import jax
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def psum_stats(local_stats: np.ndarray, mesh=None) -> np.ndarray:
    """Sum per-process statistics across the global mesh (the
    gmm-sum-accs reduction as a psum collective).  local_stats: this
    process's contribution; every process must call this."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = mesh or global_mesh()
    n = jax.process_count()
    # one shard per process: build the global (n, ...) array from each
    # process's local row
    from jax.sharding import NamedSharding
    global_shape = (jax.device_count(),) + local_stats.shape
    local_rows = np.broadcast_to(
        local_stats[None] / jax.local_device_count(),
        (jax.local_device_count(),) + local_stats.shape)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.ascontiguousarray(local_rows),
        global_shape)

    @jax.jit
    def reduce(a):
        return jnp.sum(a, axis=0)

    return np.asarray(jax.device_get(reduce(arr)))


def worker_main(argv=None) -> int:
    """Entry for the distributed smoke worker:

        python -m kaldi_tpu.parallel.distributed <coord> <nproc> <pid> \
            <out_prefix>

    Each process contributes deterministic per-process GMM-style stats
    and a gradient; the psum-reduced results are written to
    <out_prefix>.<pid>.npz for the launching test to compare."""
    argv = argv if argv is not None else sys.argv[1:]
    coord, nproc, pid, out_prefix = (argv[0], int(argv[1]), int(argv[2]),
                                     argv[3])
    import os
    import jax
    if os.environ.get("KALDI_TPU_PLATFORM"):
        # the environment may force a hardware platform via
        # sitecustomize; tests pin the CPU backend explicitly
        jax.config.update("jax_platforms", os.environ["KALDI_TPU_PLATFORM"])
    initialize(coord, nproc, pid)
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_mesh()
    # 1. stat reduction (gmm-sum-accs role)
    rng = np.random.default_rng(100 + pid)
    local = rng.standard_normal((4, 3)).astype(np.float32)
    total = psum_stats(local, mesh)

    # 2. data-parallel gradient step (nnet3-average role, done as true
    #    synchronous psum-grad SGD): global batch sharded on 'data'
    D = 8
    W = np.linspace(-1, 1, D).astype(np.float32)
    ndev = jax.device_count()
    ldev = jax.local_device_count()
    per_dev = 4
    gb = np.zeros((ndev * per_dev, D), np.float32)
    gy = np.zeros((ndev * per_dev,), np.float32)
    grng = np.random.default_rng(7)        # same on all processes
    gb[:] = grng.standard_normal(gb.shape)
    gy[:] = gb @ (np.arange(D) * 0.1)
    lo = pid * ldev * per_dev
    hi = lo + ldev * per_dev
    X = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.ascontiguousarray(gb[lo:hi]),
        gb.shape)
    Y = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.ascontiguousarray(gy[lo:hi]),
        gy.shape)

    @jax.jit
    def grad_step(W, X, Y):
        def loss(W):
            return jnp.mean((X @ W - Y) ** 2)
        return jax.grad(loss)(W)

    g = np.asarray(jax.device_get(grad_step(jnp.asarray(W), X, Y)))

    np.savez(f"{out_prefix}.{pid}.npz", total=total, grad=g,
             ndev=np.asarray(jax.device_count()))
    log.info("worker %d done: devices=%d", pid, jax.device_count())
    return 0


if __name__ == "__main__":
    sys.exit(worker_main())
