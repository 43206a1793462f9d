"""Multi-host (DCN) scale-out helpers.

The reference is single-GPU (SURVEY §2c). On multi-host TPU pods:
- `initialize()` wires jax.distributed (coordinator discovery via env),
- `host_shard_range(n)` gives this host's contiguous shard of a dataset so
  each host's input pipeline loads only its slice (per-host data sharding),
- `global_mesh(data, model)` builds a mesh over ALL devices (ICI within a
  slice, DCN across hosts — XLA routes collectives hierarchically).

Eval aggregation across hosts uses `process_allgather` on the small
per-host detection arrays before the (host-side) mAP computation.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_CLUSTER_ENV_VARS = (
    # explicit jax coordination env
    "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
    # auto-detected cluster environments (TPU pod / GKE / OMPI)
    "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
    "OMPI_MCA_orte_hnp_uri",
)


def _in_cluster_env(coordinator_address, num_processes) -> bool:
    # explicit args count as a cluster signal (callers passing
    # num_processes/process_id without an address rely on env discovery
    # for the coordinator but still mean "multi-process")
    if coordinator_address or num_processes:
        return True
    if any(os.environ.get(v) for v in _CLUSTER_ENV_VARS):
        return True
    # SLURM sets SLURM_JOB_NUM_NODES=1 on every job incl. single-node
    # interactive shells — only a multi-node value signals a cluster
    # (auto-init on a 1-node salloc would raise in jax's SlurmCluster)
    try:
        if int(os.environ.get("SLURM_JOB_NUM_NODES", "1")) > 1:
            return True
    except ValueError:
        pass
    return False


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Idempotent jax.distributed init.

    Order matters: `jax.distributed.initialize()` must run BEFORE anything
    queries a backend — `jax.process_count()` (or any `jax.devices()` call)
    initialises the *local* backend first, after which cluster init cannot
    take effect and a pod silently degrades to N independent single-host
    jobs. So: decide from env/args alone, never from a backend query, and
    let real init failures propagate instead of swallowing them.
    """
    if jax.distributed.is_initialized():
        return  # already initialised (idempotent re-entry)
    if not _in_cluster_env(coordinator_address, num_processes):
        return  # single-host run: nothing to wire
    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # auto-discovery from the cluster env (TPU pod / SLURM / OMPI)
        jax.distributed.initialize()


def host_shard_range(n_examples: int, even: bool = False):
    """This host's [start, stop) slice of a dataset of n_examples.

    `even=True` gives every host an identical floor(n/k)-sized slice,
    dropping up to k-1 tail examples — a hard requirement for TRAIN
    sharding, where unequal per-host batch counts would deadlock the SPMD
    step (one host stops issuing programs before the others). Eval keeps
    the ceil split (no example dropped) and equalises program counts with
    EvalLoader(pad_to_batches=...) dummy batches instead."""
    p = jax.process_index()
    k = jax.process_count()
    if even:
        per = n_examples // k
        return p * per, (p + 1) * per
    per = (n_examples + k - 1) // k
    return p * per, min(n_examples, (p + 1) * per)


def global_mesh(model: int = 1):
    from .mesh import make_mesh

    return make_mesh(jax.devices(), model=model)


def all_gather_host_arrays(tree):
    """Gather per-host numpy pytrees onto every host (eval aggregation)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)
