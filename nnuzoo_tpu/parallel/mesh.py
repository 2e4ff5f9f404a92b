"""Device-mesh / sharding utilities.

Replaces the reference's NCCL DDP stack (`nnunetv2/run/run_training.py:102-136`,
`utilities/ddp_allgather.py`): a 1-D ``data`` mesh with the batch sharded and
parameters replicated. Gradient/loss/metric reductions fall out of XLA's SPMD
partitioner — no explicit all-reduce code. Multi-host pods: call
``jax.distributed.initialize`` before mesh creation (``maybe_init_distributed``).
"""

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def maybe_init_distributed() -> None:
    """Initialize jax.distributed from env (multi-host pods). Single-host no-op."""
    if os.environ.get("NNUZOO_COORDINATOR") and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=os.environ["NNUZOO_COORDINATOR"],
            num_processes=int(os.environ.get("NNUZOO_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("NNUZOO_PROCESS_ID", "0")))


def get_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Batch sharded over 'data' on dim 0, replicated otherwise."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
