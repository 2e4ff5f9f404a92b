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


def shard_global_batch(global_batch_size: int, oversample_percent: float,
                       process_index: Optional[int] = None,
                       process_count: Optional[int] = None,
                       n_devices: Optional[int] = None):
    """Split the GLOBAL batch across processes, reference DDP semantics
    (`nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py:410-453`): every process
    samples only its slice of the global batch, and its oversample fraction is
    chosen so the globally-LAST ``round(global * (1 - p))`` samples are the
    force-foreground ones regardless of which process draws them.

    One TPU-driven deviation: XLA SPMD needs equal shards per device, so the
    global batch is rounded UP to a multiple of the device count (the reference
    allows ragged per-rank batches; we log the adjustment instead).

    Returns ``(adjusted_global_batch, local_batch, local_oversample_percent)``.
    """
    world = jax.process_count() if process_count is None else process_count
    rank = jax.process_index() if process_index is None else process_index
    if world == 1:
        return global_batch_size, global_batch_size, oversample_percent
    n_dev = jax.device_count() if n_devices is None else n_devices
    div = max(n_dev, world)
    adjusted = -(-global_batch_size // div) * div  # ceil to a device multiple
    local = adjusted // world

    lo, hi = rank * local, (rank + 1) * local
    # per-sample force-fg decision on the GLOBAL batch, same round() scheme as
    # the per-process sampler uses
    cutoff = round(adjusted * (1 - oversample_percent))
    if hi <= cutoff:
        local_pct = 0.0
    elif lo >= cutoff:
        local_pct = 1.0
    else:
        local_pct = (hi - cutoff) / local
    return adjusted, local, local_pct


def make_global_batch(sharding: NamedSharding, local_array: np.ndarray):
    """Assemble a globally-sharded jax.Array from this process's local batch
    slice. Single-process: plain device_put."""
    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    return jax.make_array_from_process_local_data(sharding, local_array)


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


def get_2d_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """('data', 'model') mesh for combined data + tensor parallelism. Lay the
    'model' axis innermost so its collectives ride neighboring ICI links."""
    if devices is None:
        devices = jax.devices()
    devices = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def shard_specs_channelwise(params, mesh: Mesh, axis: str = "model",
                            min_size: int = 64):
    """Channel-wise tensor-parallel sharding SPECS: shard each weight's LAST
    (output-feature) dimension over ``axis`` when it divides evenly and is
    large enough to be worth splitting; everything else is replicated. XLA's
    partitioner inserts the all-gathers / reduce-scatters — this is the
    sharding-annotation (not hand-collective) route the scaling playbook
    prescribes for conv/dense channel sharding.

    ``params`` may be concrete arrays OR abstract ``jax.ShapeDtypeStruct``s
    (from ``jax.eval_shape`` on the initializer) — pass the resulting specs as
    ``out_shardings`` to a jitted init so parameters are created ALREADY
    sharded. Materializing replicated params first and re-laying them out with
    ``device_put`` runs cross-module collectives, which deadlock XLA:CPU's
    in-process rendezvous on starved hosts.

    ``min_size=64`` keeps the flagship in scope: M2NetP's widest weights are
    64/128 output channels (conv stems, in_proj, PatchMerging reductions).
    """
    n_shard = mesh.shape[axis]

    def spec_for(p):
        if p.ndim >= 1 and p.shape[-1] % n_shard == 0 and \
                p.shape[-1] >= min_size:
            return NamedSharding(
                mesh, PartitionSpec(*([None] * (p.ndim - 1) + [axis])))
        return NamedSharding(mesh, PartitionSpec())

    return jax.tree.map(spec_for, params)


def shard_params_channelwise(params, mesh: Mesh, axis: str = "model",
                             min_size: int = 64):
    """Place already-materialized params according to
    :func:`shard_specs_channelwise`. Prefer jitting the initializer with
    ``out_shardings=shard_specs_channelwise(jax.eval_shape(init, ...), mesh)``
    — see that function's note on cross-module resharding.

    Returns (sharded_params, shardings_pytree) — the shardings are reusable as
    jit in/out shardings.
    """
    shardings = shard_specs_channelwise(params, mesh, axis, min_size)

    def put(p, sh):
        if jax.process_count() == 1:
            return jax.device_put(p, sh)
        # multi-host: every process holds the full (replicated) value; build
        # the globally-sharded array from local slices
        host = np.asarray(p)
        return jax.make_array_from_callback(host.shape, sh,
                                            lambda idx: host[idx])

    sharded = jax.tree.map(put, params, shardings)
    return sharded, shardings
