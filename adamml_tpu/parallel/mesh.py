"""Device mesh + sharding rules.

The reference's distribution stack is one-process-per-GPU NCCL DDP with
explicit metric all_reduce and opt-in SyncBN (reference train_adamml.py:54-60,
83-84, 125-129; utils/utils.py:228-233, 539-550). The TPU-native equivalent
is a jax.sharding Mesh with GSPMD jit:

  * mesh axes ('data', 'model'): batches shard over 'data' (pure DP
    reproduces the reference; SURVEY.md section 2.2 -- the models fit
    per-chip so 'model' defaults to 1, but wide Dense kernels carry a
    PartitionSpec over 'model' so tensor-parallel runs compile when
    mesh_model > 1);
  * gradient all-reduce falls out of replicated params (XLA inserts psum
    over 'data' at the jit boundary);
  * BN moments / losses / metrics are global batch reductions under jit --
    the semantic superset of the reference's SyncBN and metric all_reduce;
  * eval gathering (reference concat_all_gather, utils/utils.py:539-550) is
    just fetching the globally-sharded jit output; multi-process hosts use
    multihost_utils.process_allgather.

Multi-host: call jax.distributed.initialize (coordinator = hostfile master
analog, reference train_adamml.py:40-50) before make_mesh; the mesh then
spans all processes' devices, ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_spec() -> P:
    return P("data")


def shard_batch(batch, mesh: Mesh):
    """Place host arrays with the leading axis sharded over 'data'.

    Single process: a plain device_put. Multi-process: each process holds
    only ITS loader shard (HostDataLoader num_shards=process_count), so the
    global array is assembled from the per-process locals -- the GSPMD
    equivalent of the reference's per-rank DataLoader feeding per-rank GPUs
    (reference utils/utils.py:153-163)."""
    multiproc = jax.process_count() > 1

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        s = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.device_put(x, s)
    return jax.tree_util.tree_map(put, batch)


# module names whose Dense 'kernel' is worth column-sharding over the
# 'model' axis (the wide layers: joint MLPs, classifier heads, LSTM
# projections). Matched EXACTLY against the kernel's parent module name so a
# future param that merely contains one of these substrings is not sharded
# by accident.
_TP_MODULES = frozenset(
    {"joint_fc1", "joint_fc2", "fc", "classifier", "ih", "hh"})


def _spec_for_param(path, leaf, model_size: int) -> P:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if (leaf.ndim == 2 and len(names) >= 2 and names[-1] == "kernel"
            and names[-2] in _TP_MODULES
            and leaf.shape[1] % model_size == 0):
        return P(None, "model")  # column-parallel kernel
    return P()


def param_shardings(mesh: Mesh, tree):
    """NamedShardings: replicated by default, wide kernels column-sharded
    over 'model' when divisible (no-op when mesh_model == 1)."""
    model_size = mesh.shape["model"]

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _spec_for_param(path, leaf, model_size))
    return jax.tree_util.tree_map_with_path(to_sharding, tree)


def place_on_mesh(tree, mesh: Mesh):
    """Place a pytree on the mesh with the param sharding rules applied:
    replicated by default, tensor-parallel specs on the wide kernels (NOT
    pure replication when mesh_model > 1)."""
    shardings = param_shardings(mesh, tree)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


# deprecated alias (the old name misstated the contract)
replicate = place_on_mesh
