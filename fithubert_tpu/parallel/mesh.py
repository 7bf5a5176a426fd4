"""Device mesh + sharding rules.

The reference scales with Lightning DDP over NCCL (reference train.py:492-501,
SURVEY.md §2.y). TPU-native equivalent: a ('data', 'model') mesh; batches are
sharded on 'data', parameters are replicated (pure DP) or, when the mesh has a
nontrivial 'model' axis, the big matmul weights (attention projections, FFN)
are sharded on 'model' (tensor parallelism as headroom — XLA inserts the
all-reduces over ICI from the shardings alone; there is no explicit collective
code here, per the scaling-book recipe: pick a mesh, annotate, let XLA work).
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int = 0, model_axis: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'model') mesh over the local devices."""
    devices = devices if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter-name → PartitionSpec rules for the 'model' axis. Matmul weights
# are 2-D (in, out) in flax; shard the dimension that keeps the matmul local
# (Megatron layout: qkv/fc1 column-parallel on out, out_proj/fc2 row-parallel
# on in).
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(q_proj|k_proj|v_proj|fc1|w_1|proj_head_in)/kernel$", P(None, "model")),
    (r".*(out_proj|fc2|w_2)/kernel$", P("model", None)),
    (r".*(q_proj|k_proj|v_proj|fc1|w_1|proj_head_in)/bias$", P("model")),
)


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """NamedSharding tree for a param pytree: TP rules on the 'model' axis
    when it is nontrivial, otherwise fully replicated."""
    tp = mesh.shape.get("model", 1) > 1

    def spec_for(path: str, leaf) -> NamedSharding:
        if tp:
            for pattern, spec in _TP_RULES:
                if re.match(pattern, path):
                    # only shard when the dimension divides evenly
                    dims = [d for d in spec if d is not None]
                    axis = spec.index(dims[0]) if dims else None
                    if axis is not None and leaf.shape[axis] % mesh.shape["model"] == 0:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        key = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        specs[key] = spec_for(key, leaf)

    def map_fn(path, leaf):
        key = "/".join(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        return specs[key]

    return jax.tree_util.tree_map_with_path(map_fn, params)


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading dim over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
