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

import contextlib
import contextvars
import re
from typing import Optional, Tuple

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
    # pre-quantized int8 kernels carry a per-output-channel fp32 scale
    # (ops/quant.py prequantize_dense_kernels): column-parallel layers shard
    # it with their output dim; row-parallel scales stay replicated (their
    # output dim is unsharded), covered by the default P() fallthrough.
    (r".*(q_proj|k_proj|v_proj|fc1|w_1|proj_head_in)/kernel_scale$", P("model")),
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


# --------------------------------------------------------------- kernel mesh
# GSPMD cannot partition a pallas_call: left alone under a sharded jit it
# forces full replication (all-gather of activations) or fails to lower. The
# fix is to run the kernels under an explicit jax.shard_map over the batch
# axis. The mesh is made ambient here (a contextvar set while the train/eval
# step traces) so the kernel dispatchers in ops/pallas can wrap themselves
# without threading a mesh argument through every model layer.
_KERNEL_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "fithubert_kernel_mesh", default=None
)


@contextlib.contextmanager
def use_kernel_mesh(mesh: Optional[Mesh], force: bool = False):
    """Make `mesh` visible to pallas kernel dispatch during tracing. A 1-device
    mesh is treated as None (no wrapping: single-chip HLO stays byte-stable)
    unless `force=True` — which keeps even a 1-device mesh active so the
    shard_map + Mosaic kernel combination can be exercised on a single real
    chip (tests/test_mosaic_mesh_tpu.py; interpret-mode CPU tests cannot
    lower the kernels through Mosaic, and multi-chip hardware is absent)."""
    if (mesh is not None and not force
            and int(np.prod(list(mesh.shape.values()))) <= 1):
        mesh = None
    token = _KERNEL_MESH.set(mesh)
    try:
        yield mesh
    finally:
        _KERNEL_MESH.reset(token)


def current_kernel_mesh() -> Optional[Mesh]:
    return _KERNEL_MESH.get()


def batch_shard_map(fn, x, *consts):
    """Run pure `fn(x, *consts)` under the ambient kernel mesh with x (and
    every output) sharded on the leading/batch dim over 'data' and consts
    replicated. No-op without a mesh or when the batch is ragged.

    Used for ops GSPMD refuses to batch-partition — observed: grouped
    convolutions (the weight-norm pos_conv, feature_group_count > 1) fall
    back to full replication, all-gathering their batch."""
    mesh = _KERNEL_MESH.get()
    if mesh is None or x.shape[0] % mesh.shape.get("data", 1) != 0:
        return fn(x, *consts)
    out_sd = jax.eval_shape(fn, x, *consts)
    bspec = lambda nd: P("data", *([None] * (nd - 1)))
    out_specs = jax.tree.map(lambda s: bspec(len(s.shape)), out_sd)
    in_specs = (bspec(x.ndim),) + tuple(
        jax.tree.map(lambda _: P(), c) for c in consts
    )
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )(x, *consts)


def constrain_batch_sharded(x):
    """Pin an activation's leading dim to the 'data' axis of the ambient
    kernel mesh (no-op without one). GSPMD's propagation can drift to
    full replication inside while/scan bodies (observed: the pos_conv conv
    all-gathering its batch inside the grad-accum scan); an explicit
    with_sharding_constraint at module boundaries keeps activations
    batch-sharded."""
    mesh = _KERNEL_MESH.get()
    if mesh is None or x is None:
        return x
    if x.shape[0] % mesh.shape.get("data", 1) != 0:
        return x
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
