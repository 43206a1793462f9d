"""Device mesh + sharding rules.

The reference is single-GPU with hard-coded `.cuda()` (SURVEY.md §2c;
train_driving_dg.py:163). Here scale-out is first-class:

- mesh axes ('data', 'model'): batch dim sharded over 'data' (gradient
  all-reduce rides ICI inside the compiled step via GSPMD), wide head/box
  layers sharded over 'model' (tensor parallelism). Pipeline/sequence/expert
  parallelism are N/A for a ~40M-param CNN detector (no layer pipeline depth
  worth the bubbles, no sequence axis, no experts) — documented decision,
  mirroring SURVEY.md §2c.
- `shard_params` returns NamedShardings: replicated by default, last-axis
  'model' sharding for the detector head MLP/conv kernels listed in
  TP_PATTERNS.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param path substrings whose kernels get last-dim tensor parallelism
TP_PATTERNS = ("box_head", "fc6", "fc7", "cls_conv", "reg_conv")


def make_mesh(devices: Optional[Sequence] = None, data: int = None, model: int = 1):
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def parse_mesh_spec(spec: str, devices: Optional[Sequence] = None) -> Mesh:
    """CLI `--mesh` spec -> Mesh.

    Forms: 'auto' (all devices, pure data parallelism), 'data=N',
    'data=N,model=M', 'model=M' (data inferred as n_devices/M). Uses the
    first data*model devices, so 'data=2' works on an 8-device host (e.g.
    the virtual-CPU test mesh)."""
    devices = list(devices if devices is not None else jax.devices())
    spec = spec.strip().lower()
    if spec in ("auto", "all", ""):
        return make_mesh(devices)
    data = model = None
    for part in spec.split(","):
        key, _, val = part.partition("=")
        key = key.strip()
        if key not in ("data", "model") or not val.strip().isdigit():
            raise ValueError(
                f"bad --mesh spec {spec!r}: expected 'auto' or "
                "'data=N[,model=M]'")
        if key == "data":
            data = int(val)
        else:
            model = int(val)
    model = model or 1
    if data is None:
        data = len(devices) // model
    need = data * model
    if need > len(devices):
        raise ValueError(
            f"--mesh {spec!r} needs {need} devices, have {len(devices)}")
    return make_mesh(devices[:need], data=data, model=model)


def _path_str(path):
    return "/".join(str(getattr(p, "key", p)) for p in path)


def param_sharding(mesh: Mesh, params, tensor_parallel: bool = True):
    """NamedSharding tree: TP on selected kernels, replicated otherwise."""

    def spec(path, leaf):
        name = _path_str(path)
        if (
            tensor_parallel
            and mesh.shape["model"] > 1
            and any(pat in name for pat in TP_PATTERNS)
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[-1] % mesh.shape["model"] == 0
        ):
            return NamedSharding(
                mesh, P(*([None] * (leaf.ndim - 1) + ["model"]))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh, batch):
    """Shard every batch leaf on its leading (batch) dim over 'data'."""

    def spec(leaf):
        return NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1))))

    return jax.tree.map(spec, batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def place(tree, shardings):
    return jax.tree.map(jax.device_put, tree, shardings)
