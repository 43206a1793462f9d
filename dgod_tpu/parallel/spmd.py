"""Explicit-SPMD train step via shard_map.

The default path (train/steps.py under jit + NamedSharding) lets GSPMD
insert one all-reduce per gradient leaf (~300 for ResNet-50-FPN). This
variant maps the step over the mesh explicitly and performs ONE fused
gradient all-reduce on the raveled gradient vector — the classic
small-tensor-batching optimisation, and the shape collective-latency-bound
fabrics (and XLA:CPU's in-process rendezvous) want.

Params/optimizer state are replicated; the batch is sharded over 'data'.
Every replica applies the identical update, keeping replicas bit-consistent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.optim import OptConfig, apply_updates
from ..train.steps import (
    MODE_ACTIVE_GROUPS,
    build_active_mask,
    stop_inactive_grads,
)


def reduce_active_grads(grads, active, scalars=None, axis="data"):
    """ONE fused all-reduce over the mode's ACTIVE grad leaves only.

    Inactive leaves are exactly zero on every replica (stop_inactive_grads)
    and the optimizer's static mask never reads them, so reducing them only
    burns interconnect: mode 2 (ins_cls only) would otherwise ship the whole
    ResNet-50-FPN zero-gradient (~165 MB f32) per step. Returns grads with
    active leaves pmean-ed and inactive leaves passed through.

    `scalars` (optional pytree, e.g. the loss metrics) rides the SAME
    fused all-reduce — one rendezvous per step half instead of two. That
    matters twice: on collective-latency-bound fabrics it halves the
    latency term, and on the virtual-CPU dryrun mesh (n replica threads
    timesharing one core) every rendezvous is a full thread-scheduling
    round. Returns (grads, scalars_pmean) when scalars is given.
    """
    flat_g, treedef = jax.tree.flatten(grads)
    flat_a = jax.tree.leaves(active)
    assert len(flat_g) == len(flat_a)
    active_g = [g for g, a in zip(flat_g, flat_a) if a]
    s_flat, s_def = jax.tree.flatten(scalars if scalars is not None else ())
    vec, unravel = ravel_pytree(
        active_g + [jnp.asarray(s, jnp.float32) for s in s_flat]
    )
    red = unravel(jax.lax.pmean(vec, axis))
    red_g = iter(red[: len(active_g)])
    grads_out = jax.tree.unflatten(
        treedef, [next(red_g) if a else g for g, a in zip(flat_g, flat_a)]
    )
    if scalars is None:
        return grads_out
    return grads_out, jax.tree.unflatten(s_def, red[len(active_g):])


def make_spmd_train_step(
    model,
    mode: int,
    reg_weights,
    opt_config: OptConfig,
    base_lr: float,
    params_template,
    mesh: Mesh,
):
    """jit-compiled step with a single explicit psum over 'data'."""
    labels = model.param_group_labels(params_template)
    active = build_active_mask(labels, mode)
    reg_weights = tuple(float(w) for w in reg_weights)
    try:
        from jax import shard_map as _shard_map  # jax >= 0.6 API
        shard_map = _shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def local_step(params, opt_state, batch, rng, lr_scale):
        def loss_fn(p):
            p = stop_inactive_grads(p, active)
            return model.loss_for_mode(p, batch, rng, mode, reg_weights)

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        metrics = dict(metrics)
        metrics["loss"] = total
        grads, metrics = reduce_active_grads(grads, active, metrics)
        new_params, new_opt = apply_updates(
            params, grads, opt_state, active, base_lr * lr_scale, opt_config
        )
        return new_params, new_opt, metrics

    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_spmd_pair_step(
    model,
    mode_k: int,
    reg_weights,
    opt_config: OptConfig,
    base_lr: float,
    params_template,
    mesh: Mesh,
):
    """Fused DG pair under explicit SPMD: mode-0 then mode-k on the same
    sharded batch, two sequential updates, one fused all-reduce per half
    (the single-chip equivalent is train/steps.py::make_pair_step)."""
    labels = model.param_group_labels(params_template)
    reg_weights = tuple(float(w) for w in reg_weights)
    active_by_mode = {m: build_active_mask(labels, m) for m in (0, mode_k)}
    try:
        from jax import shard_map as _shard_map  # jax >= 0.6 API
        shard_map = _shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def half(params, opt_state, batch, rng, lr, mode):
        def loss_fn(p):
            p = stop_inactive_grads(p, active_by_mode[mode])
            return model.loss_for_mode(p, batch, rng, mode, reg_weights)

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads, total = reduce_active_grads(grads, active_by_mode[mode], total)
        new_params, new_opt = apply_updates(
            params, grads, opt_state, active_by_mode[mode], lr,
            opt_config,
        )
        return new_params, new_opt, total

    def local_step(params, opt_state, batch, rng0, rng1, lr_scale):
        lr = base_lr * lr_scale
        params, opt_state, l0 = half(params, opt_state, batch, rng0, lr, 0)
        params, opt_state, lk = half(params, opt_state, batch, rng1, lr, mode_k)
        return params, opt_state, {"loss0": l0, "loss": lk}

    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_batch_specs(batch):
    return {k: P("data") for k in batch}
