"""Jit-compiled train/eval steps — one compiled variant per DG mode.

The reference's training_step is a host-side 5-way branch with hook state
(DGFRCNN.py:111-201, DGFCOS.py:155-241); here every mode is a pure function
`(params, opt_state, batch, rng, lr_scale) -> (params, opt_state, metrics)`
compiled once. The optimizer participation mask per mode is *static*
(train/optim.py), matching torch's grad-is-None skip semantics exactly.

`ModeScheduler` reproduces the mode/sub_mode state machine
(DGFRCNN.py:128-143): in 'dg' mode the step sequence over duplicated
batches is 0,1,0,2,0,3,0,4 repeating; in 'non_dg' it is always 0.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from .optim import OptConfig, apply_updates, init_opt_state

MODE_ACTIVE_GROUPS = {
    0: ("detector",),
    1: ("detector", "image_da", "ins_da"),
    2: ("ins_cls",),
    3: ("detector", "ins_cls_prime"),
    4: ("detector",),
}


class ModeScheduler:
    """Host-side replica of the reference mode/sub_mode machine."""

    def __init__(self, dg: bool):
        self.dg = dg
        self._cycle = (0, 1, 0, 2, 0, 3, 0, 4)
        self._i = 0

    def next_mode(self) -> int:
        if not self.dg:
            return 0
        mode = self._cycle[self._i]
        self._i = (self._i + 1) % len(self._cycle)
        return mode

    def reset(self):
        self._i = 0


def build_active_mask(labels, mode: int):
    """Static pytree of python bools from group labels."""
    active_groups = MODE_ACTIVE_GROUPS[mode]
    return jax.tree.map(lambda lbl: lbl in active_groups, labels)


def stop_inactive_grads(params, active):
    """stop_gradient on every param leaf outside the mode's active groups.

    In the single-device jit path this is belt-and-braces: apply_updates'
    static mask already leaves inactive grads unused, and XLA dead-code
    eliminates their backward (verified on-chip: identical throughput
    either way). In the explicit-SPMD path (parallel/spmd.py) it is a real
    pruning win: the single fused all-reduce ravels EVERY grad leaf, which
    otherwise keeps the frozen backward alive — all FrozenBatchNorm
    per-channel stat reductions over [B,H,W,C] activations, the frozen
    conv1/layer1 weight+data grads, and the stem maxpool backward (~25 ms
    of ResNet-50 fwd+bwd at 608x1216 batch 8 on v5e). The reference never
    computes these either (requires_grad=False via
    trainable_backbone_layers=3, reference fasterrcnn.py:317).

    Gradients still FLOW THROUGH frozen layers' activations where needed;
    only the paths into the stopped param leaves (and any backward subgraph
    feeding nothing else, e.g. everything below layer2's input) get pruned.
    """
    return jax.tree.map(
        lambda p, a: p if a else jax.lax.stop_gradient(p), params, active
    )


def make_train_step(
    model,
    mode: int,
    reg_weights: Sequence[float],
    opt_config: OptConfig,
    base_lr: float,
    params_template,
    donate: bool = True,
):
    """Returns jitted step(params, opt_state, batch, rng, lr_scale)."""
    labels = model.param_group_labels(params_template)
    active = build_active_mask(labels, mode)
    reg_weights = tuple(float(w) for w in reg_weights)

    def step(params, opt_state, batch, rng, lr_scale):
        def loss_fn(p):
            p = stop_inactive_grads(p, active)
            return model.loss_for_mode(p, batch, rng, mode, reg_weights)

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_opt = apply_updates(
            params, grads, opt_state, active, base_lr * lr_scale, opt_config
        )
        metrics = dict(metrics)
        metrics["loss"] = total
        return new_params, new_opt, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_pair_step(
    model,
    mode_k: int,
    reg_weights: Sequence[float],
    opt_config: OptConfig,
    base_lr: float,
    params_template,
    donate: bool = True,
):
    """Fused DG pair: mode-0 update then mode-k update on the SAME batch,
    compiled as ONE program.

    Semantically identical to two sequential make_train_step calls (the
    reference replays each batch for the mode pair, DGcommon.py:139-151 +
    DGFRCNN.py:128-143): the mode-k pass sees the mode-0-updated params.
    Saves one dispatch per pair and — the structural win — the host decodes
    and transfers each batch ONCE instead of twice.

    Returns jitted step(params, opt_state, batch, rng0, rng1, lr_scale)
    -> (params, opt_state, metrics) with metrics from both halves.
    """
    labels = model.param_group_labels(params_template)
    reg_weights = tuple(float(w) for w in reg_weights)
    active_by_mode = {m: build_active_mask(labels, m) for m in (0, mode_k)}

    def half(params, opt_state, batch, rng, lr, mode):
        def loss_fn(p):
            p = stop_inactive_grads(p, active_by_mode[mode])
            return model.loss_for_mode(p, batch, rng, mode, reg_weights)

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_opt = apply_updates(
            params, grads, opt_state, active_by_mode[mode], lr, opt_config
        )
        metrics = dict(metrics)
        metrics["loss"] = total
        return new_params, new_opt, metrics

    def step(params, opt_state, batch, rng0, rng1, lr_scale):
        lr = base_lr * lr_scale
        params, opt_state, m0 = half(params, opt_state, batch, rng0, lr, 0)
        params, opt_state, mk = half(params, opt_state, batch, rng1, lr, mode_k)
        metrics = {f"m0/{k}": v for k, v in m0.items()}
        metrics.update({f"m{mode_k}/{k}": v for k, v in mk.items()})
        metrics["loss"] = mk["loss"]
        metrics["loss0"] = m0["loss"]
        return params, opt_state, metrics

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(model):
    def step(params, batch):
        return model.predict(params, batch)

    return jax.jit(step)


def make_optimizer(model_name: str) -> tuple[OptConfig, float]:
    """Reference hyperparams: FRCNN SGD(2e-3, wd 5e-4) (DGFRCNN.py:85-86),
    FCOS Adam(1e-4, wd 1e-4) (DGFCOS.py:123-124)."""
    if model_name == "FRCNN":
        return OptConfig("sgd", weight_decay=5e-4), 2e-3
    if model_name == "FCOS":
        return OptConfig("adam", weight_decay=1e-4), 1e-4
    raise ValueError(model_name)
