"""Optimizers with static per-mode participation masks.

The reference's 5-mode schedule gives each step a different set of
participating param groups (torch skips params whose grad is None — no
momentum/weight-decay update for them). We reproduce that exactly: every
mode compiles its own step with a *static* active-mask pytree, and the
update rule only touches active leaves — including Adam moment/step-count
state, which in torch only advances for params that received a grad.

Rules match torch:
- SGD: p -= lr * (g + wd * p)   (coupled L2; the reference constructs
  torch.optim.SGD with no momentum arg -> momentum=0, DGFRCNN.py:99-104)
- Adam: coupled L2 (g += wd * p), b1=0.9 b2=0.999 eps=1e-8, bias correction
  with a per-leaf step count (DGFCOS.py:143-148).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class OptConfig(NamedTuple):
    kind: str  # 'sgd' | 'adam'
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


def init_opt_state(params, config: OptConfig):
    if config.kind == "sgd":
        return {}
    zeros = jax.tree.map(jnp.zeros_like, params)
    counts = jax.tree.map(lambda p: jnp.zeros((), jnp.int32), params)
    return {"mu": zeros, "nu": jax.tree.map(jnp.zeros_like, params), "count": counts}


def apply_updates(params, grads, opt_state, active, lr, config: OptConfig):
    """One optimizer step. `active` is a pytree of *python bools* (static),
    aligned with params. Returns (new_params, new_opt_state)."""

    if config.kind == "sgd":

        def upd(p, g, a):
            if not a:
                return p
            return p - lr * (g + config.weight_decay * p)

        new_params = jax.tree.map(upd, params, grads, active)
        return new_params, opt_state

    mu, nu, count = opt_state["mu"], opt_state["nu"], opt_state["count"]

    def upd(p, g, m, v, c, a):
        if not a:
            return p, m, v, c
        g = g + config.weight_decay * p
        c = c + 1
        m = config.b1 * m + (1 - config.b1) * g
        v = config.b2 * v + (1 - config.b2) * (g * g)
        cf = c.astype(p.dtype)
        m_hat = m / (1 - config.b1**cf)
        v_hat = v / (1 - config.b2**cf)
        return p - lr * m_hat / (jnp.sqrt(v_hat) + config.eps), m, v, c

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(mu)
    flat_v = treedef.flatten_up_to(nu)
    flat_c = treedef.flatten_up_to(count)
    flat_a = treedef.flatten_up_to(active)
    out = [upd(*args) for args in zip(flat_p, flat_g, flat_m, flat_v, flat_c, flat_a)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_state = {
        "mu": treedef.unflatten([o[1] for o in out]),
        "nu": treedef.unflatten([o[2] for o in out]),
        "count": treedef.unflatten([o[3] for o in out]),
    }
    return new_params, new_state


class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics: mode max, factor 0.1,
    patience 5, threshold 1e-4 rel; reference DGFRCNN.py:105, DGFCOS.py:149)."""

    def __init__(self, factor=0.1, patience=5, threshold=1e-4, min_lr=0.0):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = -float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def is_better(self, metric):
        if self.best == -float("inf"):
            return True
        if self.best > 0:
            return metric > self.best * (1.0 + self.threshold)
        return metric > self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        """Feed the epoch metric; returns the current lr scale."""
        if self.is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_lr)
                self.num_bad = 0
        return self.scale


class EarlyStopping:
    """Max-mode early stopping (patience 10, min_delta 0;
    train_driving_dg.py:160)."""

    def __init__(self, patience=10, min_delta=0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = -float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> bool:
        """Returns True if training should stop."""
        if metric > self.best + self.min_delta:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        return self.num_bad >= self.patience
