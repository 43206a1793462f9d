#!/usr/bin/env python3
"""A/B XLA:TPU compiler options on the FRCNN mode-0 chained train step.

XLA_FLAGS cannot carry TPU-side flags on this host (the local CPU client's
flag parser aborts on unknown flags before the tunnel backend ever sees
them), but `lowered.compile(compiler_options=...)` ships options to the
backend compiler directly — verified accepted through the axon tunnel.

Times K=4 chained optimizer steps (loss sum carried through the fori_loop
so nothing dead-code-eliminates; scalar fetched per call = tunnel-safe
sync, same methodology as scripts/profile_frcnn.py). Baseline is timed
first AND last to expose tunnel drift. Unknown/rejected options are
reported, not fatal.

Usage:  python scripts/tune_xla_options.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dgod_tpu.models.dg_frcnn import DGFRCNNModel  # noqa: E402
from dgod_tpu.train import steps as step_lib  # noqa: E402
from dgod_tpu.train.optim import init_opt_state  # noqa: E402
from dgod_tpu.utils.timing import time_scalar_fn  # noqa: E402

K = 4

CONFIGS = [
    ("baseline", None),
    ("scoped_vmem_64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem_96M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("latency_hiding_sched",
     {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("baseline (re-run, drift check)", None),
]


def main():
    B, CANVAS = 8, (608, 1216)
    rng = np.random.RandomState(0)
    boxes = np.zeros((B, 128, 4), np.float32)
    labels = np.zeros((B, 128), np.int32)
    valid = np.zeros((B, 128), bool)
    for i in range(B):
        n = rng.randint(3, 30)
        xy = rng.uniform([0, 0], [1000, 450], (n, 2))
        wh = rng.uniform(20, 150, (n, 2))
        boxes[i, :n] = np.concatenate([xy, xy + wh], 1)
        labels[i, :n] = rng.randint(1, 9, n)
        valid[i, :n] = True
    batch = jax.device_put({
        "image": rng.randint(0, 255, (B, *CANVAS, 3), np.uint8),
        "boxes": boxes, "labels": labels, "gt_valid": valid,
        "domain": (np.arange(B) % 3).astype(np.int32),
        "image_size": np.tile(np.float32((600, 1200)), (B, 1)),
        "scale_back": np.ones((B, 2), np.float32),
    })

    model = DGFRCNNModel(num_classes=9, num_domains=3, canvas=CANVAS)
    params = model.init(jax.random.PRNGKey(0))
    opt_config, base_lr = step_lib.make_optimizer("FRCNN")
    opt_state = init_opt_state(params, opt_config)
    key = jax.random.PRNGKey(1)
    reg = (0.5, 0.5, 0.5, 0.05, 1e-4)
    step = step_lib.make_train_step(
        model, 0, reg, opt_config, base_lr, params, donate=False)

    def loop(p, o, b, k):
        def body(i, carry):
            p, o, acc = carry
            p, o, m = step(p, o, b, jax.random.fold_in(k, i), 1.0)
            return (p, o, acc + sum(
                v.astype(jnp.float32).sum()
                for v in jax.tree_util.tree_leaves(m)))
        p, o, acc = jax.lax.fori_loop(0, K, body, (p, o, jnp.float32(0)))
        return acc

    lowered = jax.jit(loop).lower(params, opt_state, batch, key)

    for name, opts in CONFIGS:
        try:
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
        except Exception as e:  # unknown option etc. — report, keep going
            print(f"{name:34s} REJECTED: {type(e).__name__} {str(e)[:120]}",
                  flush=True)
            continue
        # round-trip is NOT subtracted here (it is amortised over K chained
        # steps and identical across configs, so the A/B is unaffected)
        ms = time_scalar_fn(compiled, params, opt_state, batch, key,
                            n=3, roundtrip_ms=0.0) / K
        print(f"{name:34s} {ms:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
