#!/usr/bin/env python3
"""Detailed benchmark: per-mode step times and eval latency for both
detectors at the working resolution. (The headline single-line benchmark is
bench.py; this is the engineering view.)

Usage: python scripts/bench_detail.py [FCOS|FRCNN]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    import jax
    import numpy as np

    from dgod_tpu.train import steps as step_lib
    from dgod_tpu.train.optim import init_opt_state

    kind = sys.argv[1] if len(sys.argv) > 1 else "FCOS"
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
    batch = {
        "image": rng.randint(0, 255, (B, *CANVAS, 3), np.uint8),
        "boxes": boxes, "labels": labels, "gt_valid": valid,
        "domain": (np.arange(B) % 3).astype(np.int32),
        "image_size": np.tile(np.float32((600, 1200)), (B, 1)),
        "scale_back": np.ones((B, 2), np.float32),
    }
    batch = jax.device_put(batch)

    if kind == "FCOS":
        from dgod_tpu.models.dg_fcos import DGFCOSModel

        model = DGFCOSModel(num_classes=9, num_domains=3, canvas=CANVAS)
    else:
        from dgod_tpu.models.dg_frcnn import DGFRCNNModel

        model = DGFRCNNModel(num_classes=9, num_domains=3, canvas=CANVAS)

    params = model.init(jax.random.PRNGKey(0))
    opt_config, base_lr = step_lib.make_optimizer(model.name)
    opt_state = init_opt_state(params, opt_config)
    key = jax.random.PRNGKey(1)
    reg = (0.5, 0.5, 0.5, 0.05, 1e-4)

    cycle_ms = 0.0
    for mode in (0, 1, 2, 3, 4):
        step = step_lib.make_train_step(
            model, mode, reg, opt_config, base_lr, params, donate=False
        )
        t0 = time.perf_counter()
        out = step(params, opt_state, batch, key, 1.0)
        jax.block_until_ready(out[2]["loss"])
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(5):
            out = step(params, opt_state, batch, key, 1.0)
        jax.block_until_ready(out[2]["loss"])
        ms = (time.perf_counter() - t0) / 5 * 1000
        cycle_ms += ms * (4 if mode == 0 else 1)
        print(f"{kind} mode{mode}: {ms:.1f} ms/step (compile {compile_t:.0f}s)",
              flush=True)
    print(f"{kind} dg cycle: {cycle_ms:.0f} ms / 64 images "
          f"= {64 / cycle_ms * 1000:.1f} img/s", flush=True)

    ebatch = {k: v[:1] for k, v in batch.items()}
    ev = step_lib.make_eval_step(model)
    d = ev(params, ebatch)
    jax.block_until_ready(d["boxes"])
    t0 = time.perf_counter()
    for _ in range(10):
        d = ev(params, ebatch)
    jax.block_until_ready(d["boxes"])
    print(f"{kind} eval b1: {(time.perf_counter() - t0) / 10 * 1000:.1f} ms/img",
          flush=True)


if __name__ == "__main__":
    main()
