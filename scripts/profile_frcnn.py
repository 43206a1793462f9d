#!/usr/bin/env python3
"""Piecewise FRCNN mode-0 profile on the default backend (TPU).

Times each stage as its own jitted program (stage boundaries force
materialisation, so the sum exceeds the fused step time — use for
RELATIVE attribution):
  backbone fwd | rpn head | proposals (decode+NMS+topk) | roi_align fwd |
  box head+predictor | full loss fwd | full fwd+bwd | mode-0 step
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

from dgod_tpu.models.dg_frcnn import DGFRCNNModel  # noqa: E402
from dgod_tpu.train import steps as step_lib  # noqa: E402
from dgod_tpu.train.optim import init_opt_state  # noqa: E402


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {ms:8.2f} ms", flush=True)
    return out


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
    det = model.detector
    params = model.init(jax.random.PRNGKey(0))
    dp = params["detector"]
    opt_config, base_lr = step_lib.make_optimizer("FRCNN")
    opt_state = init_opt_state(params, opt_config)
    key = jax.random.PRNGKey(1)
    reg = (0.5, 0.5, 0.5, 0.05, 1e-4)

    img = model.normalize(batch["image"]) if hasattr(model, "normalize") \
        else batch["image"].astype(np.float32)

    feats_fn = jax.jit(lambda p, x: det.features(p, x)[0])
    feats = timeit("backbone+fpn fwd", feats_fn, dp, img)

    rpn_fn = jax.jit(lambda p, f: det.rpn_forward(p, f))
    obj, deltas = timeit("rpn head fwd", rpn_fn, dp, feats)

    prop_fn = jax.jit(lambda o, d, s: det.generate_proposals(o, d, s, True))
    props = timeit("proposals (decode+NMS+topk)", prop_fn, obj, deltas,
                   batch["image_size"])

    roi_fn = jax.jit(lambda f, r: det.roi_align(f, r))
    timeit("roi_align fwd (2000 rois)", roi_fn, feats, props[0])

    def loss_only(p, b, k):
        return model.loss_for_mode(p, b, k, 0, reg)[0]

    timeit("mode0 loss fwd", jax.jit(loss_only), params, batch, key)
    timeit("mode0 fwd+bwd",
           jax.jit(lambda p, b, k: jax.grad(loss_only)(p, b, k)),
           params, batch, key)

    step = step_lib.make_train_step(model, 0, reg, opt_config, base_lr,
                                    params, donate=False)
    timeit("mode0 full step", lambda *a: step(*a)[2]["loss"],
           params, opt_state, batch, key, 1.0)


if __name__ == "__main__":
    main()
