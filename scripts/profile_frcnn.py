#!/usr/bin/env python3
"""Piecewise FRCNN mode-0 profile on the default backend (TPU).

Measurement notes for the axon tunnel backend:
- `jax.block_until_ready` returns before remote execution completes, so
  every timing here reduces to a scalar inside jit and fetches it
  (device->host of a scalar is the only reliable sync).
- Each synced call pays a fixed ~26 ms tunnel round-trip; it is measured
  first and subtracted.
- Hot stages additionally run K iterations inside one jit (lax.fori_loop
  with data dependency) to amortise any residual per-call cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dgod_tpu.models.dg_frcnn import DGFRCNNModel  # noqa: E402
from dgod_tpu.train import steps as step_lib  # noqa: E402
from dgod_tpu.train.optim import init_opt_state  # noqa: E402
from dgod_tpu.utils import flops as flops_lib  # noqa: E402
from dgod_tpu.utils.timing import (  # noqa: E402
    calibrate_roundtrip, time_scalar_fn)

_RT = None  # calibrated per-call round-trip (ms)


def _scalarize(x):
    return sum(
        v.astype(jnp.float32).sum() for v in jax.tree_util.tree_leaves(x)
    )


def calibrate():
    global _RT
    _RT = calibrate_roundtrip()
    print(f"{'tunnel round-trip (subtracted)':34s} {_RT:8.2f} ms", flush=True)


def _mfu_suffix(ms, gflops):
    """Achieved TF/s + MFU column when the segment's analytic conv/matmul
    FLOPs are known (utils/flops.py)."""
    if not gflops:
        return ""
    tfs = gflops / ms  # GF / ms == TF/s
    return (f"  {gflops:8.1f} GF  {tfs:6.1f} TF/s  "
            f"mfu {tfs * 1e12 / flops_lib.V5E_BF16_PEAK_FLOPS:5.1%}")


def timeit(name, fn, *args, n=10, gflops=None):
    """fn must return something scalarizable; fetches to force sync."""
    wrapped = jax.jit(lambda *a: _scalarize(fn(*a)))
    ms = time_scalar_fn(wrapped, *args, n=n, roundtrip_ms=_RT)
    print(f"{name:34s} {ms:8.2f} ms{_mfu_suffix(ms, gflops)}", flush=True)


def main():
    B, CANVAS = 8, (608, 1216)
    if os.environ.get("DGOD_PROFILE_SMOKE"):  # tiny-shape CPU dry pass
        B, CANVAS = 2, (64, 128)
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

    calibrate()

    img = model.normalize(batch["image"])

    # analytic FLOPs for the MFU column (per batch, in GF)
    fw = flops_lib.family_forward_flops("FRCNN", CANVAS)
    trunk_gf = (fw["frozen"] + fw["trunk"]) * B / 1e9
    cyc = flops_lib.cycle_flops("FRCNN", CANVAS, B)
    mode0_gf = cyc["per_mode_per_image"][0] * B / 1e9

    timeit("backbone+fpn fwd", lambda p, x: det.features(p, x)[0], dp, img,
           gflops=trunk_gf)

    feats = jax.jit(lambda p, x: det.features(p, x)[0])(dp, img)
    timeit("rpn head fwd", lambda p, f: det.rpn_forward(p, f), dp, feats)
    obj, deltas = jax.jit(lambda p, f: det.rpn_forward(p, f))(dp, feats)

    timeit("proposals (decode+NMS+topk)",
           lambda o, d, s: det.generate_proposals(o, d, s, True),
           obj, deltas, batch["image_size"])
    props = jax.jit(
        lambda o, d, s: det.generate_proposals(o, d, s, True)
    )(obj, deltas, batch["image_size"])

    timeit("roi_align fwd (2000 rois)",
           lambda f, r: det.roi_align(f, r), feats, props[0])
    timeit("roi_align fwd (512 rois)",
           lambda f, r: det.roi_align(f, r), feats, props[0][:, :512])

    # loss-forward segments (attribute the residual between the stage sums
    # and the measured whole): RPN loss incl. the anchor matcher + sampler;
    # RoI sampling; box head; predictor+roi loss; and the RoIAlign
    # fwd+bwd pair at the train RoI count
    timeit("rpn loss (matcher+sample+loss)",
           lambda o, d, gb, gv, k: det.rpn_loss(o, d, gb, gv, k),
           obj, deltas, batch["boxes"], batch["gt_valid"], key)
    timeit("select_training_samples",
           lambda pr, pv, gb, gl, gv, k: det.select_training_samples(
               pr, pv, gb, gl, gv, k),
           props[0], props[1], batch["boxes"], batch["labels"],
           batch["gt_valid"], key)
    samp = jax.jit(
        lambda pr, pv, gb, gl, gv, k: det.select_training_samples(
            pr, pv, gb, gl, gv, k)
    )(props[0], props[1], batch["boxes"], batch["labels"],
      batch["gt_valid"], key)
    rois512 = samp[0]
    pooled = jax.jit(lambda f, r: det.roi_align(f, r))(feats, rois512)
    timeit("box head fwd (512 rois, pooled)",
           lambda p, x: det.box_head.apply({"params": p["box_head"]}, x),
           dp, pooled,
           gflops=(flops_lib.dense_flops(512, 7 * 7 * 256, 1024)
                   + flops_lib.dense_flops(512, 1024, 1024)) * B / 1e9)
    bf = jax.jit(
        lambda p, x: det.box_head.apply({"params": p["box_head"]}, x)
    )(dp, pooled)
    timeit("predictor+roi loss",
           lambda p, x: det.roi_loss(
               *det.box_predictions(p, x), samp[1], samp[2], samp[3]),
           dp, bf)

    def ra_step(f, r, g):
        out, vjp = jax.vjp(lambda fs: det.roi_align(fs, r), f)
        return vjp(g)

    g512 = jnp.ones((B, 512, 7, 7, 256), jnp.float32)
    timeit("roi_align fwd+bwd (512 rois)",
           ra_step, list(feats), rois512, g512, n=5)

    def loss_only(p, b, k):
        return model.loss_for_mode(p, b, k, 0, reg)[0]

    fwd_gf = (fw["frozen"] + fw["trunk"] + fw["head"]) * B / 1e9
    timeit("mode0 loss fwd", loss_only, params, batch, key, gflops=fwd_gf)
    timeit("mode0 fwd+bwd",
           lambda p, b, k: jax.grad(loss_only)(p, b, k),
           params, batch, key, n=5, gflops=mode0_gf)

    if os.environ.get("DGOD_PROFILE_SMOKE"):
        return  # stage smoke only; the chained-step loops are chip-sized

    # K chained optimizer steps inside ONE jit: the true steady-state cost
    K = 4
    for mode_k in (None, 1, 2, 3, 4):
        if mode_k is None:
            step = step_lib.make_train_step(
                model, 0, reg, opt_config, base_lr, params, donate=False)

            def loop(p, o, b, k):
                # carry the loss sum through the loop: returning a single
                # param leaf lets XLA DCE every step whose first leaf is a
                # FROZEN param (identity update under freeze-pruning)
                def body(i, carry):
                    p, o, acc = carry
                    p, o, m = step(p, o, b, jax.random.fold_in(k, i), 1.0)
                    return (p, o, acc + _scalarize(m))
                p, o, acc = jax.lax.fori_loop(
                    0, K, body, (p, o, jnp.float32(0)))
                return acc

            name = f"mode0 step (x{K} chained)"
        else:
            pair = step_lib.make_pair_step(
                model, mode_k, reg, opt_config, base_lr, params,
                donate=False)

            def loop(p, o, b, k, pair=pair):
                def body(i, carry):
                    p, o, acc = carry
                    p, o, m = pair(p, o, b, jax.random.fold_in(k, i),
                                   jax.random.fold_in(k, i + 99), 1.0)
                    return (p, o, acc + _scalarize(m))
                p, o, acc = jax.lax.fori_loop(
                    0, K, body, (p, o, jnp.float32(0)))
                return acc

            name = f"fused pair (0+{mode_k}) (x{K} chained)"

        pm = cyc["per_mode_per_image"]
        gf = (pm[0] + (pm[mode_k] if mode_k else 0)) * B / 1e9
        wrapped = jax.jit(lambda p, o, b, k, loop=loop:
                          _scalarize(loop(p, o, b, k)))
        float(wrapped(params, opt_state, batch, key))
        t0 = time.perf_counter()
        for _ in range(3):
            float(wrapped(params, opt_state, batch, key))
        ms = ((time.perf_counter() - t0) / 3 * 1000 - _RT) / K
        print(f"{name:34s} {ms:8.2f} ms{_mfu_suffix(ms, gf)}", flush=True)


if __name__ == "__main__":
    main()
