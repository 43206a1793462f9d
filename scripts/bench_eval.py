#!/usr/bin/env python3
"""Eval-path benchmark: per-image inference latency at batch 1 vs batch 8,
plus an end-to-end pipelined validation sweep (device eval_step overlapped
with host-side mAP matching, train/harness.py::Trainer.validate).

Context: the reference evaluates at batch_size=1, fully serial
(/root/reference/DGcommon.py:154-166, train_driving_dg.py:146-147), and a
val sweep gates EVERY epoch (early-stop patience 10 => >= 10 full sweeps
per run), so eval throughput is schedule-critical, not a tail cost.

Usage: python scripts/bench_eval.py [FCOS|FRCNN|both]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

CANVAS = (608, 1216)
N_TIMED = 30
if os.environ.get("DGOD_BENCH_EVAL_SMOKE"):  # tiny-shape CPU dry pass
    CANVAS = (64, 128)
    N_TIMED = 2


def make_batch(b, seed=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    boxes = np.zeros((b, 128, 4), np.float32)
    labels = np.zeros((b, 128), np.int32)
    valid = np.zeros((b, 128), bool)
    for i in range(b):
        n = rng.randint(3, 30)
        xy = rng.uniform([0, 0], [1000, 450], (n, 2))
        wh = rng.uniform(20, 150, (n, 2))
        boxes[i, :n] = np.concatenate([xy, xy + wh], 1)
        labels[i, :n] = rng.randint(1, 9, n)
        valid[i, :n] = True
    return {
        "image": rng.randint(0, 255, (b, *CANVAS, 3), np.uint8),
        "boxes": boxes, "labels": labels, "gt_valid": valid,
        "domain": np.zeros(b, np.int32),
        "image_size": np.tile(np.float32((600, 1200)), (b, 1)),
        "scale_back": np.ones((b, 2), np.float32),
    }


def bench_family(family):
    import jax
    import numpy as np

    from dgod_tpu.eval import MeanAveragePrecision
    from dgod_tpu.train.harness import Trainer

    if family == "FCOS":
        from dgod_tpu.models.dg_fcos import DGFCOSModel as Model
    else:
        from dgod_tpu.models.dg_frcnn import DGFRCNNModel as Model

    model = Model(num_classes=9, num_domains=3, canvas=CANVAS)
    params = model.init(jax.random.PRNGKey(0))
    eval_step = jax.jit(model.predict)
    # tunnel-safe sync (dgod_tpu/utils/timing.py): a scalar reduced inside
    # jit and fetched per call is the only reliable completion signal; the
    # fixed per-call round-trip is calibrated and subtracted
    from dgod_tpu.utils.timing import calibrate_roundtrip, time_scalar_fn

    scored = jax.jit(lambda p, bt: model.predict(p, bt)["scores"].sum())
    rt = calibrate_roundtrip()

    batches_env = os.environ.get("DGOD_BENCH_EVAL_BATCHES", "1,8")
    batch_sizes = tuple(int(x) for x in batches_env.split(",") if x)

    out = {}
    for b in batch_sizes:
        batch = jax.device_put(make_batch(b))
        ms = time_scalar_fn(scored, params, batch, n=N_TIMED,
                            roundtrip_ms=rt)
        out[f"batch{b}_ms_per_img"] = ms / b
        print(f"{family} eval batch {b}: {ms:.2f} ms/batch = "
              f"{ms / b:.2f} ms/img ({b * 1e3 / ms:.1f} img/s)")

    # end-to-end pipelined sweep: device eval overlapped with host mAP
    # matching (Trainer.validate's one-batch pipeline)
    n_batches, b = 16, 8
    batches = [jax.device_put(make_batch(b, seed=s)) for s in range(4)]
    loader = [batches[i % 4] for i in range(n_batches)]

    import types

    class _T:  # minimal shim with the attrs validate() uses
        pass

    shim = _T()
    shim.params = params
    shim.eval_step = eval_step
    shim.val_loader = loader
    shim.mesh = None
    shim._place_batch = jax.device_put
    shim._mesh_ctx = types.MethodType(Trainer._mesh_ctx, shim)
    shim._metric_update = types.MethodType(Trainer._metric_update, shim)
    shim._local_rows = Trainer._local_rows
    Trainer.validate(shim)  # warm
    t0 = time.perf_counter()
    Trainer.validate(shim)
    dt = time.perf_counter() - t0
    ips = n_batches * b / dt
    out["pipelined_sweep_img_per_sec"] = ips
    print(f"{family} pipelined eval sweep (batch {b}, {n_batches} batches, "
          f"incl. host mAP matching): {ips:.1f} img/s")
    return out


def stage_profile(family, b=8):
    """Per-stage attribution of the batch-`b` eval step (VERDICT r4 #6):
    successive-prefix jits, each reduced to one scalar on-device, timed
    tunnel-safely; stage cost = delta between consecutive prefixes. Also
    times the host device_get of the detection tree (the only non-jit part
    of Trainer.validate's per-batch work besides numpy mAP matching)."""
    import jax
    import jax.numpy as jnp

    from dgod_tpu.utils.timing import calibrate_roundtrip, time_scalar_fn

    if family == "FCOS":
        from dgod_tpu.models.dg_fcos import DGFCOSModel as Model
    else:
        from dgod_tpu.models.dg_frcnn import DGFRCNNModel as Model

    model = Model(num_classes=9, num_domains=3, canvas=CANVAS)
    params = model.init(jax.random.PRNGKey(0))
    batch = jax.device_put(make_batch(b))
    rt = calibrate_roundtrip()

    def tree_sum(x):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(x))

    if family == "FRCNN":
        det = model.detector

        def s_feats(p, bt):
            feats, _ = det.features(p["detector"], model.normalize(bt["image"]))
            return tree_sum(feats)

        def s_rpn(p, bt):
            feats, _ = det.features(p["detector"], model.normalize(bt["image"]))
            obj, dl = det.rpn_forward(p["detector"], feats)
            return tree_sum(obj) + tree_sum(dl)

        def s_props(p, bt):
            feats, _ = det.features(p["detector"], model.normalize(bt["image"]))
            obj, dl = det.rpn_forward(p["detector"], feats)
            props, pv, _ = det.generate_proposals(
                obj, dl, bt["image_size"], training=False)
            return jnp.sum(props) + jnp.sum(pv)

        def s_roi(p, bt):
            feats, _ = det.features(p["detector"], model.normalize(bt["image"]))
            obj, dl = det.rpn_forward(p["detector"], feats)
            props, pv, _ = det.generate_proposals(
                obj, dl, bt["image_size"], training=False)
            bf = det.box_features(p["detector"], feats, props)
            return tree_sum(bf)

        def s_pred(p, bt):
            feats, _ = det.features(p["detector"], model.normalize(bt["image"]))
            obj, dl = det.rpn_forward(p["detector"], feats)
            props, pv, _ = det.generate_proposals(
                obj, dl, bt["image_size"], training=False)
            bf = det.box_features(p["detector"], feats, props)
            logits, regs = det.box_predictions(p["detector"], bf)
            return tree_sum(logits) + tree_sum(regs)

        stages = [("backbone+FPN", s_feats), ("+rpn heads", s_rpn),
                  ("+proposal decode/NMS", s_props), ("+RoIAlign", s_roi),
                  ("+box head", s_pred)]
    else:
        def s_fwd(p, bt):
            outputs, _ = model.forward(p, bt["image"])
            return tree_sum(outputs)

        stages = [("backbone+FPN+heads", s_fwd)]

    def s_full(p, bt):
        return jnp.sum(model.predict(p, bt)["scores"])

    stages.append(("+postprocess (full predict)", s_full))

    prev = 0.0
    print(f"--- {family} eval stage profile, batch {b} ({CANVAS}) ---")
    for name, fn in stages:
        ms = time_scalar_fn(jax.jit(fn), params, batch, n=N_TIMED,
                            roundtrip_ms=rt)
        print(f"{name:28s} cum {ms:7.2f} ms  stage {ms - prev:7.2f} ms "
              f"({(ms - prev) / b:5.2f} ms/img)")
        prev = ms

    # host transfer of the detection tree (per batch)
    eval_step = jax.jit(model.predict)
    dets = eval_step(params, batch)
    jax.device_get({k: dets[k] for k in ("boxes", "scores", "labels", "valid")})
    t0 = time.perf_counter()
    for _ in range(N_TIMED):
        dets = eval_step(params, batch)
        jax.device_get(
            {k: dets[k] for k in ("boxes", "scores", "labels", "valid")})
    full_ms = (time.perf_counter() - t0) / N_TIMED * 1e3
    print(f"{'full + device_get':28s} cum {full_ms:7.2f} ms  "
          f"transfer+sync {full_ms - prev:7.2f} ms")


def main():
    import jax

    # same backend gate as bench.py: these numbers land in BASELINE.md, so
    # a shell without the TPU backend must not silently record CPU timings.
    # Smoke mode is explicitly a CPU dry pass and implies the opt-in.
    backend = jax.default_backend()
    if backend != "tpu" and not (
        os.environ.get("DGOD_BENCH_ALLOW_CPU") == "1"
        or os.environ.get("DGOD_BENCH_EVAL_SMOKE")
    ):
        print(f"bench_eval: backend is '{backend}', not TPU — refusing to "
              "record non-TPU eval numbers (set DGOD_BENCH_ALLOW_CPU=1 or "
              "DGOD_BENCH_EVAL_SMOKE=1 to override)", file=sys.stderr)
        sys.exit(1)

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    args = sys.argv[1:]
    do_stages = "stages" in args
    args = [a for a in args if a != "stages"]
    kind = args[0] if args else "both"
    fams = ("FCOS", "FRCNN") if kind == "both" else (kind,)
    for fam in fams:
        if do_stages:
            stage_profile(fam)
        else:
            bench_family(fam)


if __name__ == "__main__":
    main()
