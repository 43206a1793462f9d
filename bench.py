#!/usr/bin/env python3
"""Benchmark: DG training throughput (images/sec/chip) for BOTH detector
families (FRCNN + FCOS) at the reference's working resolution.

Measures the full 8-step DG mode cycle (0,1,0,2,0,3,0,4 — the schedule of
DGcommon.py:139-151 + DGFRCNN.py:128-143) on synthetic batches at
608x1216 / batch 8, i.e. exactly the per-image work of the reference's
`--exp dg` training loop. The headline value is the MIN over families —
the reference trains FRCNN as its primary experiment (README.md:107-111),
so the weaker family is the honest comparison point.

vs_baseline: the reference publishes no numbers (BASELINE.md) and its
torch/CUDA stack cannot run here, so the denominator is the driver target:
3x an estimated single-A100 reference throughput. The A100 estimate
(REF_A100_IMG_PER_SEC) is ~what a ResNet50-FPN detector DG step sustains
at batch 8 / 600x1200 with the reference's mode-2/3/4 8x sequential
single-image forwards (which roughly halve its average throughput). The
estimate is uncertain by ~2x either way; `baseline_note` in the JSON
carries the caveat and per-family numbers are reported alongside.
vs_baseline = ours / (3 * REF_A100_IMG_PER_SEC); >= 1.0 meets the target.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# How long to keep retrying when the TPU tunnel is down before giving up.
# The tunnel on this host class flaps (see ROUND3.md "Infra outage"); a
# transient outage at measurement time should not null the whole run.
BENCH_WAIT_SECS = float(os.environ.get("DGOD_BENCH_WAIT_SECS", "900"))
BENCH_PROBE_SECS = float(os.environ.get("DGOD_BENCH_PROBE_SECS", "120"))
BENCH_RETRY_SLEEP_SECS = float(os.environ.get("DGOD_BENCH_RETRY_SLEEP_SECS", "60"))


def _backend_probe(timeout_s: float):
    """Try jax.devices() in a thread. Returns 'tpu' (TPU up), 'other'
    (healthy non-TPU backend), False (init raised), or None (hung)."""
    import threading

    result = {}

    def probe():
        try:
            import jax

            devs = jax.devices()
            result["ok"] = (
                "tpu" if any(d.platform == "tpu" for d in devs) else "other"
            )
            result["platform"] = devs[0].platform
        except Exception as e:  # UNAVAILABLE: TPU backend setup error etc.
            print(f"bench: backend init failed: {e}", file=sys.stderr)
            result["ok"] = False

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return result.get("ok"), result.get("platform")


def _wait_for_backend():
    """If the backend is down/hung, re-exec this process until it comes up
    or the deadline (carried across execs via env) expires. A fresh exec is
    required because a failed/hung backend init cannot be retried in-process
    and the axon relay slot is held for the life of the interpreter.

    A HEALTHY non-TPU backend is not a retry case: it means the process
    would silently benchmark CPU/GPU and record that as the round's number.
    Fail fast instead, unless DGOD_BENCH_ALLOW_CPU=1 opts in (smoke runs)."""
    ok, platform = _backend_probe(BENCH_PROBE_SECS)
    if ok == "tpu":
        return
    if ok == "other":
        if os.environ.get("DGOD_BENCH_ALLOW_CPU") == "1":
            print(f"bench: non-TPU backend '{platform}' accepted "
                  "(DGOD_BENCH_ALLOW_CPU=1)", file=sys.stderr)
            return
        print(f"bench: backend is '{platform}', not TPU — refusing to "
              "record a non-TPU benchmark (set DGOD_BENCH_ALLOW_CPU=1 "
              "to override)", file=sys.stderr)
        sys.exit(1)
    deadline = os.environ.get("DGOD_BENCH_DEADLINE")
    now = time.time()
    if deadline is None:
        deadline = now + BENCH_WAIT_SECS
        os.environ["DGOD_BENCH_DEADLINE"] = repr(deadline)
    elif now >= float(deadline):
        print("bench: backend unavailable past deadline; giving up",
              file=sys.stderr)
        sys.exit(1)
    print(f"bench: backend down/hung; retrying in {BENCH_RETRY_SLEEP_SECS:.0f}s "
          f"(deadline in {float(deadline) - now:.0f}s)", file=sys.stderr)
    time.sleep(BENCH_RETRY_SLEEP_SECS)
    os.execv(sys.executable, [sys.executable] + sys.argv)

REF_A100_IMG_PER_SEC = 18.0  # documented estimate, see module docstring
BATCH = 8
CANVAS = (608, 1216)
CYCLE = (0, 1, 0, 2, 0, 3, 0, 4)


def make_batch():
    import jax
    import numpy as np

    rng = np.random.RandomState(0)
    boxes = np.zeros((BATCH, 128, 4), np.float32)
    labels = np.zeros((BATCH, 128), np.int32)
    valid = np.zeros((BATCH, 128), bool)
    for i in range(BATCH):
        n = rng.randint(3, 30)
        xy = rng.uniform([0, 0], [1000, 450], (n, 2))
        wh = rng.uniform(20, 150, (n, 2))
        boxes[i, :n] = np.concatenate([xy, xy + wh], 1)
        labels[i, :n] = rng.randint(1, 9, n)
        valid[i, :n] = True
    batch = {
        "image": rng.randint(0, 255, (BATCH, *CANVAS, 3), np.uint8),
        "boxes": boxes,
        "labels": labels,
        "gt_valid": valid,
        "domain": (np.arange(BATCH) % 3).astype(np.int32),
        "image_size": np.tile(np.float32((600, 1200)), (BATCH, 1)),
        "scale_back": np.ones((BATCH, 2), np.float32),
    }
    return jax.device_put(batch)


def bench_family(family: str, batch) -> float:
    """img/s for one family's full 8-step DG mode cycle."""
    import jax

    from dgod_tpu.train import steps as step_lib
    from dgod_tpu.train.optim import init_opt_state

    if family == "FCOS":
        from dgod_tpu.models.dg_fcos import DGFCOSModel as Model
    else:
        from dgod_tpu.models.dg_frcnn import DGFRCNNModel as Model

    model = Model(num_classes=9, num_domains=3, canvas=CANVAS)
    params = model.init(jax.random.PRNGKey(0))
    opt_config, base_lr = step_lib.make_optimizer(family)
    opt_state = init_opt_state(params, opt_config)
    reg = (0.5, 0.5, 0.5, 0.05, 1e-4)

    # production DG path: fused (mode-0 + mode-k) pair steps — 4 pair
    # programs per cycle = 8 optimizer steps, each batch dispatched once,
    # donate=True exactly as harness.fit builds them (each program donates
    # the incoming params/opt_state buffers and the loop rebinds to the
    # returned ones, so no donated buffer is ever reused; covered by
    # tests/test_train_e2e.py::test_fit_dg_fused_pairs)
    pair_modes = tuple(m for m in CYCLE if m != 0)
    steps = {
        k: step_lib.make_pair_step(
            model, k, reg, opt_config, base_lr, params
        )
        for k in pair_modes
    }

    key = jax.random.PRNGKey(0)
    # warmup/compile. Sync by FETCHING the last loss, not block_until_ready:
    # on the tunnel backend block_until_ready can return before remote
    # execution completes (see profile_frcnn.py:4-9); the last step's loss
    # depends on the whole params chain, so one scalar fetch forces the
    # full sequence (its ~one round-trip cost is noise over 24 steps)
    for k in pair_modes:
        params, opt_state, metrics = steps[k](
            params, opt_state, batch, key, key, 1.0)
    float(metrics["loss"])

    n_cycles = 6
    t0 = time.perf_counter()
    for _ in range(n_cycles):
        for k in pair_modes:
            params, opt_state, metrics = steps[k](
                params, opt_state, batch, key, key, 1.0)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    # count optimizer-step images like the reference's images/sec (BATCH
    # per training_step; a fused pair is 2 training steps)
    return n_cycles * len(CYCLE) * BATCH / dt


def family_mfu(family: str, img_per_sec: float):
    """Analytic-FLOP MFU of the measured cycle (utils/flops.py; peak =
    v5e bf16 197 TFLOP/s — the denominator-free companion metric to the
    estimated-A100 vs_baseline ratio)."""
    from dgod_tpu.utils.flops import train_mfu

    return train_mfu(family, CANVAS, BATCH, img_per_sec)


def main():
    _wait_for_backend()
    import jax

    # the env var alone does not activate the persistent cache on this
    # backend; set the config explicitly so repeat bench runs skip the
    # ~8 min of model-sized compiles
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    batch = make_batch()
    ips = {fam: bench_family(fam, batch) for fam in ("FRCNN", "FCOS")}
    headline = min(ips.values())
    mfu = {fam: family_mfu(fam, ips[fam]) for fam in ips}
    print(json.dumps({
        "metric": "images/sec/chip (DG train 8-step mode cycle, min over FRCNN/FCOS)",
        "value": round(headline, 2),
        "unit": "images/sec",
        "vs_baseline": round(headline / (3 * REF_A100_IMG_PER_SEC), 3),
        "frcnn_img_per_sec": round(ips["FRCNN"], 2),
        "fcos_img_per_sec": round(ips["FCOS"], 2),
        "frcnn_tflops_per_sec": round(mfu["FRCNN"]["model_tflops_per_sec"], 1),
        "fcos_tflops_per_sec": round(mfu["FCOS"]["model_tflops_per_sec"], 1),
        "frcnn_mfu": round(mfu["FRCNN"]["mfu"], 4),
        "fcos_mfu": round(mfu["FCOS"]["mfu"], 4),
        "mfu_note": (
            "analytic conv/matmul FLOPs of the DG cycle (utils/flops.py, "
            "jaxpr-cross-checked) over v5e bf16 peak "
            f"{mfu['FCOS']['peak_tflops']:.0f} TFLOP/s"
        ),
        "baseline_note": (
            "reference publishes no numbers; denominator is 3x an estimated "
            f"A100 reference throughput of {REF_A100_IMG_PER_SEC} img/s "
            "(uncertainty ~2x either way; see BASELINE.md)"
        ),
    }))

    # MFU regression gate (round-5, VERDICT r4 #5): the FRCNN residual was
    # declared structural after the recorded kernel A/Bs (BASELINE.md
    # "declared floor"); a run below these floors is a REGRESSION in the
    # compute path, not noise — fail the bench. Floors sit ~6% under the
    # declared steady-state (0.405 / 0.584).
    floors = {"FRCNN": 0.38, "FCOS": 0.55}
    if jax.default_backend() == "tpu":
        bad = {f: round(mfu[f]["mfu"], 4)
               for f, fl in floors.items() if mfu[f]["mfu"] < fl}
        if bad:
            print(f"MFU REGRESSION: {bad} below floors {floors} "
                  "(BASELINE.md declared floor)", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
