#!/usr/bin/env python3
"""End-to-end DG train throughput with the REAL host data path.

bench.py measures device-only throughput on a resident synthetic batch;
this script measures the production loop the CLI runs (cli.py:130-144):

    PNG files on disk -> DrivingDataset (cv2 imdecode, CSV boxes)
      -> TrainLoader (threaded fused resize/flip/pad, fixed-shape batches)
      -> device_prefetch (async H2D, depth 2)
      -> fused (mode-0 + mode-k) pair steps, donated buffers

for >= `--steps` pair programs (2 optimizer steps each), and reports:
  - e2e img/s          (optimizer-step images, same accounting as bench.py)
  - device-only img/s  (same pair steps on a resident batch)
  - host-only img/s    (loader alone, no device work)
  - occupancy          (e2e / device-only: 1.0 = host fully hidden)

The reference counterpart is the PL loop with a 4-worker DataLoader
(DGcommon.py:151). Source images are synthesized at Cityscapes-like
1024x2048 and written as real PNGs so the decode cost is genuine.

Usage: python scripts/bench_e2e.py [--family FCOS|FRCNN] [--steps 100]
       [--images 96] [--workers 8] [--smoke]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def make_dataset_on_disk(root: str, n: int, hw, seed: int = 0) -> str:
    """Write n structured synthetic PNGs + the reference CSV schema
    (image_name, BoxesString, LabelsString — DrivingDataset.py:20-23).
    Structured content (gradient + boxes), not noise: PNG filters make
    noise pathologically slow to decode and unlike street scenes."""
    import json

    import cv2

    os.makedirs(root, exist_ok=True)
    # existing PNGs are only reusable if they were generated with the SAME
    # parameters — a dir left over from a different --images/src_hw run
    # would keep its old pixels under a freshly regenerated CSV (stale GT
    # boxes, wrong decode cost)
    stamp_path = os.path.join(root, ".gen_params.json")
    stamp = {"n": int(n), "hw": list(hw), "seed": int(seed)}
    reuse = False
    if os.path.exists(stamp_path):
        try:
            with open(stamp_path) as f:
                reuse = json.load(f) == stamp
        except Exception:
            reuse = False
    if not reuse:
        for name in os.listdir(root):
            if name.endswith(".png"):
                os.remove(os.path.join(root, name))
        with open(stamp_path, "w") as f:
            json.dump(stamp, f)

    rng = np.random.RandomState(seed)
    H, W = hw
    yy = np.linspace(0, 180, H, dtype=np.uint8)[:, None]
    base = np.broadcast_to(yy, (H, W)).copy()
    rows = []
    for i in range(n):
        img = np.stack([base + rng.randint(0, 40)] * 3, axis=-1).astype(np.uint8)
        k = rng.randint(3, 12)
        boxes, labels = [], []
        for _ in range(k):
            x1 = rng.randint(0, W - 60)
            y1 = rng.randint(0, H - 60)
            w = rng.randint(30, min(400, W - x1))
            h = rng.randint(30, min(300, H - y1))
            color = tuple(int(c) for c in rng.randint(0, 255, 3))
            cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
            boxes.append((x1, y1, x1 + w, y1 + h))
            labels.append(int(rng.randint(1, 9)))
        name = f"img_{i:04d}.png"
        path = os.path.join(root, name)
        if not os.path.exists(path):
            cv2.imwrite(path, img)
        rows.append((
            name,
            ";".join(" ".join(str(v) for v in b) for b in boxes),
            ";".join(str(l) for l in labels),
        ))
    csv_path = os.path.join(root, "annots.csv")
    with open(csv_path, "w") as f:
        f.write("image_name,BoxesString,LabelsString\n")
        for name, bs, ls in rows:
            f.write(f'{name},"{bs}","{ls}"\n')
    return csv_path


def build_model(family: str, canvas):
    if family == "FCOS":
        from dgod_tpu.models.dg_fcos import DGFCOSModel

        return DGFCOSModel(num_classes=9, num_domains=3, canvas=canvas)
    from dgod_tpu.models.dg_frcnn import DGFRCNNModel

    return DGFRCNNModel(num_classes=9, num_domains=3, canvas=canvas)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="FCOS", choices=["FCOS", "FRCNN"])
    ap.add_argument("--steps", type=int, default=100,
                    help="timed pair steps (2 optimizer steps each)")
    ap.add_argument("--images", type=int, default=96,
                    help="unique source PNGs (reused across epochs/domains)")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--data_dir", default="/tmp/dgod_e2e_data")
    ap.add_argument("--decode_cache_gb", type=float, default=0.0,
                    help="per-domain decoded-image RAM cache (GiB); models "
                         "steady-state epochs >= 2 where decode is cached")
    ap.add_argument("--process_loader", action="store_true",
                    help="run the loader in a child process (shared-memory "
                         "ring) so its threads cannot GIL-convoy the "
                         "in-process device client")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU (CI/dev hosts)")
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dgod_tpu.data import transforms as T
    from dgod_tpu.data.dataset import ConcatDataset, DrivingDataset
    from dgod_tpu.data.loader import (ProcessTrainLoader, TrainLoader,
                                      device_prefetch)
    from dgod_tpu.train import steps as step_lib
    from dgod_tpu.train.optim import init_opt_state

    if args.smoke:
        canvas, src_hw = (64, 128), (128, 256)
        args.steps = min(args.steps, 6)
        args.images = min(args.images, 16)
        args.batch = 2
        # shrink the data pipeline to the smoke canvas (same knobs the
        # e2e tests patch, tests/test_train_e2e.py::patched_canvas)
        T.CANVAS = canvas
        T.TRAIN_SIZE = (60, 120)
        T.MIN_SIZE, T.MAX_SIZE = 60, 120
        T.MIN_AREA = 4.0
    else:
        canvas, src_hw = (608, 1216), (1024, 2048)
        assert T.CANVAS == canvas  # production defaults

    csv_path = make_dataset_on_disk(args.data_dir, args.images, src_hw)
    # three source domains sharing the same files (decode cost identical;
    # the reference trains on a ConcatDataset of per-domain CSVs,
    # train_driving_dg.py:54-107)
    # DrivingDataset concatenates root+name verbatim (reference
    # DrivingDataset.py behaviour), so root needs its trailing separator
    root = args.data_dir.rstrip("/") + "/"
    cache_bytes = int(args.decode_cache_gb * (1 << 30))
    ds = ConcatDataset([
        DrivingDataset(csv_path, root, domain=d, decode_cache_bytes=cache_bytes)
        for d in range(3)
    ])
    if cache_bytes:
        # pre-fill so the timed run models a steady-state (epoch >= 2) epoch
        for i in range(len(ds)):
            ds[i]

    model = build_model(args.family, canvas)
    params = model.init(jax.random.PRNGKey(0))
    opt_config, base_lr = step_lib.make_optimizer(args.family)
    opt_state = init_opt_state(params, opt_config)
    reg = (0.5, 0.5, 0.5, 0.05, 1e-4)
    pair_modes = (1, 2, 3, 4)
    pairs = {
        k: step_lib.make_pair_step(model, k, reg, opt_config, base_lr, params)
        for k in pair_modes
    }
    key = jax.random.PRNGKey(1)

    # dg=False: the fused pair replays the batch in-program
    # (harness.fit switches the duplicate emission off the same way)
    loader_cls = ProcessTrainLoader if args.process_loader else TrainLoader
    loader = loader_cls(ds, args.batch, dg=False,
                        num_workers=args.workers, max_gt=T.MAX_GT)
    if args.process_loader and cache_bytes:
        # the child process owns its own decode cache (the parent pre-fill
        # does not pickle across); drain one epoch so the timed run models
        # steady state there too
        for _ in loader.epoch():
            pass

    def batches(n_pairs):
        """Endless epochs through the real loader, n_pairs batches total."""
        got = 0
        while got < n_pairs:
            for b in device_prefetch(loader.epoch()):
                yield b
                got += 1
                if got >= n_pairs:
                    return

    # --- warmup: compile all four pair programs on real batches ---------
    it = batches(len(pair_modes))
    for k in pair_modes:
        params, opt_state, metrics = pairs[k](
            params, opt_state, next(it), key, key, 1.0)
    float(metrics["loss"])

    # --- e2e timed run ---------------------------------------------------
    n = args.steps
    t0 = time.perf_counter()
    i = 0
    for b in batches(n):
        k = pair_modes[i % 4]
        params, opt_state, metrics = pairs[k](params, opt_state, b, key, key, 1.0)
        i += 1
    float(metrics["loss"])  # sync (tunnel-safe: scalar fetch)
    dt_e2e = time.perf_counter() - t0
    e2e_ips = n * 2 * args.batch / dt_e2e

    # --- device-only rate on a resident batch ---------------------------
    resident = jax.device_put(next(iter(batches(1))))
    for k in pair_modes:  # re-warm donation chain
        params, opt_state, metrics = pairs[k](
            params, opt_state, resident, key, key, 1.0)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        k = pair_modes[i % 4]
        params, opt_state, metrics = pairs[k](
            params, opt_state, resident, key, key, 1.0)
    float(metrics["loss"])
    dt_dev = time.perf_counter() - t0
    dev_ips = n * 2 * args.batch / dt_dev

    # --- host-only loader rate -------------------------------------------
    t0 = time.perf_counter()
    n_img = 0
    for b in loader.epoch():
        n_img += b["image"].shape[0]
    host_ips = n_img / (time.perf_counter() - t0)
    if hasattr(loader, "close"):
        loader.close()

    print(json.dumps({
        "family": args.family,
        "e2e_img_per_sec": round(e2e_ips, 2),
        "device_only_img_per_sec": round(dev_ips, 2),
        "host_loader_img_per_sec": round(host_ips, 2),
        "occupancy": round(e2e_ips / dev_ips, 3),
        "pair_steps": n,
        "batch": args.batch,
        "workers": args.workers,
        "unique_images": args.images,
        "decode_cache_gb": args.decode_cache_gb,
        "process_loader": bool(args.process_loader),
        "note": (
            "e2e = PNG decode -> TrainLoader -> device_prefetch -> fused "
            "pair steps; img/s counts optimizer-step images (pair = 2 "
            "steps), same accounting as bench.py. host_loader rate counts "
            "loader images once."
        ),
    }))


if __name__ == "__main__":
    main()
