"""On-chip convergence proof: the framework LEARNS, end to end.

VERDICT round-4 #3: every unit test can pass and a detector stack this
re-engineered (static shapes, custom matchers, Pallas kernels) could still
fail to converge. This script trains both families, non_dg AND dg, on
procedurally generated detectable shapes until TRAIN-set mAP@0.5 >= 0.90,
through the production harness (TrainLoader -> Trainer.train_epoch ->
Trainer.validate -> COCO mAP).

Data: colored axis-aligned rectangles on per-domain-tinted noise. The
class IS the color (4 classes), so the task is learnable purely from
pixels; two domains differ by background tint, giving the DG mode cycle
real domain labels to discriminate (img-DA CE should fall toward ln(2)
as the GRL bites, then hover).

Run:  python scripts/check_convergence.py            # real chip, ~10-20 min
      DGOD_CONVERGENCE_SMOKE=1 JAX_PLATFORMS=cpu \
          python scripts/check_convergence.py        # tiny CPU smoke

Writes per-epoch curves to convergence_results.json (read by ROUND5.md).
The CPU smoke variant also runs in the test suite
(tests/test_convergence.py).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# class id -> RGB color (distinct, far apart in color space)
PALETTE = {
    1: (220, 40, 40),
    2: (40, 200, 60),
    3: (50, 80, 230),
    4: (235, 220, 50),
}
DOMAIN_TINT = {0: (30, 30, 30), 1: (90, 70, 20)}


class ShapesDataset:
    """Rectangles-on-noise; detection target = (box, color-class)."""

    def __init__(self, n: int, domain: int, image_hw, seed: int = 0,
                 min_frac: float = 0.12, max_frac: float = 0.35,
                 max_boxes: int = 3):
        rng = np.random.RandomState(seed * 7 + domain)
        h, w = image_hw
        self.images, self.boxes, self.labels = [], [], []
        self.domain = domain
        for _ in range(n):
            img = rng.randint(0, 60, (h, w, 3)).astype(np.int16)
            img += np.asarray(DOMAIN_TINT[domain], np.int16)
            k = rng.randint(1, max_boxes + 1)
            boxes, labels = [], []
            for _ in range(k):
                bw = int(rng.uniform(min_frac, max_frac) * w)
                bh = int(rng.uniform(min_frac, max_frac) * h)
                x1 = rng.randint(0, w - bw)
                y1 = rng.randint(0, h - bh)
                cls = int(rng.randint(1, len(PALETTE) + 1))
                color = np.asarray(PALETTE[cls], np.int16)
                jitter = rng.randint(-15, 15, (bh, bw, 3))
                img[y1:y1 + bh, x1:x1 + bw] = color + jitter
                boxes.append([x1, y1, x1 + bw, y1 + bh])
                labels.append(cls)
            self.images.append(np.clip(img, 0, 255).astype(np.uint8))
            self.boxes.append(np.asarray(boxes, np.float32))
            self.labels.append(np.asarray(labels, np.int32))

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return (self.images[idx].copy(), self.boxes[idx].copy(),
                self.labels[idx].copy(), self.domain)


def build_trainer(family: str, dg: bool, image_hw, canvas, n_per_domain,
                  batch_size, warmup_steps, block_counts, tmpdir):
    from dgod_tpu.data import transforms as T

    T.CANVAS = canvas
    T.TRAIN_SIZE = image_hw
    T.MIN_SIZE = min(image_hw)
    T.MAX_SIZE = max(image_hw)
    T.MIN_AREA = 4.0

    from dgod_tpu.data.dataset import ConcatDataset
    from dgod_tpu.data.loader import EvalLoader, TrainLoader
    from dgod_tpu.train.harness import Trainer

    train_ds = ConcatDataset([
        ShapesDataset(n_per_domain, 0, image_hw, seed=1),
        ShapesDataset(n_per_domain, 1, image_hw, seed=1),
    ])

    if family == "FCOS":
        from dgod_tpu.models.dg_fcos import DGFCOSModel

        model = DGFCOSModel(num_classes=9, num_domains=2, canvas=canvas,
                            backbone_block_counts=block_counts)
        val_resize = True
    else:
        from dgod_tpu.models.dg_frcnn import DGFRCNNModel

        model = DGFRCNNModel(num_classes=9, num_domains=2, canvas=canvas,
                             backbone_block_counts=block_counts)
        val_resize = False

    train_loader = TrainLoader(train_ds, batch_size, dg, num_workers=4)
    # TRAIN-set sweep: overfitting is the point (learning proof, not
    # generalisation); eval at batch 8 for speed
    val_loader = EvalLoader(train_ds, min(8, batch_size), val_resize,
                            num_workers=4)
    trainer = Trainer(
        model, train_loader, val_loader, dg=dg, max_epochs=0,
        ckpt_path=os.path.join(tmpdir, f"{family}_{dg}.ckpt"),
        log_every=10 ** 9, warmup_steps=warmup_steps,
    )
    return trainer


def run_one(family: str, dg: bool, *, image_hw, canvas, n_per_domain,
            batch_size, warmup_steps, block_counts, max_epochs, target,
            tmpdir) -> dict:
    t0 = time.time()
    trainer = build_trainer(family, dg, image_hw, canvas, n_per_domain,
                            batch_size, warmup_steps, block_counts, tmpdir)
    curve = []
    best = -1.0
    for epoch in range(max_epochs):
        stats = trainer.train_epoch()
        m = trainer.validate()
        entry = {
            "epoch": epoch,
            "step": trainer.global_step,
            "map_50": round(float(m["map_50"]), 4),
            "loss": round(stats.get("loss", float("nan")), 4),
            "img_per_sec": round(stats["images_per_sec"], 1),
        }
        if dg and "loss0" in stats:
            entry["loss0"] = round(stats["loss0"], 4)
        curve.append(entry)
        best = max(best, float(m["map_50"]))
        print(f"[{family} {'dg' if dg else 'non_dg'}] epoch {epoch} "
              f"step {trainer.global_step} mAP@0.5 {m['map_50']:.3f} "
              f"loss {stats.get('loss', float('nan')):.3f}", flush=True)
        if best >= target:
            break
    return {
        "family": family,
        "exp": "dg" if dg else "non_dg",
        "best_map_50": round(best, 4),
        "target": target,
        "reached": best >= target,
        "epochs": len(curve),
        "steps": trainer.global_step,
        "wall_s": round(time.time() - t0, 1),
        "curve": curve,
    }


def main() -> int:
    smoke = os.environ.get("DGOD_CONVERGENCE_SMOKE") == "1"
    if smoke:
        kw = dict(image_hw=(120, 240), canvas=(128, 256), n_per_domain=8,
                  batch_size=4, block_counts=(1, 1, 1, 1), max_epochs=60,
                  target=0.6)
        combos = [("FCOS", False)]
    else:
        kw = dict(image_hw=(600, 1200), canvas=(608, 1216), n_per_domain=16,
                  batch_size=8, block_counts=(3, 4, 6, 3), max_epochs=400,
                  target=0.9)
        combos = [("FCOS", False), ("FCOS", True),
                  ("FRCNN", False), ("FRCNN", True)]

    import tempfile

    results = []
    with tempfile.TemporaryDirectory() as tmpdir:
        for family, dg in combos:
            # from-scratch FRCNN diverges at the reference's raw SGD lr
            # (the reference always warm-starts COCO weights) — warm up
            warmup = 600 if family == "FRCNN" else 0
            results.append(run_one(family, dg, warmup_steps=warmup,
                                   tmpdir=tmpdir, **kw))

    out_path = os.path.join(REPO, "convergence_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    ok = all(r["reached"] for r in results)
    for r in results:
        print(f"{r['family']:6s} {r['exp']:7s} best mAP@0.5 "
              f"{r['best_map_50']:.3f} in {r['steps']} steps "
              f"({r['wall_s']}s) -> {'PASS' if r['reached'] else 'FAIL'}")
    print(("PASS" if ok else "FAIL") + f": curves in {out_path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
