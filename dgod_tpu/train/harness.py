"""Training harness — epoch loop, validation mAP, checkpointing, early stop.

Replaces the reference's PyTorch-Lightning Trainer usage
(train_driving_dg.py:160-168) with an explicit loop:
- per-epoch reshuffled train loader with the DG duplicate-batch sampler,
- 5-mode schedule via ModeScheduler (mode state persists across epochs,
  like the reference's `self.mode` attribute),
- validation mAP@0.5 every epoch -> drives ReduceLROnPlateau (factor 0.1,
  patience 5), ModelCheckpoint(best val_acc), EarlyStopping(patience 10)
  (train_driving_dg.py:160-163, DGFRCNN.py:105),
- warm-start from an existing checkpoint (train_driving_dg.py:154-155),
- `test()` = one validation sweep over the target domain, the reference's
  0-epoch-fit quirk (train_driving_dg.py:166-168).

Scale-out (`mesh=` / CLI `--mesh`): the reference is single-GPU with
hard-coded `.cuda()` (train_driving_dg.py:163, SURVEY §2c); here the same
Trainer drives an N-device `jax.sharding.Mesh`:

- pure data-parallel mesh (model axis 1): explicit-SPMD shard_map steps
  with ONE fused gradient all-reduce per step half (parallel/spmd.py);
- tensor-parallel mesh (model axis > 1): the GSPMD jit path — params
  placed by parallel/mesh.py::param_sharding (TP on the head kernels in
  TP_PATTERNS), batch sharded over 'data', XLA inserts the collectives;
- batches become global arrays via jax.make_array_from_process_local_data
  (each process contributes its host-local shard — multi-host correct);
- `validate()` aggregates per-image detections across hosts with
  process_allgather before the host-side mAP computation;
- checkpoint writes are gated on process 0.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..eval import MeanAveragePrecision
from . import steps as step_lib
from .checkpoint import make_store
from .optim import EarlyStopping, OptConfig, ReduceLROnPlateau, init_opt_state


def _nonreplicated_leaves(tree):
    """(path, leaf) list of leaves a single host cannot fully read —
    multi-process arrays with a sharded (non-replicated) layout."""
    out = []

    def check(path, leaf):
        if (hasattr(leaf, "sharding") and not leaf.is_fully_addressable
                and not leaf.sharding.is_fully_replicated):
            out.append(
                ("/".join(str(getattr(p, "key", p)) for p in path), leaf))

    jax.tree_util.tree_map_with_path(check, tree)
    return out


def _host_full_value(tree):
    """Replicated multi-process arrays -> host numpy (read this host's
    copy); everything else passes through np.asarray-able."""

    def get(leaf):
        if hasattr(leaf, "addressable_shards") and not leaf.is_fully_addressable:
            return np.asarray(leaf.addressable_shards[0].data)
        return leaf

    return jax.tree.map(get, tree)


class Trainer:
    def __init__(
        self,
        model,
        train_loader,
        val_loader,
        reg_weights=(0.5, 0.5, 0.5, 0.05, 1e-4),
        dg: bool = True,
        max_epochs: int = 100,
        ckpt_path: str = "checkpoints/model.ckpt",
        seed: int = 42,
        log_every: int = 50,
        metrics_path: str = None,
        tb_dir: str = None,
        warmup_steps: int = 0,
        torch_weights: Optional[str] = None,
        fused_pairs: bool = True,
        mesh=None,
    ):
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.reg_weights = tuple(reg_weights)
        self.dg = dg
        self.mesh = mesh
        self.max_epochs = max_epochs
        self.ckpt_path = ckpt_path
        self.log_every = log_every
        from ..utils.logging import MetricsLogger

        self.metrics = MetricsLogger(metrics_path, tb_dir=tb_dir)
        # linear LR warmup for from-scratch runs. The reference never needs
        # it because it always warm-starts from COCO weights
        # (DGFRCNN.py:81 pretrained=True); at its raw SGD lr 2e-3 a
        # randomly-initialised Faster R-CNN diverges within a few steps.
        # 0 (default) = reference-parity behaviour.
        self.warmup_steps = warmup_steps

        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_key = jax.random.split(self.rng)
        self.params = model.init(init_key)
        # '.ckpt' -> single-file pickle (reference-parity); else orbax
        # (async, multihost-correct)
        self.store = make_store(ckpt_path)
        # pretrained warm-start from a torchvision checkpoint — the
        # reference's `pretrained=True` COCO init (fasterrcnn.py:320-322) /
        # ImageNet backbone init (fcos.py:776-783). Skipped when a full
        # checkpoint resume exists (it would overwrite anyway).
        if torch_weights and not self.store.exists():
            from ..utils import weights as weights_lib

            sd = weights_lib.load_torch_file(torch_weights)
            family = (model.name if any(k.startswith("backbone.") for k in sd)
                      else "resnet")
            stats = weights_lib.port_torchvision(
                self.params["detector"], sd, family)
            print(
                f"ported {stats['merged']} leaves from {torch_weights} "
                f"({family}); reinitialised: "
                f"{stats['dropped_class_dependent'] or 'none'}"
            )
        self.opt_config, self.base_lr = step_lib.make_optimizer(model.name)
        self.opt_state = init_opt_state(self.params, self.opt_config)

        # fused DG pairs: (mode-0 + mode-k) on the same batch as ONE compiled
        # program with two sequential optimizer updates — semantically the
        # reference's replayed-batch schedule, minus one dispatch and one
        # host decode+transfer per pair.
        self.fused_pairs = bool(fused_pairs) and dg
        # mesh step makers: model axis 1 -> explicit-SPMD shard_map (one
        # fused all-reduce, parallel/spmd.py); model axis > 1 -> plain jit
        # whose TP-sharded params route through GSPMD (shard_map's P()
        # param specs would gather TP shards back, so TP must take the jit
        # path — same split the multichip dryrun validates).
        use_spmd = mesh is not None and mesh.shape.get("model", 1) == 1
        if use_spmd:
            from functools import partial

            from ..parallel import spmd

            make_pair = partial(spmd.make_spmd_pair_step, mesh=mesh)
            make_step = partial(spmd.make_spmd_train_step, mesh=mesh)
        else:
            make_pair = step_lib.make_pair_step
            make_step = step_lib.make_train_step
        if self.fused_pairs:
            self.pair_steps = {
                k: make_pair(
                    model, k, self.reg_weights, self.opt_config, self.base_lr,
                    self.params,
                )
                for k in (1, 2, 3, 4)
            }
            self._pair_i = 0
            # the fused step consumes each batch once; switch off the
            # loader's duplicate emission (DG replay now happens in-program)
            if getattr(train_loader, "dg", False):
                train_loader.dg = False
        else:
            modes = (0, 1, 2, 3, 4) if dg else (0,)
            self.steps = {
                m: make_step(
                    model, m, self.reg_weights, self.opt_config, self.base_lr,
                    self.params,
                )
                for m in modes
            }
        self.eval_step = step_lib.make_eval_step(model)
        self.scheduler = step_lib.ModeScheduler(dg)
        self.plateau = ReduceLROnPlateau()
        self.early_stop = EarlyStopping()
        self.best_val = -float("inf")
        self.global_step = 0

        # warm start (train_driving_dg.py:154-155)
        loaded = self.store.load_latest(self.params, self.opt_state)
        if loaded is not None:
            self.params, self.opt_state, meta = loaded
            self.best_val = meta.get("val_acc", -float("inf"))
            print(f"warm-started from {self.ckpt_path} (val_acc={self.best_val})")
        self._place_state()
        self._place_batch = self._batch_placer()

    # ------------------------------------------------------------------
    # mesh placement helpers

    def _mesh_ctx(self):
        return jax.set_mesh(self.mesh) if self.mesh is not None \
            else contextlib.nullcontext()

    def _place_state(self):
        """(Re)commit params/opt_state to the mesh sharding — required at
        init and after every checkpoint load (from_bytes returns host
        numpy trees, which jit would otherwise commit single-device)."""
        if self.mesh is None:
            return
        from ..parallel import mesh as mesh_lib

        self.params = mesh_lib.place(
            self.params, mesh_lib.param_sharding(self.mesh, self.params))
        self.opt_state = mesh_lib.place(
            self.opt_state, mesh_lib.param_sharding(self.mesh, self.opt_state))

    def _batch_placer(self):
        """Returns the host-batch -> device(s) placement function used by
        device_prefetch. Mesh runs build GLOBAL arrays from each process's
        local shard (multi-host correct; on one process it is simply a
        sharded device_put). Eval batches that don't divide by the data
        axis fall back to replication — still a valid GSPMD input."""
        if self.mesh is None:
            return jax.device_put
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        n_data = mesh.shape["data"]

        n_proc = jax.process_count()

        def place(batch):
            out = {}
            for k, v in batch.items():
                arr = np.asarray(v)
                if arr.ndim == 0:
                    # host-side scalars (e.g. the tail batch's 'num_real'
                    # mask count) stay host values — they may differ across
                    # processes, which a replicated global array must not
                    out[k] = v
                    continue
                if (arr.shape[0] * n_proc) % n_data == 0:
                    spec = P("data", *([None] * (arr.ndim - 1)))
                elif n_proc == 1:
                    spec = P()  # replicate (e.g. eval_batch 1 on 8 devices)
                else:
                    # replicating per-process DIFFERENT data would build a
                    # lying "replicated" global array — a hard error
                    raise ValueError(
                        f"batch dim {arr.shape[0]} x {n_proc} processes "
                        f"not divisible by data axis {n_data}; choose a "
                        "batch size divisible by local device count")
                out[k] = jax.make_array_from_process_local_data(
                    NamedSharding(mesh, spec), arr)
            return out

        return place

    @staticmethod
    def _local_rows(arr) -> np.ndarray:
        """THIS process's rows (in dataset order) of a batch-dim-sharded
        global array; whole array if fully addressable/replicated."""
        if not hasattr(arr, "addressable_shards") or arr.is_fully_addressable:
            return np.asarray(arr)
        if arr.sharding.is_fully_replicated:
            return np.asarray(arr.addressable_shards[0].data)
        parts = {}
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            parts.setdefault(start, np.asarray(s.data))
        return np.concatenate([parts[k] for k in sorted(parts)], axis=0)

    def train_epoch(self) -> Dict[str, float]:
        from ..data.loader import device_prefetch

        t0 = time.time()
        n_images = 0
        last_metrics = {}
        metrics = None
        for batch in device_prefetch(self.train_loader.epoch(),
                                     place=self._place_batch):
            lr_scale = self.plateau.scale
            if self.warmup_steps and self.global_step < self.warmup_steps:
                lr_scale *= (self.global_step + 1) / self.warmup_steps
            if self.fused_pairs:
                mode = (1, 2, 3, 4)[self._pair_i]
                self._pair_i = (self._pair_i + 1) % 4
                self.rng, k0 = jax.random.split(self.rng)
                self.rng, k1 = jax.random.split(self.rng)
                with self._mesh_ctx():
                    self.params, self.opt_state, metrics = self.pair_steps[mode](
                        self.params, self.opt_state, batch, k0, k1, lr_scale
                    )
                # two optimizer steps, each visiting the batch once
                n_images += 2 * batch["image"].shape[0]
                self.global_step += 2
            else:
                mode = self.scheduler.next_mode()
                self.rng, key = jax.random.split(self.rng)
                with self._mesh_ctx():
                    self.params, self.opt_state, metrics = self.steps[mode](
                        self.params, self.opt_state, batch, key, lr_scale
                    )
                n_images += batch["image"].shape[0]
                self.global_step += 1
            if self.global_step % self.log_every < (2 if self.fused_pairs else 1):
                last_metrics = {k: float(v) for k, v in metrics.items()}
                self.metrics.log(
                    "train", self.global_step, {"mode": mode, **last_metrics}
                )
                print(
                    f"step {self.global_step} mode {mode} "
                    f"loss {last_metrics.get('loss', float('nan')):.4f}"
                )
        dt = time.time() - t0
        if not last_metrics and metrics is not None:
            # no step hit the log cadence this epoch: report the final
            # step's metrics anyway (one device sync per epoch, free)
            last_metrics = {k: float(v) for k, v in metrics.items()}
        return {"images_per_sec": n_images / max(dt, 1e-9), **last_metrics}

    def validate(self, loader=None) -> Dict[str, Any]:
        # one-batch pipeline: dispatch eval_step(batch k+1) BEFORE doing the
        # host-side numpy mAP matching for batch k, so the device computes
        # the next batch while the host consumes the previous one (JAX
        # dispatch is async; np.asarray blocks only on the already-finished
        # step). The reference's val loop is fully serial (DGcommon.py:154-166).
        #
        # Multi-process runs: each host's loader holds its host_shard_range
        # slice; batches are assembled into GLOBAL arrays (every host issues
        # the same SPMD program — EvalLoader(pad_to_batches) equalises the
        # program count), each host harvests ITS OWN images' detections from
        # the sharded outputs, and the padded per-image arrays are
        # process_allgather-ed ONCE at the end so every host computes the
        # identical global mAP (drives identical plateau-LR/early-stop/ckpt
        # decisions everywhere).
        loader = loader or self.val_loader
        metric = MeanAveragePrecision()
        multi = jax.process_count() > 1
        store = [] if multi else None
        pending = None
        for batch in loader:
            placed = self._place_batch(batch)
            with self._mesh_ctx():
                dets = self.eval_step(self.params, placed)
            if pending is not None:
                self._metric_update(metric, *pending, store=store)
            # keep the HOST batch for gt: in multi-process mode the placed
            # batch is a global array whose remote shards this host can't read
            pending = (dets, batch)
        if pending is not None:
            self._metric_update(metric, *pending, store=store)
        if multi:
            self._update_from_all_hosts(metric, store)
        return metric.compute()

    def _metric_update(self, metric, dets, batch, store=None):
        # ONE host transfer per batch: per-image indexing of device arrays
        # would issue a device op + host round trip per field per image
        # (7 fields x batch images), which dominates eval wall-clock when
        # the chip is reached over a network tunnel. The metric's inputs
        # are tiny (<=100 dets/img), so fetching the whole tree at once is
        # always cheap; numpy inputs pass through device_get unchanged.
        # Multi-process: _local_rows reads only this host's addressable
        # shards — its own images, in order (batch gt is host-local already).
        dets = {k: self._local_rows(dets[k])
                for k in ("boxes", "scores", "labels", "valid")}
        gt = jax.device_get(
            {k: batch[k] for k in ("boxes", "labels", "gt_valid")})
        n_real = batch.get("num_real", dets["boxes"].shape[0])
        for i in range(n_real):
            row = (
                dets["boxes"][i],
                dets["scores"][i],
                dets["labels"][i],
                gt["boxes"][i],
                gt["labels"][i],
                dets["valid"][i],
                gt["gt_valid"][i],
            )
            if store is not None:
                store.append(row)
            else:
                metric.update(row[0], row[1], row[2], row[3], row[4],
                              pred_valid=row[5], gt_valid=row[6])

    def _update_from_all_hosts(self, metric, store):
        """process_allgather the per-image padded det/gt arrays and feed
        EVERY host's images into the metric (multihost.py docstring)."""
        from ..parallel import multihost

        assert store, (
            "multi-process validate: this host contributed no images — "
            "host_shard_range slices must be non-empty")
        # [n_local, ...] stacks of the 7 fixed-shape per-image fields
        local = tuple(np.stack([row[f] for row in store])
                      for f in range(7))
        counts = np.atleast_1d(multihost.all_gather_host_arrays(
            np.asarray(len(store), np.int32)))
        n_max = int(counts.max())
        local = tuple(
            np.concatenate(
                [a, np.zeros((n_max - a.shape[0], *a.shape[1:]), a.dtype)])
            if a.shape[0] < n_max else a
            for a in local)
        gathered = multihost.all_gather_host_arrays(local)  # [n_proc, n_max, ...]
        for p in range(len(counts)):
            for i in range(int(counts[p])):
                metric.update(
                    gathered[0][p, i], gathered[1][p, i], gathered[2][p, i],
                    gathered[3][p, i], gathered[4][p, i],
                    pred_valid=gathered[5][p, i], gt_valid=gathered[6][p, i],
                )

    def _save_checkpoint(self, epoch: int, val_acc: float):
        """Checkpoint write with multi-process discipline.

        PickleStore is a single shared file: exactly ONE process may write
        it (every process holds the identical replicated state — validate()
        allgathers, so val_acc and the improved-epoch decision agree
        everywhere). OrbaxStore is multihost-native: every process must
        participate in the save (each writes its own array shards)."""
        from .checkpoint import PickleStore

        params, opt_state = self.params, self.opt_state
        if jax.process_count() > 1 and isinstance(self.store, PickleStore):
            bad = [name for name, leaf
                   in _nonreplicated_leaves(self.params)][:3]
            if bad:
                raise NotImplementedError(
                    "PickleStore cannot save model-axis-sharded params on a "
                    f"multi-process run (e.g. {bad}); use an orbax directory "
                    "checkpoint path (train/checkpoint.py::make_store)")
            if jax.process_index() != 0:
                return
            # replicated-over-processes leaves: serialize this host's copy
            params = _host_full_value(params)
            opt_state = _host_full_value(opt_state)
        self.store.save(
            epoch, params, opt_state,
            {"val_acc": val_acc, "epoch": epoch},
        )

    def fit(self):
        try:
            for epoch in range(self.max_epochs):
                train_stats = self.train_epoch()
                val = self.validate()
                val_acc = val["map_50"]
                self.metrics.log(
                    "epoch", epoch,
                    {"val_acc": val_acc,
                     "images_per_sec": train_stats["images_per_sec"],
                     "lr_scale": self.plateau.scale},
                )
                print(
                    f"epoch {epoch}: val mAP@0.5 {val_acc:.4f} "
                    f"({train_stats['images_per_sec']:.2f} img/s) "
                    f"per-class {val['map_per_class']}"
                )
                if val_acc > self.best_val:
                    self.best_val = val_acc
                    self._save_checkpoint(epoch, val_acc)
                self.plateau.step(val_acc)
                if self.early_stop.step(val_acc):
                    print(f"early stopping at epoch {epoch}")
                    break
            self.store.wait()
        finally:
            # always stop a ProcessTrainLoader child — a mid-fit exception
            # must not leak the spawned process and its shm/cache memory
            if hasattr(self.train_loader, "close"):
                self.train_loader.close()
        return self.best_val

    def test(self, test_loader) -> Dict[str, Any]:
        """Reload the best checkpoint and sweep the target domain
        (train_driving_dg.py:166-168)."""
        self.store.wait()
        loaded = self.store.load_latest(self.params, self.opt_state)
        if loaded is not None:
            self.params, self.opt_state, _ = loaded
            self._place_state()
        result = self.validate(test_loader)
        print(f"test mAP@0.5 {result['map_50']:.4f} per-class {result['map_per_class']}")
        return result
