"""End-to-end harness smoke test: FCOS non_dg on synthetic data.

Exercises TrainLoader -> per-mode step -> validation mAP -> checkpoint ->
warm start, on a reduced canvas. (The full-scale equivalent is the
reference's `--model FCOS --exp non_dg` run, train_driving_dg.py.)
"""
import os

import numpy as np
import jax
import pytest

from dgod_tpu.data.dataset import ConcatDataset, SyntheticDataset
from dgod_tpu.data.loader import EvalLoader, TrainLoader
from dgod_tpu.models.dg_fcos import DGFCOSModel
from dgod_tpu.train.harness import Trainer

# keep geometry consistent with the tiny canvas
CANVAS = (128, 256)


@pytest.fixture()
def patched_canvas(monkeypatch):
    from dgod_tpu.data import transforms as T

    monkeypatch.setattr(T, "CANVAS", CANVAS)
    monkeypatch.setattr(T, "TRAIN_SIZE", (120, 240))
    monkeypatch.setattr(T, "MIN_SIZE", 120)
    monkeypatch.setattr(T, "MAX_SIZE", 240)
    monkeypatch.setattr(T, "MIN_AREA", 4.0)
    return T


def test_fit_and_test_sweep(tmp_path, patched_canvas):
    train_ds = ConcatDataset([
        SyntheticDataset(8, domain=0, image_hw=(120, 240)),
        SyntheticDataset(8, domain=1, image_hw=(120, 240)),
    ])
    val_ds = SyntheticDataset(4, domain=0, image_hw=(120, 240), seed=7)

    model = DGFCOSModel(num_classes=9, num_domains=2, canvas=CANVAS)
    ckpt = str(tmp_path / "m.ckpt")
    trainer = Trainer(
        model,
        TrainLoader(train_ds, 4, dg=False, num_workers=2, max_gt=16),
        EvalLoader(val_ds, 1, True, num_workers=2, max_gt=16),
        dg=False,
        max_epochs=1,
        ckpt_path=ckpt,
        log_every=2,
    )
    best = trainer.fit()
    assert os.path.exists(ckpt)
    assert np.isfinite(best)

    result = trainer.test(EvalLoader(val_ds, 1, True, num_workers=2, max_gt=16))
    assert "map_50" in result

    # warm start must load without error and keep best_val
    trainer2 = Trainer(
        model,
        TrainLoader(train_ds, 4, dg=False, num_workers=2, max_gt=16),
        EvalLoader(val_ds, 1, True, num_workers=2, max_gt=16),
        dg=False,
        max_epochs=1,
        ckpt_path=ckpt,
    )
    assert trainer2.best_val == best


def test_fused_pair_step_equals_sequential(patched_canvas):
    """make_pair_step(mode0+modek) must reproduce two make_train_step calls
    exactly (same batch, same rng keys, sequential optimizer updates)."""
    from dgod_tpu.train import steps as step_lib
    from dgod_tpu.train.optim import init_opt_state

    model = DGFCOSModel(num_classes=9, num_domains=2, canvas=CANVAS)
    params = model.init(jax.random.PRNGKey(0))
    opt_config, base_lr = step_lib.make_optimizer("FCOS")
    opt_state = init_opt_state(params, opt_config)
    reg = (0.5, 0.5, 0.5, 0.05, 1e-4)

    rng = np.random.RandomState(3)
    b = 2
    boxes = np.zeros((b, 16, 4), np.float32)
    labels = np.zeros((b, 16), np.int32)
    valid = np.zeros((b, 16), bool)
    boxes[:, 0] = [20, 20, 90, 90]
    labels[:, 0] = 1
    valid[:, 0] = True
    batch = {
        "image": rng.randint(0, 255, (b, *CANVAS, 3), np.uint8),
        "boxes": boxes, "labels": labels, "gt_valid": valid,
        "domain": np.arange(b, dtype=np.int32) % 2,
        "image_size": np.tile(np.float32(CANVAS), (b, 1)),
        "scale_back": np.ones((b, 2), np.float32),
    }

    k0, k1 = jax.random.PRNGKey(10), jax.random.PRNGKey(11)
    mode_k = 2

    s0 = step_lib.make_train_step(model, 0, reg, opt_config, base_lr,
                                  params, donate=False)
    sk = step_lib.make_train_step(model, mode_k, reg, opt_config, base_lr,
                                  params, donate=False)
    p_seq, o_seq, m0 = s0(params, opt_state, batch, k0, 1.0)
    p_seq, o_seq, mk = sk(p_seq, o_seq, batch, k1, 1.0)

    pair = step_lib.make_pair_step(model, mode_k, reg, opt_config, base_lr,
                                   params, donate=False)
    p_fused, o_fused, mf = pair(params, opt_state, batch, k0, k1, 1.0)

    np.testing.assert_allclose(float(mf["loss0"]), float(m0["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(mf["loss"]), float(mk["loss"]),
                               rtol=1e-5)
    flat_seq = jax.tree_util.tree_leaves_with_path(p_seq)
    flat_fused = jax.tree_util.tree_leaves_with_path(p_fused)
    for (path_a, a), (path_b, bb) in zip(flat_seq, flat_fused):
        assert path_a == path_b
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-5,
            err_msg=str(path_a))


def test_fit_dg_fused_pairs(tmp_path, patched_canvas):
    """DG production path: 4 donated pair programs (modes 1-4) interleaved
    over one params/opt_state chain — the exact buffer-donation pattern
    harness.fit runs in `--exp dg` (reference schedule DGcommon.py:139-151).
    Covers what the non_dg smoke test cannot: cross-program donation, the
    fused scheduler, and the loader's duplicate-emission switch-off."""
    train_ds = ConcatDataset([
        SyntheticDataset(8, domain=0, image_hw=(120, 240)),
        SyntheticDataset(8, domain=1, image_hw=(120, 240)),
    ])
    val_ds = SyntheticDataset(2, domain=0, image_hw=(120, 240), seed=7)

    model = DGFCOSModel(num_classes=9, num_domains=2, canvas=CANVAS)
    loader = TrainLoader(train_ds, 4, dg=True, num_workers=2, max_gt=16)
    trainer = Trainer(
        model,
        loader,
        EvalLoader(val_ds, 1, True, num_workers=2, max_gt=16),
        dg=True,
        max_epochs=1,
        ckpt_path=str(tmp_path / "dg.ckpt"),
        log_every=1,
    )
    assert trainer.fused_pairs
    assert loader.dg is False  # replay moved in-program
    best = trainer.fit()
    assert np.isfinite(best)
    # one epoch of 16 images / batch 4 = 4 pair steps = 8 optimizer steps
    assert trainer.global_step == 8


def test_fit_dg_process_loader(tmp_path, patched_canvas):
    """Same DG fused-pair fit through ProcessTrainLoader (--process_loader):
    the harness must flip dg off BEFORE the child process starts (the
    setter asserts this), the child must inherit the monkeypatched tiny
    canvas via the transform overrides, and fit() must close the child."""
    from dgod_tpu.data.loader import ProcessTrainLoader

    train_ds = ConcatDataset([
        SyntheticDataset(8, domain=0, image_hw=(120, 240)),
        SyntheticDataset(8, domain=1, image_hw=(120, 240)),
    ])
    val_ds = SyntheticDataset(2, domain=0, image_hw=(120, 240), seed=7)

    model = DGFCOSModel(num_classes=9, num_domains=2, canvas=CANVAS)
    loader = ProcessTrainLoader(train_ds, 4, dg=True, num_workers=2,
                                max_gt=16, n_slots=2)
    trainer = Trainer(
        model,
        loader,
        EvalLoader(val_ds, 1, True, num_workers=2, max_gt=16),
        dg=True,
        max_epochs=1,
        ckpt_path=str(tmp_path / "dgp.ckpt"),
        log_every=1,
    )
    assert trainer.fused_pairs
    assert loader.dg is False  # flipped before the child started
    best = trainer.fit()
    assert np.isfinite(best)
    assert trainer.global_step == 8
    assert loader._proc is None  # fit() closed the child


def test_batched_eval_matches_batch1_map(tmp_path, patched_canvas):
    """mAP from Trainer.validate() must be identical at eval batch 1 and
    batch 2 (incl. a padded tail batch): batching is a throughput lever
    (VERDICT round-2 #7), never a semantics change. f32 compute so the
    comparison is exact (bf16 batch-layout rounding would blur it)."""
    import jax.numpy as jnp

    ds = SyntheticDataset(5, domain=0, image_hw=(120, 240), seed=3)
    model = DGFCOSModel(num_classes=9, num_domains=2, canvas=CANVAS,
                        compute_dtype=jnp.float32)
    trainer = Trainer(
        model,
        TrainLoader(ds, 2, dg=False, num_workers=2, max_gt=16),
        EvalLoader(ds, 1, True, num_workers=2, max_gt=16),
        dg=False,
        max_epochs=0,
        ckpt_path=str(tmp_path / "ev.ckpt"),
    )
    r1 = trainer.validate(EvalLoader(ds, 1, True, num_workers=2, max_gt=16))
    r2 = trainer.validate(EvalLoader(ds, 2, True, num_workers=2, max_gt=16))
    assert abs(r1["map_50"] - r2["map_50"]) < 1e-9, (r1, r2)


class _FixedBoxDataset:
    """Every image: ONE identical planted box. Per-image fg counts are then
    equal, the condition under which per-shard loss normalisation equals
    the global unsharded one (see __graft_entry__._tiny_batch), making the
    DP-vs-single-device parity below exact up to f32 layout rounding."""

    def __init__(self, n, domain, seed=0, image_hw=(30, 60)):
        rng = np.random.RandomState(seed + domain)
        h, w = image_hw
        self.images = [rng.randint(0, 255, (h, w, 3), np.uint8)
                       for _ in range(n)]
        self.domain = domain

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return (
            self.images[idx].copy(),
            np.array([[6.0, 6.0, 30.0, 26.0]], np.float32),
            np.array([1], np.int32),
            self.domain,
        )


@pytest.fixture()
def micro_canvas(monkeypatch):
    from dgod_tpu.data import transforms as T

    monkeypatch.setattr(T, "CANVAS", (32, 64))
    monkeypatch.setattr(T, "TRAIN_SIZE", (30, 60))
    monkeypatch.setattr(T, "MIN_SIZE", 30)
    monkeypatch.setattr(T, "MAX_SIZE", 60)
    monkeypatch.setattr(T, "MIN_AREA", 1.0)
    return T


def test_trainer_mesh_dp_matches_single_device(tmp_path, micro_canvas):
    """Trainer(mesh=8-device DP) must reproduce the single-device run
    through the REAL harness path — the dryrun's anchor check, but via
    Trainer.train_epoch/validate instead of bespoke step wiring (VERDICT
    round-4 #2). Covers: _batch_placer global arrays, spmd pair steps from
    the harness, mesh-placed eval, param placement."""
    import jax.numpy as jnp

    from dgod_tpu.parallel import mesh as mesh_lib

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual cpu devices")
    mesh = mesh_lib.make_mesh(devs[:8])

    def build(use_mesh):
        train_ds = ConcatDataset([
            _FixedBoxDataset(16, 0), _FixedBoxDataset(16, 1)])
        val_ds = _FixedBoxDataset(4, 0, seed=7)
        from dgod_tpu.models.dg_fcos import DGFCOSModel as M

        model = M(num_classes=9, num_domains=2, canvas=(32, 64),
                  compute_dtype=jnp.float32,
                  backbone_block_counts=(1, 1, 1, 1))
        return Trainer(
            model,
            TrainLoader(train_ds, 8, dg=True, num_workers=2, max_gt=4),
            EvalLoader(val_ds, 2, True, num_workers=2, max_gt=4),
            dg=True,
            max_epochs=1,
            ckpt_path=str(tmp_path / f"mesh{int(use_mesh)}.ckpt"),
            log_every=1,
            mesh=mesh if use_mesh else None,
        )

    t_single = build(False)
    s_stats = t_single.train_epoch()

    t_mesh = build(True)
    assert t_mesh.fused_pairs
    m_stats = t_mesh.train_epoch()

    # 32 images / global batch 8 = 4 pair steps -> all four DG pairs ran
    assert t_mesh.global_step == 8 == t_single.global_step
    np.testing.assert_allclose(m_stats["loss"], s_stats["loss"], rtol=1e-4)
    np.testing.assert_allclose(m_stats["loss0"], s_stats["loss0"], rtol=1e-4)

    flat_s = jax.tree_util.tree_leaves_with_path(t_single.params)
    flat_m = jax.tree_util.tree_leaves_with_path(t_mesh.params)
    # Adam's early-step update is ~lr*sign(m/sqrt(v)): noise-level grad
    # differences between the sharded and unsharded layouts get amplified
    # to O(lr)=1e-4 on isolated elements over the 8 updates, so atol must
    # sit above that floor (same rationale as test_spmd_pair_step); the
    # tight loss checks above are the structural assertion
    for (pa, a), (pb, b) in zip(flat_s, flat_m):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=3e-4, err_msg=str(pa))

    # validation through the mesh path must give the identical mAP
    r_s = t_single.validate()
    r_m = t_mesh.validate()
    assert abs(r_s["map_50"] - r_m["map_50"]) < 1e-9, (r_s, r_m)
