"""Checkpoint stores: pickle single-file and async orbax directory."""
import jax
import numpy as np

from dgod_tpu.train.checkpoint import OrbaxStore, PickleStore, make_store


def _trees():
    params = {"a": np.arange(4, dtype=np.float32),
              "b": {"c": np.ones((2, 2), np.float32)}}
    opt = {"m": np.zeros(3, np.float32), "count": np.int32(0)}
    return params, opt


def test_make_store_dispatch(tmp_path):
    assert isinstance(make_store(str(tmp_path / "m.ckpt")), PickleStore)
    assert isinstance(make_store(str(tmp_path / "ckpts")), OrbaxStore)


def test_pickle_store_roundtrip(tmp_path):
    store = make_store(str(tmp_path / "m.ckpt"))
    params, opt = _trees()
    assert store.load_latest(params, opt) is None and not store.exists()
    store.save(2, params, opt, {"val_acc": 0.25})
    assert store.exists()
    p2, o2, meta = store.load_latest(
        jax.tree.map(np.zeros_like, params), jax.tree.map(np.zeros_like, opt))
    assert meta["val_acc"] == 0.25 and meta["step"] == 2
    np.testing.assert_array_equal(p2["a"], params["a"])


def test_pickle_store_rejects_torch_checkpoints(tmp_path):
    """A reference-produced .ckpt at the warm-start path must fail loudly
    with a pointer to --torch_weights, not crash inside pickle/from_bytes
    (reference workflow: train_driving_dg.py:154-155)."""
    import pickle

    import pytest
    import torch

    params, opt = _trees()

    # torch>=1.6 zip-format save
    zip_path = tmp_path / "ref_zip.ckpt"
    torch.save({"state_dict": {"w": torch.zeros(2)}}, str(zip_path))
    store = make_store(str(zip_path))
    with pytest.raises(ValueError, match="torch_weights"):
        store.load_latest(params, opt)

    # legacy plain-pickle save with the reference's schema
    legacy_path = tmp_path / "ref_legacy.ckpt"
    with open(legacy_path, "wb") as f:
        pickle.dump({"state_dict": {"w": np.zeros(2)}}, f)
    store = make_store(str(legacy_path))
    with pytest.raises(ValueError, match="torch_weights"):
        store.load_latest(params, opt)


def test_orbax_store_async_best_only(tmp_path):
    store = make_store(str(tmp_path / "ckpts"))
    params, opt = _trees()
    assert store.load_latest(params, opt) is None and not store.exists()
    store.save(0, params, opt, {"val_acc": 0.5, "epoch": 0})
    better = jax.tree.map(lambda x: x + 1, params)
    store.save(3, better, opt, {"val_acc": 0.7, "epoch": 3})
    store.wait()
    assert store.exists()
    p2, o2, meta = store.load_latest(params, opt)
    assert meta["val_acc"] == 0.7 and meta["epoch"] == 3
    np.testing.assert_array_equal(p2["a"], params["a"] + 1)
    np.testing.assert_array_equal(p2["b"]["c"], params["b"]["c"] + 1)
    # max_to_keep=1: older checkpoint garbage-collected
    assert list(store.mgr.all_steps()) == [3]
