"""Multi-device sharding tests on the virtual CPU mesh.

Uses jax.devices('cpu') explicitly: in the bench environment the default
backend is a single TPU chip, while the CPU backend exposes
--xla_force_host_platform_device_count virtual devices (conftest sets 8).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgod_tpu.parallel import mesh as mesh_lib


def cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


def test_mesh_shapes():
    devs = cpu_devices(8)
    mesh = mesh_lib.make_mesh(devs, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_dp = mesh_lib.make_mesh(devs)
    assert mesh_dp.shape == {"data": 8, "model": 1}


def test_batch_sharding_splits_leading_dim():
    devs = cpu_devices(4)
    mesh = mesh_lib.make_mesh(devs)
    batch = {"image": np.zeros((8, 16, 16, 3), np.uint8), "domain": np.zeros(8, np.int32)}
    sharded = mesh_lib.place(batch, mesh_lib.batch_sharding(mesh, batch))
    # each device holds 2 of the 8 batch entries
    shard_shapes = [s.data.shape for s in sharded["image"].addressable_shards]
    assert all(s == (2, 16, 16, 3) for s in shard_shapes)


def test_param_sharding_tp_rule():
    devs = cpu_devices(4)
    mesh = mesh_lib.make_mesh(devs, model=2)
    params = {
        "head": {"cls_conv0": {"kernel": jnp.zeros((3, 3, 256, 256))}},
        "backbone": {"conv1": {"kernel": jnp.zeros((7, 7, 3, 64))}},
    }
    shardings = mesh_lib.param_sharding(mesh, params)
    tp = shardings["head"]["cls_conv0"]["kernel"].spec
    rep = shardings["backbone"]["conv1"]["kernel"].spec
    assert tp[-1] == "model"
    assert all(s is None for s in rep)


def test_data_parallel_grad_matches_single_device():
    """A jitted loss+grad over a 4-way data mesh must equal single-device."""
    devs = cpu_devices(4)
    mesh = mesh_lib.make_mesh(devs)

    w = jnp.asarray(np.random.RandomState(0).rand(16, 8).astype(np.float32))
    x = jnp.asarray(np.random.RandomState(1).rand(8, 16).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(2).rand(8, 8).astype(np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    # reference on one CPU device (the default backend may be a TPU whose
    # matmul precision differs)
    with jax.default_device(devs[0]):
        g_single = jax.jit(jax.grad(loss))(
            jax.device_put(w, devs[0]), jax.device_put(x, devs[0]),
            jax.device_put(y, devs[0]),
        )

    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ys = jax.device_put(y, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs, ys)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded),
                               rtol=1e-5, atol=1e-6)
