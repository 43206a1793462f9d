"""Real multi-PROCESS validation of the multi-host path on one machine.

The reference is single-GPU; our multi-host story (parallel/multihost.py)
was previously exercised only by unit tests + a single-process virtual
mesh. This check runs the actual `jax.distributed` machinery end to end:

  parent (no jax)
    spawns 2 worker processes, each with 2 virtual CPU devices
  worker i
    multihost.initialize(coordinator_address=localhost:<port>,
                         num_processes=2, process_id=i)
        -> real coordination service handshake (the same code path a TPU
           pod worker takes over DCN, parallel/multihost.py:49-71)
    global mesh over ALL 4 devices (2 local + 2 on the other process)
    host_shard_range -> this worker's slice of the global batch
    jax.make_array_from_process_local_data -> globally-sharded batch
    ONE fused DG pair step (mode 0 + mode 4, reduced-depth FCOS,
        parallel/spmd.py) -> the gradient all-reduce crosses the process
        boundary through XLA:CPU's cross-process collectives
    all_gather_host_arrays -> real multihost_utils.process_allgather
  parent
    asserts both workers exit 0, print identical finite pair losses, and
    agree on the gathered eval payload

Counterpart being validated: the whole DG step under data parallelism
spanning hosts (SURVEY §2c "Distributed backend" row; reference has none —
/root/reference/train_driving_dg.py:163 is single-device).

Run:  python scripts/check_multiprocess_cpu.py          (parent mode)
Takes ~2-4 min warm on a 1-core host (one tiny-canvas reduced-depth FCOS
pair program per worker, shared persistent cache).
"""

import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
LOCAL_DEVICES = 2
GLOBAL_BATCH = 4  # 2 images per worker, 1 per device


def _xla_flags() -> str:
    # mirrors __graft_entry__._dryrun_xla_flags: pinned ISA keeps the
    # persistent-cache key stable; raised collective timeouts absorb
    # 2 processes x 2 replica threads timesharing one core
    return (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
        " --xla_cpu_max_isa=AVX2"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    )


def worker(process_id: int, coordinator: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = _xla_flags()
    # cross-process collectives on the CPU backend route through gloo
    # (XLA:CPU's in-process rendezvous only covers same-process devices)
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    sys.path.insert(0, REPO)

    import jax
    from dgod_tpu.parallel import multihost

    # must run BEFORE any backend query (multihost.initialize docstring)
    multihost.initialize(coordinator_address=coordinator,
                         num_processes=N_PROC, process_id=process_id)

    cache_dir = os.path.join(REPO, ".jax_dryrun_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    assert jax.process_count() == N_PROC, jax.process_count()
    assert jax.process_index() == process_id
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES
    print(f"worker {process_id}: distributed init ok, "
          f"{len(jax.devices())} global devices", flush=True)

    import numpy as np

    import __graft_entry__ as graft
    from dgod_tpu.parallel import mesh as mesh_lib
    from dgod_tpu.parallel.spmd import make_spmd_pair_step
    from dgod_tpu.models.dg_fcos import DGFCOSModel
    from dgod_tpu.train import steps as step_lib
    from dgod_tpu.train.optim import init_opt_state

    mesh = multihost.global_mesh()  # 4 devices, 2 local + 2 remote

    canvas = (32, 64)
    model = DGFCOSModel(num_classes=9, num_domains=2, canvas=canvas,
                        backbone_block_counts=(1, 1, 1, 1))
    params = model.init(jax.random.PRNGKey(0))  # deterministic on both
    opt_config, base_lr = step_lib.make_optimizer("FCOS")
    opt_state = init_opt_state(params, opt_config)

    def replicate(tree):
        # every process holds the identical full value -> a fully
        # replicated global array can be assembled from local data
        def put(x):
            x = np.asarray(x)
            sh = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(*([None] * x.ndim)))
            return jax.make_array_from_process_local_data(sh, x)

        return jax.tree.map(put, tree)

    params = replicate(params)
    opt_state = replicate(opt_state)

    # per-host input sharding: each worker materialises ONLY its slice
    # (what the per-host loader does at scale, parallel/multihost.py:74)
    full = graft._tiny_batch(GLOBAL_BATCH, canvas)
    lo, hi = multihost.host_shard_range(GLOBAL_BATCH)
    assert (hi - lo) == GLOBAL_BATCH // N_PROC, (lo, hi)

    def shard_batch(tree):
        def put(x):
            sh = jax.sharding.NamedSharding(
                mesh,
                jax.sharding.PartitionSpec(*(["data"] + [None] * (x.ndim - 1))))
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x[lo:hi]), global_shape=x.shape)

        return jax.tree.map(put, tree)

    batch = shard_batch(full)

    reg = (0.5, 0.5, 0.5, 0.05, 1e-4)
    k2, k3 = jax.random.PRNGKey(2), jax.random.PRNGKey(3)
    with jax.set_mesh(mesh):
        pair = make_spmd_pair_step(
            model, 4, reg, opt_config, base_lr, params, mesh)
        # compile ahead of time, then align both workers on the
        # coordination-service barrier (NOT a device collective) before
        # the first execution: gloo's context init allows only ~30 s of
        # inter-worker skew, which 1-core timesharing of two compiling
        # processes can exceed
        compiled = pair.lower(params, opt_state, batch, k2, k3, 1.0).compile()
        from jax._src import distributed as jax_distributed

        jax_distributed.global_state.client.wait_at_barrier(
            "dgod_pre_exec", 600_000)
        print(f"worker {process_id}: compiled, barrier passed", flush=True)
        params, opt_state, pm = compiled(params, opt_state, batch, k2, k3, 1.0)
        l0, l4 = float(pm["loss0"]), float(pm["loss"])
    assert np.isfinite(l0) and np.isfinite(l4), (l0, l4)
    # cross-process agreement is asserted by the parent on these lines
    print(f"worker {process_id}: pair(0+4) losses {l0:.6f}/{l4:.6f}",
          flush=True)

    # eval aggregation across processes (DGcommon.py:164 analogue at scale)
    gathered = multihost.all_gather_host_arrays(
        np.float32([process_id, l0]))
    gathered = np.asarray(gathered)
    assert gathered.shape == (N_PROC, 2), gathered.shape
    assert set(gathered[:, 0].astype(int).tolist()) == set(range(N_PROC))
    assert np.allclose(gathered[:, 1], l0), gathered
    print(f"worker {process_id}: process_allgather ok "
          f"{gathered[:, 0].astype(int).tolist()}", flush=True)

    # ---- the PRODUCTION harness across processes (round 5) --------------
    # Trainer(mesh=global) with per-host input shards: train_epoch (fused
    # DG pairs, global-array batches), validate() with UNEQUAL per-host
    # eval shards (3 vs 2 images -> dummy-batch padding equalises the SPMD
    # program count) + the cross-host process_allgather metric, and the
    # process-0 checkpoint gate. Each worker gets a DIFFERENT ckpt path
    # (simulating per-host local disks): only worker 0's file may appear.
    import tempfile

    from dgod_tpu.data import transforms as T

    T.CANVAS = (32, 64)
    T.TRAIN_SIZE = (32, 64)
    T.MIN_SIZE = 32
    T.MAX_SIZE = 64
    T.MIN_AREA = 1.0

    from dgod_tpu.data.dataset import ConcatDataset, Subset
    from dgod_tpu.data.loader import EvalLoader, TrainLoader
    from dgod_tpu.train.harness import Trainer

    class _PlantedBox:
        def __init__(self, n, domain, seed=0):
            r = np.random.RandomState(seed * 13 + domain)
            self.images = [r.randint(0, 255, (32, 64, 3), np.uint8)
                           for _ in range(n)]
            self.domain = domain

        def __len__(self):
            return len(self.images)

        def __getitem__(self, i):
            return (self.images[i].copy(),
                    np.array([[6.0, 6.0, 30.0, 26.0]], np.float32),
                    np.array([1], np.int32), self.domain)

    train_full = ConcatDataset([_PlantedBox(4, 0), _PlantedBox(4, 1)])
    val_full = _PlantedBox(5, 0, seed=7)
    tr_lo, tr_hi = multihost.host_shard_range(len(train_full), even=True)
    vl_lo, vl_hi = multihost.host_shard_range(len(val_full))
    eval_b = 2
    per_max = -(-len(val_full) // N_PROC)
    pad_batches = -(-per_max // eval_b)

    tmpdir = tempfile.mkdtemp(prefix=f"dgod_mp_w{process_id}_")
    ckpt = os.path.join(tmpdir, "m.ckpt")
    model2 = DGFCOSModel(num_classes=9, num_domains=2, canvas=(32, 64),
                         backbone_block_counts=(1, 1, 1, 1))
    trainer = Trainer(
        model2,
        TrainLoader(Subset(train_full, tr_lo, tr_hi), 2, dg=True,
                    num_workers=2, max_gt=8),
        EvalLoader(Subset(val_full, vl_lo, vl_hi), eval_b, True,
                   num_workers=2, max_gt=8, pad_to_batches=pad_batches),
        dg=True, max_epochs=0, ckpt_path=ckpt, log_every=1, mesh=mesh,
    )
    assert trainer.fused_pairs
    stats = trainer.train_epoch()
    assert trainer.global_step == 4, trainer.global_step  # 2 fused pairs
    val = trainer.validate()
    trainer._save_checkpoint(0, float(val["map_50"]))
    wrote = os.path.exists(ckpt)
    assert wrote == (process_id == 0), (
        f"ckpt gate broken: worker {process_id} wrote={wrote}")
    print(f"worker {process_id}: harness epoch loss {stats['loss']:.6f} "
          f"val mAP@0.5 {val['map_50']:.6f} ckpt_written={wrote}",
          flush=True)


def _attempt(coordinator: str):
    env = dict(os.environ)
    # never dial the single-slot TPU relay from the workers; CPU only
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = _xla_flags()

    procs = []
    for i in range(N_PROC):
        code = (f"import sys; sys.path.insert(0, {REPO!r}); "
                "from scripts.check_multiprocess_cpu import worker; "
                f"worker({i}, {coordinator!r})")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs, rcs = [], []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n<<TIMEOUT>>"
        outs.append(out)
        rcs.append(p.returncode)
        print(f"--- worker {i} (rc={p.returncode}) ---\n{out}", flush=True)

    if any(rc != 0 for rc in rcs):
        print(f"FAIL: worker rcs {rcs}")
        return 1

    losses = []
    harness = []
    for i, out in enumerate(outs):
        m = re.search(r"pair\(0\+4\) losses ([\d.]+)/([\d.]+)", out)
        if not m:
            print("FAIL: missing loss line")
            return 1
        losses.append((float(m.group(1)), float(m.group(2))))
        h = re.search(r"harness epoch loss ([\d.]+) val mAP@0.5 ([\d.]+) "
                      r"ckpt_written=(\w+)", out)
        if not h:
            print("FAIL: missing harness line")
            return 1
        harness.append((float(h.group(1)), float(h.group(2)), h.group(3)))
    if losses[0] != losses[1]:
        print(f"FAIL: cross-process loss mismatch {losses}")
        return 1
    # the SPMD epoch loss and the allgathered val mAP must be identical on
    # every host (identical plateau/early-stop decisions); the single-file
    # checkpoint must come from process 0 only
    if harness[0][:2] != harness[1][:2]:
        print(f"FAIL: cross-process harness mismatch {harness}")
        return 1
    if [h[2] for h in harness] != ["True", "False"]:
        print(f"FAIL: checkpoint gate broken {harness}")
        return 1
    print(f"PASS: 2-process jax.distributed DG pair step, losses agree "
          f"{losses[0][0]:.6f}/{losses[0][1]:.6f}; harness epoch + "
          f"validate agree (mAP {harness[0][1]:.4f}), ckpt on process 0 "
          "only")
    return 0


def main() -> int:
    # bind-then-close port picking is a TOCTOU race (another process can
    # grab the port before the coordinator binds it) — retry with a fresh
    # port rather than stalling both workers to the communicate() timeout
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        rc = _attempt(f"localhost:{port}")
        if rc == 0:
            return 0
        print(f"attempt {attempt} failed (port {port}); retrying"
              if attempt < 2 else "FAIL after 3 attempts")
    return 1


if __name__ == "__main__":
    sys.exit(main())
