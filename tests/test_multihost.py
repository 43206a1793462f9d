"""multihost.initialize() contract tests (mocked jax.distributed).

The round-2 bug: calling jax.process_count() BEFORE
jax.distributed.initialize() initialises the local backend first, which
defeats cluster init and silently degrades a pod to N independent
single-host jobs (and the bare `except: pass` hid every failure). These
tests pin the fixed contract without needing a real cluster:
- no backend query happens before jax.distributed.initialize(),
- explicit coordinator args are forwarded,
- cluster env (COORDINATOR_ADDRESS etc.) triggers auto-init,
- no cluster signal -> no init call at all (single-host),
- already-initialised -> idempotent no-op,
- initialize() failures PROPAGATE (no silent except).
"""
import pytest

from dgod_tpu.parallel import multihost


class _Recorder:
    def __init__(self, already=False, fail=False):
        self.calls = []
        self.already = already
        self.fail = fail

    def is_initialized(self):
        self.calls.append("is_initialized")
        return self.already

    def initialize(self, **kw):
        self.calls.append(("initialize", kw))
        if self.fail:
            raise RuntimeError("coordinator unreachable")

    # canary: any backend query before initialize() is the round-2 bug
    def process_count(self):
        self.calls.append("process_count")
        return 1


@pytest.fixture
def recorder(monkeypatch):
    rec = _Recorder()
    import jax

    monkeypatch.setattr(jax.distributed, "is_initialized", rec.is_initialized)
    monkeypatch.setattr(jax.distributed, "initialize", rec.initialize)
    monkeypatch.setattr(jax, "process_count", rec.process_count)
    for v in multihost._CLUSTER_ENV_VARS + ("SLURM_JOB_NUM_NODES",):
        monkeypatch.delenv(v, raising=False)
    return rec


def test_explicit_coordinator_forwards_args(recorder):
    multihost.initialize(
        coordinator_address="10.0.0.1:8476", num_processes=4, process_id=2
    )
    assert recorder.calls == [
        "is_initialized",
        ("initialize", dict(coordinator_address="10.0.0.1:8476",
                            num_processes=4, process_id=2)),
    ], "no backend query may precede jax.distributed.initialize()"


def test_cluster_env_triggers_auto_init(recorder, monkeypatch):
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:8476")
    multihost.initialize()
    assert ("initialize", {}) in recorder.calls
    assert "process_count" not in recorder.calls


def test_single_host_no_init(recorder):
    multihost.initialize()
    assert recorder.calls == ["is_initialized"]


def test_idempotent_when_already_initialized(recorder):
    recorder.already = True
    multihost.initialize(coordinator_address="10.0.0.1:8476")
    assert recorder.calls == ["is_initialized"]


def test_failures_propagate(recorder):
    recorder.fail = True
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        multihost.initialize(coordinator_address="10.0.0.1:8476")


def test_num_processes_without_address_still_initializes(recorder):
    """Explicit num_processes/process_id (coordinator via env discovery)
    must not silently no-op on the single-host gate."""
    multihost.initialize(num_processes=4, process_id=2)
    assert ("initialize", dict(coordinator_address=None,
                               num_processes=4, process_id=2)) \
        in recorder.calls


def test_single_node_slurm_does_not_auto_init(recorder, monkeypatch):
    """SLURM sets SLURM_JOB_NUM_NODES=1 on every job incl. interactive
    single-node shells; auto-init there would raise in jax's SlurmCluster
    discovery and crash otherwise-working single-host training."""
    monkeypatch.setenv("SLURM_JOB_NUM_NODES", "1")
    multihost.initialize()
    assert recorder.calls == ["is_initialized"]


def test_multi_node_slurm_auto_inits(recorder, monkeypatch):
    monkeypatch.setenv("SLURM_JOB_NUM_NODES", "4")
    multihost.initialize()
    assert ("initialize", {}) in recorder.calls


def test_host_shard_range_even_vs_ceil(monkeypatch):
    """even=True must give every host the same floor(n/k) slice (unequal
    per-host TRAIN batch counts deadlock the SPMD step); default ceil split
    covers every example (eval)."""
    import jax

    def set_proc(p, k):
        monkeypatch.setattr(jax, "process_index", lambda: p)
        monkeypatch.setattr(jax, "process_count", lambda: k)

    # n=10, k=3: ceil -> 4,4,2 (covers all); even -> 3,3,3 (drops 1)
    ranges_ceil, ranges_even = [], []
    for p in range(3):
        set_proc(p, 3)
        ranges_ceil.append(multihost.host_shard_range(10))
        ranges_even.append(multihost.host_shard_range(10, even=True))
    assert ranges_ceil == [(0, 4), (4, 8), (8, 10)]
    assert ranges_even == [(0, 3), (3, 6), (6, 9)]
    sizes = {b - a for a, b in ranges_even}
    assert sizes == {3}
