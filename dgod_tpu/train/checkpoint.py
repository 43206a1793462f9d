"""Checkpoint stores.

Two formats behind one interface:

- PickleStore: single-file, synchronous, host-only — byte-compatible with
  the original harness format and the reference's one-ckpt-file workflow
  (train_driving_dg.py:154-155). Chosen for paths ending in '.ckpt'.
- OrbaxStore: directory-based orbax CheckpointManager — ASYNC saves (the
  train loop never blocks on filesystem writes) and multihost/sharded-array
  correct (each process writes its own shards), with best-only retention
  (max_to_keep=1). The production choice once training spans hosts.

The reference itself has neither async nor distributed checkpointing (PL
ModelCheckpoint, SURVEY §5); this subsystem intentionally exceeds it.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

from flax import serialization


class PickleStore:
    """Single-file pickle checkpoints (atomic replace)."""

    def __init__(self, path: str):
        self.path = path

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def save(self, step: int, params, opt_state, meta: Dict[str, Any]):
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        payload = {
            "params": serialization.to_bytes(params),
            "opt_state": serialization.to_bytes(opt_state),
            "meta": dict(meta, step=step),
        }
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, self.path)

    def load_latest(self, params_template, opt_state_template
                    ) -> Optional[Tuple[Any, Any, Dict]]:
        if not self.exists():
            return None
        with open(self.path, "rb") as f:
            head = f.read(2)
            f.seek(0)
            if head == b"PK":
                # torch>=1.6 saves are zip archives; a reference-produced
                # .ckpt left at the warm-start path is the likeliest cause
                # (train_driving_dg.py:154-155 workflow).
                raise ValueError(
                    f"{self.path} is a PyTorch zip checkpoint, not a dgod_tpu "
                    "one. Move it aside and port it with --torch_weights "
                    f"{self.path} instead (utils/weights.port_torchvision).")
            payload = pickle.load(f)
        if not (isinstance(payload, dict)
                and {"params", "opt_state"} <= payload.keys()):
            # legacy (pre-zip) torch pickles load fine but have the wrong
            # schema ('state_dict', torch tensors) — fail with a pointer
            # rather than letting from_bytes crash opaquely.
            raise ValueError(
                f"{self.path} is not a dgod_tpu checkpoint (keys: "
                f"{sorted(payload) if isinstance(payload, dict) else type(payload).__name__}). "
                "If it came from the PyTorch reference, move it aside and "
                "port it via --torch_weights.")
        params = serialization.from_bytes(params_template, payload["params"])
        opt_state = serialization.from_bytes(
            opt_state_template, payload["opt_state"])
        return params, opt_state, payload.get("meta", {})

    def wait(self):
        pass


class OrbaxStore:
    """Async orbax CheckpointManager keeping only the best checkpoint."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.dir = os.path.abspath(directory)
        self.mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, enable_async_checkpointing=True
            ),
        )

    def exists(self) -> bool:
        return self.mgr.latest_step() is not None

    def save(self, step: int, params, opt_state, meta: Dict[str, Any]):
        ocp = self._ocp
        self.mgr.save(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_sanitize(
                    {"params": params, "opt_state": opt_state})),
                meta=ocp.args.JsonSave({k: _jsonable(v) for k, v in meta.items()}),
            ),
        )

    def load_latest(self, params_template, opt_state_template
                    ) -> Optional[Tuple[Any, Any, Dict]]:
        ocp = self._ocp
        step = self.mgr.latest_step()
        if step is None:
            return None
        restored = self.mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(_sanitize(
                    {"params": params_template, "opt_state": opt_state_template})),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = dict(restored["meta"] or {})
        return restored["state"]["params"], restored["state"]["opt_state"], meta

    def wait(self):
        self.mgr.wait_until_finished()


def _sanitize(tree):
    """numpy scalar leaves (np.int32(0), ...) -> 0-d ndarrays for orbax."""
    import jax
    import numpy as np

    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, np.generic) else x, tree)


def _jsonable(v):
    try:
        import numpy as np

        if isinstance(v, (np.floating, np.integer)):
            return v.item()
    except Exception:
        pass
    return v


def make_store(path: str):
    """'.ckpt' suffix -> single-file pickle (reference-parity workflow);
    anything else -> orbax directory."""
    if path.endswith(".ckpt"):
        return PickleStore(path)
    return OrbaxStore(path)
