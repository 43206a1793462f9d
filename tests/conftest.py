"""Test config.

- Virtual 8-device CPU mesh available via jax.devices('cpu') (the standard
  JAX fake-multi-device trick standing in for a pod slice). Note: in the
  bench environment the *default* backend is a single TPU chip regardless
  of JAX_PLATFORMS; multi-device tests must request 'cpu' explicitly.
- Persistent compilation cache: model-sized jit compiles dominate suite
  runtime; caching makes repeat runs fast.

Must run before jax initialises.
"""
import os

# FORCE cpu (not setdefault): the bench environment exports
# JAX_PLATFORMS=axon (the TPU tunnel), and running this suite over the
# tunnel serialises every dispatch through one remote chip — the suite
# semantics are CPU-only by design (see module docstring).
os.environ["JAX_PLATFORMS"] = "cpu"
# On hosts where a TPU plugin registers even under JAX_PLATFORMS=cpu (the
# axon tunnel does), jax.default_backend() reports 'tpu' inside this "CPU"
# suite. Pin the dispatchers to the XLA paths: the CPU suite tests
# semantics; Mosaic lowering is tested by scripts/check_pallas_*_tpu.py on
# the real chip. (Kernel unit tests pass interpret=True explicitly.)
os.environ.setdefault("DGOD_MATCHER", "xla")
os.environ.setdefault("DGOD_ROI_ALIGN", "xla")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_test_cache")
)

import jax  # noqa: E402

try:
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
