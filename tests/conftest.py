"""Test harness: force an 8-device virtual CPU platform so data-parallel
sharding semantics are testable without a TPU pod (the reference only ever
exercised distribution on real 8-GPU rigs; we do better).

Note: the env var alone is not enough on hosts where the axon TPU plugin is
registered — jax.config.update after import is authoritative.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Golden fixtures + reference oracles were recorded with bilinear I2P
# sampling (strict reference parity). The package default at eval is the
# quality-gated "nearest" lever (PERF.md round 3); tests pin the parity
# mode. Equivalence of the two modes is covered by test_mmri_encoder.py.
os.environ.setdefault("DI_I2P_SAMPLE", "bilinear")
# MSDA eval-time top-k point reduction stays off in tests (parity mode);
# the lever itself is covered by test_deform_topk.py. The package default
# at eval is joint k=4 (quality-gated, PERF.md round 3).
os.environ.setdefault("DI_MSDA_EVAL_POINTS", "0")
os.environ.setdefault("DI_MSDA_JOINT_POINTS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()

# In-process CPU collectives abort the process when straggler virtual-device
# threads miss a rendezvous by 40 s — routine when 8 device threads share one
# throttled core. Values MUST match __graft_entry__._CPU_COLLECTIVE_TIMEOUT_FLAGS:
# they are part of the compilation-cache key, and matching lets driver dry
# runs hit the cache entries compiled by test runs.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _CPU_COLLECTIVE_TIMEOUT_FLAGS  # noqa: E402

for f in _CPU_COLLECTIVE_TIMEOUT_FLAGS:
    if f.split("=")[0] not in flags:
        flags += " " + f
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 tests must not silently run matmuls in bf16 (TPU default)
jax.config.update("jax_default_matmul_precision", "highest")
# the host is heavily CPU-throttled; persist compiled executables across
# pytest processes so reruns skip the multi-minute compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
