"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; shardings are validated on
host-platform virtual devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).

Note: the environment's TPU plugin prepends itself to jax_platforms, so
JAX_PLATFORMS alone is not enough — we override the config after import
(before any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the WFA sweep kernels are compile-heavy
jax.config.update("jax_compilation_cache_dir", "/tmp/wfmash_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
