"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on a virtual 8-device CPU mesh, matching how the driver dry-runs
`__graft_entry__.dryrun_multichip`.
"""

import os

# Force CPU: the shell exports JAX_PLATFORMS=axon (one real TPU chip), but
# the suite needs the 8-device virtual CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from diffcodec_tpu.utils.jax_cache import enable_persistent_cache  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config flag
# wins, so set it explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Single-core host: persistent compile cache makes rerun compiles ~free.
enable_persistent_cache()
