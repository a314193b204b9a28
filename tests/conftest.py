"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), something the torch reference
cannot do. Must run before the first ``import jax`` anywhere in the test
session, hence the env mutation at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-register an accelerator plugin whose platform wins
# over the env var (it is read before we get a chance to mutate os.environ in
# some launch paths) — force it through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
