"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without TPU hardware the standard way:
``--xla_force_host_platform_device_count`` (see task brief; SURVEY section 4
"Implication for the rebuild").

Note: this image pre-registers an experimental TPU platform plugin via
sitecustomize, which overrides ``JAX_PLATFORMS`` from the environment —
``jax.config.update`` after import is the reliable way to pin tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
