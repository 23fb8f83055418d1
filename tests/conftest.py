"""Test configuration: force the CPU backend with 8 virtual devices so
sharding tests exercise real multi-device code paths without TPU hardware
(the driver's multichip dryrun does the same).

The environment's sitecustomize pins jax_platforms to the remote-TPU "axon"
plugin; overriding the config after import is what actually sticks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Route mid-size meshes (>4k dofs) to the sparse tier: on the CPU test
# backend the dense-QR path is LAPACK-bound and slow, and the 1D/2D cases
# below the limit still cover it.
os.environ.setdefault("HELMHOLTZ_X_TPU_DENSE_LIMIT", "4000")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
