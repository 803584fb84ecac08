"""Test configuration: force an 8-device CPU platform so every test can
exercise multi-chip sharding (Mesh/pjit/shard_map) without TPU hardware.

This stands in for the multi-GPU `torchrun` fixture the reference uses
(Megatron-LM-240603/tests/unit_tests/test_utilities.py) — JAX's host-device
simulation gives us the multi-device coverage the reference only gets on a
real node.
"""

import os

# Hard override: the machine image pins JAX_PLATFORMS=axon (real TPU) via env
# + sitecustomize; tests must run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8
