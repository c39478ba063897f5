"""Test configuration: force CPU jax with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4: the
rebuild's analogue of the reference's GPU-free golden CRC strategy)."""

import os

# Must be set before jax is imported anywhere.  Override unconditionally:
# the session environment points JAX at TPU hardware (JAX_PLATFORMS=axon),
# but the test suite runs CPU-only by design; set FRACTALSHARK_TEST_TPU=1
# to run tests against the real chip.
if os.environ.get("FRACTALSHARK_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("FRACTALSHARK_TEST_TPU") != "1":
    # The axon sitecustomize force-selects the TPU platform even when
    # JAX_PLATFORMS=cpu is in the environment; override via config.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
