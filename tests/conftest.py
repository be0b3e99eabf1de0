"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""
import os

# neutralize the axon TPU sitecustomize (it force-registers the TPU
# backend even when JAX_PLATFORMS=cpu)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    # The env-var set above is too late when a sitecustomize has already
    # imported jax (it snapshots JAX_PLATFORMS at import); the config
    # update works any time before first backend init, so force CPU here
    # unless the user explicitly opts the suite onto real hardware.
    if os.environ.get("FTPU_TEST_TPU") != "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
    # persistent jit-compile cache across test runs (the XLA-scan
    # kernels cost ~1 min of CPU compile each, paid once)
    from falcon_tpu.utils.jaxinit import setup_jax
    setup_jax()
