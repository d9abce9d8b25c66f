"""Test bootstrap: force the CPU backend with 8 virtual devices.

The axon sitecustomize imports jax at interpreter start (before pytest loads
this conftest), so env vars are too late — but backends initialize lazily, so
``jax.config.update`` still wins as long as no array op has run yet. 8 CPU
devices serve the mesh / shard_map / collective tests (SURVEY.md §4.2 #4);
benches run on the real chip outside pytest.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 CPU devices, got {len(devs)}"
    return devs
