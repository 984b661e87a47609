"""Test configuration: force an 8-device virtual CPU platform BEFORE jax import.

Multi-chip sharding paths are exercised on a virtual CPU mesh (the TPU-native
answer to multi-node testing without a cluster, per SURVEY.md §4).
"""

import os

# Force-overwrite: the machine environment pins JAX_PLATFORMS=axon (a remote
# TPU tunnel) and its sitecustomize imports jax and sets jax_platforms before
# user code runs, so the env var alone is not enough — running the unit suite
# over the tunnel would make every eager op a network round trip. Tests run on
# a local 8-device virtual CPU platform instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture()
def tmp_home(tmp_path, monkeypatch):
    """Isolated APEX home dir for filesystem-touching tests."""
    monkeypatch.setenv("APEX_HOME_DIR", str(tmp_path / "apex_home"))
    monkeypatch.delenv("APEX_MANIFEST_PATHS", raising=False)
    return tmp_path / "apex_home"
