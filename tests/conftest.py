"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must be deterministic and runnable anywhere, so we pin JAX to CPU with
8 virtual devices (for multi-chip data-parallel tests per SURVEY.md §4) —
set via env BEFORE jax is imported anywhere in the test process.
"""

import os

# Hard override: the ambient environment may preset JAX_PLATFORMS (e.g. the
# axon TPU tunnel); tests always run on the virtual CPU mesh. A pytest
# plugin may have imported jax already (env vars alone would be ignored),
# so set the config directly too — this works any time before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fixtures import ALANINE, FEATURE_FILE_TEXT, write_fixture_files  # noqa: E402


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("alanine")
    return write_fixture_files(d)


@pytest.fixture(scope="session")
def universe(fixture_dir):
    from molann_tpu.topology import Universe

    return Universe(str(fixture_dir / "alanine.pdb"))


@pytest.fixture(scope="session")
def feature_file(fixture_dir):
    return str(fixture_dir / "features.txt")


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
