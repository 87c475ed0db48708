"""Test harness: force an 8-virtual-device CPU backend.

The reference never had multi-node tests (SURVEY.md §4); here every
sharded code path runs on a virtual 8-device CPU mesh.  The axon TPU
plugin registers itself in sitecustomize and pins jax_platforms, so we
override the config after import (backends are cleared lazily).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from mevi_tpu.parallel.mesh import make_mesh
    return make_mesh(corpus=4)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
