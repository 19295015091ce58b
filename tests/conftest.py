"""Test harness configuration.

Runs JAX on the CPU backend with a virtual 8-device mesh (so multi-chip
sharding tests run without TPUs) and enables float64 for numerical-parity
tests, mirroring the reference's float64 consistency strategy
(``cheetah tests/conftest.py:155-235``).
"""

import os

# Must be set before jax initialises a backend. NOTE: the environment may pin
# JAX_PLATFORMS=axon (tunneled TPU) — override it explicitly, since compiling
# over the tunnel makes tests orders of magnitude slower.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import random  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--seed",
        action="store",
        type=int,
        default=random.Random().randint(0, 2**31),
        help="Seed for global random number generators.",
    )


def pytest_report_header(config):
    return f"seed: {config.getoption('--seed')}"


def pytest_collection_modifyitems(config, items):
    """``standalone``-marked tests (strict wall-clock guards) only run when
    explicitly selected with ``-m standalone`` — inside the full suite, host
    pressure from hundreds of compiled programs makes their timing budgets
    meaningless."""
    if "standalone" in config.getoption("-m", default=""):
        return
    skip = pytest.mark.skip(
        reason="strict timing guard; run explicitly with -m standalone"
    )
    for item in items:
        if "standalone" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True)
def seed_random_generators(request):
    """Seed all global RNGs for reproducibility (report seed in header)."""
    seed = request.config.getoption("--seed")
    random.seed(seed)
    np.random.seed(seed % 2**32)

    from cheetah_tpu.utils import rng

    rng.seed(seed)
    return seed


@pytest.fixture
def key(seed_random_generators):
    return jax.random.PRNGKey(seed_random_generators)
