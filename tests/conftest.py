import os

# Force CPU backend with 8 virtual devices so sharding/collective code paths
# are exercised without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# the axon sitecustomize forces jax_platforms=axon,cpu; tests must run on
# the virtual 8-device CPU mesh regardless
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


REF_TEST_DIR = "/root/reference/test"


@pytest.fixture(scope="session")
def toy_fasta():
    return os.path.join(REF_TEST_DIR, "ref.fa")


@pytest.fixture(scope="session")
def toy_mut_fasta():
    return os.path.join(REF_TEST_DIR, "mut.fa")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def random_genome(rng, n):
    return rng.integers(0, 4, size=n).astype(np.uint8)
