"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised without TPU hardware (SURVEY.md §4 'implication for the build').
Must run before jax initializes its backends — hence module-level env setup.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the tunneled TPU
# backend, which would make every tiny test op pay a network round trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize registers its backend regardless of env vars;
# jax.config is the authoritative override.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_graph():
    """A fixed small graph: 6 nodes, undirected edges, 2 feats, 2 classes."""
    import jax.numpy as jnp
    from graphslim_tpu import graph as G

    edges = np.array([[0, 1], [1, 2], [2, 0], [3, 4], [4, 5], [1, 3]]).T
    adj = G.from_edge_index(edges, 6, symmetrize=True)
    feat = jnp.asarray(np.random.default_rng(1).normal(size=(6, 4)),
                       dtype=jnp.float32)
    labels = jnp.asarray([0, 0, 0, 1, 1, 1], dtype=jnp.int32)
    return adj, feat, labels


@pytest.fixture(scope="session")
def synth_dataset():
    """Small synthetic multi-class dataset through the real data pipeline."""
    from graphslim_tpu.data import load

    return load("synth-small", setting="trans", split="random", seed=0)
