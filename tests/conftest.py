"""Test config: force an 8-device CPU mesh before jax initializes.

Multi-chip sharding paths are validated on a virtual CPU mesh (the JAX idiom
for testing pjit/shard_map without a pod); Pallas kernels run in interpret
mode in tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; force CPU explicitly so tests
# run on the virtual 8-device host mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the heavy compiles (full train step through
# the seg head, real-size configs) dominate suite wall time; cache them
# across runs. Safe to delete .jax_cache/ at any time.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running training-evidence tests")


@pytest.fixture(scope="session")
def mesh8():
    from video_llava_seg_tpu.config import MeshConfig
    from video_llava_seg_tpu.parallel import create_mesh

    return create_mesh(MeshConfig(data_parallel=4, model_parallel=2))


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
