"""Test harness: force an 8-virtual-device CPU backend (multi-chip emulation).

The reference exercises multi-node only on a real SLURM cluster (SURVEY.md §4);
we instead validate all sharding on a virtual mesh, per the standard JAX trick.
Must run before the first `import jax` in any test module.
"""

import os
import sys

# Force CPU even when the ambient env points at a TPU (JAX_PLATFORMS=axon):
# tests need 8 virtual devices and exact fp32 matmuls.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Something in the environment may import jax before this conftest runs (the
# axon TPU plugin reads JAX_PLATFORMS at jax import time); force the platform
# again through the config API, which works until the backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests need 8 virtual CPU devices"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from metamorph_tpu.config import MeshConfig
    from metamorph_tpu.parallel.mesh import build_mesh

    return build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))


@pytest.fixture(autouse=True)
def _reset_mesh_context():
    """make_sharded_train_step registers a process-wide mesh for activation
    constraints; clear it so single-device tests don't constrain against a
    mesh left over from a sharded test."""
    yield
    from metamorph_tpu.parallel.context import set_current_mesh, set_sequence_axis

    set_current_mesh(None)
    set_sequence_axis(None)


_COMPILE_HEAVY_MODULES = {"test_train", "test_trainer", "test_visualizer",
                          "test_serve", "test_serve_spec"}


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_before_heavy_modules(request):
    """The XLA CPU compiler segfaults compiling LARGE programs late in a
    long single-process run (observed 3x: "Fatal Python error: Segmentation
    fault" in backend_compile_and_load at test_train's sharded-step compile,
    after ~257 tests / hundreds of live executables; each suite half passes
    alone). Dropping accumulated executable references before the
    compile-heavy modules keeps the compiler healthy at the cost of a few
    intra-module recompiles."""
    name = request.module.__name__.rsplit(".", 1)[-1]
    if name in _COMPILE_HEAVY_MODULES:
        import jax

        jax.clear_caches()
    yield
