"""Test configuration: force CPU with 8 virtual devices so sharding/pjit code
paths are exercised without TPU hardware (SURVEY.md §4 'distributed tests
without a cluster').

Note: the runtime environment pre-imports jax via sitecustomize and pins the
'axon' TPU platform through env vars, so plain env-var overrides are too late.
jax.config.update is authoritative; XLA_FLAGS is still read lazily at first
CPU-backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: reruns of the suite hit cached executables
from motionstyle.utils import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test (CLI chains, protocols)")
    config.addinivalue_line(
        "markers", "quick: the ~5-min pre-commit gate "
                   "(python -m pytest tests/ -m quick): goldens, diffusion "
                   "math, masks, parser, codec, serve fuzz. The full suite "
                   "stays the merge gate")


# the quick gate's module set: correctness-critical, fast, wide coverage.
# Everything else (CLI chains, trainers, protocols) stays full-suite-only.
QUICK_MODULES = {
    "test_rotations", "test_rotations_property", "test_schedule_property",
    "test_diffusion", "test_plms_vlb", "test_resample", "test_models",
    "test_skeleton_features", "test_bvh_property", "test_dtype",
    "test_packaging", "test_serve", "test_forecast_sampling",
    "test_sampler_update",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in QUICK_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def goldens():
    """Load all committed golden npz files keyed by basename."""
    out = {}
    for fn in os.listdir(GOLDEN_DIR):
        if fn.endswith(".npz"):
            out[fn[:-4]] = np.load(os.path.join(GOLDEN_DIR, fn), allow_pickle=True)
    return out
