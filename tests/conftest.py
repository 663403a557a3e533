"""Test config: run JAX on CPU with 8 virtual devices for sharding tests.

This is the standard JAX fake-multi-device trick (SURVEY.md §4): multi-chip
code paths (mesh/pjit/shard_map/collectives) compile and execute on N host
CPU devices, so the suite needs no TPU pod. Must be set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import pathlib

import numpy as np
import pytest

import jax

# IMPORTANT: the axon TPU sitecustomize (PYTHONPATH=/root/.axon_site)
# registers its plugin at interpreter start and sets the *config value*
# jax_platforms="axon,cpu", which overrides the JAX_PLATFORMS env var.
# Force the config back so tests really run on 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: full-forward CPU compiles take minutes; cache
# them across test sessions.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
ARTIFACTS = pathlib.Path(__file__).parent.parent / "artifacts"


@pytest.fixture(scope="session", autouse=True)
def _protect_repo_label_mappings():
    """The checked-in reference label_mappings.json was once clobbered by
    a test run (extract_fpaths' old cwd-relative default). Fail the
    session loudly if any test writes it again."""
    p = pathlib.Path(__file__).parent.parent / "label_mappings.json"
    before = p.read_bytes() if p.exists() else None
    yield
    after = p.read_bytes() if p.exists() else None
    assert before == after, (
        "a test overwrote the repo's checked-in label_mappings.json — "
        "pass an explicit label_mappings_fpath"
    )


@pytest.fixture(scope="session")
def forward_golden():
    return dict(np.load(GOLDEN_DIR / "forward_golden.npz"))


@pytest.fixture(scope="session")
def resize_golden():
    return dict(np.load(GOLDEN_DIR / "resize_golden.npz"))


@pytest.fixture(scope="session")
def cv2_resize_golden():
    return dict(np.load(GOLDEN_DIR / "cv2_resize_golden.npz"))


@pytest.fixture(scope="session")
def converted_variables():
    """Reference checkpoint converted to our schema (requires artifacts/)."""
    from roomnet_tpu.params import schema

    path = ARTIFACTS / "roomnet_params.npz"
    if not path.exists():
        pytest.skip("artifacts/roomnet_params.npz missing — run converter first")
    return schema.unflatten_variables(dict(np.load(path)))
