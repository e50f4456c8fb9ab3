"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``).  Env vars must be
set before jax initializes its backends, hence at conftest import time.
"""

import os
import pathlib

# Force CPU: the harness exports JAX_PLATFORMS=axon (the tunneled TPU),
# which is far too slow for the dispatch-heavy unit tests and must be
# reserved for benchmarks.  Stash the original platform first so the
# hardware-kernel test (test_tpu_hardware.py) can auto-enable itself
# when the suite runs on a machine that actually has an accelerator.
os.environ.setdefault(
    "REDUX_TPU_ORIG_PLATFORMS", os.environ.get("JAX_PLATFORMS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"
# Small kernel lane width on CPU: interpret-mode cost scales with padded
# lanes; semantics are lane-width independent (the TPU default is wider).
os.environ.setdefault("REDUX_TPU_LANES", "128")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# Some pytest plugins import jax before this conftest runs, making the env
# var too late — force the platform through the config API as well (works
# until a backend is actually initialized).
jax.config.update("jax_platforms", "cpu")

# (The persistent compile cache itself is configured by the redux_tpu
# package import — tests share the same cache directory.)

REFERENCE = pathlib.Path("/root/reference")
RESOURCES = REFERENCE / "resources"


@pytest.fixture(scope="session")
def resources() -> pathlib.Path:
    if not RESOURCES.is_dir():
        pytest.skip("reference corpora not mounted")
    return RESOURCES


def corpus_file(*parts: str) -> pathlib.Path:
    return RESOURCES.joinpath(*parts)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run the full-corpus grid tier (the reference gates these to "
        "release builds, tests/corpora.rs via cfg_attr(debug_assertions))",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: full-corpus grid (needs --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="needs --runslow (corpus grid tier)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
