"""Test env setup (SURVEY.md §4.2-§4.3).

Platform selection MUST happen before jax import: the axon sitecustomize
registers the TPU plugin when PALLAS_AXON_POOL_IPS is set, and first TPU op
costs ~53 s — unit tests therefore default to the CPU backend with 8
simulated devices (exact collective semantics, SURVEY.md §4.3). Set
TPQ_TEST_PLATFORM=axon to run the TPU-marked suite on the real chip.
"""

import os
import subprocess
import sys
from pathlib import Path

_PLATFORM = os.environ.get("TPQ_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _PLATFORM
# Pallas interpret-mode programs compile slowly on XLA:CPU; the persistent
# cache makes re-runs of the suite near-instant (SURVEY.md §7.4.7).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tests")
if _PLATFORM == "cpu":
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep axon from hijacking
    # The axon sitecustomize imports jax at interpreter startup, freezing
    # env-var config before this file runs — jax.config.update still works.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ORACLE_BIN = REPO / "oracle" / "build" / "oracle"


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs the real TPU chip (run with TPQ_TEST_PLATFORM=axon)")
    config.addinivalue_line("markers", "slow: long-running scale test")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and _PLATFORM == "cpu":
            item.add_marker(pytest.mark.skip(reason="TPU-only (set TPQ_TEST_PLATFORM=axon)"))


@pytest.fixture(scope="session")
def oracle_bin() -> Path:
    """Builds the C++ oracle (once, cached by mtime)."""
    src = sorted((REPO / "oracle").glob("*.cc")) + sorted((REPO / "oracle").glob("*.h"))
    if ORACLE_BIN.exists() and all(ORACLE_BIN.stat().st_mtime > f.stat().st_mtime for f in src):
        return ORACLE_BIN
    ORACLE_BIN.parent.mkdir(parents=True, exist_ok=True)
    # The oracle is the ground truth: build it paranoid (SURVEY.md §5.2) —
    # ASan+UBSan with no recovery, still -O2 so slow tests stay fast.
    subprocess.run(
        ["g++", "-std=c++17", "-O2", "-Wall",
         "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
         "-o", str(ORACLE_BIN), str(REPO / "oracle" / "main.cc")],
        check=True,
    )
    return ORACLE_BIN


@pytest.fixture(scope="session")
def oracle(oracle_bin):
    """Callable: oracle("join", algo="hash", left=..., ...) -> stdout."""

    def run(cmd: str, **kwargs) -> str:
        argv = [str(oracle_bin), cmd] + [f"--{k}={v}" for k, v in kwargs.items()]
        res = subprocess.run(argv, capture_output=True, text=True)
        if res.returncode != 0:
            raise RuntimeError(f"oracle failed: {argv}\n{res.stderr}")
        return res.stdout

    return run


def assert_tables_equal(engine_cols: dict, oracle_cols: dict, msg=""):
    """Byte-level equality of canonical forms."""
    assert list(engine_cols.keys()) == list(oracle_cols.keys()), (
        f"{msg}: column mismatch {list(engine_cols)} vs {list(oracle_cols)}"
    )
    for k in engine_cols:
        a, b = np.asarray(engine_cols[k]), np.asarray(oracle_cols[k])
        assert a.shape == b.shape, f"{msg}: col {k} rows {a.shape} vs {b.shape}"
        assert np.array_equal(a, b), f"{msg}: col {k} differs"
