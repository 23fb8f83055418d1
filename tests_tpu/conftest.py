"""On-hardware (TPU) test lane — VERDICT round-4 item 5.

Unlike tests/ (which pins the CPU backend for hermetic fast tests), this
lane runs on the REAL device the rig provides (the axon remote-TPU plugin)
and gates the PRODUCTION device tiers: banded+Ozaki MICCA solve, the
FlamedDuct rank-1 path, and the Pallas double-single kernels whose
compensated arithmetic XLA-CPU rewrites away (docs/BENCH_NOTES.md).

Run ALONE (one TPU job at a time through the tunnel):

    python -m pytest tests_tpu/ -q

Each gate appends a JSON record to tests_tpu/artifacts/device_gates.jsonl
so accuracy drift is diffable across rounds.  The whole lane skips (rather
than failing) when no accelerator is present or the remote session cannot
bind within HELMHOLTZ_X_TPU_DEVICE_WAIT_S (default here: 1200 s — the
session-hold wait documented in utils/warmup.py).
"""

import json
import os
import pathlib

import pytest

os.environ.setdefault("HELMHOLTZ_X_TPU_DEVICE_WAIT_S", "1200")
# the production auto-tier routes sub-60k-dof problems to the host
# (measured tunnel crossover, solvers/linsolve.HOST_SMALL_N); this lane's
# purpose is gating the DEVICE tiers, so disable that routing here
os.environ.setdefault("HELMHOLTZ_X_TPU_HOST_SMALL_N", "0")

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_enable_x64", True)

ARTIFACTS = pathlib.Path(__file__).resolve().parent / "artifacts"


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "cpu":
        skip = pytest.mark.skip(reason="TPU lane: no accelerator backend")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def device():
    """Bound accelerator device (waits out a remote session hold once)."""
    from helmholtz_x_tpu.utils.warmup import start_device_warmup, wait_device

    start_device_warmup()
    if not wait_device(float(os.environ["HELMHOLTZ_X_TPU_DEVICE_WAIT_S"])):
        pytest.skip("device session did not bind within the wait budget")
    return jax.devices()[0]


@pytest.fixture(autouse=True)
def _release_device_factors():
    """Free each test's device band arrays (~2 GB per factor plus Ozaki
    packs) before the next: the adjoint-reuse registry otherwise pins the
    MICCA factors across tests and the FlamedDuct factorization then hits
    the single-chip HBM ceiling."""
    yield
    from helmholtz_x_tpu.solvers import linsolve

    linsolve._recent_banded_factors.clear()
    linsolve._recent_host_factors.clear()


@pytest.fixture(scope="session")
def record_gate():
    """Append a gate record to the JSONL artifact."""
    ARTIFACTS.mkdir(exist_ok=True)
    path = ARTIFACTS / "device_gates.jsonl"

    def _rec(**fields):
        import time

        fields["t"] = round(time.time(), 1)
        with open(path, "a") as f:
            f.write(json.dumps(fields) + "\n")

    return _rec
