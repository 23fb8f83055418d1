"""Two-process jax.distributed smoke test for parallel/runtime.py.

Launches TWO actual OS processes (coordinator + worker) on localhost, each
with 2 virtual CPU devices, initializes the multi-host runtime through
`initialize_distributed`, and runs a psum over a global 4-device mesh plus a
dof-sharded SpMV slice — the minimal multiprocess execution the real
multi-host path (Cloud TPU slices) would perform.  This executes the
jax.distributed contract (coordinator service, cross-process device
visibility, collectives over the global mesh) that single-process
virtual-device tests cannot reach.  (SURVEY §5 / round-3 verdict item 9.)
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

rank = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
from helmholtz_x_tpu.parallel.runtime import dof_mesh, initialize_distributed

multi = initialize_distributed(coordinator=f"localhost:{port}",
                               num_processes=2, process_id=rank)
assert multi, "distributed runtime did not report multi-process"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = dof_mesh()
from helmholtz_x_tpu.parallel.dist import AXIS

# global psum across the 4 global devices (2 per process)
@jax.jit
def global_sum():
    def body():
        return jax.lax.psum(jnp.ones(()), AXIS)

    return shard_map(body, mesh=mesh, in_specs=(), out_specs=P())()

s = float(np.asarray(global_sum().addressable_data(0)))
assert s == 4.0, s

# dof-sharded matvec: y = A x with A row-sharded over the global mesh,
# columns gathered — the halo-free all-gather SpMV pattern of parallel/dist
n = 32
rng = np.random.default_rng(0)
A = rng.standard_normal((n, n))
x = rng.standard_normal(n)
shard = NamedSharding(mesh, P(AXIS))
rep = NamedSharding(mesh, P())

Ad = jax.device_put(jnp.asarray(A), NamedSharding(mesh, P(AXIS, None)))
xd = jax.device_put(jnp.asarray(x), rep)


@jax.jit
def spmv(Ad, xd):
    def body(Ab, xb):
        return Ab @ xb

    return shard_map(body, mesh=mesh,
                     in_specs=(P(AXIS, None), P()),
                     out_specs=P(AXIS))(Ad, xd)


y = spmv(Ad, xd)
y_exact = A @ x
for sh in y.addressable_shards:  # this process's rows of the global result
    got = np.asarray(sh.data).ravel()
    want = y_exact[sh.index[0]]
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()
print(f"RANK{rank}_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_spmv(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(rank), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank}_OK" in out, out[-3000:]
