"""Multi-host foundation: a REAL 2-process jax.distributed group over DCN
(localhost TCP), each process with virtual CPU devices — the fake-cluster
harness the reference lacks (SURVEY §4 "no fake-cluster harness").

Each worker initializes the process group, builds the global mesh, runs a
psum over a sharded array, and checks the globally-reduced value. This
validates the coordinator/process-group path that multi-host serving uses;
collectives themselves are the same XLA ops the single-host tests cover.
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["TPULLM_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from tpullm.parallel.distributed import (broadcast_from_coordinator,
                                         global_mesh, init_distributed,
                                         sync_hosts)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

ctx = init_distributed()
assert jax.process_count() == 2, jax.process_count()
mesh = global_mesh(tp=2, dp=2)  # 2 local devices x 2 hosts
x = jnp.arange(8, dtype=jnp.float32) + 1.0

@jax.jit
def total(x):
    return x.sum()

sh = NamedSharding(mesh, P(("dp", "tp")))
from jax.experimental import multihost_utils
gx = multihost_utils.host_local_array_to_global_array(
    np.arange(4, dtype=np.float32) + 4 * ctx.process_id, mesh, P(("dp", "tp")))
with mesh:
    s = total(gx)
val = float(s)  # result is replicated on every host
assert abs(val - 28.0) < 1e-6, val  # sum(0..7)
b = broadcast_from_coordinator(np.asarray([17 + ctx.process_id * 100]))
assert int(b[0]) == 17, b  # everyone sees the coordinator's value
sync_hosts("done")
print(f"worker {ctx.process_id} OK", flush=True)
"""


@pytest.mark.skipif(os.environ.get("TPULLM_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_group(tmp_path):
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "TPULLM_REPO": repo,
            "TPULLM_COORDINATOR": f"127.0.0.1:{port}",
            "TPULLM_NUM_PROCESSES": "2",
            "TPULLM_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid}:\n{out[-3000:]}"
        assert f"worker {pid} OK" in out
