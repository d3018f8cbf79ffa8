"""Multi-host SPMD serving loop: a REAL 2-process group serves requests
through the op-broadcast protocol (coordinator serves, host 1 follows),
and the lockstep output must equal a plain single-host engine's greedy
decode on the same model."""
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
import numpy as np
from tpullm.gguf.constants import GGMLType
from tpullm.parallel.distributed import global_mesh, init_distributed, sync_hosts
from tpullm.server.multihost import MultiHostEngine
from tpullm.utils.synth import synth_qparams

ctx = init_distributed()
mesh = global_mesh(tp=2, dp=2)  # 2 local devices x 2 hosts
cfg, params = synth_qparams(
    vocab_size=128, n_embd=256, n_layer=2, n_head=8, n_head_kv=4,
    n_ff=512, qtype=GGMLType.Q8_0, seed=5, device_put=False)
eng = MultiHostEngine(cfg, params, mesh, max_seq_len=64)

TASKS = [([3, 5, 7, 9], 6), ([2, 4, 8], 4)]
if ctx.is_coordinator:
    outs = eng.serve(list(TASKS))
    # oracle: plain single-host greedy on the same checkpoint
    import jax.numpy as jnp
    from tpullm.runtime.engine import InferenceEngine
    cfg2, params2 = synth_qparams(
        vocab_size=128, n_embd=256, n_layer=2, n_head=8, n_head_kv=4,
        n_ff=512, qtype=GGMLType.Q8_0, seed=5)
    ref = InferenceEngine(cfg2, params2, max_seq_len=64,
                          compute_dtype=jnp.float32, decode_chunk=2)
    for (prompt, mnt), got in zip(TASKS, outs):
        want = ref.generate([prompt], max_new_tokens=mnt).tokens[0]
        assert got == want, (prompt, got, want)
else:
    served = eng.follow()
    assert served == 2, served
sync_hosts("done")
print(f"worker {ctx.process_id} OK", flush=True)
"""


@pytest.mark.skipif(os.environ.get("TPULLM_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_spmd_serving_two_hosts():
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
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid}:\n{out[-3000:]}"
        assert f"worker {pid} OK" in out
