"""Ragged grouped MoE GEMM (ops/moe_gmm.py, the MUL_MAT_ID prefill path):
sort/pad bookkeeping invariants and numeric parity vs the dense-masked
moe_ffn on the same weights (interpret mode — no TPU needed)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tpullm.gguf.constants import GGMLType
from tpullm.models.config import ModelConfig
from tpullm.models.llama import moe_ffn
from tpullm.ops.moe_gmm import TM, grouped_qmm, sort_by_expert
from tpullm.ops.qtensor import qtensor_from_float

E, USED, D, NFF = 4, 2, 512, 512


@pytest.fixture(scope="module")
def moe_weights():
    from tpullm.runtime.loader import _stack_qtensors

    rng = np.random.default_rng(3)

    def mk(n, k):  # per-layer (E, n, k) kmajor, stacked over 2 layers
        return _stack_qtensors([
            qtensor_from_float(
                rng.standard_normal((E, n, k)).astype(np.float32) * 0.05,
                GGMLType.Q8_0, device_put=False)
            for _ in range(2)])

    gate, up, down = mk(NFF, D), mk(NFF, D), mk(D, NFF)
    assert gate.layout == "kmajor", "expert weights must pack kmajor"
    router = qtensor_from_float(
        rng.standard_normal((2, E, D)).astype(np.float32) * 0.1,
        GGMLType.F32)
    return gate, up, down, router


def test_sort_by_expert_layout():
    rng = np.random.default_rng(0)
    M = 64
    top_i = jnp.asarray(rng.integers(0, E, (M, USED)), jnp.int32)
    order, dest, tile_expert, Mp = sort_by_expert(top_i, E, M)
    assert Mp % TM == 0
    ef = np.asarray(top_i).reshape(-1)
    o = np.asarray(order)
    d = np.asarray(dest)
    te = np.asarray(tile_expert)
    # destinations are unique and land in the owning expert's tile range
    assert len(set(d.tolist())) == len(d)
    for a in range(len(o)):
        e = ef[o[a]]
        assert te[d[a] // TM] == e, (a, e, d[a])


def test_grouped_matches_per_expert(moe_weights):
    gate, up, down, router = moe_weights
    rng = np.random.default_rng(1)
    M = 32
    x = jnp.asarray(rng.standard_normal((M, D)) * 0.3, jnp.bfloat16)
    top_i = jnp.asarray(rng.integers(0, E, (M, USED)), jnp.int32)
    order, dest, tile_expert, Mp = sort_by_expert(top_i, E, M)
    tok_s = np.asarray(order) // USED
    xs_pad = jnp.zeros((Mp, D), jnp.bfloat16).at[dest].set(x[tok_s])
    y = grouped_qmm(xs_pad, tile_expert, gate, NFF, layer=jnp.int32(1),
                    interpret=True)
    # oracle: per-row dense matmul against the routed expert's weights
    gdense = np.asarray(gate.dequant(jnp.float32))[1]  # (E, NFF, D)
    yn = np.asarray(y, np.float32)
    xf = np.asarray(x, np.float32)
    for a in range(M * USED):
        e = int(np.asarray(top_i).reshape(-1)[np.asarray(order)[a]])
        want = xf[tok_s[a]] @ gdense[e].T
        got = yn[int(np.asarray(dest)[a])]
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_ragged_moe_ffn_matches_dense(moe_weights):
    """The full ragged prefill path == the dense-masked moe_ffn."""
    gate, up, down, router = moe_weights
    cfg = ModelConfig(arch="llama", n_embd=D, n_ff=NFF, n_expert=E,
                      n_expert_used=USED)
    cfg._moe_gmm_interpret = True
    qw = {"moe_gate_inp": router, "moe_gate_exps": gate,
          "moe_up_exps": up, "moe_down_exps": down}
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 24, D)) * 0.3, jnp.float32)
    ragged = np.asarray(moe_ffn(x, {}, qw, jnp.int32(0), cfg, jnp.float32))
    cfg2 = ModelConfig(arch="llama", n_embd=D, n_ff=NFF, n_expert=E,
                       n_expert_used=USED)  # no interpret flag, no pallas
    dense = np.asarray(moe_ffn(x, {}, qw, jnp.int32(0), cfg2, jnp.float32))
    nmse = ((ragged - dense) ** 2).mean() / max((dense ** 2).mean(), 1e-12)
    assert nmse < 2e-4, nmse
