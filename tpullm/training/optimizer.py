"""In-graph optimizers: AdamW and SGD over a params pytree.

Matches ggml-opt's semantics (ggml/src/ggml-opt.cpp, GGML_OP_OPT_STEP_ADAMW
in ggml/src/ggml.c): AdamW with bias-corrected moments and decoupled weight
decay applied as p *= (1 - alpha*wd); SGD as p = p*(1-alpha*wd) - alpha*g.
Moments are stored in f32 regardless of param dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def adamw_init(params):
    """-> opt state {m, v, t} (f32 moments per leaf)."""
    zeros = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params)
    return {"m": zeros,
            "v": jax.tree_util.tree_map(jnp.copy, zeros),
            "t": jnp.zeros((), jnp.int32)}


def adamw_step(params, grads, state, lr=1e-4, beta1=0.9, beta2=0.999,
               eps=1e-8, wd=0.0):
    """One AdamW update; returns (new_params, new_state).

    The ggml kernel (ggml_compute_forward_opt_step_adamw) folds the bias
    corrections into the step: mh = m/(1-b1^t), vh = v/(1-b2^t),
    p = p*(1-alpha*wd) - alpha*mh/(sqrt(vh)+eps)."""
    t = state["t"] + 1
    b1t = 1.0 - beta1 ** t.astype(jnp.float32)
    b2t = 1.0 - beta2 ** t.astype(jnp.float32)

    def upd(p, g, m, v):
        gf = g.astype(jnp.float32)
        m2 = beta1 * m + (1 - beta1) * gf
        v2 = beta2 * v + (1 - beta2) * gf * gf
        mh = m2 / b1t
        vh = v2 / b2t
        p2 = (p.astype(jnp.float32) * (1.0 - lr * wd)
              - lr * mh / (jnp.sqrt(vh) + eps))
        return p2.astype(p.dtype), m2, v2

    flat_p, tdef = jax.tree_util.tree_flatten(params)
    flat_g = tdef.flatten_up_to(grads)
    flat_m = tdef.flatten_up_to(state["m"])
    flat_v = tdef.flatten_up_to(state["v"])
    out = [upd(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = tdef.unflatten([o[0] for o in out])
    new_m = tdef.unflatten([o[1] for o in out])
    new_v = tdef.unflatten([o[2] for o in out])
    return new_p, {"m": new_m, "v": new_v, "t": t}


def sgd_step(params, grads, lr=1e-3, wd=0.0):
    """p = p*(1-alpha*wd) - alpha*g (ggml GGML_OP_OPT_STEP_SGD)."""
    return jax.tree_util.tree_map(
        lambda p, g: ((p.astype(jnp.float32) * (1.0 - lr * wd)
                       - lr * g.astype(jnp.float32)).astype(p.dtype)),
        params, grads)
