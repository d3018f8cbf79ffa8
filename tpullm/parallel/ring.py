"""Ring attention: sequence parallelism over the ICI ring (SURVEY §5.7).

Long-context prefill/training splits the SEQUENCE across devices: each
device holds a (B, T/n, H, D) shard of q/k/v, and KV shards rotate
around the mesh axis with `jax.lax.ppermute` while a streaming
(online-softmax) accumulator builds each query's full-context result —
attention over the whole sequence without ever materializing it on one
chip. This is the TPU-native replacement for the reference's
single-device O(T^2) prefill attention at long context; collectives ride
ICI neighbor links (ppermute), not all-to-alls.

Use inside shard_map with the sequence axis mapped, e.g.:

    mesh = Mesh(devices, ("sp",))
    f = shard_map(lambda q, k, v: ring_attention(q, k, v, "sp"),
                  mesh=mesh,
                  in_specs=P(None, "sp", None, None), out_specs=...)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _block_attn(q, k, v, q_off, kv_off, scale, causal, acc, m, l):
    """One (local-q x one-kv-block) step of streaming softmax.

    q (B,Tq,H,D), k/v (B,Tk,H,D); acc (B,Tq,H,Dv) f32, m/l (B,Tq,H) f32
    running max / normalizer (the flash-attention recurrence).
    """
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if causal:
        qpos = q_off + jnp.arange(Tq)
        kpos = kv_off + jnp.arange(Tk)
        mask = qpos[:, None] >= kpos[None, :]  # (Tq, Tk)
        s = jnp.where(mask[None, None], s, -jnp.inf)
    bm = jnp.max(s, axis=-1)  # (B,H,Tq)
    bm = jnp.transpose(bm, (0, 2, 1))  # (B,Tq,H)
    new_m = jnp.maximum(m, bm)
    # guard fully-masked blocks (new_m = -inf): contribute nothing
    safe_m = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
    p = jnp.exp(s - jnp.transpose(safe_m, (0, 2, 1))[:, :, :, None])
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
    l = l * corr + jnp.transpose(p.sum(-1), (0, 2, 1))
    pv = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    acc = acc * corr[..., None] + pv
    return acc, new_m, l


def ring_attention(q, k, v, axis_name: str, causal: bool = True,
                   scale: float | None = None):
    """Per-shard attention bodies (call under shard_map).

    q/k/v: this device's sequence shard (B, T_loc, H, D). Returns the
    (B, T_loc, H, Dv) attention output for the local queries over the
    ENTIRE global sequence. KV shards travel the ring: at step s the
    local device holds the shard originating from device (idx - s) mod n.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, T, H, D = q.shape
    Dv = v.shape[-1]
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))

    perm = [(i, (i + 1) % n) for i in range(n)]
    q_off = idx * T

    def step(carry, s):
        k_cur, v_cur, acc, m, l = carry
        kv_off = ((idx - s) % n) * T
        acc, m, l = _block_attn(q, k_cur, v_cur, q_off, kv_off, scale,
                                causal, acc, m, l)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, acc, m, l), None

    acc0 = jnp.zeros((B, T, H, Dv), jnp.float32)
    m0 = jnp.full((B, T, H), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, T, H), jnp.float32)
    (k, v, acc, m, l), _ = jax.lax.scan(
        step, (k, v, acc0, m0, l0), jnp.arange(n))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh, axis: str = "sp",
                           causal: bool = True):
    """Convenience wrapper: full (B, T, H, D) arrays in, shard_map over
    `axis` (T must divide by the axis size)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    spec = P(None, axis, None, None)
    f = shard_map(
        partial(ring_attention, axis_name=axis, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False)
    return f(q, k, v)
