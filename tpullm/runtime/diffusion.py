"""Diffusion-LM generation (LLaDA / Dream / LLaDA-MoE).

Counterpart of the reference's examples/diffusion/diffusion.cpp
diffusion_generate: the sequence starts as [prompt | MASK * n], and each
step runs ONE full-length bidirectional forward, samples every masked
position, and "transfers" (commits) the top-confidence positions per a
schedule; the rest stay masked for the next step.

TPU shape: the forward is a single jitted bidirectional pass at a static
max_length (one compile for the whole run); the per-step
confidence/transfer bookkeeping is O(max_length) host numpy, negligible
next to the forward.

Algorithms (calculate_confidence): confidence (selected prob),
entropy (-H), margin (p1-p2), random, origin (per-position coin flip).
Schedules (calculate_transfer_count): timestep (Dream, (1-s/t)*remaining)
and block (LLaDA, equal split per block step). `shift_logits` reproduces
the reference's -1 logit alignment (diffusion.shift_logits metadata).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class DiffusionParams:
    steps: int = 32
    max_length: int = 128
    mask_token_id: int = -1
    algorithm: str = "confidence"  # origin|entropy|margin|random|confidence
    schedule: str = "timestep"  # timestep | block
    block_length: int = 32
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    alg_temp: float = 0.0
    eps: float = 1e-3
    cfg_scale: float = 0.0
    shift_logits: bool = True
    add_gumbel_noise: bool = False
    seed: int = 0


def _transfer_count(step, total_steps, remaining, schedule, eps,
                    per_step=None):
    if schedule == "timestep":
        t = 1.0 - step / total_steps * (1.0 - eps)
        s = 1.0 - (step + 1) / total_steps * (1.0 - eps)
        p = 1.0 if step >= total_steps - 1 else (1.0 - s / t)
        return int(remaining * p)
    if per_step is not None and step < len(per_step):
        return per_step[step]
    return remaining // max(total_steps - step, 1)


def _num_transfer_tokens(mask_count, steps):
    base, rem = divmod(mask_count, steps)
    return [base + (1 if i < rem else 0) for i in range(steps)]


def _sample_and_confidence(logits, p: DiffusionParams, rng):
    """logits (M, V) -> (tokens (M,), confidence (M,)). Sampler chain =
    top-k, top-p, temperature, dist — per the reference's chain order."""
    lf = logits.astype(np.float64)
    M, V = lf.shape
    if p.add_gumbel_noise and p.temperature > 0:
        noise = np.maximum(rng.random(lf.shape), 1e-20)
        lf = np.exp(lf) / np.power(-np.log(noise), p.temperature)
    work = lf.copy()
    if p.top_k and p.top_k < V:
        kth = np.partition(work, -p.top_k, axis=-1)[:, -p.top_k][:, None]
        work = np.where(work < kth, -np.inf, work)
    probs = _softmax(work)
    if p.top_p < 1.0:
        order = np.argsort(-probs, axis=-1)
        ps = np.take_along_axis(probs, order, axis=-1)
        cum = np.cumsum(ps, axis=-1)
        keep_sorted = cum - ps < p.top_p
        keep = np.zeros_like(keep_sorted)
        np.put_along_axis(keep, order, keep_sorted, axis=-1)
        work = np.where(keep, work, -np.inf)
        probs = _softmax(work)
    if p.temperature > 0:
        probs = _softmax(work / p.temperature)
        cum = probs.cumsum(-1)
        r = rng.random((M, 1))
        toks = (cum < r).sum(-1).clip(0, V - 1)
    else:
        toks = probs.argmax(-1)
    sel_p = np.take_along_axis(probs, toks[:, None], axis=-1)[:, 0]
    if p.algorithm in ("confidence", "origin"):
        conf = sel_p
    elif p.algorithm == "entropy":
        q = np.clip(probs, 1e-10, None)
        conf = (probs * np.log(q)).sum(-1)  # -H (higher = more confident)
    elif p.algorithm == "margin":
        top2 = -np.partition(-probs, 1, axis=-1)[:, :2]
        conf = top2[:, 0] - top2[:, 1]
    elif p.algorithm == "random":
        conf = rng.random(M)
    else:
        raise ValueError(p.algorithm)
    return toks.astype(np.int64), conf


def _softmax(x):
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    e = np.where(np.isfinite(x), e, 0.0)
    return e / np.maximum(e.sum(-1, keepdims=True), 1e-30)


def diffusion_generate(forward_fn, prompt_ids, p: DiffusionParams,
                       step_callback=None):
    """forward_fn(tokens (1, L) int32) -> logits (1, L, V) f32 — a jitted
    full-length bidirectional forward. Returns the final token array of
    length max_length (prompt + denoised completion)."""
    n_in = len(prompt_ids)
    assert p.max_length > n_in, "max_length must exceed the prompt"
    assert p.mask_token_id >= 0, "mask_token_id required"
    rng = np.random.default_rng(p.seed)
    x = np.full(p.max_length, p.mask_token_id, np.int64)
    x[:n_in] = prompt_ids

    if p.schedule == "block":
        assert p.max_length % p.block_length == 0
        n_blocks = max((p.max_length - n_in + p.block_length - 1)
                       // p.block_length, 1)
        assert p.steps % n_blocks == 0, (p.steps, n_blocks)
        steps_per_block = p.steps // n_blocks
    else:
        n_blocks, steps_per_block = 1, p.steps

    for block in range(n_blocks):
        if p.schedule == "block":
            b0 = n_in + block * p.block_length
            b1 = min(n_in + (block + 1) * p.block_length, p.max_length)
            per_step = _num_transfer_tokens(
                int((x[b0:b1] == p.mask_token_id).sum()), steps_per_block)
        else:
            b0, b1, per_step = 0, p.max_length, None

        for step in range(steps_per_block):
            mask_pos = np.nonzero(x == p.mask_token_id)[0]
            mask_pos = mask_pos[(mask_pos >= b0) & (mask_pos < b1)]
            if len(mask_pos) == 0:
                break
            logits = np.asarray(forward_fn(x[None].astype(np.int32)))[0]
            if p.cfg_scale > 0:
                ux = x.copy()
                ux[:n_in] = p.mask_token_id
                ul = np.asarray(forward_fn(ux[None].astype(np.int32)))[0]
                logits = ul + (p.cfg_scale + 1.0) * (logits - ul)
            src = mask_pos - 1 if p.shift_logits else mask_pos
            src = np.maximum(src, 0)
            toks, conf = _sample_and_confidence(logits[src], p, rng)

            n_tr = _transfer_count(step, steps_per_block, len(mask_pos),
                                   p.schedule, p.eps, per_step)
            if p.algorithm == "origin":
                coin = rng.random(len(mask_pos)) < n_tr / len(mask_pos)
                x[mask_pos[coin]] = toks[coin]
            elif n_tr > 0:
                if p.alg_temp == 0.0:
                    pick = np.lexsort((np.arange(len(conf)), -conf))[:n_tr]
                else:
                    w = _softmax((conf / p.alg_temp)[None])[0]
                    pick = rng.choice(len(conf), size=min(n_tr, len(conf)),
                                      replace=False, p=w)
                x[mask_pos[pick]] = toks[pick]
            if step_callback:
                step_callback(block * steps_per_block + step, p.steps, x)
    return x
