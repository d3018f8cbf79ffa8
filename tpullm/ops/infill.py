"""Infill sampler filter (llama_sampler_init_infill).

Host-side re-derivation of llama_sampler_infill_apply
(src/llama-sampler.cpp:3609-3790): operates on softmaxed candidate
probabilities and

  1. if EOG mass dominates (3 * p_eog * n > p_txt), keeps ONLY the EOG
     tokens (renormalized);
  2. merges tokens whose text is a prefix of another candidate's text
     into the higher-probability one;
  3. drops non-EOG tokens with p < 0.2, renormalizes, then drops non-EOG
     tokens with p < 1/(n_non_eog+1) and renormalizes again;
  4. if no non-EOG tokens survive, forces a single EOT (or EOS) token.

Used by the server's /infill path when the request opts into the
"infill" sampler (common/sampling.cpp:352 adds it to the chain).
"""
from __future__ import annotations

import numpy as np


def infill_apply(ids: np.ndarray, probs: np.ndarray, pieces: list[bytes],
                 is_eog: np.ndarray, eot_id: int):
    """Filter candidates per the reference infill sampler.

    ids (n,) int candidate token ids sorted by prob desc; probs (n,) f32
    softmaxed over the candidate set; pieces[i] raw text bytes of ids[i];
    is_eog (n,) bool. Returns (ids, probs) of the surviving candidates
    (renormalized), matching the reference's cur_p contents."""
    ids = np.asarray(ids)
    probs = np.asarray(probs, np.float64).copy()
    is_eog = np.asarray(is_eog, bool)
    n = len(ids)

    p_eog = float(probs[is_eog].sum())
    p_txt = float(probs[~is_eog].sum())

    if 3.0 * p_eog * n > p_txt:  # EOG mass dominates -> EOG-only
        keep = is_eog
        p = probs[keep]
        return ids[keep], (p / p.sum()).astype(np.float32)

    # combine tokens with a common prefix into the higher-p one
    alive = np.ones(n, bool)
    for i0 in range(n):
        if not alive[i0]:
            continue
        for i1 in range(n):
            if i0 == i1 or not alive[i0] or not alive[i1]:
                continue
            t0, t1 = pieces[i0], pieces[i1]
            if len(t0) > 0 and len(t0) <= len(t1) and t1[:len(t0)] == t0:
                dst, src = (i1, i0) if probs[i1] > probs[i0] else (i0, i1)
                probs[dst] += probs[src]
                probs[src] = 0.0
                alive[src] = False

    # threshold pass 1: p >= 0.2 (EOG always kept), renormalize
    keep = alive & ((probs >= 0.2) | is_eog)
    n_non_eog = int((keep & ~is_eog).sum())
    if n_non_eog == 0:  # reduce to a single EOT
        return (np.asarray([eot_id]), np.asarray([1.0], np.float32))
    p = probs[keep] / probs[keep].sum()
    kids, keog = ids[keep], is_eog[keep]

    # threshold pass 2: p >= 1/(n_non_eog+1), renormalize
    th = 1.0 / (n_non_eog + 1)
    keep2 = (p >= th) | keog
    p2 = p[keep2]
    return kids[keep2], (p2 / p2.sum()).astype(np.float32)
