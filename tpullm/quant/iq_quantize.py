"""i-quant encoders: IQ2_XXS / IQ2_XS / IQ2_S / IQ3_XXS / IQ3_S.

Vectorized (block-parallel numpy) re-implementation of the reference's
codebook grid-search quantizers (ggml/src/ggml-quants.c
quantize_row_iq2_xxs_impl and siblings):

per 256-element superblock, groups of 16/32 values are quantized onto a
restricted codebook of 8-element (iq2) / 4-element (iq3) sign-free grid
points: magnitudes are rounded to odd levels q = 2l+1, the level pattern is
looked up in the codebook map, off-grid patterns snap to the nearest
codebook entry by weighted distance over a precomputed neighbour shell, and
a 19-31 step scale sweep picks the weighted-LS best (scale, pattern)
combination. Signs store separately (canonical 7-bit with forced even
parity for the XXS/XS variants, raw 8-bit for the S variants). Importance
weights (imatrix) shape the per-element error metric exactly as the
reference: w = qw * sqrt(sigma2 + x^2).

Intentional deviations (quality-neutral, documented):
- make_qp_quants' sequential coordinate-descent refinement (iq2_xxs initial
  scale) runs Jacobi-style sweeps instead of in-place Gauss-Seidel (the
  element order dependence does not vectorize); the following 13-candidate
  scale sweep dominates the final assignment either way.
- neighbour tie-breaks: equal weighted distances resolve to the lowest
  shell-order index, matching the reference's qsort order for distinct
  distances; exact tie order among equal (d2, j) pairs can differ.

The grid tables derive from the same codebooks the decoders use
(quant/iq_grids.py), inverse-mapped from dequant magnitudes to search
levels, so encode/decode stay mutually consistent by construction.
"""
from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from .iq_grids import grid

# per-type static parameters (ggml-quants.c quantize_row_iq*_impl)
#   gname: decode grid; per: elements per codeword; kmax: level count;
#   gbits: bits per level in the kmap pattern; nwant: neighbour shells;
#   group: elements per scale group; is_lo/is_hi/is_step: scale sweep;
#   parity: canonical 7-bit signs; sigma2x: sigma2 multiplier; eps: zero cut
_PARAMS = {
    GGMLType.IQ2_XXS: dict(gname="IQ2_XXS", per=8, kmax=3, gbits=2, nwant=2,
                           group=32, is_lo=-6, is_hi=6, is_step=0.1,
                           parity=True, sigma2x=1.0, eps=1e-15, fudge=1.0),
    GGMLType.IQ2_XS: dict(gname="IQ2_XS", per=8, kmax=3, gbits=2, nwant=2,
                          group=16, is_lo=-9, is_hi=9, is_step=0.1,
                          parity=True, sigma2x=1.0, eps=1e-15, fudge=1.0),
    GGMLType.IQ2_S: dict(gname="IQ2_S", per=8, kmax=3, gbits=2, nwant=1,
                         group=16, is_lo=-9, is_hi=9, is_step=0.1,
                         parity=False, sigma2x=2.0, eps=1e-8, fudge=0.9875),
    GGMLType.IQ3_XXS: dict(gname="IQ3_XXS", per=4, kmax=8, gbits=3, nwant=2,
                           group=32, is_lo=-15, is_hi=15, is_step=0.2,
                           parity=True, sigma2x=2.0, eps=1e-8, fudge=1.0125),
    GGMLType.IQ3_S: dict(gname="IQ3_S", per=4, kmax=8, gbits=3, nwant=3,
                         group=32, is_lo=-9, is_hi=9, is_step=0.2,
                         parity=False, sigma2x=2.0, eps=0.0, fudge=1.033),
    # IQ1_S/M: 2048-point ternary grid, 3 neighbour shells, split-search
    # quantizer (quantize_row_iq1_{s,m}_impl) instead of the sign search
    GGMLType.IQ1_S: dict(gname="IQ1_S", per=8, kmax=3, gbits=2, nwant=3,
                         group=32, parity=False, sigma2x=2.0,
                         eps=1e-8, fudge=1.125),
    GGMLType.IQ1_M: dict(gname="IQ1_M", per=8, kmax=3, gbits=2, nwant=3,
                         group=16, parity=False, sigma2x=2.0,
                         eps=1e-7, fudge=1.1125),
}

_TABLES: dict = {}


def _levels_from_grid(g: np.ndarray) -> np.ndarray:
    """Dequant magnitudes -> search levels l (rank in the sorted value set:
    iq2 {8,25,43}->{0,1,2}, iq3_xxs {4..62}->{0..7}, iq3_s 2l+1->l,
    iq1 {-1,0,1}->{0,1,2})."""
    vals = np.unique(g)
    lut = np.zeros(int(vals.max()) - int(vals.min()) + 1, np.int64)
    lut[vals - vals.min()] = np.arange(len(vals))
    return lut[g - vals.min()]


def _tables(qtype: GGMLType):
    """(grid_pos (G, per) int 2l+1, kmap (kmap_size,) int, neighbours padded
    (n_off, max_n) int32 with -1 pad, nb_count (n_off,)) — the iq2xs_init /
    iq3xs_init analogue, built once per type from the decode codebooks."""
    if qtype in _TABLES:
        return _TABLES[qtype]
    import os
    cache = os.path.join(os.environ.get("TPULLM_TAB_CACHE",
                                        os.path.expanduser("~/.cache/tpullm")),
                         f"iqtab_{GGMLType(qtype).name}_v1.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        t = {k: z[k] for k in z.files}
        t["G"], t["per"] = int(t["G"]), int(t["per"])
        _TABLES[qtype] = t
        return t
    p = _PARAMS[qtype]
    g = grid(p["gname"]).astype(np.int64)  # (G, per) dequant magnitudes
    L = _levels_from_grid(g)  # (G, per) levels
    G, per = L.shape
    gbits = p["gbits"]
    kmap_size = 1 << (gbits * per)
    # pattern id of each grid point
    shifts = (np.arange(per) * gbits).astype(np.int64)
    pat = (L << shifts).sum(-1)
    kmap = np.full(kmap_size, -1, np.int64)
    kmap[pat] = np.arange(G)
    # search-space positions: pos = 2l+1
    gpos = (2 * L + 1).astype(np.float32)  # (G, per)
    # all patterns' positions
    allpat = np.arange(kmap_size, dtype=np.int64)
    plev = (allpat[:, None] >> shifts) & ((1 << gbits) - 1)
    ppos = (2 * plev + 1).astype(np.int32)  # (kmap_size, per)
    off = np.nonzero(kmap < 0)[0]
    # integer squared distances off-grid pattern -> every grid point, via
    # the |a|^2 + |b|^2 - 2ab matmul identity (exact in f32 for these small
    # ints; the naive broadcast materializes 0.5 GB and crawls on this host)
    pa = ppos[off].astype(np.float32)
    pb = (2 * L + 1).astype(np.float32)
    d2 = ((pa * pa).sum(1)[:, None] + (pb * pb).sum(1)[None, :]
          - 2.0 * (pa @ pb.T)).astype(np.int16)  # max 8*6^2 fits easily
    # neighbours: all grid points within the first nwant distinct shells.
    # Shell thresholds by iterated masked-min (no 65k x G argsort — this
    # host's memory ops crawl); order inside the kept set = (d2, grid idx),
    # the reference's qsort order, via a small composite-key sort.
    BIG = np.int16(32000)
    thr = d2.min(1)
    for _ in range(p["nwant"] - 1):
        thr = np.where(d2 > thr[:, None], d2, BIG).min(1)
    keep = d2 <= thr[:, None]
    nb_count = keep.sum(1).astype(np.int32)
    max_n = int(nb_count.max())
    key = np.where(keep, d2.astype(np.int32) * G
                   + np.arange(G, dtype=np.int32), np.int32(1 << 30))
    part = np.argpartition(key, max_n - 1, axis=1)[:, :max_n]
    pkey = np.take_along_axis(key, part, axis=1)
    sub = np.argsort(pkey, axis=1, kind="stable")
    nbr = np.take_along_axis(part, sub, axis=1).astype(np.int32)
    nbr[np.take_along_axis(pkey, sub, axis=1) >= (1 << 30)] = -1
    off_index = np.full(kmap_size, -1, np.int64)
    off_index[off] = np.arange(len(off))
    t = dict(gpos=gpos, glev=L.astype(np.int8), kmap=kmap, off_index=off_index,
             nbr=nbr, nb_count=nb_count, shifts=shifts, G=G, per=per)
    try:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, **t)
    except OSError:
        pass
    _TABLES[qtype] = t
    return t


def _nearest_int(x):
    return np.rint(x).astype(np.int64)


def _signs_and_xval(xb, weight, parity):
    """(R, bs) -> xval=|x| (R, bs), sign bytes (R, bs//8) uint8.

    Signs are always per 8 elements (the sign byte granularity) regardless
    of codeword size. parity: force even sign parity per 8 by flipping the
    element with minimal w*x^2 (the canonical 7-bit sign scheme)."""
    R, bs = xb.shape
    ns = bs // 8
    neg = xb < 0
    xval = np.abs(xb)
    sb = neg.reshape(R, ns, 8)
    s = (sb << np.arange(8)).sum(-1).astype(np.uint16)
    if parity:
        nflip = sb.sum(-1) % 2  # (R, ns)
        wx2 = (weight * xb * xb).reshape(R, ns, 8)
        imin = wx2.argmin(-1)
        flip = np.zeros_like(sb)
        np.put_along_axis(flip, imin[..., None], nflip[..., None].astype(bool),
                          -1)
        # flipping the sign of xval at imin when parity is odd
        xval = np.where(flip.reshape(R, bs), -xval, xval)
        s = s ^ ((nflip.astype(np.uint16)) << imin.astype(np.uint16))
        s = s & 127
    return xval, s.astype(np.uint8)


def _snap_to_grid(t, Laux, xval, waux2, scale):
    """Map level patterns to grid indices; off-grid patterns snap to the
    weighted-distance-best neighbour (iq2_find_best_neighbour).

    Laux (R, ncw, per) levels; xval (R, ncw, per); waux2 = weight
    (R, ncw, per); scale (R, 1, 1) current scale. Returns (gidx (R, ncw),
    L (R, ncw, per) final levels, on_grid (R, ncw) bool)."""
    shifts = t["shifts"]
    pat = (Laux.astype(np.int64) << shifts).sum(-1)  # (R, ncw)
    gidx = t["kmap"][pat]
    on = gidx >= 0
    if not on.all():
        roff, coff = np.nonzero(~on)
        oi = t["off_index"][pat[roff, coff]]  # (M,)
        nbr = t["nbr"][oi]  # (M, max_n) grid ids, -1 pad
        valid = nbr >= 0
        gp = t["gpos"][np.where(valid, nbr, 0)]  # (M, max_n, per)
        xv = xval[roff, coff].astype(np.float32)  # (M, per)
        wv = waux2[roff, coff].astype(np.float32)
        sc = np.broadcast_to(scale[:, 0, 0][:, None],
                             xval.shape[:2])[roff, coff].astype(np.float32)
        # argmin_j sum_i w*(sc*gp - xv)^2 == argmin_j sc^2*A - 2*sc*B with
        # A = sum w*gp^2, B = sum w*gp*xv (xv^2 term constant in j)
        A = np.einsum("mji,mi->mj", gp * gp, wv)
        B = np.einsum("mji,mi->mj", gp, wv * xv)
        d2 = sc[:, None] * sc[:, None] * A - 2.0 * sc[:, None] * B
        d2 = np.where(valid, d2, np.inf)
        best = d2.argmin(1)
        bi = nbr[np.arange(len(best)), best]
        gidx[roff, coff] = bi
        Laux = Laux.copy()
        Laux[roff, coff] = t["glev"][bi]
    return gidx, Laux, on


def _make_qp_scale(xval, weight, nmax):
    """make_qp_quants' scale (non-negative levels 0..nmax), vectorized;
    the coordinate-descent refinement runs as 5 Jacobi sweeps."""
    R = xval.shape[0]
    mx = xval.max(1)
    ok = mx >= 1e-15
    mxs = np.where(ok, mx, 1.0)
    best_isc = nmax / mxs
    L0 = _nearest_int(best_isc[:, None] * xval)
    best_mse = (weight * (xval - L0 / best_isc[:, None]) ** 2).sum(1)
    for is_ in range(-4, 5):
        if is_ == 0:
            continue
        isc = (0.1 * is_ + nmax) / mxs
        L = np.minimum(_nearest_int(isc[:, None] * xval), nmax)
        mse = (weight * (xval - L / isc[:, None]) ** 2).sum(1)
        better = mse < best_mse
        best_mse = np.where(better, mse, best_mse)
        best_isc = np.where(better, isc, best_isc)
    L = np.minimum(_nearest_int(best_isc[:, None] * xval), nmax)
    sumlx = (weight * xval * L).sum(1)
    suml2 = (weight * L * L).sum(1)
    for _ in range(5):
        slx = sumlx[:, None] - weight * xval * L
        sl2 = suml2[:, None] - weight * L * L
        can = (slx > 0) & (sl2 > 0)
        newl = np.minimum(_nearest_int(np.where(
            can, xval * sl2 / np.where(slx == 0, 1, slx), L)), nmax)
        slx2 = slx + weight * xval * newl
        sl22 = sl2 + weight * newl * newl
        improve = can & (newl != L) & (
            slx2 * slx2 * suml2[:, None] > sumlx[:, None] ** 2 * sl22)
        if not improve.any():
            break
        # Jacobi: apply the single best improvement per row, then recompute
        gain = np.where(improve, slx2 * slx2 / np.where(sl22 == 0, 1, sl22)
                        - sumlx[:, None] ** 2
                        / np.where(suml2[:, None] == 0, 1, suml2[:, None]), 0)
        j = gain.argmax(1)
        r = np.arange(R)
        pick = improve[r, j]
        L[r[pick], j[pick]] = newl[r[pick], j[pick]]
        sumlx = (weight * xval * L).sum(1)
        suml2 = (weight * L * L).sum(1)
    sc = np.where(suml2 > 0, sumlx / np.where(suml2 == 0, 1, suml2), 0.0)
    return np.where(ok, sc, 0.0), ok


def _search_groups(qtype, xg, wg):
    """Core grid search for (R, group) magnitudes.

    Returns (scales (R,), gidx (R, ncw), signs (R, ncw) uint8)."""
    p = _PARAMS[qtype]
    t = _tables(qtype)
    per, kmax = p["per"], p["kmax"]
    R, bs = xg.shape
    ncw = bs // per
    xval, signs = _signs_and_xval(xg, wg, p["parity"])
    mx = xval.max(1)
    dead = mx < p["eps"] if p["eps"] else mx <= 0

    xv3 = xval.reshape(R, ncw, per)
    # the reference's neighbour metric weights by waux = sqrt(weight)
    # (iq2_find_best_neighbour receives waux), NOT the LS weight itself
    wx3 = np.sqrt(wg).reshape(R, ncw, per)

    # scale sweep base: iq2_xxs anchors on make_qp_quants' effective max
    if qtype == GGMLType.IQ2_XXS:
        qp_scale, _ = _make_qp_scale(xval, wg, kmax)
        eff_max = qp_scale * kmax
        base = np.where(eff_max > 0, eff_max, 1.0)
        dead |= eff_max <= 0
    else:
        base = np.where(mx > 0, mx, 1.0)

    best = np.zeros(R)
    scale = np.where(dead, 0.0, base / (2 * kmax - 1))
    L = np.zeros((R, ncw, per), np.int8)
    Gidx = np.zeros((R, ncw), np.int64)
    on_best = np.ones((R, ncw), bool)

    n_is = int(round((p["is_hi"] - p["is_lo"]) / 1)) + 1
    for k in range(n_is):
        is_ = p["is_lo"] + k
        id_ = (2 * kmax - 1 + is_ * p["is_step"]) / base  # (R,)
        this_scale = 1.0 / id_
        Laux = np.clip(_nearest_int(0.5 * (id_[:, None] * xval - 1)),
                       0, kmax - 1).reshape(R, ncw, per)
        gidx, Laux, on = _snap_to_grid(t, Laux, xv3, wx3,
                                       this_scale[:, None, None])
        q = (2 * Laux + 1).astype(np.float64).reshape(R, bs)
        sumqx = (wg * xval * q).sum(1)
        sumq2 = (wg * q * q).sum(1)
        better = (sumq2 > 0) & (sumqx * sumqx > best * sumq2) & ~dead
        ns = np.where(sumq2 == 0, 1, sumq2)
        scale = np.where(better, sumqx / ns, scale)
        best = np.where(better, scale * sumqx, best)
        L = np.where(better[:, None, None], Laux, L)
        Gidx = np.where(better[:, None], gidx, Gidx)
        on_best = np.where(better[:, None], on, on_best)

    # final fixup: re-round at the winning scale (xxs: every codeword;
    # others: only codewords that landed off-grid), snap, refit scale
    if qtype == GGMLType.IQ2_XXS:
        redo = np.broadcast_to((scale > 0)[:, None], (R, ncw))
    else:
        redo = (~on_best) & (scale > 0)[:, None]
    if redo.any():
        id_ = np.where(scale > 0, 1.0 / np.where(scale == 0, 1, scale), 0.0)
        Lnew = np.clip(_nearest_int(0.5 * (id_[:, None] * xval - 1)),
                       0, kmax - 1).reshape(R, ncw, per)
        gidx2, Lnew, _ = _snap_to_grid(t, Lnew, xv3, wx3,
                                       scale[:, None, None])
        L = np.where(redo[..., None], Lnew, L)
        Gidx = np.where(redo, gidx2, Gidx)
        q = (2 * L + 1).astype(np.float64).reshape(R, bs)
        sumqx = (wg * xval * q).sum(1)
        sumq2 = (wg * q * q).sum(1)
        had = redo.any(1) & (sumq2 > 0)
        scale = np.where(had, sumqx / np.where(sumq2 == 0, 1, sumq2), scale)

    # negative scale: flip signs (canonical signs stay 7-bit)
    negs = scale < 0
    if negs.any():
        scale = np.abs(scale)
        mask = 127 if p["parity"] else 255
        signs = np.where(negs[:, None], (~signs) & mask, signs)
    scale = np.where(dead, 0.0, scale)
    Gidx = np.where(dead[:, None], 0, Gidx)
    signs = np.where(dead[:, None], 0, signs).astype(np.uint8)
    return scale, Gidx, signs


def _group_weights(x, qw, qtype):
    """x (B, 256) -> per-group x and LS error weights (B*n_g, group), per
    the type's weighting rule (quantize_row_iq*_impl)."""
    p = _PARAMS[qtype]
    group = p["group"]
    B = x.shape[0]
    sigma2 = p["sigma2x"] * (x * x).mean(1)
    xg = x.reshape(-1, group)
    s2 = np.repeat(sigma2, 256 // group)[:, None]
    if qw is not None:
        w = np.broadcast_to(np.asarray(qw, np.float32).reshape(1, 256),
                            (B, 256)).reshape(-1, group)
        wg = w * np.sqrt(s2 + xg * xg)
    elif qtype == GGMLType.IQ2_S:
        wg = 0.25 * s2 + xg * xg
    elif qtype in (GGMLType.IQ3_XXS, GGMLType.IQ3_S):
        wg = xg * xg
    else:
        # the reference refuses IQ2_XXS/XS without an imatrix; degrade to
        # uniform importance instead of refusing
        wg = np.sqrt(s2 + xg * xg)
    return xg.astype(np.float64), np.asarray(wg, np.float64)


def _block_scales(scales, d):
    """Group scales -> 4-bit codes at the shared d = max/31."""
    idd = np.where(d > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    ls = np.clip(_nearest_int(0.5 * (idd[:, None] * scales - 1)), 0, 15)
    return ls.astype(np.uint32)


def _f16(v):
    return np.asarray(v, np.float16).view(np.uint8)


def q_iq2_xxs(x, qw=None):
    """(B, 256) -> (B, 66) block_iq2_xxs bytes."""
    x = x.reshape(-1, 256).astype(np.float32)
    B = x.shape[0]
    xg, wg = _group_weights(x, qw, GGMLType.IQ2_XXS)
    sc, gi, sg = _search_groups(GGMLType.IQ2_XXS, xg, wg)
    sc = sc.reshape(B, 8)
    gi = gi.reshape(B, 8, 4).astype(np.uint32)
    sg = sg.reshape(B, 8, 4).astype(np.uint32)
    d = sc.max(1) / 31.0
    ls = _block_scales(sc, d)  # (B, 8)
    q2a = (gi << (8 * np.arange(4, dtype=np.uint32))).sum(-1, dtype=np.uint64)
    q2b = ((sg << (7 * np.arange(4, dtype=np.uint32))).sum(-1, dtype=np.uint64)
           | (ls.astype(np.uint64) << 28))
    live = (d > 0)
    q2a = np.where(live[:, None], q2a, 0)
    q2b = np.where(live[:, None], q2b, 0)
    out = np.zeros((B, 66), np.uint8)
    out[:, 0:2] = _f16(np.where(live, d, 0.0)).reshape(B, 2)
    words = np.empty((B, 16), np.uint32)
    words[:, 0::2] = q2a.astype(np.uint32)
    words[:, 1::2] = q2b.astype(np.uint32)
    out[:, 2:66] = words.view(np.uint8).reshape(B, 64)
    return out


def q_iq2_xs(x, qw=None):
    """(B, 256) -> (B, 74) block_iq2_xs bytes."""
    x = x.reshape(-1, 256).astype(np.float32)
    B = x.shape[0]
    xg, wg = _group_weights(x, qw, GGMLType.IQ2_XS)
    sc, gi, sg = _search_groups(GGMLType.IQ2_XS, xg, wg)
    sc = sc.reshape(B, 16)
    gi = gi.reshape(B, 16, 2).astype(np.uint32)
    sg = sg.reshape(B, 16, 2).astype(np.uint32)
    d = sc.max(1) / 31.0
    ls = _block_scales(sc, d)  # (B, 16) 4-bit
    live = d > 0
    q2 = (gi | (sg << 9)).astype(np.uint16).reshape(B, 32)
    q2 = np.where(live[:, None], q2, 0)
    out = np.zeros((B, 74), np.uint8)
    out[:, 0:2] = _f16(np.where(live, d, 0.0)).reshape(B, 2)
    out[:, 2:66] = q2.view(np.uint8).reshape(B, 64)
    pk = (ls.reshape(B, 8, 2) >> 0)
    out[:, 66:74] = np.where(
        live[:, None], (pk[..., 0] | (pk[..., 1] << 4)), 0).astype(np.uint8)
    return out


def q_iq2_s(x, qw=None):
    """(B, 256) -> (B, 82) block_iq2_s bytes."""
    x = x.reshape(-1, 256).astype(np.float32)
    B = x.shape[0]
    xg, wg = _group_weights(x, qw, GGMLType.IQ2_S)
    sc, gi, sg = _search_groups(GGMLType.IQ2_S, xg, wg)
    sc = sc.reshape(B, 16)
    gi = gi.reshape(B, 32).astype(np.uint32)  # 2 codewords x 16 groups
    sg = sg.reshape(B, 32)
    d = sc.max(1) / 31.0
    ls = _block_scales(sc, d)
    live = d > 0
    gi = np.where(live[:, None], gi, 0)
    sg = np.where(live[:, None], sg, 0)
    out = np.zeros((B, 82), np.uint8)
    out[:, 0:2] = _f16(np.where(live, d * 0.9875, 0.0)).reshape(B, 2)
    out[:, 2:34] = (gi & 255).astype(np.uint8)
    out[:, 34:66] = sg.astype(np.uint8)
    hi = (gi >> 8).reshape(B, 8, 4)
    out[:, 66:74] = (hi << (2 * np.arange(4, dtype=np.uint32))).sum(
        -1).astype(np.uint8)
    pk = ls.reshape(B, 8, 2)
    out[:, 74:82] = np.where(live[:, None],
                             pk[..., 0] | (pk[..., 1] << 4), 0).astype(np.uint8)
    return out


def q_iq3_xxs(x, qw=None):
    """(B, 256) -> (B, 98) block_iq3_xxs bytes."""
    x = x.reshape(-1, 256).astype(np.float32)
    B = x.shape[0]
    xg, wg = _group_weights(x, qw, GGMLType.IQ3_XXS)
    sc, gi, sg = _search_groups(GGMLType.IQ3_XXS, xg, wg)
    sc = sc.reshape(B, 8)
    gi = gi.reshape(B, 8, 8).astype(np.uint32)  # 8 codewords of 4 per group
    sg = sg.reshape(B, 8, 4).astype(np.uint32)  # 4 sign bytes per 32-group
    d = sc.max(1) / 31.0
    ls = _block_scales(sc, d)
    live = d > 0
    gi = np.where(live[:, None, None], gi, 0)
    out = np.zeros((B, 98), np.uint8)
    out[:, 0:2] = _f16(np.where(live, d * 1.0125, 0.0)).reshape(B, 2)
    out[:, 2:66] = gi.astype(np.uint8).reshape(B, 64)
    meta = ((sg << (7 * np.arange(4, dtype=np.uint32))).sum(-1,
                                                            dtype=np.uint64)
            | (ls.astype(np.uint64) << 28)).astype(np.uint32)
    meta = np.where(live[:, None], meta, 0)
    out[:, 66:98] = meta.view(np.uint8).reshape(B, 32)
    return out


def q_iq3_s(x, qw=None):
    """(B, 256) -> (B, 110) block_iq3_s bytes."""
    x = x.reshape(-1, 256).astype(np.float32)
    B = x.shape[0]
    xg, wg = _group_weights(x, qw, GGMLType.IQ3_S)
    sc, gi, sg = _search_groups(GGMLType.IQ3_S, xg, wg)
    sc = sc.reshape(B, 8)
    gi = gi.reshape(B, 64).astype(np.uint32)
    sg = sg.reshape(B, 32)  # 8 groups x 4 sign bytes
    d = sc.max(1) / 31.0
    live = d > 0
    idd = np.where(live, 1.0 / np.where(d == 0, 1, d), 0.0)
    ls = np.clip(_nearest_int(0.5 * (idd[:, None] * sc - 1)), 0, 15)
    gi = np.where(live[:, None], gi, 0)
    sg = np.where(live[:, None], sg, 0)
    out = np.zeros((B, 110), np.uint8)
    out[:, 0:2] = _f16(np.where(live, d * 1.033, 0.0)).reshape(B, 2)
    out[:, 2:66] = (gi & 255).astype(np.uint8)
    hi = (gi >> 8).reshape(B, 8, 8)
    out[:, 66:74] = (hi << np.arange(8, dtype=np.uint32)).sum(-1).astype(
        np.uint8)
    out[:, 74:106] = sg.astype(np.uint8)
    pk = ls.reshape(B, 4, 2)
    out[:, 106:110] = np.where(live[:, None],
                               pk[..., 0] | (pk[..., 1] << 4), 0).astype(np.uint8)
    return out


# Note on signs for the XXS/XS variants: the stored 7-bit sign index implies
# bit 7 = parity of the low 7 (the KSIGNS table used at decode); the search
# produces even-parity sign bytes whose low 7 bits ARE that index.


# ---------------------------------------------------------------------------
# IQ1_S / IQ1_M: ternary-grid quantizers (quantize_row_iq1_{s,m}_impl,
# ggml/src/ggml-quants.c:4336-4660). Unlike the IQ2/IQ3 sign-search, the
# IQ1 search solves the weighted SSD split problem exactly: per sub-block,
# sort the values, sweep all (i1 <= i2) 3-way splits against the shifted
# level sets x_p = {-1,0,1}+0.125 and x_m = {-1,0,1}-0.125, then snap each
# 8-group onto the 2048-point grid via the neighbour shells.

_IQ1_DELTA = 0.125


def _iq1_levels(shift):
    base = np.asarray([-1.0, 0.0, 1.0], np.float64)
    return base + shift * _IQ1_DELTA


def _iq1_split_search(xb, wb, variants):
    """xb/wb (R, bs): exhaustive two-boundary split search.

    variants: list of per-half shift patterns; each entry is (bs,) arrays of
    +1/-1 (IQ1_S: uniform +1 and uniform -1; IQ1_M: the 4 half-block
    combinations). Returns (scale (R,), L (R, bs) levels 0..2,
    kbest (R,) variant index) maximizing sumqx^2/sumq2 (first-max order
    matching the reference's i1-outer/i2-inner/variant sweep)."""
    R, bs = xb.shape
    order = np.argsort(xb, axis=1, kind="stable")
    xs = np.take_along_axis(xb, order, axis=1)
    ws = np.take_along_axis(wb, order, axis=1)
    nv = len(variants)
    # per-variant per-sorted-position shifted level values for the three
    # segments: seg value depends on the ORIGINAL index's half (IQ1_M)
    shifts = np.stack([np.take_along_axis(
        np.broadcast_to(v, (R, bs)), order, axis=1) for v in variants])
    # prefix sums of w*x and w per (variant-independent) sorted order
    zx = np.zeros((R, 1))
    Sx = np.concatenate([zx, np.cumsum(ws * xs, axis=1)], axis=1)  # (R,bs+1)
    Sw = np.concatenate([zx, np.cumsum(ws, axis=1)], axis=1)
    # per-variant prefix sums of w*delta and w*x*delta terms: level value
    # for segment s is (s-1) + shift*DELTA, so
    #   sumqx = sum_s [ (s-1)*Sx_seg + DELTA*Sxd_seg ]
    #   sumq2 = sum_s [ (s-1)^2*Sw_seg + 2(s-1)*DELTA*Swd_seg + D^2*Swd2_seg ]
    Sxd = np.concatenate([np.zeros((nv, R, 1)),
                          np.cumsum(ws * xs * shifts, axis=2)], axis=2)
    Swd = np.concatenate([np.zeros((nv, R, 1)),
                          np.cumsum(ws * shifts, axis=2)], axis=2)
    # shift^2 == 1 always, so Swd2 == Sw
    i1 = np.arange(bs + 1)[:, None]  # (bs+1, 1)
    i2 = np.arange(bs + 1)[None, :]
    valid = i2 >= i1  # (bs+1, bs+1)
    D = _IQ1_DELTA

    def seg(S, a, b):  # S (..., bs+1) -> (..., bs+1, bs+1) segment sums
        return S[..., b] - S[..., a]

    best_score = np.full(R, -np.inf)
    best_scale = np.zeros(R)
    best_i1 = np.zeros(R, np.int64)
    best_i2 = np.zeros(R, np.int64)
    best_k = np.zeros(R, np.int64)
    for k in range(nv):
        # segment endpoint helpers (broadcast over the i1/i2 grid)
        sx_a = Sx[:, i1[:, 0]][:, :, None]  # (R, bs+1, 1)
        sx_b = Sx[:, i2[0]][:, None, :]     # (R, 1, bs+1)
        sx_end = Sx[:, -1][:, None, None]
        sw_a = Sw[:, i1[:, 0]][:, :, None]
        sw_b = Sw[:, i2[0]][:, None, :]
        sw_end = Sw[:, -1][:, None, None]
        sxd_a = Sxd[k][:, i1[:, 0]][:, :, None]
        sxd_b = Sxd[k][:, i2[0]][:, None, :]
        sxd_end = Sxd[k][:, -1][:, None, None]
        swd_a = Swd[k][:, i1[:, 0]][:, :, None]
        swd_b = Swd[k][:, i2[0]][:, None, :]
        swd_end = Swd[k][:, -1][:, None, None]
        # segment sums: [0,i1): level -1; [i1,i2): level 0; [i2,end): +1;
        # every element also carries its +/-DELTA shift
        sumqx = (-1.0) * sx_a + 1.0 * (sx_end - sx_b) + D * sxd_end
        sumq2 = (1.0 * sw_a + 0.0 + 1.0 * (sw_end - sw_b)
                 + 2 * D * (-1.0 * swd_a + 0.0 + (swd_end - swd_b))
                 + D * D * sw_end)
        score = np.where(valid[None] & (sumq2 > 0),
                         sumqx * sumqx / np.where(sumq2 <= 0, 1, sumq2),
                         -np.inf)
        flat = score.reshape(R, -1)
        am = flat.argmax(1)
        sc_k = flat[np.arange(R), am]
        better = sc_k > best_score
        q2 = sumq2.reshape(R, -1)[np.arange(R), am]
        qx = sumqx.reshape(R, -1)[np.arange(R), am]
        best_scale = np.where(better, qx / np.where(q2 <= 0, 1, q2),
                              best_scale)
        best_score = np.where(better, sc_k, best_score)
        best_i1 = np.where(better, am // (bs + 1), best_i1)
        best_i2 = np.where(better, am % (bs + 1), best_i2)
        best_k = np.where(better, k, best_k)
    # levels in ORIGINAL order
    pos = np.empty((R, bs), np.int64)
    np.put_along_axis(pos, order, np.arange(bs)[None].repeat(R, 0), axis=1)
    L = np.where(pos < best_i1[:, None], 0,
                 np.where(pos < best_i2[:, None], 1, 2)).astype(np.int8)
    neg = best_scale < 0
    L = np.where(neg[:, None], 2 - L, L)
    best_scale = np.abs(best_scale)
    # scale<0 flips the shift variant: IQ1_S k in {0(p),1(m)} -> 1-k;
    # IQ1_M k in 0..3 -> 3-k (reference's explicit remap table)
    best_k = np.where(neg, (len(variants) - 1) - best_k, best_k)
    return best_scale, L, best_k, best_score


def _iq1_snap(t, L, xb3, w3, scale, shift3):
    """Snap (R, ncw, 8) levels to the IQ1 grid. shift3 (R, ncw, 1) in
    {+1,-1} selects the level set; metric = sum w*(scale*xx[L] - x)^2
    (iq1_find_best_neighbour2)."""
    R, ncw, per = L.shape
    pat = (L.astype(np.int64) << t["shifts"]).sum(-1)
    gidx = t["kmap"][pat]
    off = gidx < 0
    if off.any():
        nbr = t["nbr"][t["off_index"][pat[off]]]  # (n, max_n)
        nb_ok = nbr >= 0
        cand = t["glev"][np.where(nbr < 0, 0, nbr)]  # (n, max_n, 8) levels
        lvl = (cand.astype(np.float64) - 1.0)  # {-1,0,1}
        sh_off = np.broadcast_to(shift3[..., 0], off.shape)[off]
        q = lvl + sh_off[:, None, None] * _IQ1_DELTA
        xo = xb3[off][:, None]  # (n, 1, 8)
        wo = w3[off][:, None]
        sc = np.broadcast_to(scale[..., 0], off.shape)[off][:, None, None]
        d2 = (wo * (sc * q - xo) ** 2).sum(-1)
        d2 = np.where(nb_ok, d2, np.inf)
        pick = d2.argmin(1)
        gsel = nbr[np.arange(len(pick)), pick]
        gidx = gidx.copy()
        gidx[off] = gsel
        L = L.copy()
        L[off] = t["glev"][gsel]
    return gidx, L, ~off


def q_iq1_s(x, qw=None):
    """(B, 256) -> (B, 50) block_iq1_s bytes (quantize_row_iq1_s_impl).

    The reference REQUIRES an imatrix for IQ1_S; without one we degrade to
    uniform importance (documented deviation; quality will be worse)."""
    t = _tables(GGMLType.IQ1_S)
    x = x.reshape(-1, 256).astype(np.float64)
    B = x.shape[0]
    sigma2 = 2.0 * (x * x).mean(1)
    xg = x.reshape(-1, 32)  # (B*8, 32)
    s2 = np.repeat(sigma2, 8)[:, None]
    w = (np.broadcast_to(np.asarray(qw, np.float64).reshape(1, 256),
                         (B, 256)).reshape(-1, 32)
         if qw is not None else np.ones_like(xg))
    wg = w * np.sqrt(s2 + xg * xg)
    R = xg.shape[0]
    dead = np.abs(xg).max(1) < 1e-8
    ones = np.ones(32)
    scale, L, kbest, _ = _iq1_split_search(xg, wg, [ones, -ones])
    shift = np.where(kbest == 0, 1.0, -1.0)  # +1 -> x_p, -1 -> x_m
    L3 = L.reshape(R, 4, 8)
    gidx, L3, on = _iq1_snap(t, L3, xg.reshape(R, 4, 8), wg.reshape(R, 4, 8),
                             scale[:, None, None], shift[:, None, None])
    # off-grid blocks: refit scale at the final grid levels
    redo = (~on).any(1) & (scale > 0)
    if redo.any():
        q = (L3.astype(np.float64) - 1.0) + shift[:, None, None] * _IQ1_DELTA
        qf = q.reshape(R, 32)
        sumqx = (wg * qf * xg).sum(1)
        sumq2 = (wg * qf * qf).sum(1)
        ok = redo & (sumqx > 0) & (sumq2 > 0)
        scale = np.where(ok, sumqx / np.where(sumq2 == 0, 1, sumq2), scale)
    scale = np.where(dead, 0.0, scale)
    shift = np.where(dead, 1.0, shift)
    gidx = np.where(dead[:, None], 0, gidx)

    sc = scale.reshape(B, 8)
    gi = gidx.reshape(B, 8, 4).astype(np.uint32)
    sh = shift.reshape(B, 8)
    mx = sc.max(1)
    d = mx / 15.0
    live = d > 0
    idd = np.where(live, 1.0 / np.where(d == 0, 1, d), 0.0)
    ls = np.clip(_nearest_int(0.5 * (idd[:, None] * sc - 1)), 0, 7)
    qh = ((gi >> 8) << (3 * np.arange(4, dtype=np.uint32))).sum(-1)
    qh |= ls.astype(np.uint32) << 12
    qh |= np.where(sh < 0, np.uint32(0x8000), np.uint32(0))
    out = np.zeros((B, 50), np.uint8)
    out[:, 0:2] = _f16(np.where(live, d * 1.125, 0.0)).reshape(B, 2)
    out[:, 2:34] = (gi & 255).reshape(B, 32).astype(np.uint8)
    hw = qh.astype(np.uint16).view(np.uint8).reshape(B, 16)
    out[:, 34:50] = hw
    return out


def q_iq1_m(x, qw=None):
    """(B, 256) -> (B, 56) block_iq1_m bytes (quantize_row_iq1_m_impl):
    16-element sub-blocks, per-HALF shift variants, the f16 super-scale
    packed into the scale words' top nibbles."""
    t = _tables(GGMLType.IQ1_M)
    x = x.reshape(-1, 256).astype(np.float64)
    B = x.shape[0]
    sigma2 = 2.0 * (x * x).mean(1)
    xg = x.reshape(-1, 16)  # (B*16, 16)
    s2 = np.repeat(sigma2, 16)[:, None]
    if qw is not None:
        w = np.broadcast_to(np.asarray(qw, np.float64).reshape(1, 256),
                            (B, 256)).reshape(-1, 16)
        wg = w * np.sqrt(s2 + xg * xg)
    else:
        wg = xg * xg
    R = xg.shape[0]
    dead = np.abs(xg).max(1) < 1e-7
    half = np.concatenate([np.ones(8), -np.ones(8)])
    # variants k=0..3: (first-half shift, second-half shift) =
    # (+,+), (+,-), (-,+), (-,-)  [masks {0x00,0x80,0x08,0x88}]
    variants = [np.ones(16), np.where(np.arange(16) < 8, 1.0, -1.0),
                np.where(np.arange(16) < 8, -1.0, 1.0), -np.ones(16)]
    scale, L, kbest, _ = _iq1_split_search(xg, wg, variants)
    # per-8-group shift: group 0 -> k<2 ? + : -, group 1 -> k%2==0 ? + : -
    sh0 = np.where(kbest < 2, 1.0, -1.0)
    sh1 = np.where(kbest % 2 == 0, 1.0, -1.0)
    shift3 = np.stack([sh0, sh1], axis=1)[..., None]  # (R, 2, 1)
    L3 = L.reshape(R, 2, 8)
    gidx, L3, on = _iq1_snap(t, L3, xg.reshape(R, 2, 8), wg.reshape(R, 2, 8),
                             scale[:, None, None], shift3)
    redo = (~on).any(1) & (scale > 0)
    if redo.any():
        q = (L3.astype(np.float64) - 1.0) + shift3 * _IQ1_DELTA
        qf = q.reshape(R, 16)
        sumqx = (wg * qf * xg).sum(1)
        sumq2 = (wg * qf * qf).sum(1)
        ok = redo & (sumqx > 0) & (sumq2 > 0)
        scale = np.where(ok, sumqx / np.where(sumq2 == 0, 1, sumq2), scale)
    scale = np.where(dead, 0.0, scale)
    gidx = np.where(dead[:, None], 0, gidx)
    kbest = np.where(dead, 0, kbest)

    sc = scale.reshape(B, 16)
    gi = gidx.reshape(B, 16, 2).astype(np.uint32)
    kb = kbest.reshape(B, 16)
    mx = sc.max(1)
    d0 = mx / 15.0
    live = d0 > 0
    idd = np.where(live, 1.0 / np.where(d0 == 0, 1, d0), 0.0)
    ls = np.clip(_nearest_int(0.5 * (idd[:, None] * sc - 1)), 0, 7)
    # final d refit over ALL blocks at the chosen levels (reference tail)
    lvl = t["glev"][gidx].astype(np.float64) - 1.0  # (R, 2, 8)
    q = (lvl + np.stack([np.where(kbest < 2, 1.0, -1.0),
                         np.where(kbest % 2 == 0, 1.0, -1.0)],
                        axis=1)[..., None] * _IQ1_DELTA)
    qf = q.reshape(B, 16, 16) * (2 * ls + 1)[:, :, None]
    wgf = wg.reshape(B, 16, 16)
    xf = xg.reshape(B, 16, 16)
    sumqx = (wgf * qf * xf).sum((1, 2))
    sumq2 = (wgf * qf * qf).sum((1, 2))
    d = np.where(live & (sumq2 > 0),
                 sumqx / np.where(sumq2 == 0, 1, sumq2), d0)
    masks = np.asarray([0x00, 0x80, 0x08, 0x88], np.uint32)
    qh = (gi[..., 0] >> 8) | ((gi[..., 1] >> 8) << 4)
    qh = qh | masks[kb]
    out = np.zeros((B, 56), np.uint8)
    out[:, 0:32] = (gi & 255).reshape(B, 32).astype(np.uint8)
    out[:, 32:48] = qh.astype(np.uint8)
    # scale words: 4 u16, each holding four 3-bit ls + a nibble of f16(d)
    du16 = _f16(np.where(live, d * 1.1125, 0.0)).reshape(B, 2)
    dbits = du16.view(np.uint16).reshape(B).astype(np.uint32)
    lsq = ls.reshape(B, 4, 4).astype(np.uint32)
    sw = (lsq[..., 0] | (lsq[..., 1] << 3) | (lsq[..., 2] << 6)
          | (lsq[..., 3] << 9))
    # scale word j's top nibble holds bits [4j, 4j+4) of the f16 d
    sw = sw | ((((dbits[:, None] >> (4 * np.arange(4, dtype=np.uint32)))
                 & 0xF) << 12).astype(np.uint32))
    out[:, 48:56] = sw.astype(np.uint16).view(np.uint8).reshape(B, 8)
    return out
