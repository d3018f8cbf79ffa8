"""Infill sampler filter (llama_sampler_init_infill,
src/llama-sampler.cpp:3594-3790): EOG-dominance cut, prefix merging,
double thresholding, EOT fallback."""
import numpy as np

from tpullm.ops.infill import infill_apply

EOT = 99


def _apply(cands, eogs=()):
    """cands: list of (id, prob, piece) sorted by prob desc."""
    ids = np.asarray([c[0] for c in cands])
    probs = np.asarray([c[1] for c in cands], np.float64)
    pieces = [c[2].encode() for c in cands]
    is_eog = np.asarray([c[0] in eogs for c in cands])
    return infill_apply(ids, probs, pieces, is_eog, EOT)


def test_eog_dominates():
    # 3 * p_eog * n > p_txt -> EOG-only, renormalized
    ids, p = _apply([(1, 0.5, "a"), (7, 0.3, "</s>"), (8, 0.2, "<eot>")],
                    eogs={7, 8})
    assert list(ids) == [7, 8]
    np.testing.assert_allclose(p, [0.6, 0.4], atol=1e-6)


def test_prefix_merge_into_higher_p():
    # "ab" (0.5) absorbs its prefix "a" (0.3): p("ab") = 0.8
    ids, p = _apply([(2, 0.5, "ab"), (1, 0.3, "a"), (3, 0.2, "xy")])
    assert 2 in ids and 1 not in ids
    i2 = list(ids).index(2)
    assert abs(p[i2] - 0.8 / (0.8 + 0.2)) < 1e-6 or p[i2] >= 0.79


def test_threshold_drops_low_p():
    # 0.15 < 0.2 -> dropped; survivors renormalized
    ids, p = _apply([(1, 0.55, "aa"), (2, 0.30, "bb"), (3, 0.15, "cc")])
    assert 3 not in ids
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-6)


def test_second_threshold():
    # after renorm, non-EOG below 1/(n+1) are dropped too
    ids, p = _apply([(1, 0.40, "aa"), (2, 0.32, "bb"), (3, 0.28, "cc")])
    # n_non_eog=3, th=0.25: all >= 0.25 after renorm -> all survive
    assert len(ids) == 3


def test_eot_fallback():
    # everything below 0.2 and no EOG -> single forced EOT
    ids, p = _apply([(1, 0.19, "aa"), (2, 0.19, "bb"), (3, 0.17, "cc"),
                     (4, 0.15, "dd"), (5, 0.15, "ee"), (6, 0.15, "ff")])
    assert list(ids) == [EOT]
    assert p[0] == 1.0


def test_genparams_flag_parsed():
    from tpullm.server.http import _gen_params

    p = _gen_params({"samplers": ["top_k", "infill"]})
    assert p.infill_sampler
    p = _gen_params({"infill_sampler": True})
    assert p.infill_sampler
    p = _gen_params({})
    assert not p.infill_sampler
