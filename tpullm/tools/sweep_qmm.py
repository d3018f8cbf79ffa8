"""Tile sweep for the fused dequant-matmul kernels (perf tool).

Times qmm_kmajor on the decode-regime shapes of the flagship model across
(tile_n, tile_k) and reports achieved HBM GB/s per config (packed weight
bytes / step, slope-timed). Run on the real chip:

    python -m tpullm.tools.sweep_qmm [--model 8b] [--qtype Q4_K]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _slope(fn_of_len, L1=64, L2=256, reps=3):
    # L2-L1 steps must dwarf the ~33ms dispatch round-trip noise
    f1, f2 = fn_of_len(L1), fn_of_len(L2)
    float(f1())
    float(f2())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f1())
        t1 = time.perf_counter()
        float(f2())
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (L2 - L1))
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--qtype", default="Q4_K")
    ap.add_argument("--m", type=int, default=1, help="batch rows (decode=1)")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--tiles-n", default="256,512")
    ap.add_argument("--tiles-k", default="1024,2048,4096")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpullm.gguf.constants import GGMLType
    from tpullm.ops.qmm import qmm_kmajor, tile_k_ok
    from tpullm.quant.kmajor import KM_SPECS, pack_kmajor
    from tpullm.quant.numpy_impl import quantize

    qtype = GGMLType[args.qtype]
    L = args.layers
    # 8B decode shapes: fused qkv, fused gate-up, ffn down, attn out
    shapes = {
        "qkv": (4096, 6144),
        "gateup": (4096, 28672),
        "down": (14336, 4096),
        "wo": (4096, 4096),
    }
    rng = np.random.default_rng(0)

    def build(K, N):
        w = (rng.standard_normal((N, K)) * 0.02).astype(np.float32)
        from tpullm.quant.layout import decode_planar

        raw = quantize(w, qtype)
        planar = decode_planar(raw.reshape(N, -1), qtype)
        one = pack_kmajor(planar, qtype)
        return {k: jnp.asarray(np.broadcast_to(v, (L,) + v.shape).copy())
                for k, v in one.items()}

    results = []
    for name, (K, N) in shapes.items():
        data = build(K, N)
        nbytes = sum(int(np.prod(v.shape[1:])) * v.dtype.itemsize
                     for v in data.values())
        x = jnp.asarray(rng.standard_normal((args.m, K)), jnp.bfloat16)

        for tn in (int(t) for t in args.tiles_n.split(",")):
            for tk in (int(t) for t in args.tiles_k.split(",")):
                if N % tn or K % tk or not tile_k_ok(qtype, tk, K):
                    continue

                def make(nsteps, tn=tn, tk=tk):
                    @jax.jit
                    def run(x, data):
                        def body(x, li):
                            y = qmm_kmajor(x, data, qtype, N, jnp.bfloat16,
                                           layer=li % L, tile_n=tn, tile_k=tk)
                            # feed a scalar back to serialize steps
                            return x + y[..., :1].astype(jnp.bfloat16) * 1e-6, None

                        x, _ = jax.lax.scan(body, x, jnp.arange(nsteps))
                        return x.astype(jnp.float32).sum()
                    return lambda: run(x, data)

                try:
                    dt = _slope(make)
                except Exception as e:
                    results.append({"shape": name, "tn": tn, "tk": tk,
                                    "error": f"{type(e).__name__}: {e}"[:80]})
                    continue
                results.append({"shape": name, "tn": tn, "tk": tk,
                                "us": round(dt * 1e6, 1),
                                "gbps": round(nbytes / dt / 1e9, 1)})
    dev = str(jax.devices()[0].device_kind)
    for r in results:
        print(json.dumps(r))
    best = {}
    for r in results:
        if "gbps" in r and r["gbps"] > best.get(r["shape"], {}).get("gbps", 0):
            best[r["shape"]] = r
    print(json.dumps({"device": dev, "qtype": args.qtype, "m": args.m,
                      "best": best}))


if __name__ == "__main__":
    main()
