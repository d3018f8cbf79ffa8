"""Driver benchmark: single-chip decode/prefill throughput.

Builds a synthetic Llama-3-8B-shaped checkpoint (Q4_K weights — random
payloads; throughput does not depend on weight values), runs pp512 prefill +
tg decode on the real TPU, and prints ONE JSON line.

Baseline: single-chip HBM roofline for batch-1 decode. v5e: ~819 GB/s HBM;
Q4_K 8B weights = 4.52 GB/token pass -> ~181 tok/s ceiling. vs_baseline is
the fraction of that roofline achieved (1.0 == speed of light).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODEL = os.environ.get("BENCH_MODEL", "8b")
SHAPES = {
    "8b": dict(vocab_size=128256, n_embd=4096, n_layer=32, n_head=32, n_head_kv=8, n_ff=14336),
    "1b": dict(vocab_size=32000, n_embd=2048, n_layer=22, n_head=32, n_head_kv=4, n_ff=5632),
    "tiny": dict(vocab_size=2048, n_embd=512, n_layer=4, n_head=8, n_head_kv=4, n_ff=1024),
}

HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0, "v6e": 1638.0}


def _cached_synth(shape):
    """Synth the 8B-scale packed model once, cache host arrays on disk
    (fabrication is ~4 min of host numpy; the bench should measure the TPU)."""
    import numpy as np
    import jax.numpy as jnp

    from tpullm.gguf.constants import GGMLType
    from tpullm.ops.qtensor import QTensor
    from tpullm.utils.synth import synth_qparams

    tag = "-".join(f"{k}{v}" for k, v in sorted(shape.items()))
    # v2: compact kmajor scale layout (d/s8/m8/dmin)
    cache = f"/tmp/tpullm_bench_{tag}_q4k_v2.npz"

    def _up(params):
        def walk(v):
            if isinstance(v, QTensor):
                return QTensor(v.qtype, v.shape, {k: jnp.asarray(a) for k, a in v.data.items()})
            if isinstance(v, dict):
                return {k: walk(x) for k, x in v.items()}
            return jnp.asarray(v)
        return {k: walk(v) for k, v in params.items()}

    if os.path.exists(cache):
        z = np.load(cache)
        meta = json.loads(str(z["__meta__"]))
        params = {}
        for name, (qt, shp) in meta["qtensors"].items():
            keys = [k for k in z.files if k.startswith(name + "::")]
            data = {k.split("::", 1)[1]: z[k] for k in keys}
            node = QTensor(GGMLType(qt), tuple(shp), data)
            parts = name.split("/")
            d = params
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = node
        for name in meta["arrays"]:
            parts = name.split("/")
            d = params
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = z["arr::" + name]
        from tpullm.models.config import ModelConfig
        from tpullm.ops.fuse import fuse_layer_weights

        cfg = ModelConfig(**json.loads(str(z["__cfg__"])))
        params["layers"] = fuse_layer_weights(params["layers"])
        return cfg, _up(params)

    cfg, params = synth_qparams(qtype=GGMLType.Q4_K, seed=0, device_put=False, **shape)
    flat_q, flat_a = {}, {}

    def flatten(prefix, v):
        if isinstance(v, QTensor):
            flat_q[prefix] = v
        elif isinstance(v, dict):
            for k, x in v.items():
                flatten(f"{prefix}/{k}" if prefix else k, x)
        else:
            flat_a[prefix] = np.asarray(v)

    flatten("", params)
    save = {"__meta__": json.dumps({
        "qtensors": {n: (int(q.qtype), list(q.shape)) for n, q in flat_q.items()},
        "arrays": list(flat_a),
    }), "__cfg__": json.dumps({
        k: getattr(cfg, k) for k in (
            "arch", "vocab_size", "n_embd", "n_layer", "n_head", "n_head_kv",
            "head_dim", "head_dim_v", "n_ff", "rope_dim")
    })}
    for n, q in flat_q.items():
        for k, a in q.data.items():
            save[f"{n}::{k}"] = np.asarray(a)
    for n, a in flat_a.items():
        save["arr::" + n] = a
    try:
        np.savez(cache + ".tmp.npz", **save)
        os.replace(cache + ".tmp.npz", cache)
    except OSError:
        pass
    from tpullm.ops.fuse import fuse_layer_weights

    params["layers"] = fuse_layer_weights(params["layers"])
    return cfg, _up(params)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpullm.gguf.constants import GGMLType
    from tpullm.ops.qtensor import QTensor
    from tpullm.runtime.engine import InferenceEngine
    from tpullm.utils.synth import synth_qparams

    shape = SHAPES[MODEL]
    t0 = time.time()
    cfg, params = _cached_synth(shape)
    gen_s = time.time() - t0

    n_params = (
        2 * shape["vocab_size"] * shape["n_embd"]
        + shape["n_layer"]
        * (
            2 * shape["n_embd"] * shape["n_embd"]
            + 2 * shape["n_embd"] * shape["n_embd"] // (shape["n_head"] // shape["n_head_kv"])
            + 3 * shape["n_embd"] * shape["n_ff"]
        )
    )
    qbytes = n_params * 144 / 256  # Q4_K: 144B per 256 elems

    eng = InferenceEngine(cfg, params, max_seq_len=1024,
                          compute_dtype=jnp.bfloat16, decode_chunk=64)
    B, T_PP, N_TG = 1, 512, 128
    prompt = [list(range(2, T_PP + 2))]

    # warmup (compile)
    t0 = time.time()
    r = eng.generate(prompt, max_new_tokens=2)
    compile_s = time.time() - t0

    # prefill timing
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        eng.logits_for(prompt)
    pp_s = (time.time() - t0) / reps
    pp_tok_s = T_PP / pp_s

    # decode timing (includes per-step host sampling loop, as served)
    t0 = time.time()
    r = eng.generate(prompt, max_new_tokens=N_TG)
    tg_s = time.time() - t0
    # subtract one prefill
    tg_tok_s = (N_TG - 1) / max(tg_s - pp_s, 1e-9)

    # decode-at-depth sweep (tg32 @ d{1024,4096,16384}): the reference's
    # llama-bench depth rows (benches/mac-m2-ultra/mac-m2-ultra.md:47-55).
    # The decode flash-attention kernel reads only ceil(pos/TS) KV tiles, so
    # throughput should degrade with actual depth, not with S_max.
    depth_tg = {}
    depths = [int(d) for d in os.environ.get(
        "BENCH_DEPTHS", "1024,4096,16384").split(",") if d]
    if depths:
        S_max = max(depths) + 256
        eng_d = InferenceEngine(cfg, params, max_seq_len=S_max,
                                compute_dtype=jnp.bfloat16, decode_chunk=32)
        for d in sorted(depths):
            dp = [list(range(2, 2 + d))]
            # paired difference: t(33 new) - t(1 new) isolates one 32-step
            # decode chunk — the (large, jittery) prefill cancels exactly,
            # and warming with the same shapes avoids in-measurement compiles
            eng_d.generate(dp, max_new_tokens=33)
            eng_d.generate(dp, max_new_tokens=1)
            t0 = time.time()
            eng_d.generate(dp, max_new_tokens=1)
            t1 = time.time()
            eng_d.generate(dp, max_new_tokens=33)
            tg_d = (time.time() - t1) - (t1 - t0)
            depth_tg[f"tg32_d{d}"] = round(32 / max(tg_d, 1e-9), 2)
        del eng_d

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    bw_spec = next((v for k, v in HBM_GBPS.items() if k in str(kind).lower()), 819.0)
    bw_meas = _measured_stream_gbps()
    bw = bw_meas or bw_spec
    roofline = bw * 1e9 / qbytes
    parity_nmse = _kernel_parity_nmse(cfg, params)

    result = {
        "metric": f"decode_tok_s_llama3_{MODEL}_q4k_chip({kind})",
        "value": round(tg_tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tg_tok_s / roofline, 4),
        "prefill_tok_s": round(pp_tok_s, 1),
        "roofline_tok_s": round(roofline, 1),
        "stream_gbps_meas": round(bw_meas or 0.0, 1),
        "compile_s": round(compile_s, 1),
        "weight_gb": round(qbytes / 1e9, 2),
        "synth_s": round(gen_s, 1),
        "parity_nmse": parity_nmse,
        "parity_ok": (parity_nmse is not None and parity_nmse < 1e-4),
        **depth_tg,
    }
    print(json.dumps(result))


def _kernel_parity_nmse(cfg, params):
    """On-device numeric check: the fused Pallas dequant-matmul vs the XLA
    dequant+dot path on the SAME bench weights (the test-backend-ops
    analogue, tests/test-backend-ops.cpp:1-11, executed on real hardware
    every bench run so a Mosaic lowering bug cannot ship silently)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        from tpullm.ops.qmm import qmm_kmajor

        qt = params["layers"]["wqkv"]
        K = qt.n_in
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, K)) * 0.3, jnp.bfloat16)

        @jax.jit
        def both(x, qt):
            data0 = {k: v[0] for k, v in qt.data.items()}
            y_k = qmm_kmajor(x, qt.data, qt.qtype, qt.n_out,
                             out_dtype=jnp.float32, layer=jnp.int32(0))
            from tpullm.quant.kmajor import dequant_kmajor_jnp

            w = dequant_kmajor_jnp(data0, qt.qtype, jnp.bfloat16)
            y_r = jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y_k, y_r

        y_k, y_r = both(x, qt)
        y_k, y_r = np.asarray(y_k, np.float64), np.asarray(y_r, np.float64)
        denom = float((y_r ** 2).mean()) or 1.0
        return float(((y_k - y_r) ** 2).mean() / denom)
    except Exception:
        return None


def _measured_stream_gbps():
    """Achievable dense-bf16 stream rate on THIS chip (slope-timed matvec
    chain; cancels the dispatch round-trip). The spec sheet number is not
    attainable through this runtime, so the roofline uses the measured one."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        rng = np.random.default_rng(0)
        N = K = 4096
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((16, K)), jnp.bfloat16)

        def chain(L):
            @jax.jit
            def f(x, w):
                def body(c, _):
                    y = jax.lax.dot_general(
                        c, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return (y * 1e-4).astype(jnp.bfloat16), None
                y, _ = jax.lax.scan(body, x, None, length=L)
                return jnp.sum(y.astype(jnp.float32))
            return f

        c1, c2 = chain(16), chain(96)
        float(c1(x, w)); float(c2(x, w))
        t1 = t2 = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(c1(x, w)); t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(c2(x, w)); t2 = min(t2, time.perf_counter() - t0)
        dt = (t2 - t1) / 80
        return N * K * 2 / dt / 1e9
    except Exception:
        return None


if __name__ == "__main__":
    main()
