"""CLIP/SigLIP vision encoder for multimodal (mmproj) GGUF files.

TPU-native analogue of the reference's libmtmd vision stack
(tools/mtmd/clip.cpp:297 build_vit, tools/mtmd/models/llava.cpp,
tools/mtmd/models/siglip.cpp). The mmproj GGUF schema — KV keys
(clip.vision.*, tools/mtmd/clip-impl.h:20-70) and tensor names
(v.blk.%d.*, mm.*, clip-impl.h:78-120) — is shared with the reference so
the same files load in both.

Design: the whole encoder is ONE jitted function over static shapes —
patch embedding is expressed as a reshape + matmul (a stride-p conv over
p x p patches IS a matmul, and that form lands on the MXU directly
instead of relying on XLA conv lowering), attention is a dense
all-to-all softmax over n_patches (no mask, no cache), and the projector
runs in the same program so XLA fuses norm/gelu chains into the matmuls.
Weights stay f32 host-side (vision towers are tiny next to the LM) and
are cast to the compute dtype at trace time.

Projectors implemented (clip-impl.h:301 projector_type):
- mlp        (LLaVA: mm.0 -> gelu -> mm.2, models/llava.cpp:165)
- mlp_norm   (mm.0 -> LN -> gelu -> mm.3 -> LN, models/llava.cpp:176)
- gemma3     (avg-pool n_merge -> rms_norm -> input_projection,
              models/siglip.cpp:18-40)
- idefics3   (pixel-shuffle n_merge -> mm.model.fc, models/siglip.cpp:41)
- internvl   (pixel-shuffle -> LN -> mm.1 -> gelu -> mm.3,
              models/internvl.cpp)
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFFile, read_gguf
from ..quant.numpy_impl import dequantize as _dq


@dataclass(frozen=True)
class ClipConfig:
    proj_type: str = "mlp"
    n_embd: int = 0
    n_ff: int = 0
    n_layer: int = 0
    n_head: int = 0
    image_size: int = 0
    patch_size: int = 0
    proj_dim: int = 0
    eps: float = 1e-6
    ffn_op: str = "gelu_quick"  # gelu | silu | gelu_quick
    n_merge: int = 1  # pool/pixel-shuffle factor (scale_factor)
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    has_class_embd: bool = False

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def n_output_tokens(self) -> int:
        """LM-side tokens per image (clip.cpp:3048 clip_n_output_tokens)."""
        n = self.n_patches
        if self.proj_type == "gemma3":
            side = self.image_size // self.patch_size
            return (side // self.n_merge) ** 2
        if self.proj_type in ("idefics3", "internvl"):
            return n // (self.n_merge * self.n_merge)
        return n


def _to_f32(reader: GGUFFile, name: str) -> np.ndarray:
    ti = reader.tensors[name]
    if ti.ggml_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        a = reader.tensor_array(name)
        return np.ascontiguousarray(a, np.float32)
    return _dq(reader.tensor_data(name), ti.ggml_type,
               tuple(ti.np_shape)).astype(np.float32)


def load_mmproj(path: str):
    """Load an mmproj GGUF -> (ClipConfig, params dict of f32 arrays)."""
    g = read_gguf(path)
    gv = g.get

    def vkey(k, default=None):
        v = gv(f"clip.vision.{k}")
        return default if v is None else v

    use_gelu = bool(gv("clip.use_gelu", False))
    use_silu = bool(gv("clip.use_silu", False))
    names = set(g.tensor_names())
    cfg = ClipConfig(
        proj_type=str(gv("clip.projector_type", "mlp")),
        n_embd=int(vkey("embedding_length")),
        n_ff=int(vkey("feed_forward_length")),
        n_layer=int(vkey("block_count")),
        n_head=int(vkey("attention.head_count")),
        image_size=int(vkey("image_size")),
        patch_size=int(vkey("patch_size")),
        proj_dim=int(vkey("projection_dim", 0)),
        eps=float(vkey("attention.layer_norm_epsilon", 1e-6)),
        ffn_op="gelu" if use_gelu else ("silu" if use_silu else "gelu_quick"),
        n_merge=int(gv("clip.vision.projector.scale_factor", 0)
                    or vkey("spatial_merge_size", 0) or 1),
        image_mean=tuple(np.asarray(vkey("image_mean",
                                         ClipConfig.image_mean), np.float64)),
        image_std=tuple(np.asarray(vkey("image_std",
                                        ClipConfig.image_std), np.float64)),
        has_class_embd="v.class_embd" in names,
    )

    p: dict = {}
    for name in names:
        p[name] = _to_f32(g, name)
    # stack per-layer tensors for a lax.scan-friendly layout
    blocks: dict = {}
    for key in list(p):
        if key.startswith("v.blk."):
            _, _, il, *rest = key.split(".")
            blocks.setdefault(".".join(rest), {})[int(il)] = p.pop(key)
    for k, by_layer in blocks.items():
        p["blk." + k] = np.stack([by_layer[i] for i in range(cfg.n_layer)])
    return cfg, p


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * w + (0 if b is None else b)


def _act(x, op):
    if op == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if op == "silu":
        return jax.nn.silu(x)
    return x * jax.nn.sigmoid(1.702 * x)  # gelu_quick (ggml GELU_QUICK)


def _linear(x, p, name):
    y = x @ p[f"{name}.weight"].T
    b = p.get(f"{name}.bias")
    return y if b is None else y + b


def _vit(cfg: ClipConfig, p: dict, pixels):
    """pixels (H, W, 3) f32 normalized -> (n_pos, n_embd) encoder output."""
    ps, C = cfg.patch_size, cfg.n_embd
    side = cfg.image_size // ps
    # stride-p conv == per-patch flatten (c, ky, kx order, matching the
    # torch/ggml kernel layout (C_out, C_in, kh, kw)) then one MXU matmul
    x = pixels.transpose(2, 0, 1)  # (3, H, W)
    x = x.reshape(3, side, ps, side, ps).transpose(1, 3, 0, 2, 4)
    x = x.reshape(side * side, 3 * ps * ps)
    kern = p["v.patch_embd.weight"].reshape(C, -1)
    x = x @ kern.T
    if "v.patch_embd.bias" in p:
        x = x + p["v.patch_embd.bias"]

    if cfg.has_class_embd:  # CLS prepended at index 0 (llava.cpp:35)
        x = jnp.concatenate([p["v.class_embd"][None, :], x], axis=0)
    x = x + p["v.position_embd.weight"][: x.shape[0]]

    if "v.pre_ln.weight" in p:
        x = _ln(x, p["v.pre_ln.weight"], p.get("v.pre_ln.bias"), cfg.eps)

    n_pos, H, D = x.shape[0], cfg.n_head, C // cfg.n_head
    scale = 1.0 / np.sqrt(D)

    def block(x, w):
        h = _ln(x, w["ln1.weight"], w.get("ln1.bias"), cfg.eps)
        q = _linear(h, w, "attn_q").reshape(n_pos, H, D)
        k = _linear(h, w, "attn_k").reshape(n_pos, H, D)
        v = _linear(h, w, "attn_v").reshape(n_pos, H, D)
        att = jnp.einsum("qhd,khd->hqk", q, k) * scale
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(n_pos, C)
        x = x + _linear(o, w, "attn_out")
        h = _ln(x, w["ln2.weight"], w.get("ln2.bias"), cfg.eps)
        up = _linear(h, w, "ffn_up")
        if "ffn_gate.weight" in w:
            up = _act(_linear(h, w, "ffn_gate"), cfg.ffn_op) * up
        else:
            up = _act(up, cfg.ffn_op)
        return x + _linear(up, w, "ffn_down"), None

    stacked = {k[len("blk."):]: jnp.asarray(v)
               for k, v in p.items() if k.startswith("blk.")}
    x, _ = jax.lax.scan(lambda c, w: block(c, w), x, stacked)

    if "v.post_ln.weight" in p:
        x = _ln(x, p["v.post_ln.weight"], p.get("v.post_ln.bias"), cfg.eps)
    return x


def _pixel_shuffle(x, side, r):
    """(side*side, C) -> (side/r * side/r, C*r*r).

    Matches clip.cpp:797 build_patch_merge_permute exactly: output tokens
    row-major over (y//r, x//r); merged channel laid out (dy, dx, e) with
    e fastest (the ggml unshuffle-w-then-h contiguous flattening).
    """
    C = x.shape[-1]
    x = x.reshape(side // r, r, side // r, r, C)  # (y2, dy, x2, dx, e)
    x = x.transpose(0, 2, 1, 3, 4)  # (y2, x2, dy, dx, e)
    return x.reshape((side // r) ** 2, C * r * r)


def _project(cfg: ClipConfig, p: dict, x):
    pt = cfg.proj_type
    if cfg.has_class_embd:  # llava projector drops CLS (clip.cpp:3727)
        x = x[1:]
    side = cfg.image_size // cfg.patch_size
    if pt == "mlp":
        y = x @ p["mm.0.weight"].T + p["mm.0.bias"]
        y = jax.nn.gelu(y, approximate=False)
        if "mm.2.weight" in p:
            y = y @ p["mm.2.weight"].T + p["mm.2.bias"]
        return y
    if pt == "mlp_norm":
        y = x @ p["mm.0.weight"].T + p["mm.0.bias"]
        y = _ln(y, p["mm.1.weight"], p["mm.1.bias"], cfg.eps)
        y = jax.nn.gelu(y, approximate=False)
        y = y @ p["mm.3.weight"].T + p["mm.3.bias"]
        return _ln(y, p["mm.4.weight"], p["mm.4.bias"], cfg.eps)
    if pt == "gemma3":
        k = cfg.n_merge
        y = x.reshape(side // k, k, side // k, k, cfg.n_embd).mean((1, 3))
        y = y.reshape(-1, cfg.n_embd)
        ms = (y * y).mean(-1, keepdims=True)
        # plain multiply: the GGUF stores the (1+w) form already (siglip.cpp:34)
        y = y * jax.lax.rsqrt(ms + cfg.eps) * p["mm.soft_emb_norm.weight"]
        # ggml applies mul_mat on the TRANSPOSED proj: y @ W (siglip.cpp:37)
        return y @ p["mm.input_projection.weight"]
    if pt == "idefics3":
        y = _pixel_shuffle(x, side, cfg.n_merge)
        return y @ p["mm.model.fc.weight"].T
    if pt == "internvl":
        y = _pixel_shuffle(x, side, cfg.n_merge)
        y = _ln(y, p["mm.0.weight"], p.get("mm.0.bias"), 1e-5)
        y = y @ p["mm.1.weight"].T + p["mm.1.bias"]
        y = jax.nn.gelu(y, approximate=False)
        return y @ p["mm.3.weight"].T + p["mm.3.bias"]
    raise NotImplementedError(f"projector type {pt!r}")


@partial(jax.jit, static_argnums=(0,))
def _encode(cfg: ClipConfig, params, pixels):
    return _project(cfg, params, _vit(cfg, params, pixels))


def encode_image(cfg: ClipConfig, params: dict, pixels: np.ndarray):
    """Normalized pixels (image_size, image_size, 3) f32 ->
    (n_output_tokens, proj_dim) f32 embeddings for the LM."""
    return np.asarray(_encode(cfg, params, jnp.asarray(pixels, jnp.float32)))
