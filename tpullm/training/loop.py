"""Dataset + epoch loop (ggml-opt / llama_opt_epoch analogue).

ggml_opt_dataset slices a tokenized corpus into (input, label) windows with
label = input shifted by one; llama_opt_epoch walks them ubatch by ubatch
with a train/eval split (llama-context.cpp:3020 opt_epoch_iter). Here the
whole step (forward + masked cross-entropy + grads + AdamW/SGD update) is
ONE jitted function; quantized checkpoints are first materialized as float
master weights (float_params) because gradients flow through dense math.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..models.llama import KVCache, forward
from ..ops.qtensor import QTensor
from .optimizer import adamw_init, adamw_step, sgd_step


def float_params(params, dtype=jnp.float32):
    """Dequantize every QTensor leaf into a dense float master weight.

    ggml likewise trains float tensors only; finetuning a quantized GGUF
    means training the dequantized weights and re-quantizing on save
    (examples/training/finetune.cpp operates on f32/f16 models)."""
    def walk(v):
        if isinstance(v, QTensor):
            # dense QTensor wrapper: forward() keeps calling take_rows/qmm
            # transparently, and the float leaf is differentiable
            w = v.dequant(dtype)
            return QTensor(
                {jnp.float32: GGMLType.F32}.get(dtype, GGMLType.BF16),
                v.shape, {"w": w})
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        return v
    return {k: walk(v) for k, v in params.items()}


@dataclass
class TrainConfig:
    seq_len: int = 128
    batch: int = 2
    lr: float = 1e-4
    optimizer: str = "adamw"  # adamw | sgd
    weight_decay: float = 0.0
    epochs: int = 1
    eval_frac: float = 0.0  # tail fraction of batches used as eval split


class Dataset:
    """Tokenized corpus -> (input, label) windows (ggml_opt_dataset_init
    with stride = seq_len; labels are the next-token ids)."""

    def __init__(self, tokens: list[int], seq_len: int, batch: int):
        n = (len(tokens) - 1) // seq_len
        assert n >= 1, "corpus shorter than one window"
        ids = np.asarray(tokens[: n * seq_len + 1], np.int32)
        self.inputs = ids[:-1].reshape(n, seq_len)
        self.labels = ids[1:].reshape(n, seq_len)
        self.batch = batch
        self.n_batches = n // batch

    def batches(self):
        for b in range(self.n_batches):
            s = slice(b * self.batch, (b + 1) * self.batch)
            yield self.inputs[s], self.labels[s]


def make_train_step(cfg, tcfg: TrainConfig, dtype=jnp.float32):
    """-> jitted (params, opt_state, tokens, labels) -> (loss, params, state)."""

    def loss_fn(params, tokens, labels):
        B, T = tokens.shape
        cache = KVCache.create(cfg, B, T, dtype)
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        logits, _ = forward(params, cfg, tokens, positions, cache,
                            cache_pos=0,
                            valid_from=jnp.zeros((B,), jnp.int32),
                            dtype=dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return nll.mean()

    if tcfg.optimizer == "adamw":
        @jax.jit
        def step(params, state, tokens, labels):
            loss, grads = jax.value_and_grad(loss_fn)(params, tokens, labels)
            params, state = adamw_step(params, grads, state, lr=tcfg.lr,
                                       wd=tcfg.weight_decay)
            return loss, params, state
    else:
        @jax.jit
        def step(params, state, tokens, labels):
            loss, grads = jax.value_and_grad(loss_fn)(params, tokens, labels)
            params = sgd_step(params, grads, lr=tcfg.lr, wd=tcfg.weight_decay)
            return loss, params, state

    eval_step = jax.jit(loss_fn)
    return step, eval_step


def train(cfg, params, tokens: list[int], tcfg: TrainConfig,
          log=None, dtype=jnp.float32):
    """Epoch loop over the corpus; returns (trained_params, history).

    params must already be float (float_params). history: per-epoch dicts
    {train_loss, eval_loss}."""
    ds = Dataset(tokens, tcfg.seq_len, tcfg.batch)
    step, eval_step = make_train_step(cfg, tcfg, dtype)
    state = adamw_init(params) if tcfg.optimizer == "adamw" else {}
    n_eval = int(ds.n_batches * tcfg.eval_frac)
    n_train = ds.n_batches - n_eval
    history = []
    for epoch in range(tcfg.epochs):
        tr_losses, ev_losses = [], []
        for bi, (inp, lab) in enumerate(ds.batches()):
            ti, tl = jnp.asarray(inp), jnp.asarray(lab)
            if bi < n_train:
                loss, params, state = step(params, state, ti, tl)
                tr_losses.append(float(loss))
            else:
                ev_losses.append(float(eval_step(params, ti, tl)))
        rec = {"epoch": epoch,
               "train_loss": float(np.mean(tr_losses)) if tr_losses else None,
               "eval_loss": float(np.mean(ev_losses)) if ev_losses else None}
        history.append(rec)
        if log:
            log(rec)
    return params, history
