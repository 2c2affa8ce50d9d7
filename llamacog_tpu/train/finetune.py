"""Finetuning / optimizer hooks (reference: ggml/src/ggml-opt.cpp
`ggml_opt_init`/`ggml_opt_fit`, exposed as llama_opt_init / llama_opt_epoch
at include/llama.h:1449-1478, used by examples/training/finetune.cpp).

TPU-native design: the forward pass is the same functional graph as
inference; the loss (mean cross-entropy over next-token targets) and an
optax optimizer (AdamW or SGD, the two the reference implements) are jitted
into one update step. Only dense parameters train — load the model with
mode="dequant" (quantized QuantTensor planes are frozen wire-format data).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.config import ModelConfig
from ..models.llama import forward
from ..runtime.kv_cache import KVCache


@dataclass
class OptParams:
    """Mirror of ggml_opt_optimizer_params (ggml-opt.h): AdamW hyperparams
    + optimizer choice."""

    optimizer: str = "adamw"  # adamw | sgd
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    wd: float = 0.0
    # llama_opt_params.param_filter role: which param names train
    train_embeddings: bool = True
    train_output: bool = True


@dataclass
class TrainState:
    params: dict
    opt_state: Any
    step_fn: Any
    tx: Any
    cfg: ModelConfig
    n_ctx: int
    history: list = field(default_factory=list)


def _loss_fn(params, cfg: ModelConfig, tokens, targets, mask_valid, n_ctx):
    B, T = tokens.shape
    cache = KVCache.create(
        cfg.n_layer, B, n_ctx, cfg.n_head_kv, cfg.head_dim_k, cfg.head_dim_v,
        dtype=jnp.float32,
    )
    write_pos = jnp.zeros((B,), jnp.int32)
    positions = jnp.arange(T)[None, :].repeat(B, 0)
    logits, _ = forward(
        params, cfg, tokens, positions, cache, write_pos, dtype=jnp.float32
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    valid = mask_valid.astype(jnp.float32)
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def opt_init(
    model_params: dict, cfg: ModelConfig, opt: OptParams | None = None, n_ctx: int = 128
) -> TrainState:
    """llama_opt_init analog: set up optimizer state + the jitted update step."""
    from ..quant.planar import QuantTensor

    opt = opt or OptParams()
    for leaf in jax.tree_util.tree_leaves(
        model_params, is_leaf=lambda x: isinstance(x, QuantTensor)
    ):
        if isinstance(leaf, QuantTensor):
            raise ValueError(
                "training requires dense params: load_model(..., mode='dequant')"
            )
    if opt.optimizer == "adamw":
        tx = optax.adamw(
            opt.lr, b1=opt.beta1, b2=opt.beta2, eps=opt.eps, weight_decay=opt.wd
        )
    elif opt.optimizer == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(opt.wd) if opt.wd else optax.identity(),
            optax.sgd(opt.lr),
        )
    else:
        raise ValueError(f"unknown optimizer {opt.optimizer}")

    frozen_keys = set()
    if not opt.train_embeddings:
        frozen_keys.add("tok_embd")
    if not opt.train_output:
        frozen_keys.add("output")

    opt_state = tx.init(model_params)

    @jax.jit
    def step(params, opt_state, tokens, targets, mask_valid):
        loss, grads = jax.value_and_grad(_loss_fn)(
            params, cfg, tokens, targets, mask_valid, n_ctx
        )
        for k in frozen_keys:
            if k in grads:
                grads[k] = jax.tree_util.tree_map(jnp.zeros_like, grads[k])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return TrainState(
        params=model_params, opt_state=opt_state, step_fn=step, tx=tx, cfg=cfg,
        n_ctx=n_ctx,
    )


def _batches(
    tokens: np.ndarray, n_ctx: int, n_batch: int, shuffle: bool, seed: int
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Non-overlapping (input, target) windows, like ggml_opt_fit's
    ndata-per-epoch slicing."""
    n_win = (len(tokens) - 1) // n_ctx
    order = np.arange(n_win)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i0 in range(0, n_win, n_batch):
        idx = order[i0 : i0 + n_batch]
        if idx.size == 0:
            continue
        inp = np.stack([tokens[i * n_ctx : i * n_ctx + n_ctx] for i in idx])
        tgt = np.stack([tokens[i * n_ctx + 1 : i * n_ctx + n_ctx + 1] for i in idx])
        yield inp.astype(np.int32), tgt.astype(np.int32)


def opt_epoch(
    state: TrainState,
    tokens: np.ndarray,
    n_batch: int = 1,
    shuffle: bool = True,
    seed: int = 0,
    callback=None,
) -> float:
    """llama_opt_epoch analog: one pass over the token stream; returns the
    mean loss. `callback(step, loss)` mirrors llama_opt_epoch_callback."""
    losses = []
    for i, (inp, tgt) in enumerate(
        _batches(tokens, state.n_ctx, n_batch, shuffle, seed)
    ):
        B = inp.shape[0]
        valid = np.ones_like(inp, dtype=bool)
        state.params, state.opt_state, loss = state.step_fn(
            state.params, state.opt_state, jnp.asarray(inp), jnp.asarray(tgt),
            jnp.asarray(valid),
        )
        loss = float(loss)
        losses.append(loss)
        state.history.append(loss)
        if callback:
            callback(i, loss)
    return float(np.mean(losses)) if losses else float("nan")
