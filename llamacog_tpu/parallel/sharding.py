"""SPMD sharding over a (data, model) mesh.

Replaces the reference's multi-device machinery (row-split tensor parallelism
ggml-cuda.cu:768-892, layer-split + pipeline scheduler ggml-backend.cpp:865,
TCP rpc backend ggml-rpc.cpp) with XLA SPMD: annotate shardings with
NamedSharding over ICI mesh axes and let XLA insert/overlap collectives.

TP layout (per SURVEY §2.5):
  attn_q/k/v   [H*D, E]   -> rows (heads) on "model"
  attn_output  [E, H*D]   -> cols on "model" (partial sums -> psum by XLA)
  ffn_gate/up  [F, E]     -> rows on "model"
  ffn_down     [E, F]     -> cols on "model"
  experts      [n_exp,...] -> expert axis on "model" (EP)
  KV cache     [L, B, S, Hkv, Dk] -> B on "data", Hkv on "model"

QuantTensor planes shard like their parent logical dims: every plane has
shape [N, K/g] so a row shard is dim 0, a column shard is dim 1 (block sizes
divide any reasonable shard width).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.planar import QuantTensor


def make_mesh(n_data: int = 1, n_model: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def _fit_spec(shape, spec: P, mesh: Mesh) -> P:
    """Drop sharded axes whose dimension doesn't divide the mesh axis size
    (e.g. Hkv=4 over an 8-way model axis → replicate that dim)."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            out.append(None if i >= len(shape) else axis)
            continue
        n = mesh.shape[axis]
        out.append(axis if shape[i] % n == 0 else None)
    return P(*out[: len(shape)])


def _put(x, mesh: Mesh, spec: P):
    if isinstance(x, QuantTensor):
        planes = {}
        for name, plane in x.planes.items():
            pspec = spec
            # planes are 2-D [N, K/g]; drop trailing spec dims if any
            if plane.ndim < len(spec):
                pspec = P(*spec[: plane.ndim])
            pspec = _fit_spec(plane.shape, pspec, mesh)
            planes[name] = jax.device_put(plane, NamedSharding(mesh, pspec))
        return QuantTensor(x.kind, x.shape, planes)
    return jax.device_put(x, NamedSharding(mesh, _fit_spec(x.shape, spec, mesh)))


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Apply TP/EP shardings to a llama param pytree."""
    rep = P()
    out = {
        "tok_embd": _put(params["tok_embd"], mesh, P(None, None)),
    }
    if "output_norm" in params:
        out["output_norm"] = _put(params["output_norm"], mesh, rep)
    if "output" in params:
        out["output"] = _put(params["output"], mesh, P("model", None))
    layers = []
    for layer in params["layers"]:
        sl = {}
        for k, w in layer.items():
            if k in ("attn_q", "attn_k", "attn_v", "ffn_gate", "ffn_up",
                     "attn_qkv", "ffn_gate_up"):
                sl[k] = _put(w, mesh, P("model", None))
            elif k in ("attn_output", "ffn_down"):
                sl[k] = _put(w, mesh, P(None, "model"))
            elif k.endswith("_exps"):
                sl[k] = _put(w, mesh, P("model", None, None))
            elif k == "ffn_gate_inp":
                sl[k] = _put(w, mesh, P(None, None))
            else:  # norms, biases
                sl[k] = _put(w, mesh, rep)
        layers.append(sl)
    out["layers"] = layers
    return out


def cache_sharding(mesh: Mesh) -> NamedSharding:
    # [L, B, S, Hkv, D]
    return NamedSharding(mesh, P(None, "data", None, "model", None))


def shard_cache(cache, mesh: Mesh):
    spec = P(None, "data", None, "model", None)
    k = jax.device_put(cache.k, NamedSharding(mesh, _fit_spec(cache.k.shape, spec, mesh)))
    v = jax.device_put(cache.v, NamedSharding(mesh, _fit_spec(cache.v.shape, spec, mesh)))
    return type(cache)(k, v)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-dim sharding for tokens/positions/masks."""
    return NamedSharding(mesh, P("data", *(None,) * (ndim - 1)))
