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


# payload planes carry packed codes/signs along K; everything else is a
# per-group scale/min plane (quant/planar.py layout)
_PAYLOAD_PLANES = ("qs", "qsv", "qh", "sg", "hb", "w")

_ACTIVE_MESH: Mesh | None = None


def set_active_mesh(mesh: Mesh | None) -> None:
    """Record the serving mesh so qmatmul can shard_map the Pallas kernels
    (ops/linear.py consults this; trace-time only, not traced state)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


class active_mesh:
    """Scope the active mesh to a block: the trace-time mesh consultation
    (ops/linear.py, ops/pallas/flash_*.py) must see each Engine's OWN mesh —
    a module global left set by one engine would silently change kernel
    selection for every engine created after it."""

    def __init__(self, mesh: Mesh | None):
        self.mesh = mesh

    def __enter__(self):
        self.prev = _ACTIVE_MESH
        set_active_mesh(self.mesh)

    def __exit__(self, *exc):
        set_active_mesh(self.prev)


def _put_quant(x: QuantTensor, mesh: Mesh, spec: P) -> QuantTensor:
    """Shard a planar QuantTensor and record the realized layout.

    row: every plane shards dim 0 (output rows) — always planar-coherent.
    col: only payload planes shard dim 1, and only when the local width
         stays a multiple of the group count G (an unpack slice must start
         at group 0 for the `c mod G` scale broadcast to hold locally);
         scale/min planes replicate — the per-shard partial outputs are
         psummed, which also distributes the correction dot correctly.
    expert: dim 0 shards whole experts (n_exp divisible by the axis).
    Anything that doesn't fit falls back to replicated planes with no
    layout tag, which routes through the XLA decode path under SPMD.
    """
    m = mesh.shape["model"]
    K = x.shape[-1]
    N = int(np.prod(x.shape[:-1]))
    G = 0
    for name, plane in x.planes.items():
        # transposed superblock planes ([S, N]) have N minor, not a group dim
        if name not in _PAYLOAD_PLANES and not name.endswith("T"):
            G = max(G, plane.shape[-1])

    def rep(q):
        return {n: jax.device_put(
            p, NamedSharding(mesh, P(*([None] * p.ndim)))
        ) for n, p in q.planes.items()}

    sharded_dim0 = spec and len(spec) > 0 and spec[0] == "model"
    sharded_dim1 = spec and len(spec) > 1 and spec[1] == "model" and not sharded_dim0
    if m == 1 or (not sharded_dim0 and not sharded_dim1):
        return QuantTensor(x.kind, x.shape, rep(x), None)
    if sharded_dim0 and len(x.shape) == 3:  # stacked experts
        if x.shape[0] % m == 0:
            planes = {n: jax.device_put(p, NamedSharding(mesh, P("model", None)))
                      for n, p in x.planes.items()}
            return QuantTensor(x.kind, x.shape, planes, "expert")
        return QuantTensor(x.kind, x.shape, rep(x), None)
    if sharded_dim0:
        if N % m == 0:
            # transposed superblock planes ([S, N], quant/planar.
            # _sb_scale_plane) carry the output-row dim in dim 1
            planes = {n: jax.device_put(p, NamedSharding(
                mesh, P(None, "model") if n.endswith("T") else P("model", None)))
                      for n, p in x.planes.items()}
            return QuantTensor(x.kind, x.shape, planes, "row")
        return QuantTensor(x.kind, x.shape, rep(x), None)
    # col: a column shard must stay planar-coherent — only single-payload
    # formats qualify (every decoded slice derives from the one `qs` plane,
    # so shard d owns the d-th fraction of each slice range), and the local
    # width must stay a multiple of the group count G so `c mod G` still
    # indexes the group within the shard
    payload = [n for n in x.planes if n in _PAYLOAD_PLANES]
    ok = K % m == 0 and G > 0 and payload in (["qs"], ["qsv"])
    if ok:
        w = x.planes[payload[0]].shape[-1]
        if w % m != 0 or (w // m) % G != 0:
            ok = False
    if not ok:
        return QuantTensor(x.kind, x.shape, rep(x), None)
    planes = {}
    for name, plane in x.planes.items():
        ps = (P(None, "model") if name in ("qs", "qsv")
              else P(*([None] * plane.ndim)))
        planes[name] = jax.device_put(plane, NamedSharding(mesh, ps))
    return QuantTensor(x.kind, x.shape, planes, "col")


def _put(x, mesh: Mesh, spec: P):
    if isinstance(x, QuantTensor):
        return _put_quant(x, mesh, spec)
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
                     "attn_qkv", "attn_qk", "ffn_gate_up"):
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
    """Shard any KV-cache pytree: every leaf is [L, B, S, H(, D...)] with
    batch at axis 1 and heads at axis 3 (KVCache, QuantKVCache planes,
    SwaKVCache full+ring — all keep this layout)."""
    spec = P(None, "data", None, "model", None)

    def put(a):
        s = spec if a.ndim >= len(spec) else P(*spec[: a.ndim])
        return jax.device_put(a, NamedSharding(mesh, _fit_spec(a.shape, s, mesh)))

    return jax.tree_util.tree_map(put, cache)


def to_host(x) -> np.ndarray:
    """Device value -> host numpy, multi-process safe.

    Single-process arrays (and host values) take the plain np.asarray path.
    Under a multi-host mesh a jit output may be sharded across processes
    (not fully addressable); gather it first — the reference analog is
    logits landing on the rpc client host (ggml-rpc.cpp graph_compute
    reply). Fully-replicated outputs read locally with no traffic."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-dim sharding for tokens/positions/masks."""
    return NamedSharding(mesh, P("data", *(None,) * (ndim - 1)))
