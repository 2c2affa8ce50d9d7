"""Pipeline parallelism: layer-stage split + micro-batch pipelining.

The reference's PP is split-mode LAYER plus up to GGML_SCHED_MAX_COPIES=4
in-flight micro-batches in the backend scheduler (ggml-backend.cpp:620,
enabled at src/llama-context.cpp:235-265): each device owns a contiguous
layer range, ubatches flow through the stages, and async dispatch overlaps
stage s's compute on ubatch m with stage s+1's compute on ubatch m-1.

The TPU-native equivalent here keeps that host-driven shape (it is the
honest analog of the reference's scheduler, and it composes with arbitrary
per-layer graphs — MoE, SWA patterns, per-layer head counts — which a
stacked-scan SPMD pipeline cannot):

- each stage's weights and KV cache live on that stage's device
  (jax.device_put placement = the reference's per-backend buffer split);
- one jitted step per stage (stage 0 embeds, the last stage applies the
  final norm + LM head, middle stages return the raw residual stream via
  forward(..., layer_offset=, return_raw=True));
- prefill is chunked into sequence micro-batches (the reference's n_ubatch
  split, src/llama-batch.h:69) dispatched in wavefront order: JAX's async
  dispatch queues stage s+1 on chunk m while stage s computes chunk m+1 —
  the pipeline fills exactly like the reference's n_copies ring;
- decode steps traverse the stages sequentially (same bubble the
  reference's layer-split decode has).

Activations cross stages with jax.device_put (device-to-device copy, the
role of ggml_backend_sched's inter-split copy tensors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import forward
from ..runtime.kv_cache import KVCache


def split_stages(n_layer: int, n_stages: int) -> list[tuple[int, int]]:
    """Contiguous [lo, hi) layer ranges, remainder to the early stages
    (the reference distributes by tensor_split fractions; equal split is
    the uniform-model default)."""
    if not 1 <= n_stages <= n_layer:
        raise ValueError(f"n_stages={n_stages} must be in [1, {n_layer}]")
    base, rem = divmod(n_layer, n_stages)
    bounds, lo = [], 0
    for s in range(n_stages):
        hi = lo + base + (1 if s < rem else 0)
        bounds.append((lo, hi))
        lo = hi
    return bounds


_STAGE0_KEYS = ("tok_embd", "pos_embd", "tok_norm", "tok_norm_b")
_LAST_KEYS = ("output_norm", "output_norm_b", "output", "output_b",
              "output_lora", "tok_embd")
# rope factor tables are read by every stage's rope_tables call
_SHARED_KEYS = ("rope_freqs", "rope_long", "rope_short")


class PipelineEngine:
    """Layer-stage pipelined engine for uniform attention models.

    Recurrent/hybrid models are out of scope (their state handling lives in
    the specialized engines); quantized or dense weights both work — each
    stage's tensors are simply placed on its device.
    """

    def __init__(
        self,
        params: dict,
        config: ModelConfig,
        n_stages: int,
        devices: list | None = None,
        batch_size: int = 1,
        max_seq: int = 512,
        dtype=jnp.bfloat16,
        chunk: int = 64,  # prefill micro-batch length (reference n_ubatch)
        tp: int = 1,  # tensor-parallel width WITHIN each stage: devices are
        # grouped into n_stages sub-meshes of tp chips and each stage's
        # weights/KV shard over its own "model" axis — the TPxPP layout a
        # >1-host model (BASELINE config 5, 70B) deploys with
    ):
        if config.is_recurrent:
            raise ValueError("pipeline engine supports attention models only")
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < n_stages * tp:
            raise ValueError(f"need {n_stages * tp} devices, have {len(devices)}")
        self.devices = devices[: n_stages * tp]
        self.config = config
        self.dtype = dtype
        self.batch_size = batch_size
        self.max_seq = max_seq
        self.chunk = chunk
        self.bounds = split_stages(config.n_layer, n_stages)
        self.n_stages = n_stages
        self.tp = tp
        self.meshes: list = [None] * n_stages
        if tp > 1:
            from .sharding import make_mesh

            self.meshes = [
                make_mesh(1, tp, devices=self.devices[s * tp:(s + 1) * tp])
                for s in range(n_stages)
            ]

        self.stage_params: list[dict] = []
        self.caches: list[KVCache] = []
        self._steps = []
        for s, (lo, hi) in enumerate(self.bounds):
            sp: dict = {"layers": params["layers"][lo:hi]}
            keys = set(_SHARED_KEYS)
            keys |= set(_STAGE0_KEYS) if s == 0 else set()
            keys |= set(_LAST_KEYS) if s == n_stages - 1 else set()
            for k in keys:
                if k in params:
                    sp[k] = params[k]
            if "cvec" in params:
                sp["cvec"] = params["cvec"][lo:hi]
            cache = KVCache.create(
                hi - lo, batch_size, max_seq, config.n_head_kv,
                config.head_dim_k, config.head_dim_v, dtype=dtype,
            )
            if tp > 1:
                from .sharding import shard_cache, shard_params

                self.stage_params.append(shard_params(sp, self.meshes[s]))
                self.caches.append(shard_cache(cache, self.meshes[s]))
            else:
                self.stage_params.append(
                    jax.device_put(sp, self.devices[s]))
                self.caches.append(jax.device_put(cache, self.devices[s]))
            self._steps.append(self._make_stage_fn(s, lo))

        self.seq_len = np.zeros(batch_size, np.int32)

    def _make_stage_fn(self, s: int, lo: int):
        first = s == 0
        last = s == self.n_stages - 1
        cfg, dtype = self.config, self.dtype
        mesh = self.meshes[s]

        @functools.partial(jax.jit, static_argnames=("logits_last_only",),
                           donate_argnames=("cache",))
        def step(sp, tokens, x, positions, cache, write_pos,
                 logits_last_only=False):
            out, cache = forward(
                sp, cfg, tokens, positions, cache, write_pos, dtype=dtype,
                input_embd=None if first else x,
                layer_offset=lo,
                return_raw=not last,
                logits_last=jnp.full((tokens.shape[0],), tokens.shape[1] - 1,
                                     jnp.int32)
                if (last and logits_last_only) else None,
            )
            return out, cache

        if mesh is None:
            return step

        from .sharding import active_mesh

        @functools.wraps(step)
        def scoped(*a, **k):
            # each stage dispatches under ITS sub-mesh so the shard_map'd
            # Pallas kernels pick that stage's axis (runtime/engine.scoped)
            with active_mesh(mesh):
                return step(*a, **k)

        return scoped

    def _run_chunk(self, tokens: np.ndarray, positions, write_pos,
                   logits_last_only: bool):
        """Push one micro-batch through all stages (async: the host only
        dispatches; compute overlaps with the next chunk's earlier stages)."""
        x = None
        toks = jnp.asarray(tokens, jnp.int32)
        out = None
        for s in range(self.n_stages):
            if self.meshes[s] is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                dev = NamedSharding(self.meshes[s], P())  # replicate on stage
            else:
                dev = self.devices[s]
            t = jax.device_put(toks, dev)
            pos = jax.device_put(jnp.asarray(positions), dev)
            wp = jax.device_put(jnp.asarray(write_pos), dev)
            if x is not None:
                x = jax.device_put(x, dev)
            out, self.caches[s] = self._steps[s](
                self.stage_params[s], t, x, pos, self.caches[s], wp,
                logits_last_only=logits_last_only,
            )
            x = out
        return out

    def prefill(self, token_ids: list[int]) -> np.ndarray:
        """Chunked pipelined prefill of row 0; returns last-position logits.
        Chunks are dispatched back-to-back: while the last stage runs chunk
        m, the first stages already compute chunk m+1 (micro-batch
        pipelining, ggml-backend n_copies role)."""
        ids = list(token_ids)
        if len(ids) > self.max_seq:
            raise ValueError("prompt exceeds max_seq")
        B = self.batch_size
        logits = None
        for off in range(0, len(ids), self.chunk):
            part = ids[off : off + self.chunk]
            toks = np.zeros((B, len(part)), np.int32)
            toks[0, : len(part)] = part
            positions = np.tile(np.arange(off, off + len(part),
                                          dtype=np.int32), (B, 1))
            write_pos = np.full(B, off, np.int32)
            last_chunk = off + self.chunk >= len(ids)
            logits = self._run_chunk(toks, positions, write_pos,
                                     logits_last_only=last_chunk)
        self.seq_len[:] = 0
        self.seq_len[0] = len(ids)
        return np.asarray(logits[0, -1])

    def decode_one(self, token_ids: np.ndarray) -> np.ndarray:
        """One decode step for all rows: [B] -> logits [B, V]."""
        B = self.batch_size
        toks = np.asarray(token_ids, np.int32).reshape(B, 1)
        positions = self.seq_len.reshape(B, 1).astype(np.int32)
        logits = self._run_chunk(toks, positions, self.seq_len.copy(),
                                 logits_last_only=False)
        self.seq_len += 1
        return np.asarray(logits[:, -1])

    def generate_greedy(self, prompt_ids: list[int], n: int) -> list[int]:
        logits = self.prefill(prompt_ids)
        out = [int(np.argmax(logits))]
        for _ in range(n - 1):
            logits = self.decode_one(np.full(self.batch_size, out[-1]))
            out.append(int(np.argmax(logits[0])))
        return out
