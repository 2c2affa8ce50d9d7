"""Single/multi-sequence generation engine.

The decode step is one jitted function with static shapes (prefill runs in
padded length buckets; decode appends one token per live row). This replaces
the reference's llama_context::decode ubatch machinery
(src/llama-context.cpp:880) with an XLA-friendly design: no dynamic shapes,
positions as inputs, additive masks.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.llama import forward
from ..parallel.sharding import to_host

PREFILL_BUCKETS = (32, 128, 512, 2048)
# longest single prefill step; longer prompts loop chunks of this size
# (reference n_ubatch role — bounds activation temps AND compile count)
PREFILL_MAX_CHUNK = 2048


def _bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return -(-n // 2048) * 2048


@dataclass
class GenerationResult:
    tokens: list[int]
    logits: np.ndarray | None = None


class Engine:
    """Owns the jitted step functions and the KV cache."""

    def __init__(
        self,
        params: dict,
        config: ModelConfig,
        batch_size: int = 1,
        max_seq: int = 2048,
        dtype=jnp.bfloat16,
        kv_type: str = "dense",
        mesh=None,  # jax.sharding.Mesh for TP/EP/DP sharded serving
    ):
        from .kv_cache import make_cache

        self.params = params
        if mesh is None and os.environ.get("LLAMACOG_MMQ", "0") == "1":
            # int8-MXU prefill relayout (the reference's mmq analog):
            # attach per-block int8 planes to every eligible weight
            from ..quant.mmq import attach_mmq_planes

            attach_mmq_planes(params)
        self.config = config
        self.batch_size = batch_size
        self.max_seq = max_seq
        self.dtype = dtype
        self.kv_type = kv_type
        self.mesh = mesh
        self.recurrent = config.is_recurrent
        if mesh is not None and not self.recurrent:
            # shard weights (TP rows/cols, EP experts) and KV (data x heads)
            # over the mesh; the jitted steps run SPMD, with the Pallas
            # kernels shard_map-wrapped per the recorded layouts
            # (parallel/pallas_shard.py) and XLA inserting/overlapping the
            # remaining collectives (SURVEY §2.4-2.5)
            from ..parallel.sharding import shard_cache, shard_params

            self.params = params = shard_params(params, mesh)
            self._shard_cache_fn = lambda c: shard_cache(c, mesh)
        else:
            self._shard_cache_fn = None
        from ..parallel.sharding import active_mesh

        def scoped(fn, _mesh=mesh):
            """Each dispatch (and thus each lazy trace) sees THIS engine's
            mesh, not whatever another engine last set globally."""

            @functools.wraps(fn)
            def wrapped(*a, **k):
                with active_mesh(_mesh):
                    return fn(*a, **k)

            if hasattr(fn, "_cache_size"):
                wrapped._cache_size = fn._cache_size
            return wrapped

        self._scoped = scoped
        if self.recurrent:
            self._init_recurrent()
            return
        if (kv_type == "dense" and config.sliding_window > 0
                and config.swa_pattern > 1 and config.sliding_window < max_seq
                and config.swa_type != "chunked"):
            # chunked attention (llama4) keeps the full store: the ring-mask
            # math assumes sliding-window semantics
            # iswa cache: SWA layers get a window-sized ring instead of a
            # full-length store (llama_kv_cache_unified_iswa role)
            from .kv_cache import SwaKVCache

            self.cache = SwaKVCache.create(
                tuple(config.is_swa(il) for il in range(config.n_layer)),
                batch_size, max_seq, config.sliding_window,
                config.n_head_kv, config.head_dim_k, config.head_dim_v,
                dtype=dtype,
            )
        else:
            self.cache = make_cache(
                kv_type,
                config.n_layer,
                batch_size,
                max_seq,
                config.n_head_kv,
                config.head_dim_k,
                config.head_dim_v,
                dtype=dtype,
            )
        if self._shard_cache_fn is not None:
            self.cache = self._shard_cache_fn(self.cache)
        self.seq_len = np.zeros(batch_size, dtype=np.int32)  # host-side lengths
        # rope position minus cache slot: nonzero only after M-RoPE image
        # chunks, where a whole image is ONE temporal position
        # (mtmd_image_tokens_get_n_pos, tools/mtmd/mtmd.cpp:1022)
        self.pos_offset = np.zeros(batch_size, dtype=np.int32)

        @functools.partial(jax.jit, static_argnames=("t", "kv_cap"),
                           donate_argnames=("cache",))
        def step(params, cache, tokens, write_pos, seq_len, t, pos_off=None,
                 wmask=None, last_pos=None, kv_cap=None):
            base = write_pos if pos_off is None else write_pos + pos_off
            positions = base[:, None] + jnp.arange(t)[None, :]
            logits, cache = forward(
                params, config, tokens, positions, cache, write_pos, dtype=dtype,
                write_mask=wmask, n_new=seq_len - write_pos, logits_last=last_pos,
                kv_cap=kv_cap,
            )
            return logits, cache

        self._step = scoped(step)

        @functools.partial(jax.jit, static_argnames=("t", "kv_cap"),
                           donate_argnames=("cache",))
        def step_row(params, cache, tokens, row, write_pos_row, n_new_row, t,
                     pos_off_row, last_pos=None, kv_cap=None):
            """Prefill ONE row at B=1: the full-batch step pays batch_size x
            the prompt's FLOPs to prefill a single row (every row recomputes
            the block); here the row's cache is sliced out (batch axis 1 on
            every cache leaf), the forward runs at B=1, and the updated row
            is scattered back — all inside one jit. `row` is traced, so one
            compile per t-bucket serves every slot."""
            sub = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, row, 1, axis=1), cache
            )
            positions = (write_pos_row + pos_off_row)[:, None] + jnp.arange(t)[None, :]
            logits, sub = forward(
                params, config, tokens, positions, sub, write_pos_row,
                dtype=dtype, n_new=n_new_row, logits_last=last_pos,
                kv_cap=kv_cap,
            )
            cache = jax.tree_util.tree_map(
                lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, row, axis=1),
                cache, sub,
            )
            return logits, cache

        self._step_row = scoped(step_row)

        @functools.partial(jax.jit, static_argnames=("t",),
                           donate_argnames=("cache",))
        def embed_step(params, cache, tokens, write_pos, seq_len, t, wmask=None):
            positions = write_pos[:, None] + jnp.arange(t)[None, :]
            hidden, cache = forward(
                params, config, tokens, positions, cache, write_pos,
                dtype=dtype, return_hidden=True, write_mask=wmask,
                n_new=seq_len - write_pos,
            )
            return hidden, cache

        self._embed_step = scoped(embed_step)

        @functools.partial(jax.jit, static_argnames=("t",),
                           donate_argnames=("cache",))
        def embd_input_step(params, cache, embd, write_pos, t, wmask=None,
                            n_new=None):
            """Prefill with precomputed embeddings (multimodal image chunks —
            the llama_batch.embd path)."""
            positions = write_pos[:, None] + jnp.arange(t)[None, :]
            tokens = jnp.zeros(embd.shape[:2], jnp.int32)
            logits, cache = forward(
                params, config, tokens, positions, cache, write_pos, dtype=dtype,
                input_embd=embd, write_mask=wmask, n_new=n_new,
            )
            return logits, cache

        self._embd_input_step = scoped(embd_input_step)

        @functools.partial(jax.jit, static_argnames=("t",),
                           donate_argnames=("cache",))
        def embd_mrope_step(params, cache, embd, write_pos, cos, sin, t, wmask=None,
                            n_new=None):
            """Image-chunk prefill with caller-built M-RoPE tables
            (ggml_rope_multi path: t constant, h/w vary per patch)."""
            positions = write_pos[:, None] + jnp.arange(t)[None, :]
            tokens = jnp.zeros(embd.shape[:2], jnp.int32)
            logits, cache = forward(
                params, config, tokens, positions, cache, write_pos, dtype=dtype,
                input_embd=embd, rope_override=(cos, sin), write_mask=wmask,
                n_new=n_new,
            )
            return logits, cache

        self._embd_mrope_step = scoped(embd_mrope_step)

        @functools.partial(jax.jit, static_argnames=("n", "kv_cap"),
                           donate_argnames=("cache",))
        def greedy_loop(params, cache, tok, seq_len, pos_off, n, kv_cap=None):
            """Device-side greedy decode: the token feedback never leaves the
            chip, so N tokens cost one host round-trip (the reference's
            decode loop is host-driven; on TPU the host<->device latency
            would dominate single-stream decode)."""
            B = tok.shape[0]
            out_toks = jnp.zeros((B, n), dtype=jnp.int32)

            def body(i, state):
                cache, tok, seq_len, out_toks = state
                write_pos = seq_len
                positions = (write_pos + pos_off)[:, None]
                logits, cache = forward(
                    params, config, tok[:, None], positions, cache, write_pos,
                    dtype=dtype, kv_cap=kv_cap,
                )
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                out_toks = out_toks.at[:, i].set(nxt)
                return (cache, nxt, seq_len + 1, out_toks)

            cache, tok, seq_len, out_toks = jax.lax.fori_loop(
                0, n, body, (cache, tok, seq_len, out_toks)
            )
            return cache, out_toks, seq_len

        self._greedy_loop = scoped(greedy_loop)

    def _kv_cap(self, needed: int) -> int | None:
        """Static attended-cache bound, bucketed to 2048 (the reference's
        padded n_kv, llama-kv-cache-unified.h:297): decode at depth 1k in a
        16k-allocated cache must not read 16k of K/V per step."""
        cap = max(2048, -(-int(needed) // 2048) * 2048)
        return min(cap, self.max_seq)

    def decode_greedy_tokens(self, first_tokens: np.ndarray, n: int) -> np.ndarray:
        """Run n greedy decode steps fully on device; returns [B, n] tokens.
        first_tokens are consumed as step 0's input."""
        tok = jnp.asarray(first_tokens, dtype=jnp.int32)
        seq_len = jnp.asarray(self.seq_len)
        self.cache, out, new_len = self._greedy_loop(
            self.params, self.cache, tok, seq_len, jnp.asarray(self.pos_offset), n,
            kv_cap=self._kv_cap(int(self.seq_len.max()) + n + 1),
        )
        self.seq_len = np.array(to_host(new_len))  # writable host copy
        return to_host(out)

    def _init_recurrent(self):
        """Recurrent-state path: pure mamba (llama_memory_recurrent role) or
        jamba-style hybrid (llama_memory_hybrid role: attention KV for the
        attention layers + conv/ssm state for the mamba layers). Prefill runs
        exact-length (padding would corrupt recurrent state); `active` gates
        which rows advance."""
        from ..models.jamba import forward as jamba_forward
        from ..models.jamba import layer_kinds, make_hybrid_cache
        from ..models.mamba import forward as mamba_forward
        from ..models.mamba import make_recurrent_cache

        config, dtype = self.config, self.dtype
        self.seq_len = np.zeros(self.batch_size, dtype=np.int32)
        self.pos_offset = np.zeros(self.batch_size, dtype=np.int32)  # unused
        if config.wkv_head_size > 0:  # rwkv6/7 (wkv state, not conv/ssm)
            from ..models.rwkv import forward as rwkv_forward
            from ..models.rwkv import make_rwkv_cache

            self.cache = make_rwkv_cache(config, self.batch_size)

            @functools.partial(jax.jit, static_argnames=("t", "return_hidden"))
            def step(params, cache, tokens, active, write_pos, t,
                     return_hidden=False):
                return rwkv_forward(
                    params, config, tokens, cache, active, dtype=dtype,
                    return_hidden=return_hidden,
                )

            self._recurrent_step = self._scoped(step)
            return
        hybrid = any(k == "attn" for k in layer_kinds(self.params))
        if hybrid:
            self.cache = make_hybrid_cache(
                config, self.params, self.batch_size, self.max_seq, dtype=dtype
            )

            @functools.partial(jax.jit, static_argnames=("t", "return_hidden"))
            def step(params, cache, tokens, active, write_pos, t,
                     return_hidden=False):
                return jamba_forward(
                    params, config, tokens, cache, write_pos, active,
                    dtype=dtype, return_hidden=return_hidden,
                )
        else:
            self.cache = make_recurrent_cache(config, self.batch_size,
                                              dtype=jnp.float32)

            @functools.partial(jax.jit, static_argnames=("t", "return_hidden"))
            def step(params, cache, tokens, active, write_pos, t,
                     return_hidden=False):
                return mamba_forward(
                    params, config, tokens, cache, active, dtype=dtype,
                    return_hidden=return_hidden,
                )

        self._recurrent_step = self._scoped(step)

    def _recurrent_prefill(self, token_ids, row, all_logits=False):
        n = len(token_ids)
        toks = np.zeros((self.batch_size, n), dtype=np.int32)
        toks[row, :n] = token_ids
        active = np.zeros(self.batch_size, dtype=bool)
        active[row] = True
        # mamba state advances per token: feed only the real tokens, padding
        # would corrupt the state, so run the exact length in chunks of t
        logits, self.cache = self._recurrent_step(
            self.params, self.cache, jnp.asarray(toks[:, :n]), jnp.asarray(active),
            jnp.asarray(self.seq_len), t=n
        )
        self.seq_len[row] += n
        return to_host(logits[row, :n]) if all_logits else to_host(logits[row, n - 1])

    def clear_row_state(self, row: int) -> None:
        if self.recurrent:
            from ..models.jamba import HybridCache
            from ..models.mamba import RecurrentCache
            from ..models.rwkv import RwkvCache

            c = self.cache
            if isinstance(c, HybridCache):
                self.cache = HybridCache(
                    c.kv_k, c.kv_v,
                    c.conv.at[:, row].set(0.0), c.ssm.at[:, row].set(0.0),
                )
            elif isinstance(c, RwkvCache):
                self.cache = RwkvCache(
                    c.shift.at[:, row].set(0.0), c.wkv.at[:, row].set(0.0)
                )
            else:
                self.cache = RecurrentCache(
                    c.conv.at[:, row].set(0.0), c.ssm.at[:, row].set(0.0)
                )

    def embed(self, token_ids: list[int], pooling: str = "mean") -> np.ndarray:
        """Embed one sequence; pooling in mean|cls|last|none
        (reference pooling types, llama-context.cpp:1077-1124)."""
        n = len(token_ids)
        t = self._prefill_t(n)  # row 0 was just cleared: wp = 0
        toks = np.zeros((self.batch_size, t), dtype=np.int32)
        toks[0, :n] = token_ids
        self.clear_row(0)
        write_pos = jnp.asarray(self.seq_len)
        new_len = self.seq_len.copy()
        new_len[0] = n
        hidden, self.cache = self._embed_step(
            self.params, self.cache, jnp.asarray(toks), write_pos, jnp.asarray(new_len), t
        )
        self.seq_len = new_len
        h = to_host(hidden[0, :n])  # [n, E]
        if pooling == "mean":
            return h.mean(axis=0)
        if pooling == "cls":
            return h[0]
        if pooling == "last":
            return h[-1]
        return h

    def reset(self):
        self.seq_len[:] = 0
        self.pos_offset[:] = 0

    def _prefill_t(self, n: int) -> int:
        if n > self.max_seq:
            raise ValueError(f"prompt of {n} tokens exceeds max_seq {self.max_seq}")
        return min(_bucket(n), self.max_seq)

    def _prefill_t_at(self, n: int, wp: int) -> int:
        """Padded length that fits the target row's tail of the cache —
        a DUS whose start+size exceeds max_seq would CLAMP the start and
        overwrite valid history."""
        t = self._prefill_t(n)
        if wp + t > self.max_seq:
            if wp + n > self.max_seq:
                raise ValueError(
                    f"context full: {wp}+{n} tokens > max_seq {self.max_seq}"
                )
            t = self.max_seq - wp  # exact tail fit, no padding
        return t

    def _row_mask(self, row: int):
        m = np.zeros(self.batch_size, dtype=bool)
        m[row] = True
        return jnp.asarray(m)

    def _prefill_row_logits(self, token_ids, row: int,
                            last_only: bool = False) -> "jnp.ndarray":
        """Shared single-row prefill; returns the row's [t, V] logits (or
        [1, V] with last_only — the LM head runs on one position, so an 8k
        prompt never materializes [t, V])."""
        n = len(token_ids)
        t = self._prefill_t_at(n, int(self.seq_len[row]))
        new_len = self.seq_len.copy()
        new_len[row] += n
        last = jnp.asarray([n - 1], np.int32) if last_only else None
        if self.batch_size > 1:
            # B=1 sliced-row step: one prompt costs its own FLOPs, not
            # batch_size x (reference chunked-prefill goal, server.cpp:3191)
            toks = np.zeros((1, t), dtype=np.int32)
            toks[0, :n] = token_ids
            logits, self.cache = self._step_row(
                self.params, self.cache, jnp.asarray(toks), jnp.int32(row),
                jnp.asarray(self.seq_len[row : row + 1]), jnp.asarray([n], np.int32),
                t, jnp.asarray(self.pos_offset[row : row + 1]), last_pos=last,
                kv_cap=self._kv_cap(int(self.seq_len[row]) + t),
            )
            self.seq_len = new_len
            return logits[0]
        toks = np.zeros((self.batch_size, t), dtype=np.int32)
        toks[row, :n] = token_ids
        write_pos = jnp.asarray(self.seq_len)
        if last is not None:
            last = jnp.broadcast_to(last, (self.batch_size,))
        logits, self.cache = self._step(
            self.params, self.cache, jnp.asarray(toks), write_pos, jnp.asarray(new_len), t,
            pos_off=jnp.asarray(self.pos_offset), wmask=self._row_mask(row),
            last_pos=last, kv_cap=self._kv_cap(int(self.seq_len.max()) + t),
        )
        self.seq_len = new_len
        return logits[row]

    def prefill(self, token_ids: list[int], row: int = 0) -> np.ndarray:
        """Feed a prompt into one row; returns logits of the last real token.

        Prompts longer than PREFILL_MAX_CHUNK run as a chunk loop (the
        reference's n_ubatch role, llama-context n_ubatch split): one
        8k-token step's f32 activation temps ([t, 2*n_ff] per layer) blow
        HBM at 8B, and uniform chunks reuse ONE compiled step."""
        if not len(token_ids):
            raise ValueError("empty prompt: nothing to prefill")
        if self.recurrent:
            return self._recurrent_prefill(token_ids, row)
        for off in range(0, len(token_ids), PREFILL_MAX_CHUNK):
            chunk = token_ids[off : off + PREFILL_MAX_CHUNK]
            logits = self._prefill_row_logits(chunk, row, last_only=True)
        return to_host(logits[-1])

    def prefill_embd(self, embd: np.ndarray, row: int = 0,
                     grid: tuple[int, int] | None = None) -> np.ndarray:
        """Prefill one row with precomputed embeddings [n, E] (image chunks);
        returns the last position's logits.

        With `grid` = (gh, gw) on an M-RoPE model (qwen2vl), patch (y, x)
        gets positions (t=p0, h=p0+y, w=p0+x) and the whole image advances
        the position counter by ONE (mtmd-helper set_position_mrope_2d +
        mtmd_image_tokens_get_n_pos)."""
        n = embd.shape[0]
        t = self._prefill_t_at(n, int(self.seq_len[row]))
        buf = np.zeros((self.batch_size, t, embd.shape[1]), dtype=np.float32)
        buf[row, :n] = embd
        write_pos = jnp.asarray(self.seq_len)
        new_len = self.seq_len.copy()
        new_len[row] += n
        sections = self.config.rope.sections
        if grid is not None and sections:
            from ..mtmd.qwen2vl import mrope_tables

            gh, gw = grid
            p0 = int(self.seq_len[row] + self.pos_offset[row])
            idx = np.arange(t)
            y, x = idx // max(gw, 1), idx % max(gw, 1)
            pos = np.stack([np.full(t, p0), p0 + y, p0 + x], 0).astype(np.int32)
            cos, sin = mrope_tables(
                jnp.asarray(pos), tuple(sections), self.config.head_dim_k,
                self.config.rope.freq_base,
            )
            logits, self.cache = self._embd_mrope_step(
                self.params, self.cache, jnp.asarray(buf), write_pos, cos, sin, t,
                wmask=self._row_mask(row), n_new=jnp.asarray(new_len) - write_pos,
            )
            self.pos_offset[row] -= n - 1  # image = 1 temporal position
        else:
            logits, self.cache = self._embd_input_step(
                self.params, self.cache, jnp.asarray(buf), write_pos, t,
                wmask=self._row_mask(row), n_new=jnp.asarray(new_len) - write_pos,
            )
        self.seq_len = new_len
        return to_host(logits[row, n - 1])

    def prefill_logits(self, token_ids: list[int], row: int = 0) -> np.ndarray:
        """Prefill a row and return logits for EVERY prompt position [n, V]
        (the perplexity path; reference asks for all-token logits via
        batch.logits)."""
        if self.recurrent:
            return self._recurrent_prefill(token_ids, row, all_logits=True)
        outs = []
        for off in range(0, len(token_ids), PREFILL_MAX_CHUNK):
            chunk = token_ids[off : off + PREFILL_MAX_CHUNK]
            logits = self._prefill_row_logits(chunk, row)
            outs.append(to_host(logits[: len(chunk)]))
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)

    def decode_one(self, token_ids: np.ndarray, active=None) -> np.ndarray:
        """One decode step for all rows. token_ids: [B] -> logits [B, V].

        `active` (bool [B]) limits which rows advance: inactive rows write
        their junk K/V one slot past their valid length (masked out) and do
        not advance, so idle server slots cost nothing semantically.
        """
        toks = jnp.asarray(token_ids, dtype=jnp.int32)[:, None]
        if active is None:
            new_len = self.seq_len + 1
        else:
            new_len = self.seq_len + np.asarray(active, dtype=np.int32)
        if self.recurrent:
            act = (
                np.ones(self.batch_size, dtype=bool)
                if active is None
                else np.asarray(active, dtype=bool)
            )
            logits, self.cache = self._recurrent_step(
                self.params, self.cache, toks, jnp.asarray(act),
                jnp.asarray(self.seq_len), t=1
            )
            self.seq_len = new_len
            return to_host(logits[:, 0])
        write_pos = jnp.asarray(self.seq_len)
        logits, self.cache = self._step(
            self.params, self.cache, toks, write_pos, jnp.asarray(new_len), 1,
            pos_off=jnp.asarray(self.pos_offset),
            kv_cap=self._kv_cap(int(self.seq_len.max()) + 1),
        )
        self.seq_len = new_len
        return to_host(logits[:, 0])

    def clear_row(self, row: int) -> None:
        self.seq_len[row] = 0
        self.pos_offset[row] = 0
        if self.recurrent:
            self.clear_row_state(row)

    def set_seq_len(self, row: int, n: int) -> None:
        """Truncate a row's valid length (prefix-cache reuse). A method —
        not a bare array store — so multi-host serving can mirror it:
        seq_len feeds write_pos into every later dispatch, and replicated
        jit inputs must be identical across processes (parallel/mirror.py)."""
        self.seq_len[row] = n

    def copy_row(self, src: int, dst: int) -> None:
        """llama_memory_seq_cp analog: duplicate one row's state into another
        (prompt shared across parallel continuations without re-prefilling)."""
        if src == dst:
            return
        self.pos_offset[dst] = self.pos_offset[src]
        if self.recurrent:
            from ..models.mamba import RecurrentCache

            c = self.cache
            self.cache = RecurrentCache(
                c.conv.at[:, dst].set(c.conv[:, src]),
                c.ssm.at[:, dst].set(c.ssm[:, src]),
            )
        else:
            # every cache pytree keeps batch at axis 1 of each leaf
            self.cache = jax.tree_util.tree_map(
                lambda a: a.at[:, dst].set(a[:, src]), self.cache
            )
        self.seq_len[dst] = self.seq_len[src]

    def shift_row(self, row: int, n_keep: int, n_discard: int) -> None:
        """Context shift: drop tokens [n_keep, n_keep+n_discard) of a row and
        slide the rest down, re-rotating the moved K by -n_discard (the
        reference's lazy K-shift graph, llama-kv-cache-unified.h:193).

        Runs as ONE jitted gather + delta-rope over the full row: positions
        below n_keep map to themselves with delta 0 (exact identity), so the
        shapes are static and a single compile serves every (row, n_keep,
        n_discard) combination — no host round-trip of the cache."""
        s = int(self.seq_len[row])
        if n_discard <= 0 or s - (n_keep + n_discard) < 0:
            return
        self.cache = self._shift_fn()(
            self.cache, jnp.int32(row), jnp.int32(n_keep), jnp.int32(n_discard)
        )
        self.seq_len[row] = s - n_discard

    def _shift_fn(self):
        if getattr(self, "_shift_jit", None) is not None:
            return self._shift_jit
        from ..models.llama import _rope_factors
        from ..ops.rope import apply_rope
        from .kv_cache import QuantKVCache

        config = self.config
        ff = _rope_factors(self.params, config, self.max_seq)

        @jax.jit
        def shift_fn(cache, row, n_keep, n_discard):
            S = int(cache.max_seq)
            idx = jnp.arange(S)
            src = jnp.clip(jnp.where(idx < n_keep, idx, idx + n_discard), 0, S - 1)
            delta = jnp.where(idx < n_keep, 0, -n_discard).astype(jnp.int32)
            quant = isinstance(cache, QuantKVCache)
            if quant:
                k = cache.dequant_k(tuple(p[:, row] for p in cache.k_planes),
                                    jnp.float32)
                v = cache.dequant_v(tuple(p[:, row] for p in cache.v_planes),
                                    jnp.float32)
            else:
                k, v = cache.k[:, row], cache.v[:, row]  # [L, S, Hkv, Dk]
            k = jnp.take(k, src, axis=1)
            v = jnp.take(v, src, axis=1)
            d2 = jnp.broadcast_to(delta[None, :], (k.shape[0], S))
            k = apply_rope(k, d2, config.rope, ff)
            if quant:
                kp = cache.quant_k(k)
                vp = cache.quant_v(v)
                return type(cache)(
                    tuple(c.at[:, row].set(p)
                          for c, p in zip(cache.k_planes, kp)),
                    tuple(c.at[:, row].set(p)
                          for c, p in zip(cache.v_planes, vp)),
                    cache.kinds, cache.hkv,
                )
            return type(cache)(
                cache.k.at[:, row].set(k.astype(cache.k.dtype)),
                cache.v.at[:, row].set(v),
            )

        self._shift_jit = self._scoped(shift_fn)
        return shift_fn

    def generate_greedy(
        self, prompt_tokens: list[int], max_new_tokens: int, eog_ids=(),
    ) -> GenerationResult:
        logits = self.prefill(prompt_tokens)
        out = []
        tok = int(np.argmax(logits))
        if not self.recurrent and max_new_tokens > 1:
            # on-device loop: one host round-trip for the whole generation
            out.append(tok)
            if tok in eog_ids:
                return GenerationResult(tokens=out)
            n = min(max_new_tokens - 1, self.max_seq - int(self.seq_len[0]) - 1)
            if n > 0:
                toks = self.decode_greedy_tokens(
                    np.array([tok] * self.batch_size), n
                )[0]
                for t in toks:
                    out.append(int(t))
                    if int(t) in eog_ids:
                        break
            return GenerationResult(tokens=out)
        for _ in range(max_new_tokens):
            out.append(tok)
            if tok in eog_ids:
                break
            if int(self.seq_len[0]) >= self.max_seq:
                break
            logits = self.decode_one(np.array([tok] * self.batch_size))
            tok = int(np.argmax(logits[0]))
        return GenerationResult(tokens=out)
