"""Speculative decoding: draft model proposes, target verifies in one step.

Algorithm per the reference (common/speculative.cpp:137-280): the draft
model greedily extends until its confidence drops below p_min or n_draft is
reached; the target decodes the whole draft batch in ONE call (one jit step
on TPU) and accepts the longest prefix that agrees with its own sampling.

Two implementations:
* SpeculativeDecoder — host-driven, sampler-aware, per-slot (the server
  integration). Matches the reference control flow, including the p_min
  confidence gate.
* OnDeviceSpeculative — greedy-only, the whole draft->verify->accept loop
  inside ONE jit (lax.while_loop). The reference's loop is host-driven,
  which is fine at PCIe latency; on TPU every host round-trip costs more
  than a decode step, so speculative decoding can only ever pay for itself
  if the token feedback never leaves the chip (same reasoning as
  Engine.decode_greedy_tokens).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .engine import Engine
from .sampler import SamplerChain, _softmax


def truncated_draft_params(params: dict, n_layers: int) -> dict:
    """Self-speculative draft: the target's first n_layers plus its own
    embedding/norm/head, sharing every array (zero extra HBM). The
    early-exit draft of LayerSkip / Draft&Verify, without trained exit
    heads — acceptance on real checkpoints improves with them, but the
    cost model (k draft steps + one (k+1)-token verify) is identical."""
    draft = dict(params)
    draft["layers"] = params["layers"][:n_layers]
    return draft


class OnDeviceSpeculative:
    """Greedy speculative decoding with zero per-token host traffic.

    Each while_loop round: k+1 draft forwards (the +1 keeps the draft
    cache complete when all k drafts are accepted), one (k+1)-token
    target verify step, longest-agreeing-prefix acceptance, and emission
    into a device buffer. Greedy-exact: the emitted tokens are identical
    to Engine.decode_greedy_tokens on the target (the acceptance rule
    only ever keeps tokens the target itself would have picked).
    """

    def __init__(self, target: Engine, draft: Engine, k: int = 4):
        assert target.batch_size == 1 and draft.batch_size == 1
        assert not target.recurrent and not draft.recurrent
        self.target, self.draft, self.k = target, draft, k
        t_cfg, d_cfg = target.config, draft.config
        t_dtype, d_dtype = target.dtype, draft.dtype
        from ..models.llama import forward

        @functools.partial(
            jax.jit, static_argnames=("n", "k", "t_cap", "d_cap"),
            donate_argnames=("t_cache", "d_cache"))
        def spec_loop(t_params, d_params, t_cache, d_cache, cur, t_seq,
                      d_seq, n, k, t_cap, d_cap):
            out = jnp.zeros((n + k + 1,), jnp.int32)

            def cond(st):
                return st[5] < n

            def body(st):
                t_cache, d_cache, cur, t_seq, d_seq, n_out, out, acc, rnd = st

                def dbody(i, dst):
                    d_cache, tok, drafts = dst
                    logits, d_cache = forward(
                        d_params, d_cfg, tok[:, None], (d_seq + i)[:, None],
                        d_cache, d_seq + i, dtype=d_dtype, kv_cap=d_cap)
                    nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                    return d_cache, nxt, drafts.at[i].set(nxt[0])

                d_cache, _, drafts = jax.lax.fori_loop(
                    0, k + 1, dbody,
                    (d_cache, cur, jnp.zeros((k + 1,), jnp.int32)))

                batch = jnp.concatenate([cur, drafts[:k]])[None, :]
                positions = t_seq[:, None] + jnp.arange(k + 1)[None, :]
                t_logits, t_cache = forward(
                    t_params, t_cfg, batch, positions, t_cache, t_seq,
                    dtype=t_dtype, kv_cap=t_cap)
                choice = jnp.argmax(t_logits[0], -1).astype(jnp.int32)
                agree = (choice[:k] == drafts[:k]).astype(jnp.int32)
                n_acc = jnp.sum(jnp.cumprod(agree))
                idx = jnp.arange(k + 1)
                emit = jnp.where(idx < n_acc, drafts[:k + 1],
                                 choice[jnp.minimum(idx, n_acc)])
                out = jax.lax.dynamic_update_slice(out, emit, (n_out,))
                return (t_cache, d_cache, choice[n_acc][None],
                        t_seq + n_acc + 1, d_seq + n_acc + 1,
                        n_out + n_acc + 1, out, acc + n_acc, rnd + 1)

            st = jax.lax.while_loop(cond, body, (
                t_cache, d_cache, cur, t_seq, d_seq,
                jnp.int32(0), out, jnp.int32(0), jnp.int32(0)))
            return st[0], st[1], st[6], st[3], st[4], st[7], st[8]

        self._loop = spec_loop

    def generate_greedy(self, first_token: int, n: int):
        """Decode n greedy tokens on device; returns (tokens [n], stats).
        Both engines must hold the same prefilled context."""
        t, d = self.target, self.draft
        cur = jnp.full((1,), first_token, jnp.int32)
        t_cap = t._kv_cap(int(t.seq_len[0]) + n + self.k + 2)
        d_cap = d._kv_cap(int(d.seq_len[0]) + n + self.k + 2)
        t.cache, d.cache, out, t_seq, d_seq, acc, rnd = self._loop(
            t.params, d.params, t.cache, d.cache, cur,
            jnp.asarray(t.seq_len), jnp.asarray(d.seq_len),
            n=n, k=self.k, t_cap=t_cap, d_cap=d_cap)
        out, t_seq, d_seq, acc, rnd = jax.device_get(
            (out, t_seq, d_seq, acc, rnd))
        t.seq_len = np.array(t_seq)
        d.seq_len = np.array(d_seq)
        stats = {"rounds": int(rnd), "drafted": int(rnd) * self.k,
                 "accepted": int(acc),
                 "accept_rate": float(acc) / max(int(rnd) * self.k, 1)}
        return out[:n], stats


@dataclass
class SpeculativeParams:
    n_draft: int = 8
    n_min: int = 0
    p_min: float = 0.75


class SpeculativeDecoder:
    def __init__(
        self,
        target: Engine,
        draft: Engine,
        params: SpeculativeParams | None = None,
    ):
        self.target = target
        self.draft = draft
        self.p = params or SpeculativeParams()

    def _draft_tokens(self, last_token: int, row: int = 0) -> list[int]:
        """Greedy draft until confidence drops (speculative.cpp:243-274)."""
        out: list[int] = []
        tok = last_token
        active = np.zeros(self.draft.batch_size, dtype=bool)
        active[row] = True
        for _ in range(self.p.n_draft):
            toks = np.zeros(self.draft.batch_size, dtype=np.int32)
            toks[row] = tok
            logits = self.draft.decode_one(toks, active=active)[row]
            probs = _softmax(logits.astype(np.float64))
            nxt = int(probs.argmax())
            if probs[nxt] < self.p.p_min and len(out) >= self.p.n_min:
                break
            out.append(nxt)
            tok = nxt
        return out

    def step_slot(self, row: int, last_token: int, pick, max_accept: int,
                  stats: dict | None = None) -> tuple[list[int], int]:
        """One speculative round for one slot (server.cpp:3559-3584 role).

        Drafts a continuation of `last_token` on the draft engine's `row`,
        verifies the whole draft in ONE target prefill_logits call, rolls
        both caches back to the accepted prefix, and returns
        (accepted_draft_tokens, next_token). `pick(logits) -> token` is the
        slot's sampler; rejected sampling restarts from the target's choice.
        """
        save_len = int(self.target.seq_len[row])
        draft_save = int(self.draft.seq_len[row])  # lockstep with target
        draft = self._draft_tokens(last_token, row=row)
        if not draft:
            toks = np.zeros(self.target.batch_size, dtype=np.int32)
            toks[row] = last_token
            active = np.zeros(self.target.batch_size, dtype=bool)
            active[row] = True
            logits = self.target.decode_one(toks, active=active)[row]
            return [], pick(logits)
        batch = [last_token] + draft
        logits_all = self.target.prefill_logits(batch, row=row)
        n_acc = 0
        next_tok = None
        for i, d in enumerate(draft):
            t_choice = pick(logits_all[i])
            if t_choice == d and n_acc < max_accept:
                n_acc += 1
            else:
                next_tok = t_choice
                break
        if next_tok is None:
            next_tok = pick(logits_all[len(draft)])
        if stats is not None:
            stats["drafted"] = stats.get("drafted", 0) + len(draft)
            stats["accepted"] = stats.get("accepted", 0) + n_acc
            stats["rounds"] = stats.get("rounds", 0) + 1
        accepted = draft[:n_acc]
        # KV rollback to the accepted prefix (llama-context.cpp:1014-1035)
        self.target.seq_len[row] = save_len + 1 + n_acc
        # resync draft: rewind past the speculation and replay accepted
        self.draft.seq_len[row] = draft_save
        active = np.zeros(self.draft.batch_size, dtype=bool)
        active[row] = True
        for t in [last_token] + accepted:
            toks = np.zeros(self.draft.batch_size, dtype=np.int32)
            toks[row] = t
            self.draft.decode_one(toks, active=active)
        return accepted, next_tok

    def generate(
        self,
        prompt_tokens: list[int],
        max_new_tokens: int,
        sampler: SamplerChain | None = None,
        eog_ids=(),
    ) -> tuple[list[int], dict]:
        """Returns (tokens, stats)."""
        t_logits = self.target.prefill(prompt_tokens)
        self.draft.prefill(prompt_tokens)

        def pick(logits) -> int:
            if sampler is not None:
                return sampler.sample(logits)
            return int(np.argmax(logits))

        out: list[int] = []
        stats = {"drafted": 0, "accepted": 0, "rounds": 0}
        cur = pick(t_logits)
        while len(out) < max_new_tokens:
            out.append(cur)
            if cur in eog_ids:
                break
            # draft continuation after `cur`
            draft = self._draft_tokens(cur)
            stats["drafted"] += len(draft)
            stats["rounds"] += 1
            if not draft:
                # plain decode step
                t_logits = self.target.decode_one(
                    np.array([cur] * self.target.batch_size)
                )[0]
                cur = pick(t_logits)
                continue
            # target verifies [cur, d0, .., dk-1] in one call -> logits for each
            batch = [cur] + draft
            save_len = int(self.target.seq_len[0])
            logits_all = self.target.prefill_logits(batch, row=0)  # [len(batch), V]
            # accept longest agreeing prefix
            n_acc = 0
            next_tok = None
            for i, d in enumerate(draft):
                t_choice = pick(logits_all[i])
                if t_choice == d and len(out) + n_acc < max_new_tokens:
                    n_acc += 1
                    if sampler is not None:
                        sampler.accept(d)
                else:
                    next_tok = t_choice
                    break
            if next_tok is None:
                next_tok = pick(logits_all[len(draft)])
            accepted = draft[:n_acc]
            stats["accepted"] += n_acc
            out.extend(accepted)
            # roll back target cache length to cover only accepted tokens
            # (KV rollback semantics of llama-context.cpp:1014-1035)
            self.target.seq_len[0] = save_len + 1 + n_acc
            # resync draft cache: feed accepted tokens (its cache advanced
            # during drafting; rewind and replay)
            self.draft.seq_len[0] = save_len
            for t in [cur] + accepted:
                self.draft.decode_one(np.array([t] * self.draft.batch_size))
            cur = next_tok
        return out[:max_new_tokens], stats
