"""Speculative decoding: draft model proposes, target verifies in one step.

Algorithm per the reference (common/speculative.cpp:137-280): the draft
model greedily extends until its confidence drops below p_min or n_draft is
reached; the target decodes the whole draft batch in ONE call (one jit step
on TPU) and accepts the longest prefix that agrees with its own sampling.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .engine import Engine
from .sampler import SamplerChain, _softmax


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
