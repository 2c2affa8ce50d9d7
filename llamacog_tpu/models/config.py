"""Model hyperparameters from GGUF metadata.

Key registry mirrors the reference (llama.cpp src/llama-arch.cpp LLM_KV_NAMES,
gguf-py/gguf/constants.py Keys).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class RopeConfig:
    dim: int = 0  # rotary dims (defaults to head_dim)
    freq_base: float = 10000.0
    scaling_type: str = "none"  # none | linear | yarn | longrope
    scaling_factor: float = 1.0
    orig_ctx_len: int = 0
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    yarn_log_mul: float = 0.0


@dataclass
class ModelConfig:
    arch: str
    n_vocab: int
    n_ctx_train: int
    n_embd: int
    n_layer: int
    n_head: int
    n_head_kv: int
    n_ff: int
    head_dim_k: int
    head_dim_v: int
    rms_norm_eps: float = 1e-5
    rope: RopeConfig = field(default_factory=RopeConfig)
    # MoE
    n_expert: int = 0
    n_expert_used: int = 0
    expert_gating_func: str = "softmax"  # softmax | sigmoid
    expert_weights_norm: bool = False
    expert_weights_scale: float = 1.0
    n_ff_exp: int = 0
    n_ff_shexp: int = 0
    n_expert_shared: int = 0
    # attention extras
    sliding_window: int = 0
    swa_pattern: int = 1  # every Nth layer is non-SWA (1 = no SWA)
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    # misc
    tie_word_embeddings: bool = False
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def n_gqa(self) -> int:
        return self.n_head // max(self.n_head_kv, 1)

    def is_swa(self, layer: int) -> bool:
        """Gemma-style interleaved SWA: layer is SWA unless (layer+1) % pattern == 0."""
        if self.sliding_window <= 0 or self.swa_pattern <= 1:
            return False
        return (layer + 1) % self.swa_pattern != 0

    @classmethod
    def from_metadata(cls, md: dict[str, Any]) -> "ModelConfig":
        arch = str(md["general.architecture"])

        def g(key: str, default=None):
            return md.get(f"{arch}.{key}", default)

        n_embd = int(g("embedding_length"))
        n_head = int(g("attention.head_count"))
        hk = g("attention.head_count_kv", n_head)
        # per-layer head counts (arrays) not yet supported; take first
        try:
            n_head_kv = int(hk)
        except TypeError:
            n_head_kv = int(hk[0])
        head_dim = int(g("attention.key_length", n_embd // max(n_head, 1)))
        rope = RopeConfig(
            dim=int(g("rope.dimension_count", head_dim)),
            freq_base=float(g("rope.freq_base", 10000.0)),
            scaling_type=str(g("rope.scaling.type", "none") or "none"),
            scaling_factor=float(g("rope.scaling.factor", 1.0)),
            orig_ctx_len=int(g("rope.scaling.original_context_length", 0)),
            attn_factor=float(g("rope.scaling.attn_factor", 1.0)),
            yarn_log_mul=float(g("rope.scaling.yarn_log_multiplier", 0.0)),
        )
        n_vocab = g("vocab_size")
        if n_vocab is None:
            toks = md.get("tokenizer.ggml.tokens")
            n_vocab = len(toks) if toks is not None else 0
        return cls(
            arch=arch,
            n_vocab=int(n_vocab),
            n_ctx_train=int(g("context_length", 2048)),
            n_embd=n_embd,
            n_layer=int(g("block_count")),
            n_head=n_head,
            n_head_kv=n_head_kv,
            n_ff=int(g("feed_forward_length", 4 * n_embd)),
            head_dim_k=head_dim,
            head_dim_v=int(g("attention.value_length", head_dim)),
            rms_norm_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            n_expert=int(g("expert_count", 0) or 0),
            n_expert_used=int(g("expert_used_count", 0) or 0),
            expert_gating_func=(
                "sigmoid" if int(g("expert_gating_func", 1) or 1) == 2 else "softmax"
            ),
            expert_weights_norm=bool(g("expert_weights_norm", False)),
            expert_weights_scale=float(g("expert_weights_scale", 1.0) or 1.0),
            n_ff_exp=int(g("expert_feed_forward_length", 0) or 0),
            n_ff_shexp=int(g("expert_shared_feed_forward_length", 0) or 0),
            n_expert_shared=int(g("expert_shared_count", 0) or 0),
            sliding_window=int(g("attention.sliding_window", 0) or 0),
            attn_logit_softcap=float(g("attn_logit_softcapping", 0.0) or 0.0),
            final_logit_softcap=float(g("final_logit_softcapping", 0.0) or 0.0),
            metadata=md,
        )
