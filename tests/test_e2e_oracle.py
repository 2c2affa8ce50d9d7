"""End-to-end oracle: greedy tokens must match a COMPILED reference
llama-cli on the same GGUF + prompt (SURVEY §4 test translation (d)).

Like tests/oracle (which compiles ggml-quants.c), this builds the reference
from /root/reference at test time — its source never enters this repo. The
build is cached in /tmp; set LLAMACOG_LLAMA_CLI to point at an existing
binary, or LLAMACOG_SKIP_ORACLE_BUILD=1 to skip when no binary is cached.

This one test proves the full pipeline end to end: our GGUF writer produces
files stock llama.cpp loads; tokenizer, forward pass (rope convention!),
greedy sampling, and detokenizer agree token-for-token.
"""

import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

REF = pathlib.Path("/root/reference")
BUILD = pathlib.Path(os.environ.get("LLAMACOG_ORACLE_BUILD", "/tmp/llamacog_oracle"))


def _find_or_build_cli() -> str | None:
    env = os.environ.get("LLAMACOG_LLAMA_CLI")
    if env and os.path.isfile(env):
        return env
    for cand in (BUILD / "bin" / "llama-cli",
                 pathlib.Path("/tmp/llamacpp_build/bin/llama-cli")):
        if cand.is_file():
            return str(cand)
    if os.environ.get("LLAMACOG_SKIP_ORACLE_BUILD") or not REF.is_dir():
        return None
    BUILD.mkdir(parents=True, exist_ok=True)
    try:
        subprocess.run(
            ["cmake", str(REF), "-DCMAKE_BUILD_TYPE=Release",
             "-DLLAMA_BUILD_TESTS=OFF", "-DLLAMA_BUILD_SERVER=OFF",
             "-DLLAMA_CURL=OFF", "-DGGML_OPENMP=OFF"],
            cwd=BUILD, check=True, capture_output=True, timeout=600,
        )
        subprocess.run(
            ["cmake", "--build", ".", "--target", "llama-cli", "-j1"],
            cwd=BUILD, check=True, capture_output=True, timeout=2400,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return None
    p = BUILD / "bin" / "llama-cli"
    return str(p) if p.is_file() else None


@pytest.fixture(scope="module")
def llama_cli():
    cli = _find_or_build_cli()
    if cli is None:
        pytest.skip("reference llama-cli unavailable (set LLAMACOG_LLAMA_CLI)")
    return cli


N_GEN = 16
PROMPT = "hello world"


def _ref_generate(cli: str, gguf: str) -> bytes:
    out = subprocess.run(
        [cli, "-m", gguf, "-p", PROMPT, "-n", str(N_GEN), "--temp", "0",
         "-no-cnv", "--no-warmup", "--no-display-prompt", "--simple-io",
         "-s", "1", "-c", "256"],
        capture_output=True, timeout=300, check=True,
    )
    txt = out.stdout.rstrip(b"\n")
    return txt.removesuffix(b" [end of text]")


def _our_generate(gguf: str) -> bytes:
    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine

    m = load_model(gguf, dtype=jnp.float32)
    eng = Engine(m.params, m.config, batch_size=1, max_seq=256, dtype=jnp.float32)
    ids = m.tokenizer.tokenize(PROMPT, add_special=True, parse_special=True)
    eog = {tid for tid in (m.vocab.eos_id,) if tid is not None}
    res = eng.generate_greedy(ids, N_GEN, eog_ids=eog)
    toks = [t for t in res.tokens if t not in eog]
    return b"".join(m.vocab.token_to_piece(t) for t in toks)


@pytest.mark.parametrize("quant", ["F32", "Q8_0"])
def test_greedy_matches_reference_cli(llama_cli, tmp_path, quant):
    from llamacog_tpu.gguf import GGMLType
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = str(tmp_path / f"oracle_{quant}.gguf")
    make_tiny_llama_gguf(
        path, n_vocab=256, n_embd=64, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=128, seed=3, quant_type=getattr(GGMLType, quant),
    )
    ref = _ref_generate(llama_cli, path)
    ours = _our_generate(path)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


def test_yarn_scaled_context_matches_reference_cli(llama_cli, tmp_path):
    """YaRN rope scaling end to end at positions past the original context:
    greedy output must match the compiled reference on the same GGUF.
    (ggml's yarn ramp differs slightly from HF's, so the compiled llama.cpp
    is the correct oracle here, not transformers.)"""
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = str(tmp_path / "yarn.gguf")
    make_tiny_llama_gguf(
        path, n_vocab=256, n_embd=64, n_layer=2, n_head=4, n_head_kv=2,
        n_ff=128, seed=11, n_ctx=256,
        extra_metadata={
            "llama.rope.scaling.type": "yarn",
            "llama.rope.scaling.factor": 4.0,
            "llama.rope.scaling.original_context_length": 16,
        },
    )
    import subprocess

    long_prompt = "the quick brown fox jumps over the lazy dog " * 3  # > 16 tok
    out = subprocess.run(
        [llama_cli, "-m", path, "-p", long_prompt, "-n", str(N_GEN), "--temp",
         "0", "-no-cnv", "--no-warmup", "--no-display-prompt", "--simple-io",
         "-s", "1", "-c", "256"],
        capture_output=True, timeout=300, check=True,
    )
    ref = out.stdout.rstrip(b"\n")

    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine

    m = load_model(path, dtype=jnp.float32)
    assert m.config.rope.scaling_type == "yarn"
    eng = Engine(m.params, m.config, batch_size=1, max_seq=256, dtype=jnp.float32)
    ids = m.tokenizer.tokenize(long_prompt, add_special=True, parse_special=True)
    assert len(ids) > 16  # genuinely beyond the original context
    eog = {m.vocab.eos_id}
    res = eng.generate_greedy(ids, N_GEN, eog_ids=eog)
    toks = [t for t in res.tokens if t not in eog]
    ours = b"".join(m.vocab.token_to_piece(t) for t in toks)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


def test_saved_model_loads_in_reference_cli(llama_cli, tmp_path):
    """tools/save_model output must be loadable by stock llama.cpp and give
    the same greedy tokens as the original file (proves metadata + tensor
    round-trip fidelity, llama_model_save_to_file parity)."""
    import jax.numpy as jnp

    from llamacog_tpu.gguf import GGMLType
    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.tools.save_model import save_model
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    src = str(tmp_path / "orig.gguf")
    make_tiny_llama_gguf(src, n_vocab=256, n_embd=64, n_layer=2, n_head=4,
                         n_head_kv=2, n_ff=128, seed=5,
                         quant_type=GGMLType.F32)
    m = load_model(src, mode="dequant", dtype=jnp.float32, fuse=False)
    dst = str(tmp_path / "resaved.gguf")
    save_model(m, dst)
    assert _ref_generate(llama_cli, dst) == _ref_generate(llama_cli, src)


def test_phimoe_matches_reference_cli(llama_cli, tmp_path):
    """phimoe (Phi-3.5-MoE): RMS norms with biases, qkv/output biases,
    softmax-routed MoE with weight renorm — greedy tokens must match the
    compiled reference (llm_build_phi3 shared graph, llama-model.cpp:13933).
    No HF oracle is possible here: HF phimoe routes with sparsemixer, which
    the reference intentionally approximates with softmax top-k."""
    from llamacog_tpu.utils.testing import make_tiny_phimoe_gguf

    path = str(tmp_path / "phimoe.gguf")
    make_tiny_phimoe_gguf(path, seed=13)
    ref = _ref_generate(llama_cli, path)
    ours = _our_generate(path)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


# Long-tail arches with no offline HF oracle: prove graph parity by matching
# the compiled reference token-for-token on tiny random GGUFs.
ARCH_ORACLE_SPECS = {
    # llama graph, NORM rope (llm_build_xverse, llama-model.cpp:5308)
    "xverse": dict(),
    # gateless relu^2 FFN (llm_build_arcee :13616)
    "arcee": dict(gate=False),
    # fused qkv+bias MHA, NEOX; metadata n_ff is 2x the tensor width
    # (llm_build_qwen :6740, create_tensor n_ff/2 :2444)
    "qwen": dict(qkv="fused", qkv_bias=True, n_head_kv=4, n_ff_meta=192),
    # shared attn_norm, out = attn + ffn + input (llm_build_plamo :7792)
    "plamo": dict(ffn_norm=False),
    # gpt2 block + NEOX rope (llm_build_codeshell :8017)
    "codeshell": dict(norm="layer", norm_bias=True, qkv="fused",
                      qkv_bias=True, o_bias=True, gate=False, ffn_bias=True),
    # gpt2 + ALiBi + swiglu with biases, 1/d attention scale
    # (llm_build_jais :11238)
    "jais": dict(norm="layer", norm_bias=True, qkv="fused", qkv_bias=True,
                 o_bias=True, ffn_bias=True, n_head_kv=4,
                 extra_metadata={"jais.attention.max_alibi_bias": 8.0}),
    # MoE + shared expert + dense lead layer + routed-weight scale
    # (llm_build_deepseek :10382)
    # seed pinned: expert_weights_scale=1.5 amplifies the f16-KV (ref) vs
    # f32-KV (ours) noise enough to flip near-tied argmaxes on some seeds
    "deepseek": dict(
        seed=0,
        n_expert=4, n_expert_used=2, n_expert_shared=1, n_dense_lead=1,
        extra_metadata={
            "deepseek.leading_dense_block_count": 1,
            "deepseek.expert_feed_forward_length": 96,
            "deepseek.expert_shared_count": 1,
            "deepseek.expert_weights_scale": 1.5,
        }),
    # fused qkv with per-head q/k rms norm, tied lm head
    # (llm_build_openelm :9967)
    "openelm": dict(qkv="fused", qk_norm=True, output=False),
    # embd x78.38, unit attn scale, per-branch post-norms, gelu MoE,
    # logits x0.577 (llm_build_grok :5545)
    "grok": dict(n_expert=4, n_expert_used=2, post_norms=True),

    # non-parametric LayerNorm everywhere (llm_build_olmo :9582)
    "olmo": dict(norms=False, norm="layer"),
    # llama block without rope (llm_build_refact :5943; ROPE_TYPE_NONE)
    "refact": dict(),
    # per-head LayerNorm on q/k before rope, image-logit suppression
    # (llm_build_chameleon :12821; vocab > 8196 so the suppression runs)
    "chameleon": dict(qk_norm_layer=True, n_vocab=8448,
                      extra_metadata={"chameleon.swin_norm": False}),
    # sequential dense FFN + parallel MoE on the layer input
    # (llm_build_arctic :10244)
    "arctic": dict(seed=2, moe_extra_dense=True, n_expert=4, n_expert_used=2),
    # iSWA chunked attention (inactive at tiny ctx), NoPE 4th layer with
    # attn-temperature scale, L2 q/k norm, sigmoid router with
    # weight-before-FFN MoE on every 2nd layer + shared expert
    # (llm_build_llama_iswa :4847)
    "llama4": dict(
        n_layer=4, n_expert=4, n_expert_used=2, n_expert_shared=1,
        moe_layer_step=2,
        extra_metadata={"llama4.expert_feed_forward_length": 96,
                        "llama4.interleave_moe_layer_step": 2}),
    # rms sub-norms before wo/ffn_down + per-projection scalar scales,
    # tied lm head (llm_build_bitnet :10807)
    "bitnet": dict(subnorm_scales=True, output=False),
    # qwen3-style per-head q/k norm + deepseek-v3-style MoE: sigmoid router
    # with selection-bias tensor, shared expert, dense lead layer
    # (llm_build_dots1 :13466)
    "dots1": dict(  # the reference loads MHA-shaped k/v for dots1
        qk_norm=True, n_head_kv=4, n_expert=4, n_expert_used=2,
        n_expert_shared=1, n_dense_lead=1, exp_probs_b=True,
        extra_metadata={
            "dots1.leading_dense_block_count": 1,
            "dots1.expert_feed_forward_length": 96,
            "dots1.expert_shared_count": 1,
            "dots1.expert_weights_scale": 1.0,
            "dots1.expert_weights_norm": True,
            "dots1.expert_gating_func": 2,
        }),
    # deepseek-shaped MoE with shared experts, softmax router
    # (llm_build_bailingmoe :13322)
    "bailingmoe": dict(
        seed=1,
        n_expert=4, n_expert_used=2, n_expert_shared=1,
        extra_metadata={
            "bailingmoe.leading_dense_block_count": 0,
            "bailingmoe.expert_feed_forward_length": 96,
            "bailingmoe.expert_shared_count": 1,
            "bailingmoe.expert_weights_scale": 1.0,
            "bailingmoe.expert_weights_norm": True,
        }),

}


@pytest.mark.parametrize("arch", sorted(ARCH_ORACLE_SPECS))
def test_arch_matches_reference_cli(llama_cli, tmp_path, arch):
    from llamacog_tpu.utils.testing import make_tiny_arch_gguf

    path = str(tmp_path / f"{arch}.gguf")
    spec = dict(ARCH_ORACLE_SPECS[arch])
    seed = spec.pop("seed", 17)
    make_tiny_arch_gguf(path, arch, seed=seed, **spec)
    ref = _ref_generate(llama_cli, path)
    ours = _our_generate(path)
    assert ours == ref, f"{arch}: ref={ref!r}\nours={ours!r}"


# ---------------------------------------------------------------------------
# Encoder (BERT-family) oracle: pooled embeddings must match the compiled
# reference llama-embedding on the same tiny GGUF (llm_build_bert
# llama-model.cpp:6042 / llm_build_neo_bert :6228).
# ---------------------------------------------------------------------------

def _find_or_build_embedding() -> str | None:
    env = os.environ.get("LLAMACOG_LLAMA_EMBEDDING")
    if env and os.path.isfile(env):
        return env
    for cand in (BUILD / "bin" / "llama-embedding",
                 pathlib.Path("/tmp/llamacpp_build/bin/llama-embedding")):
        if cand.is_file():
            return str(cand)
    if _find_or_build_cli() is None:  # sets up the cmake build dir
        return None
    build_dir = (BUILD if (BUILD / "CMakeCache.txt").is_file()
                 else pathlib.Path("/tmp/llamacpp_build"))
    try:
        subprocess.run(
            ["cmake", "--build", ".", "--target", "llama-embedding", "-j2"],
            cwd=build_dir, check=True, capture_output=True, timeout=1200,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return None
    p = build_dir / "bin" / "llama-embedding"
    return str(p) if p.is_file() else None


@pytest.fixture(scope="module")
def llama_embedding():
    binp = _find_or_build_embedding()
    if binp is None:
        pytest.skip("reference llama-embedding unavailable")
    return binp


BERT_ORACLE_ARCHES = [
    "bert",            # learned positions + token types, GELU MLP w/ biases
    "nomic-bert",      # NEOX rope, fused qkv, silu-gated FFN
    "nomic-bert-moe",  # + qkv bias, gateless-GELU MoE every 2nd layer
    "jina-bert-v2",    # ALiBi, q/k LayerNorms, attn_norm_2, GELU-gated FFN
    "jina-bert-v2-geglu",  # gateless GEGLU variant (doubled ffn_up split)
    "neo-bert",        # pre-norm RMS, NORM rope, packed-swiglu, enc norm
]


@pytest.mark.parametrize("arch", BERT_ORACLE_ARCHES)
def test_bert_family_matches_reference_embedding(llama_embedding, tmp_path, arch):
    import json

    import jax.numpy as jnp
    import numpy as np

    from llamacog_tpu.models.bert import BertEncoder
    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.utils.testing import make_tiny_bert_gguf

    geglu = arch == "jina-bert-v2-geglu"
    real_arch = "jina-bert-v2" if geglu else arch
    path = str(tmp_path / f"{arch}.gguf")
    make_tiny_bert_gguf(path, real_arch, seed=29, jina_gate=not geglu)

    out = subprocess.run(
        [llama_embedding, "-m", path, "-p", PROMPT, "--pooling", "mean",
         "--embd-normalize", "-1", "--embd-output-format", "array"],
        capture_output=True, timeout=300, check=True,
    )
    line = next(l for l in out.stdout.decode().splitlines()
                if l.startswith("[["))
    ref = np.asarray(json.loads(line)[0], np.float32)

    m = load_model(path, dtype=jnp.float32)
    ids = m.tokenizer.tokenize(PROMPT, add_special=True, parse_special=True)
    enc = BertEncoder(m.params, m.config)
    ours = enc.embed([list(ids)], pooling="mean")[0]
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_rwkv6_converted_matches_reference_cli(llama_cli, tmp_path):
    """Full rwkv6 chain vs the compiled reference: crafted HF checkpoint ->
    OUR converter (incl. the rwkv-world vocab export) -> both llama-cli and
    our engine greedy-decode token-for-token."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from llamacog_tpu.tools.convert_hf import convert

    E6, HS, NL6, NFF = 64, 8, 2, 224
    cfg = dict(architectures=["Rwkv6ForCausalLM"], model_type="rwkv6",
               vocab_size=128, hidden_size=E6, num_hidden_layers=NL6,
               head_size=HS, layer_norm_epsilon=1e-5, rescale_every=2,
               intermediate_size=None)
    t = {"rwkv.embeddings.weight": (128, E6),
         "rwkv.blocks.0.pre_ln.weight": (E6,),
         "rwkv.blocks.0.pre_ln.bias": (E6,),
         "rwkv.ln_out.weight": (E6,), "rwkv.ln_out.bias": (E6,),
         "head.weight": (128, E6)}
    for i in range(NL6):
        p = f"rwkv.blocks.{i}"
        t.update({f"{p}.ln1.weight": (E6,), f"{p}.ln1.bias": (E6,),
                  f"{p}.ln2.weight": (E6,), f"{p}.ln2.bias": (E6,)})
        for x in "xwkvrg":
            t[f"{p}.attention.time_maa_{x}"] = (1, 1, E6)
        t.update({f"{p}.attention.time_maa_w1": (E6, 5 * 32),
                  f"{p}.attention.time_maa_w2": (5, 32, E6),
                  f"{p}.attention.time_decay": (1, 1, E6),
                  f"{p}.attention.time_decay_w1": (E6, 64),
                  f"{p}.attention.time_decay_w2": (64, E6),
                  f"{p}.attention.time_faaaa": (E6 // HS, HS),
                  f"{p}.attention.receptance.weight": (E6, E6),
                  f"{p}.attention.key.weight": (E6, E6),
                  f"{p}.attention.value.weight": (E6, E6),
                  f"{p}.attention.gate.weight": (E6, E6),
                  f"{p}.attention.output.weight": (E6, E6),
                  f"{p}.attention.ln_x.weight": (E6,),
                  f"{p}.attention.ln_x.bias": (E6,),
                  f"{p}.feed_forward.time_maa_k": (1, 1, E6),
                  f"{p}.feed_forward.time_maa_r": (1, 1, E6),
                  f"{p}.feed_forward.key.weight": (NFF, E6),
                  f"{p}.feed_forward.receptance.weight": (E6, E6),
                  f"{p}.feed_forward.value.weight": (E6, NFF)})
    d = tmp_path / "r6hf"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(4)
    save_file({k: (rng.standard_normal(v) * 0.5).astype(np.float32)
               for k, v in t.items()}, str(d / "model.safetensors"))
    # tiny rwkv world vocab: printable ascii single bytes (ids 1..95)
    lines = [f"{i} {bytes([b])!r} 1"
             for i, b in enumerate(range(0x20, 0x7F), start=1)]
    (d / "rwkv_vocab_v20230424.txt").write_text("\n".join(lines))

    gguf = str(tmp_path / "r6.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


def test_rwkv7_converted_matches_reference_cli(llama_cli, tmp_path):
    """rwkv7 (fla-hub layout) through our converter vs compiled llama-cli."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from llamacog_tpu.tools.convert_hf import convert

    E7, HS, NL7, NFF = 64, 8, 2, 256
    cfg = dict(architectures=["Rwkv7ForCausalLM"], vocab_size=128,
               hidden_size=E7, num_hidden_layers=NL7, head_size=HS,
               layer_norm_epsilon=1e-5, intermediate_size=NFF,
               lora_rank_decay=None, lora_rank_iclr=None,
               lora_rank_value_residual_mix=None, lora_rank_gate=None)
    t = {"model.embeddings.weight": (128, E7),
         "model.layers.0.pre_norm.weight": (E7,),
         "model.layers.0.pre_norm.bias": (E7,),
         "model.ln_out.weight": (E7,), "model.ln_out.bias": (E7,),
         "lm_head.weight": (128, E7)}
    for i in range(NL7):
        p = f"model.layers.{i}"
        t.update({f"{p}.ln1.weight": (E7,), f"{p}.ln1.bias": (E7,),
                  f"{p}.ln2.weight": (E7,), f"{p}.ln2.bias": (E7,)})
        for x in "rwkvag":
            t[f"{p}.attention.x_{x}"] = (1, 1, E7)
        t.update({f"{p}.attention.w0": (1, 1, E7),
                  f"{p}.attention.w1": (E7, 32),
                  f"{p}.attention.w2": (32, E7),
                  f"{p}.attention.a0": (1, 1, E7),
                  f"{p}.attention.a1": (E7, 32),
                  f"{p}.attention.a2": (32, E7),
                  f"{p}.attention.v0": (1, 1, E7),
                  f"{p}.attention.v1": (E7, 32),
                  f"{p}.attention.v2": (32, E7),
                  f"{p}.attention.g1": (E7, 32),
                  f"{p}.attention.g2": (32, E7),
                  f"{p}.attention.k_k": (1, 1, E7),
                  f"{p}.attention.k_a": (1, 1, E7),
                  f"{p}.attention.r_k": (E7 // HS, HS),
                  f"{p}.attention.receptance.weight": (E7, E7),
                  f"{p}.attention.key.weight": (E7, E7),
                  f"{p}.attention.value.weight": (E7, E7),
                  f"{p}.attention.output.weight": (E7, E7),
                  f"{p}.attention.ln_x.weight": (E7,),
                  f"{p}.attention.ln_x.bias": (E7,),
                  f"{p}.feed_forward.x_k": (1, 1, E7),
                  f"{p}.feed_forward.key.weight": (NFF, E7),
                  f"{p}.feed_forward.value.weight": (E7, NFF)})
    d = tmp_path / "r7hf"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(6)
    save_file({k: (rng.standard_normal(v) * 0.5).astype(np.float32)
               for k, v in t.items()}, str(d / "model.safetensors"))
    lines = [f"{i} {bytes([b])!r} 1"
             for i, b in enumerate(range(0x20, 0x7F), start=1)]
    (d / "rwkv_vocab_v20230424.txt").write_text("\n".join(lines))

    gguf = str(tmp_path / "r7.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


def _world_vocab(d):
    lines = [f"{i} {bytes([b])!r} 1"
             for i, b in enumerate(range(0x20, 0x7F), start=1)]
    (d / "rwkv_vocab_v20230424.txt").write_text("\n".join(lines))


def test_rwkv6qwen2_converted_matches_reference_cli(llama_cli, tmp_path):
    """rwkv6-qwen2 hybrid (gated linear attention + qwen2 FFN shell)
    through our converter vs compiled llama-cli."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from llamacog_tpu.tools.convert_hf import convert

    E6, NLh = 64, 2
    cfg = dict(architectures=["RWKV6Qwen2ForCausalLM"], vocab_size=128,
               hidden_size=E6, num_hidden_layers=NLh, num_attention_heads=8,
               num_key_value_heads=2, rms_norm_eps=1e-6,
               intermediate_size=96)
    t = {"model.embed_tokens.weight": (128, E6),
         "model.norm.weight": (E6,), "lm_head.weight": (128, E6)}
    for i in range(NLh):
        p = f"model.layers.{i}"
        t[f"{p}.input_layernorm.weight"] = (E6,)
        for x in "xwkvrg":
            t[f"{p}.self_attn.time_maa_{x}"] = (1, 1, E6)
        t.update({f"{p}.self_attn.time_maa_w1": (E6, 5 * 32),
                  f"{p}.self_attn.time_maa_w2": (5, 32, E6),
                  f"{p}.self_attn.time_decay": (1, 1, E6),
                  f"{p}.self_attn.time_decay_w1": (E6, 64),
                  f"{p}.self_attn.time_decay_w2": (64, E6),
                  f"{p}.self_attn.q_proj.weight": (E6, E6),
                  f"{p}.self_attn.k_proj.weight": (16, E6),
                  f"{p}.self_attn.v_proj.weight": (16, E6),
                  f"{p}.self_attn.gate.weight": (E6, E6),
                  f"{p}.self_attn.o_proj.weight": (E6, E6),
                  f"{p}.post_attention_layernorm.weight": (E6,),
                  f"{p}.mlp.gate_proj.weight": (96, E6),
                  f"{p}.mlp.up_proj.weight": (96, E6),
                  f"{p}.mlp.down_proj.weight": (E6, 96)})
    d = tmp_path / "r6q2hf"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(7)
    save_file({k: (rng.standard_normal(v) * 0.5).astype(np.float32)
               for k, v in t.items()}, str(d / "model.safetensors"))
    _world_vocab(d)
    gguf = str(tmp_path / "r6q2.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


def test_arwkv7_converted_matches_reference_cli(llama_cli, tmp_path):
    """arwkv7 hybrid (rwkv7 time mix in a qwen2 layer shell) through our
    converter vs compiled llama-cli."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from llamacog_tpu.tools.convert_hf import convert

    E7, HS, NLh, NFF = 64, 8, 2, 96
    cfg = dict(architectures=["RwkvHybridForCausalLM"], vocab_size=128,
               hidden_size=E7, num_hidden_layers=NLh, head_size=HS,
               rms_norm_eps=1e-6, intermediate_size=NFF, wkv_has_gate=True,
               wkv_version=7, num_attention_heads=8)
    t = {"model.embed_tokens.weight": (128, E7),
         "model.norm.weight": (E7,), "lm_head.weight": (128, E7)}
    for i in range(NLh):
        p = f"model.layers.{i}.self_attn.time_mixer"
        for x in "rwkvag":
            t[f"{p}.x_{x}"] = (1, 1, E7)
        # ARwkv7Model hardcodes lora ranks decay/iclr 64, v-mix 32, gate 128
        t.update({f"{p}.w0": (1, 1, E7), f"{p}.w1": (E7, 64),
                  f"{p}.w2": (64, E7),
                  f"{p}.a0": (1, 1, E7), f"{p}.a1": (E7, 64),
                  f"{p}.a2": (64, E7),
                  f"{p}.g1": (E7, 128), f"{p}.g2": (128, E7),
                  f"{p}.k_k": (1, 1, E7), f"{p}.k_a": (1, 1, E7),
                  f"{p}.r_k": (E7 // HS, HS),
                  f"{p}.receptance.weight": (E7, E7),
                  f"{p}.key.weight": (E7, E7),
                  f"{p}.value.weight": (E7, E7),
                  f"{p}.output.weight": (E7, E7),
                  f"{p}.ln_x.weight": (E7,), f"{p}.ln_x.bias": (E7,)})
        if i > 0:
            t.update({f"{p}.v0": (1, 1, E7), f"{p}.v1": (E7, 32),
                      f"{p}.v2": (32, E7)})
        q = f"model.layers.{i}"
        t.update({f"{q}.input_layernorm.weight": (E7,),
                  f"{q}.post_attention_layernorm.weight": (E7,),
                  f"{q}.mlp.gate_proj.weight": (NFF, E7),
                  f"{q}.mlp.up_proj.weight": (NFF, E7),
                  f"{q}.mlp.down_proj.weight": (E7, NFF)})
    d = tmp_path / "ar7hf"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(8)
    save_file({k: (rng.standard_normal(v) * 0.5).astype(np.float32)
               for k, v in t.items()}, str(d / "model.safetensors"))
    _world_vocab(d)
    gguf = str(tmp_path / "ar7.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


def test_deci_converted_matches_reference_cli(llama_cli, tmp_path):
    """Nemotron-51B-style DeciLM (per-layer kv heads, one linear-attention
    block) through our converter vs compiled llama-cli — exercises the
    variable-GQA runtime path and the linear_attn mapping."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from llamacog_tpu.tools.convert_hf import convert

    E8, NH8 = 64, 4
    blocks = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": True},
         "ffn": {"ffn_mult": 1.0}},
        {"attention": {"n_heads_in_group": 4, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
    ]
    ffn_dim = 256
    cfg = dict(architectures=["DeciLMForCausalLM"], vocab_size=128,
               hidden_size=E8, num_hidden_layers=3,
               num_attention_heads=NH8, block_configs=blocks,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               rope_theta=10000.0)
    hd = E8 // NH8
    t = {"model.embed_tokens.weight": (128, E8), "model.norm.weight": (E8,),
         "lm_head.weight": (128, E8)}

    def attn(i, kv):
        p = f"model.layers.{i}"
        t.update({f"{p}.self_attn.q_proj.weight": (NH8 * hd, E8),
                  f"{p}.self_attn.k_proj.weight": (kv * hd, E8),
                  f"{p}.self_attn.v_proj.weight": (kv * hd, E8),
                  f"{p}.self_attn.o_proj.weight": (E8, NH8 * hd)})

    def mlp(i):
        p = f"model.layers.{i}"
        t.update({f"{p}.input_layernorm.weight": (E8,),
                  f"{p}.post_attention_layernorm.weight": (E8,),
                  f"{p}.mlp.gate_proj.weight": (ffn_dim, E8),
                  f"{p}.mlp.up_proj.weight": (ffn_dim, E8),
                  f"{p}.mlp.down_proj.weight": (E8, ffn_dim)})

    attn(0, 2)
    t["model.layers.1.self_attn.linear_attn.weight"] = (E8, E8)
    attn(2, 1)
    for i in range(3):
        mlp(i)
    d = tmp_path / "decihf"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(9)
    save_file({k: (rng.standard_normal(v) * 0.5).astype(np.float32)
               for k, v in t.items()}, str(d / "model.safetensors"))
    _world_vocab(d)
    gguf = str(tmp_path / "deci.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


def test_openelm_converted_matches_reference_cli(llama_cli, tmp_path):
    """OpenELM (per-layer q/kv head arrays, per-head qk-norm, per-layer ffn
    dims, tied head) through our converter vs compiled llama-cli."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from llamacog_tpu.tools.convert_hf import convert

    E8, hd = 64, 16
    q_heads, kv_heads = [4, 2], [2, 1]
    cfg = dict(architectures=["OpenELMForCausalLM"], vocab_size=128,
               model_dim=E8, num_transformer_layers=2, head_dim=hd,
               num_query_heads=q_heads, num_kv_heads=kv_heads,
               ffn_multipliers=[1.0, 2.0], ffn_dim_divisor=32,
               max_context_length=2048, rope_freq_constant=10000)
    ffn = [64, 128]
    t = {"transformer.token_embeddings.weight": (128, E8),
         "transformer.norm.weight": (E8,)}
    for i in range(2):
        p = f"transformer.layers.{i}"
        qkv = (q_heads[i] + 2 * kv_heads[i]) * hd
        t.update({f"{p}.attn_norm.weight": (E8,),
                  f"{p}.ffn_norm.weight": (E8,),
                  f"{p}.attn.qkv_proj.weight": (qkv, E8),
                  f"{p}.attn.out_proj.weight": (E8, q_heads[i] * hd),
                  f"{p}.attn.q_norm.weight": (hd,),
                  f"{p}.attn.k_norm.weight": (hd,),
                  f"{p}.ffn.proj_1.weight": (2 * ffn[i], E8),
                  f"{p}.ffn.proj_2.weight": (E8, ffn[i])})
    d = tmp_path / "oelm"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(10)
    save_file({k: (rng.standard_normal(v) * 0.5).astype(np.float32)
               for k, v in t.items()}, str(d / "model.safetensors"))
    _world_vocab(d)
    gguf = str(tmp_path / "oelm.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"ref={ref!r}\nours={ours!r}"


def _converted_oracle(tmp_path, llama_cli, name, cfg, tensors, seed=11,
                      init_scale=0.5):
    import json

    import numpy as np
    from safetensors.numpy import save_file

    from llamacog_tpu.tools.convert_hf import convert

    d = tmp_path / name
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    rng = np.random.default_rng(seed)
    save_file({k: (rng.standard_normal(v) * init_scale).astype(np.float32)
               for k, v in tensors.items()}, str(d / "model.safetensors"))
    _world_vocab(d)
    gguf = str(tmp_path / f"{name}.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"{name}: ref={ref!r}\nours={ours!r}"


def _llama_style_tensors(E8, F8, NLh, NH8, NKV8, fused_qkv=None,
                         norm_bias=False, tied=False):
    hd = E8 // NH8
    t = {"model.embed_tokens.weight": (128, E8), "model.norm.weight": (E8,)}
    if not tied:
        t["lm_head.weight"] = (128, E8)
    if norm_bias:
        t["model.norm.bias"] = (E8,)
    for i in range(NLh):
        p = f"model.layers.{i}"
        if fused_qkv == "W_pack":
            t[f"{p}.self_attn.W_pack.weight"] = (3 * E8, E8)
        else:
            t[f"{p}.self_attn.q_proj.weight"] = (NH8 * hd, E8)
            t[f"{p}.self_attn.k_proj.weight"] = (NKV8 * hd, E8)
            t[f"{p}.self_attn.v_proj.weight"] = (NKV8 * hd, E8)
        t[f"{p}.self_attn.o_proj.weight"] = (E8, NH8 * hd)
        t[f"{p}.input_layernorm.weight"] = (E8,)
        t[f"{p}.post_attention_layernorm.weight"] = (E8,)
        if norm_bias:
            t[f"{p}.input_layernorm.bias"] = (E8,)
            t[f"{p}.post_attention_layernorm.bias"] = (E8,)
        t[f"{p}.mlp.gate_proj.weight"] = (F8, E8)
        t[f"{p}.mlp.up_proj.weight"] = (F8, E8)
        t[f"{p}.mlp.down_proj.weight"] = (E8, F8)
    return t


def test_minicpm_converted_matches_reference_cli(llama_cli, tmp_path):
    """minicpm: scale_emb embedding scale, scale_depth residual scale,
    E/dim_model_base logit scale (llm_build_minicpm flags)."""
    cfg = dict(architectures=["MiniCPMForCausalLM"], vocab_size=128,
               hidden_size=64, intermediate_size=96, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               max_position_embeddings=2048, rms_norm_eps=1e-5,
               scale_emb=12.0, scale_depth=1.4, dim_model_base=32)
    t = _llama_style_tensors(64, 96, 2, 4, 2, tied=True)
    _converted_oracle(tmp_path, llama_cli, "minicpme2e", cfg, t,
                      init_scale=0.1)


def test_baichuan_converted_matches_reference_cli(llama_cli, tmp_path):
    """baichuan: fused W_pack QKV + NORM-rope permute. llama.cpp hard-aborts
    unless n_layer is 32 (7B/rope) or 40 (13B/alibi), so the fixture uses
    32 tiny layers."""
    cfg = dict(architectures=["BaichuanForCausalLM"], vocab_size=128,
               hidden_size=64, intermediate_size=96, num_hidden_layers=32,
               num_attention_heads=4, model_max_length=4096,
               rms_norm_eps=1e-6)
    t = _llama_style_tensors(64, 96, 32, 4, 4, fused_qkv="W_pack")
    _converted_oracle(tmp_path, llama_cli, "baichuane2e", cfg, t)


def test_exaone_converted_matches_reference_cli(llama_cli, tmp_path):
    cfg = dict(architectures=["ExaoneForCausalLM"], vocab_size=128,
               hidden_size=64, num_layers=2, num_attention_heads=4,
               num_key_value_heads=2, max_position_embeddings=2048,
               layer_norm_epsilon=1e-5, intermediate_size=96,
               rope_theta=10000.0, activation_function="silu")
    t = {"transformer.wte.weight": (128, 64),
         "transformer.ln_f.weight": (64,), "lm_head.weight": (128, 64)}
    for i in range(2):
        p = f"transformer.h.{i}"
        t.update({f"{p}.ln_1.weight": (64,), f"{p}.ln_2.weight": (64,),
                  f"{p}.attn.attention.q_proj.weight": (64, 64),
                  f"{p}.attn.attention.k_proj.weight": (32, 64),
                  f"{p}.attn.attention.v_proj.weight": (32, 64),
                  f"{p}.attn.attention.out_proj.weight": (64, 64),
                  f"{p}.mlp.c_fc_0.weight": (96, 64),
                  f"{p}.mlp.c_fc_1.weight": (96, 64),
                  f"{p}.mlp.c_proj.weight": (64, 96)})
    _converted_oracle(tmp_path, llama_cli, "exaonee2e", cfg, t)


def test_internlm2_converted_matches_reference_cli(llama_cli, tmp_path):
    """internlm2: grouped wqkv interleave split."""
    E8, NH8, NKV8 = 64, 4, 2
    hd = E8 // NH8
    cfg = dict(architectures=["InternLM2ForCausalLM"], vocab_size=128,
               hidden_size=E8, intermediate_size=96, num_hidden_layers=2,
               num_attention_heads=NH8, num_key_value_heads=NKV8,
               max_position_embeddings=2048, rope_theta=10000.0,
               rms_norm_eps=1e-5)
    t = {"model.tok_embeddings.weight": (128, E8),
         "model.norm.weight": (E8,), "output.weight": (128, E8)}
    for i in range(2):
        p = f"model.layers.{i}"
        t.update({f"{p}.attention.wqkv.weight": ((NH8 + 2 * NKV8) * hd, E8),
                  f"{p}.attention.wo.weight": (E8, E8),
                  f"{p}.attention_norm.weight": (E8,),
                  f"{p}.ffn_norm.weight": (E8,),
                  f"{p}.feed_forward.w1.weight": (96, E8),
                  f"{p}.feed_forward.w2.weight": (E8, 96),
                  f"{p}.feed_forward.w3.weight": (96, E8)})
    _converted_oracle(tmp_path, llama_cli, "internlm2e2e", cfg, t)


def test_orion_converted_matches_reference_cli(llama_cli, tmp_path):
    """orion: LayerNorm (with biases) llama variant."""
    cfg = dict(architectures=["OrionForCausalLM"], vocab_size=128,
               hidden_size=64, intermediate_size=96, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               max_sequence_length=4096, rms_norm_eps=1e-5)
    t = _llama_style_tensors(64, 96, 2, 4, 2, norm_bias=True)
    _converted_oracle(tmp_path, llama_cli, "orione2e", cfg, t)


# ---------------------------------------------------------------------------
# Converted-oracle long tail: build the HF model with transformers, convert
# with OUR converter, then require token-for-token agreement between the
# compiled reference llama-cli and our engine on the same GGUF. These arches
# already have byte-level converter parity (tests/test_convert_oracle.py);
# this closes the runtime-graph half (the rwkv6qwen2 GQA bug showed "flag
# permutations of tested families" still hide real errors).
# ---------------------------------------------------------------------------

_HF_COMMON = dict(
    vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    tie_word_embeddings=False, pad_token_id=0, bos_token_id=1, eos_token_id=2,
)

# (config class, model class, config overrides)
HF_CONVERTED_CASES = {
    "stablelm": ("StableLmConfig", "StableLmForCausalLM", {}),
    "granite": ("GraniteConfig", "GraniteForCausalLM", {}),
    "granitemoe": ("GraniteMoeConfig", "GraniteMoeForCausalLM",
                   dict(num_local_experts=4, num_experts_per_tok=2)),
    "olmo": ("OlmoConfig", "OlmoForCausalLM", {}),
    "olmo2": ("Olmo2Config", "Olmo2ForCausalLM", {}),
    # MHA: the reference creates attn_{q,k}_norm at n_embd width
    # (real OlmoE is MHA, so HF's per-kv-width k_norm only matches then)
    "olmoe": ("OlmoeConfig", "OlmoeForCausalLM",
              dict(num_experts=4, num_experts_per_tok=2,
                   num_key_value_heads=4)),
    "starcoder2": ("Starcoder2Config", "Starcoder2ForCausalLM", {}),
    "nemotron": ("NemotronConfig", "NemotronForCausalLM", {}),
    "commandr": ("CohereConfig", "CohereForCausalLM",
                 dict(tie_word_embeddings=True)),
    # >=1 non-SWA layer (pattern 4) and a window < n_ctx; the reference
    # segfaults on an all-SWA 2-layer file
    "cohere2": ("Cohere2Config", "Cohere2ForCausalLM",
                dict(tie_word_embeddings=True, rotary_pct=0.5,
                     num_hidden_layers=4, sliding_window=32)),
    # HF Glm4Config defaults head_dim=128 regardless of hidden_size
    "glm4": ("Glm4Config", "Glm4ForCausalLM", dict(head_dim=16)),
    "arcee": ("ArceeConfig", "ArceeForCausalLM", {}),
}


@pytest.mark.parametrize("name", sorted(HF_CONVERTED_CASES))
def test_hf_converted_matches_reference_cli(llama_cli, tmp_path, name):
    torch = pytest.importorskip("torch")
    T = pytest.importorskip("transformers")

    from llamacog_tpu.tools.convert_hf import convert

    cfg_name, model_name, over = HF_CONVERTED_CASES[name]
    cfg_cls = getattr(T, cfg_name, None)
    model_cls = getattr(T, model_name, None)
    if cfg_cls is None or model_cls is None:
        pytest.skip("arch not in this transformers version")
    kw = dict(_HF_COMMON)
    kw.update(over)
    torch.manual_seed(0)
    m = model_cls(cfg_cls(**kw)).eval()
    # HF's 0.02-std init makes logits near-degenerate (argmax decided by
    # rounding noise the ref's f16 KV would flip); rescale like the
    # hand-built converted oracles (init_scale=0.5)
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.5)
    d = tmp_path / name
    m.save_pretrained(d, safe_serialization=True)
    _world_vocab(d)
    gguf = str(tmp_path / f"{name}.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"{name}: ref={ref!r}\nours={ours!r}"


# ---------------------------------------------------------------------------
# Converted-oracle batch 2 (round 4): arches whose HF config classes use
# their own argument names (n_embd/d_model/...), so each case carries its
# FULL config kwargs — merging _HF_COMMON would leave stray keys in
# config.json that can shadow the real dims for the converter.
# Same joint converter+runtime oracle: build with transformers, convert with
# OUR converter, require token-for-token agreement between the compiled
# reference llama-cli and our engine on the same GGUF
# (convert_hf_to_gguf.py:1240 ff. flag-permutation pool; VERDICT r3 item 7).
# ---------------------------------------------------------------------------

HF_CONVERTED_CASES2 = {
    # shared-expert MoE + per-expert gating (llm_build_qwen2moe)
    "qwen2moe": ("Qwen2MoeConfig", "Qwen2MoeForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        shared_expert_intermediate_size=64, decoder_sparse_step=1,
        max_position_embeddings=256, tie_word_embeddings=False)),
    # qk-norm llama shell (llm_build_qwen3)
    "qwen3": ("Qwen3Config", "Qwen3ForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        tie_word_embeddings=False)),
    # norm_topk_prob=True like every real Qwen3-MoE checkpoint: the
    # reference HARDCODES norm_w=true for qwen3moe (llama-model.cpp
    # llm_build_qwen3moe -> build_moe_ffn(..., LLM_FFN_SILU, true, ...))
    # and ignores the metadata; our runtime follows the converted flag
    # (verified == HF logits at 3e-6 either way), so only the True corner
    # is comparable against llama-cli.
    "qwen3moe": ("Qwen3MoeConfig", "Qwen3MoeForCausalLM", dict(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        decoder_sparse_step=1, max_position_embeddings=256,
        norm_topk_prob=True, tie_word_embeddings=False)),
    # fused qkv_proj/gate_up_proj splits (llm_build_phi3). Case name must
    # not contain "phi3": llama-vocab.cpp keys RSTRIP attrs off the model
    # NAME ("phi-3"/"phi3") and .at()-asserts "</s>" exists, which the
    # byte-world test vocab doesn't have.
    "p3mini": ("Phi3Config", "Phi3ForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)),
    # phi2: parallel residual, partial rotary, LN (+biases), fc biases
    "phi2": ("PhiConfig", "PhiForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=256,
        tie_word_embeddings=False)),
    # gemma2: logit/attn softcaps, pre+post norms, interleaved SWA
    "gemma2": ("Gemma2Config", "Gemma2ForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, sliding_window=32, max_position_embeddings=256,
        query_pre_attn_scalar=16)),
    # classic top-k MoE (llm_build_llama + mul_mat_id)
    "mixtral": ("MixtralConfig", "MixtralForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, tie_word_embeddings=False)),
    # gptneox parallel vs sequential residual (llm_build_gptneox both modes)
    "gptneox_par": ("GPTNeoXConfig", "GPTNeoXForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=True, max_position_embeddings=256)),
    "gptneox_seq": ("GPTNeoXConfig", "GPTNeoXForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.25,
        use_parallel_residual=False, max_position_embeddings=256)),
    # starcoder1 shell: MQA + learned positions + LN biases
    "gptbigcode": ("GPTBigCodeConfig", "GPTBigCodeForCausalLM", dict(
        vocab_size=128, n_embd=64, n_inner=96, n_layer=2, n_head=4,
        n_positions=256, multi_query=True)),
    # ALiBi + embedding layernorm (llm_build_bloom)
    "bloom": ("BloomConfig", "BloomForCausalLM", dict(
        vocab_size=128, hidden_size=64, n_layer=2, n_head=4)),
    # ALiBi, no biases, expansion-ratio FFN (llm_build_mpt).
    # expansion_ratio must be 4: transformers' MptMLP hardcodes
    # 4*hidden_size regardless of the config field, so any other value
    # makes config.json disagree with the tensors.
    "mpt": ("MptConfig", "MptForCausalLM", dict(
        vocab_size=128, d_model=64, n_heads=4, n_layers=2,
        expansion_ratio=4, max_seq_len=256)),
    # falcon-40B style: new_decoder_architecture (parallel attn+mlp, GQA)
    "falcon": ("FalconConfig", "FalconForCausalLM", dict(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, new_decoder_architecture=True,
        bias=False, parallel_attn=True, alibi=False)),
    # glm-edge (GlmForCausalLM): partial rope, post-norms
    "glm": ("GlmConfig", "GlmForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256)),
    # NOTE gptj is converter-supported here but has NO runtime oracle: the
    # reference's LLM_ARCH_GPTJ is vestigial — llama-model.cpp's
    # load_hparams switch has no GPTJ case and aborts with "unsupported
    # model architecture", so llama-cli cannot load ANY gptj GGUF. Our
    # gptj runtime is covered by the HF-logit parity suite instead.
    # gpt2: learned positions, fused c_attn, LN biases
    "gpt2": ("GPT2Config", "GPT2LMHeadModel", dict(
        vocab_size=128, n_embd=64, n_inner=96, n_layer=2, n_head=4,
        n_positions=256)),
}


@pytest.mark.parametrize("name", sorted(HF_CONVERTED_CASES2))
def test_hf_converted_matches_reference_cli_batch2(llama_cli, tmp_path, name):
    torch = pytest.importorskip("torch")
    T = pytest.importorskip("transformers")

    from llamacog_tpu.tools.convert_hf import convert

    cfg_name, model_name, kw = HF_CONVERTED_CASES2[name]
    cfg_cls = getattr(T, cfg_name, None)
    model_cls = getattr(T, model_name, None)
    if cfg_cls is None or model_cls is None:
        pytest.skip("arch not in this transformers version")
    kw = dict(kw, pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    if name == "dbrx":
        c = _dbrx_cfg(T)
        for k, v in kw.items():
            setattr(c, k, v)
        m = model_cls(c).eval()
    else:
        m = model_cls(cfg_cls(**kw)).eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.5)
    d = tmp_path / name
    m.save_pretrained(d, safe_serialization=True)
    _world_vocab(d)
    gguf = str(tmp_path / f"{name}.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"{name}: ref={ref!r}\nours={ours!r}"


# Round-5 long-tail batch (VERDICT r4 next #8): the remaining high-value
# converter arch names proven token-for-token vs the compiled reference.
HF_CONVERTED_CASES3 = {
    # llama shell + the four granite multipliers (llm_build_granite)
    "granite": ("GraniteConfig", "GraniteForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        logits_scaling=8.0, residual_multiplier=0.22,
        embedding_multiplier=12.0, attention_multiplier=0.015,
        max_position_embeddings=256, tie_word_embeddings=False)),
    # granite multipliers + fused input/output expert tensors
    "granitemoe": ("GraniteMoeConfig", "GraniteMoeForCausalLM", dict(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2, intermediate_size=48,
        logits_scaling=8.0, residual_multiplier=0.22,
        embedding_multiplier=12.0, attention_multiplier=0.015,
        max_position_embeddings=256, tie_word_embeddings=False)),
    # LayerNorm + partial rotary + optional qkv bias (llm_build_stablelm)
    "stablelm": ("StableLmConfig", "StableLmForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, use_qkv_bias=True,
        max_position_embeddings=256, tie_word_embeddings=False)),
    # LN + all-linear biases (llm_build_starcoder2)
    "starcoder2": ("Starcoder2Config", "Starcoder2ForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        use_bias=True, max_position_embeddings=256,
        tie_word_embeddings=False)),
    # non-parametric LayerNorm + clamped qkv (llm_build_olmo)
    "olmo": ("OlmoConfig", "OlmoForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        clip_qkv=2.0, max_position_embeddings=256,
        tie_word_embeddings=False)),
    # q/k-norm + POST-norms (llm_build_olmo2)
    "olmo2": ("Olmo2Config", "Olmo2ForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)),
    # MoE + q/k-norm + normalized top-k (llm_build_olmoe). MHA like the
    # real OLMoE checkpoints: the reference HARDCODES attn_{q,k}_norm as
    # {n_embd} (llama-model.cpp:3188-3189), so a GQA olmoe cannot load
    "olmoe": ("OlmoeConfig", "OlmoeForCausalLM", dict(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        num_experts=4, num_experts_per_tok=2, intermediate_size=48,
        norm_topk_prob=False, max_position_embeddings=256,
        tie_word_embeddings=False)),
    # relu^2 FFN (no gate), partial rope, LayerNorm+1 (llm_build_nemotron)
    "nemotron": ("NemotronConfig", "NemotronForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=256,
        tie_word_embeddings=False)),
    # parallel attn+ffn residual, LN, logit_scale, tied head
    # (llm_build_command_r)
    "commandr": ("CohereConfig", "CohereForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        logit_scale=0.25, max_position_embeddings=256,
        tie_word_embeddings=True)),
    # command-r shell + interleaved SWA w/ rope-only-local
    # (llm_build_cohere2)
    "cohere2": ("Cohere2Config", "Cohere2ForCausalLM", dict(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        logit_scale=0.25, sliding_window=32, sliding_window_pattern=4,
        max_position_embeddings=256, tie_word_embeddings=True)),
}


def _dbrx_cfg(T):
    return T.DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=256, vocab_size=128,
        attn_config=T.models.dbrx.configuration_dbrx.DbrxAttentionConfig(
            kv_n_heads=2, rope_theta=10000.0, clip_qkv=8.0),
        ffn_config=T.models.dbrx.configuration_dbrx.DbrxFFNConfig(
            ffn_hidden_size=48, moe_num_experts=4, moe_top_k=2))


# fused-Wqkv-with-clamp + fused expert mats (llm_build_dbrx). Nested HF
# config objects, so it builds its own config instead of flat kwargs;
# clip_qkv is set like every real DBRX checkpoint (the reference runtime
# .get_key()-REQUIRES dbrx.attention.clamp_kqv).
HF_CONVERTED_CASES3["dbrx"] = ("DbrxConfig", "DbrxForCausalLM", dict())


@pytest.mark.parametrize("name", sorted(HF_CONVERTED_CASES3))
def test_hf_converted_matches_reference_cli_batch3(llama_cli, tmp_path, name):
    torch = pytest.importorskip("torch")
    T = pytest.importorskip("transformers")

    from llamacog_tpu.tools.convert_hf import convert

    cfg_name, model_name, kw = HF_CONVERTED_CASES3[name]
    cfg_cls = getattr(T, cfg_name, None)
    model_cls = getattr(T, model_name, None)
    if cfg_cls is None or model_cls is None:
        pytest.skip("arch not in this transformers version")
    kw = dict(kw, pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    if name == "dbrx":
        c = _dbrx_cfg(T)
        for k, v in kw.items():
            setattr(c, k, v)
        m = model_cls(c).eval()
    else:
        m = model_cls(cfg_cls(**kw)).eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.5)
    d = tmp_path / name
    m.save_pretrained(d, safe_serialization=True)
    _world_vocab(d)
    gguf = str(tmp_path / f"{name}.gguf")
    convert(str(d), gguf, outtype="f32")
    ref = _ref_generate(llama_cli, gguf)
    ours = _our_generate(gguf)
    assert ours == ref, f"{name}: ref={ref!r}\nours={ours!r}"
