"""Distribution-level oracle: per-token FULL-VOCAB log-probs vs the compiled
reference (SURVEY §4; VERDICT r2 item 3).

The greedy e2e oracle (tests/test_e2e_oracle.py) compares argmax tokens,
which can mask logit drift that never flips the argmax. Here the reference
`llama-perplexity --kl-divergence-base` dump is parsed — its wire format
(perplexity.cpp:519-523 header+tokens, :77-105 per-position quantized
log-prob records) stores, for every scored position, the whole distribution
— and our engine's log-probs on the SAME token stream are bounded against
it by max/mean KL divergence and next-token Δlogprob. This is the strongest
quality gate available without real pretrained weights (wikitext PPL is
environment-blocked; BASELINE.md's Δppl table is pinned structurally by the
byte-identical codecs + this distribution-level agreement).
"""

import os
import pathlib
import struct
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles / reference-oracle runs: core profile skips (-m 'not slow')

REF = pathlib.Path("/root/reference")
BUILD = pathlib.Path(os.environ.get("LLAMACOG_ORACLE_BUILD", "/tmp/llamacog_oracle"))

N_CTX = 64
N_CHUNK = 2
# ~3 chunks' worth of byte tokens for the byte-fallback tiny vocab
TEXT = ("The quick brown fox jumps over the lazy dog. " * 6)[: N_CTX * (N_CHUNK + 1)]


def _find_or_build_perplexity() -> str | None:
    env = os.environ.get("LLAMACOG_LLAMA_PERPLEXITY")
    if env and os.path.isfile(env):
        return env
    cand = BUILD / "bin" / "llama-perplexity"
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
            ["cmake", "--build", ".", "--target", "llama-perplexity", "-j1"],
            cwd=BUILD, check=True, capture_output=True, timeout=2400,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return None
    return str(cand) if cand.is_file() else None


@pytest.fixture(scope="module")
def llama_perplexity():
    binp = _find_or_build_perplexity()
    if binp is None:
        pytest.skip("reference llama-perplexity unavailable")
    return binp


def _ref_kld_dump(binp: str, gguf: str, tmp_path, tag: str):
    """Run the reference and parse its --kl-divergence-base dump.

    Returns (tokens [n_chunk, n_ctx], logprobs [n_chunk, n_scored, V]) where
    n_scored = n_ctx - 1 - n_ctx//2 (perplexity.cpp:539 `first = n_ctx/2`,
    :617 `n_ctx - 1 - first` records per chunk).
    """
    textfile = tmp_path / "text.txt"
    textfile.write_text(TEXT)
    dump = tmp_path / f"{tag}.kld"
    subprocess.run(
        [binp, "-m", gguf, "-f", str(textfile), "--kl-divergence-base",
         str(dump), "-c", str(N_CTX), "--chunks", str(N_CHUNK), "-b",
         str(N_CTX)],
        check=True, capture_output=True, timeout=600,
    )
    raw = dump.read_bytes()
    # "_logits_" magic + n_ctx (perplexity.cpp:465-466), then n_vocab,
    # n_chunk, the token stream, then the per-position records
    assert raw[:8] == b"_logits_"
    (n_ctx,) = struct.unpack_from("<i", raw, 8)
    assert n_ctx == N_CTX
    n_vocab, n_chunk = struct.unpack_from("<2i", raw, 12)
    off = 20
    tokens = np.frombuffer(raw, np.int32, n_chunk * N_CTX, off)
    tokens = tokens.reshape(n_chunk, N_CTX)
    off += tokens.nbytes
    first = N_CTX // 2
    n_scored = N_CTX - 1 - first
    nv = 2 * ((n_vocab + 1) // 2) + 4  # u16s per record (perplexity.cpp:144)
    recs = np.frombuffer(raw, np.uint16, n_chunk * n_scored * nv, off)
    recs = recs.reshape(n_chunk, n_scored, nv)
    # record: [scale f32, min_log_prob f32] then V u16 codes;
    # logprob_i = min_log_prob + scale * code_i (log_softmax :77-105)
    hdr = recs[:, :, :4].copy().view(np.float32)  # [c, s, 2]
    scale, min_lp = hdr[..., 0:1], hdr[..., 1:2]
    codes = recs[:, :, 4 : 4 + n_vocab].astype(np.float32)
    return tokens, min_lp + scale * codes


def _our_logprobs(gguf: str, tokens: np.ndarray, kv_type: str = "dense",
                  decode: bool = False):
    """Log-probs for the scored positions of each chunk, replicating the
    reference's eval: first token of each chunk replaced by BOS
    (perplexity.cpp:563-568) at positions 0..n_ctx-1.

    decode=True runs the scored half token-by-token through decode_one so
    the attention actually READS the cache (a one-shot prefill attends to
    the current block via k_cur/v_cur and would never touch a quantized KV
    round-trip)."""
    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine

    m = load_model(gguf, with_tokenizer=False, dtype=jnp.float32)
    bos = 1
    first = N_CTX // 2
    out = []
    for chunk in tokens:
        ids = [bos] + [int(t) for t in chunk[1:]]
        eng = Engine(m.params, m.config, batch_size=1, max_seq=N_CTX,
                     dtype=jnp.float32, kv_type=kv_type)
        if decode:
            rows = [eng.prefill(ids[: first + 1])]  # logits at pos `first`
            for p in range(first + 1, N_CTX - 1):
                rows.append(eng.decode_one(np.array([ids[p]]))[0])
            logits = np.stack(rows).astype(np.float64)
        else:
            logits = eng.prefill_logits(ids).astype(np.float64)[first : N_CTX - 1]
        lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1))
        lp = logits - logits.max(-1, keepdims=True) - lse[:, None]
        out.append(lp)
    return np.stack(out)


def _gates(ref_lp: np.ndarray, our_lp: np.ndarray):
    """(max KLD, mean KLD, max |Δlogprob| at the target token position)."""
    p_ref = np.exp(ref_lp)
    kld = (p_ref * (ref_lp - our_lp)).sum(-1)
    return float(kld.max()), float(kld.mean()), float(np.abs(ref_lp - our_lp).max())


CFG = dict(n_vocab=256, n_embd=256, n_head=4, n_head_kv=2, n_layer=2, n_ff=256)

# (tag, weight quant, our kv_type, decode?, max-KLD gate, max |Δlp| gate).
# Gates are ~3-5x the measured values (recorded in each row's comment).
# f32 differs only by f32 accumulation order + the dump's u16 log-prob
# quantization; quantized weights add the reference's Q8_x-quantized-
# ACTIVATION integer dot (our design decodes weights and keeps activations
# exact, so small drift here is expected and bounded); decode rows run the
# scored half through decode_one so the (possibly quantized) cache is READ.
CONFIGS = [
    ("f32", "F32", "dense", False, 2e-5, 5e-3),        # 3.2e-6 / 0.001
    ("q8_0", "Q8_0", "dense", False, 5e-4, 2e-1),      # 1.0e-4 / 0.046
    ("q4_k", "Q4_K", "dense", False, 15e-4, 4e-1),     # 3.4e-4 / 0.082
    ("q6_k", "Q6_K", "dense", False, 15e-4, 4e-1),     # 3.0e-4 / 0.078
    ("f32-decode", "F32", "dense", True, 2e-5, 5e-3),
    ("q8_0-kvq8", "Q8_0", "q8_0", True, 5e-3, 1.0),
    ("q4_k-kvq4", "Q4_K", "q4_0", True, 5e-2, 2.5),
]


@pytest.mark.slow
@pytest.mark.parametrize("tag,quant,kv,decode,kld_gate,dlp_gate", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_logprob_distribution_matches_reference(
    llama_perplexity, tmp_path, tag, quant, kv, decode, kld_gate, dlp_gate
):
    from llamacog_tpu.gguf import GGMLType
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = str(tmp_path / f"kld_{tag}.gguf")
    make_tiny_llama_gguf(path, quant_type=getattr(GGMLType, quant), seed=7,
                         **CFG)
    tokens, ref_lp = _ref_kld_dump(llama_perplexity, path, tmp_path, tag)
    our_lp = _our_logprobs(path, tokens, kv_type=kv, decode=decode)
    assert ref_lp.shape == our_lp.shape
    kmax, kmean, dmax = _gates(ref_lp, our_lp)
    assert kmax < kld_gate and kmean < kld_gate / 2, (
        f"{tag}: KLD max {kmax:.2e} mean {kmean:.2e} (gate {kld_gate:.0e})")
    assert dmax < dlp_gate, f"{tag}: max |dlogprob| {dmax:.3f}"


def test_q4_0_exact_dequant_twin(llama_perplexity, tmp_path):
    """Q4_0 through our engine == exact dequantized math, bounded against
    the compiled reference running the dequantized twin. (The reference's
    own Q4_0 CPU path — Q8_0-quantized activations into the repacked
    integer dot — drifts ~0.4 max KLD from its own f32 run on this tiny
    random model, so ref-quantized is not a usable oracle for Q4_0; the
    twin pins our decode+forward exactly instead.)"""
    import numpy as np

    from llamacog_tpu.gguf import GGMLType, GGUFWriter
    from llamacog_tpu.gguf.reader import GGUFReader
    from llamacog_tpu.quant import dequantize_tensor
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    q = str(tmp_path / "q4_0.gguf")
    make_tiny_llama_gguf(q, quant_type=GGMLType.Q4_0, seed=7, **CFG)
    twin = str(tmp_path / "twin.gguf")
    with GGUFReader(q) as r:
        w = GGUFWriter(twin)
        for k, v in r.metadata.items():
            w.add(k, v)
        for name, ti in r.tensors.items():
            if ti.ggml_type == GGMLType.F32:
                arr = np.frombuffer(bytes(r.tensor_bytes(name)),
                                    np.float32).reshape(ti.shape)
            else:
                arr = dequantize_tensor(
                    np.frombuffer(bytes(r.tensor_bytes(name)), np.uint8),
                    ti.ggml_type, ti.shape)
            w.add_tensor(name, np.asarray(arr, np.float32))
        w.write()
    tokens, ref_lp = _ref_kld_dump(llama_perplexity, twin, tmp_path, "twin")
    our_lp = _our_logprobs(q, tokens)  # our engine runs the QUANTIZED file
    kmax, kmean, dmax = _gates(ref_lp, our_lp)
    assert kmax < 2e-5 and dmax < 5e-3, (
        f"q4_0 twin: KLD max {kmax:.2e} dlp {dmax:.4f}")
