"""llamacog_tpu — a TPU-native quantized LLM inference engine.

Built from scratch in JAX/XLA/Pallas with the capability set of llama.cpp
(GGUF loading, ggml quantization zoo, quantized-KV flash attention,
continuous-batching serving, grammar-constrained sampling, speculative
decoding) re-designed for TPU: SPMD over jax.sharding meshes, Pallas kernels
for fused dequant-matmul and attention, static-shape decode steps.
"""

__version__ = "0.1.0"


def _install_default_compiler_options() -> None:
    """LLAMACOG_TPU_XLA_OPTS="flag=v,flag=v" threads per-compile XLA/TPU
    compilation-environment options (e.g. memory-space-assignment knobs)
    into every jax.jit as `compiler_options`. jax has no global setting
    for these, and on tunneled TPU backends LIBTPU_INIT_ARGS belongs to
    the terminal, not the client — per-compile options are the only
    client-controlled channel. No-op unless the env var is set."""
    import os

    spec = os.environ.get("LLAMACOG_TPU_XLA_OPTS", "")
    opts = dict(kv.split("=", 1) for kv in spec.split(",") if "=" in kv)
    if not opts:
        return
    import functools

    import jax

    orig = jax.jit

    def _trace_clean() -> bool:
        try:
            return jax.core.trace_state_clean()
        except Exception:
            return False

    @functools.wraps(orig)
    def jit(*args, **kwargs):
        plain = orig(*args, **kwargs)
        k2 = dict(kwargs)
        merged = dict(opts)
        merged.update(kwargs.get("compiler_options") or {})
        k2["compiler_options"] = merged
        opted = orig(*args, **k2)

        @functools.wraps(plain)
        def call(*a, **k):
            # compiler_options are only legal on TOP-LEVEL jit calls; a
            # nested call (inside another trace) inlines anyway and takes
            # the outer call's options
            return (opted if _trace_clean() else plain)(*a, **k)

        call.__wrapped__ = plain
        for attr in ("lower", "trace", "eval_shape", "_cache_size"):
            if hasattr(opted, attr):
                setattr(call, attr, getattr(opted, attr))
        return call

    jax.jit = jit


_install_default_compiler_options()
