"""llamacog_tpu — a TPU-native quantized LLM inference engine.

Built from scratch in JAX/XLA/Pallas with the capability set of llama.cpp
(GGUF loading, ggml quantization zoo, quantized-KV flash attention,
continuous-batching serving, grammar-constrained sampling, speculative
decoding) re-designed for TPU: SPMD over jax.sharding meshes, Pallas kernels
for fused dequant-matmul and attention, static-shape decode steps.
"""

__version__ = "0.1.0"
