"""Shared helpers: force CPU off-axon, provide a tiny model when no GGUF given."""
import os
import sys
import tempfile

# examples run from a source checkout: make the repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_model_path(dense=False):
    if len(sys.argv) > 1:
        return sys.argv[1]
    import jax

    if os.environ.get("JAX_PLATFORMS") is None:
        jax.config.update("jax_platforms", "cpu")
    from llamacog_tpu.gguf import GGMLType
    from llamacog_tpu.utils.testing import make_tiny_llama_gguf

    path = os.path.join(tempfile.gettempdir(), "llamacog_example.gguf")
    if not os.path.exists(path):
        make_tiny_llama_gguf(path, quant_type=GGMLType.F32 if dense else GGMLType.Q4_0)
    return path
