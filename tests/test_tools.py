"""Tool-level tests: gguf-split/merge, batched-bench, tokenize CLI."""

import numpy as np
import pytest

import jax.numpy as jnp

from llamacog_tpu.gguf import GGUFModelReader
from llamacog_tpu.models.loader import load_model
from llamacog_tpu.runtime.engine import Engine
from llamacog_tpu.tools.gguf_split import merge_gguf, split_gguf
from llamacog_tpu.utils.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    return make_tiny_llama_gguf(str(d / "t.gguf")), d


def test_gguf_split_roundtrip(tiny):
    path, d = tiny
    shards = split_gguf(path, str(d / "shard"), max_tensors=5)
    assert len(shards) > 1
    # split model loads through the reader's multi-file path
    r0 = GGUFModelReader(shards[0])
    names_split = set(r0.names())
    r_orig = GGUFModelReader(path)
    assert names_split == set(r_orig.names())
    assert int(r0.metadata["split.count"]) == len(shards)
    # logits parity split vs original
    def logits_of(model_path):
        m = load_model(model_path, with_tokenizer=False, dtype=jnp.float32)
        e = Engine(m.params, m.config, max_seq=32, dtype=jnp.float32)
        return e.prefill([1, 2, 3])

    ref = logits_of(path)
    np.testing.assert_allclose(logits_of(shards[0]), ref, atol=1e-6)
    # merge back
    merged = str(d / "merged.gguf")
    n = merge_gguf(shards[0], merged)
    assert n == len(names_split)
    np.testing.assert_allclose(logits_of(merged), ref, atol=1e-6)


def test_gguf_split_by_size(tiny):
    path, d = tiny
    shards = split_gguf(path, str(d / "bysize"), max_size=64 * 1024)
    assert len(shards) >= 2


def test_batched_bench(tiny, capsys):
    path, _ = tiny
    from llamacog_tpu.tools.batched_bench import print_md, run_grid

    rows = run_grid(path, [8], [4], [1, 2], ctx_size=64, dtype_name="f32")
    assert len(rows) == 2
    assert all(r["S_TG t/s"] > 0 for r in rows)
    assert rows[1]["B"] == 2
    print_md(rows)
    out = capsys.readouterr().out
    assert "S_TG t/s" in out


def test_tokenize_cli(tiny, capsys):
    path, _ = tiny
    from llamacog_tpu.tools.tokenize import main

    rc = main(["-m", path, "-p", "ab", "--ids"])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    assert out.startswith("[") and out.endswith("]")
    ids = [int(v) for v in out[1:-1].split(",")]
    rc = main(["-m", path, "--detokenize", ",".join(map(str, ids[1:]))])
    assert rc == 0
    assert "ab" in capsys.readouterr().out


def test_cvector_generator(tiny, tmp_path):
    path, _ = tiny
    from llamacog_tpu.runtime.lora import attach_control_vector, load_control_vector
    from llamacog_tpu.tools.cvector_generator import generate_cvector

    out = str(tmp_path / "cv.gguf")
    n = generate_cvector(path, out, ["happy joy", "great day"], ["sad pain", "bad day"])
    dirs = load_control_vector(out)
    assert len(dirs) == n
    for v in dirs.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # unit directions
    # applying it steers logits
    m = load_model(path, with_tokenizer=False, dtype=jnp.float32)
    e = Engine(m.params, m.config, max_seq=32, dtype=jnp.float32)
    base = e.prefill([1, 2, 3])
    attach_control_vector(m.params, dirs, m.config.n_layer, m.config.n_embd,
                          strength=2.0, layer_start=0)
    e2 = Engine(m.params, m.config, max_seq=32, dtype=jnp.float32)
    steered = e2.prefill([1, 2, 3])
    assert np.abs(steered - base).max() > 1e-4
