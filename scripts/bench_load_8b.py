"""Time the real-GGUF load path at 8B scale (VERDICT r2 weak #5).

Writes a Llama-3-8B-shaped Q4_K_M GGUF (~5.3 GB wire) to disk ONCE with
valid random wire-format blocks (payload bytes random, f16 scales small —
load cost depends on bytes and layout, not values), then times
`load_model`: GGUF parse -> planar relayout -> device upload. This is the
reference's `load_all_data` role (llama-model-loader.cpp) at serving scale;
the 1B bench already covers correctness of the same path with real encodes.

Run: python scripts/bench_load_8b.py [path]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

F16_SMALL = np.float16(0.001).tobytes()  # keeps 32-layer logits finite


def rand_wire(rng, kind, n, k):
    """Random valid wire bytes for an [n, k] tensor of `kind`."""
    from llamacog_tpu.gguf import GGMLType

    t = getattr(GGMLType, kind)
    if t == GGMLType.Q4_K:
        bs, ts, doffs = 256, 144, (0, 2)
    elif t == GGMLType.Q6_K:
        bs, ts, doffs = 256, 210, (208,)
    else:
        raise ValueError(kind)
    nb = n * k // bs
    b = rng.integers(0, 256, size=(nb, ts), dtype=np.uint8)
    small = np.frombuffer(F16_SMALL, np.uint8)
    for off in doffs:
        b[:, off] = small[0]
        b[:, off + 1] = small[1]
    if t == GGMLType.Q6_K:
        # int8 sub-scales: keep them small and positive
        b[:, 192:208] = rng.integers(1, 8, size=(nb, 16), dtype=np.uint8)
    return b.reshape(-1), t


def write_8b(path):
    from llamacog_tpu.gguf import GGUFWriter
    from llamacog_tpu.utils.synthetic import _use_more_bits, llama3_8b_config

    cfg = llama3_8b_config()
    rng = np.random.default_rng(0)
    w = GGUFWriter(path)
    w.add("general.architecture", "llama")
    w.add("general.name", "bench-8b")
    w.add("llama.context_length", cfg.n_ctx_train)
    w.add("llama.embedding_length", cfg.n_embd)
    w.add("llama.block_count", cfg.n_layer)
    w.add("llama.feed_forward_length", cfg.n_ff)
    w.add("llama.attention.head_count", cfg.n_head)
    w.add("llama.attention.head_count_kv", cfg.n_head_kv)
    w.add("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add("llama.rope.freq_base", 500000.0)
    w.add("llama.vocab_size", cfg.n_vocab)
    toks = ["<unk>", "<s>", "</s>"] + [f"t{i}" for i in range(cfg.n_vocab - 3)]
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", toks)
    w.add("tokenizer.ggml.scores", np.zeros(cfg.n_vocab, np.float32))
    w.add("tokenizer.ggml.token_type",
          np.array([2, 3, 3] + [6] * (cfg.n_vocab - 3), np.int32))
    w.add("tokenizer.ggml.bos_token_id", 1)
    w.add("tokenizer.ggml.eos_token_id", 2)

    E, F, V = cfg.n_embd, cfg.n_ff, cfg.n_vocab
    kvdim = cfg.n_head_kv * cfg.head_dim_k

    def addq(name, n, k, kind):
        raw, t = rand_wire(rng, kind, n, k)
        w.add_tensor(name, raw.tobytes(), shape=(n, k), ggml_type=t)

    addq("token_embd.weight", V, E, "Q4_K")
    w.add_tensor("output_norm.weight", np.ones(E, np.float32))
    addq("output.weight", V, E, "Q6_K")
    for il in range(cfg.n_layer):
        p = f"blk.{il}."
        down = "Q6_K" if _use_more_bits(il, cfg.n_layer) else "Q4_K"
        w.add_tensor(p + "attn_norm.weight", np.ones(E, np.float32))
        w.add_tensor(p + "ffn_norm.weight", np.ones(E, np.float32))
        addq(p + "attn_q.weight", E, E, "Q4_K")
        addq(p + "attn_k.weight", kvdim, E, "Q4_K")
        addq(p + "attn_v.weight", kvdim, E, "Q6_K")
        addq(p + "attn_output.weight", E, E, "Q4_K")
        addq(p + "ffn_gate.weight", F, E, "Q4_K")
        addq(p + "ffn_up.weight", F, E, "Q4_K")
        addq(p + "ffn_down.weight", E, F, down)
    w.write()


def main():
    import jax
    import jax.numpy as jnp

    from llamacog_tpu.models.loader import load_model
    from llamacog_tpu.runtime.engine import Engine

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/llamacog_bench/llama8b_q4_k_m.gguf"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not os.path.exists(path):
        t0 = time.time()
        write_8b(path)
        print(f"[gen] wrote {os.path.getsize(path)/1e9:.2f} GB in "
              f"{time.time()-t0:.0f}s", file=sys.stderr)
    # drop page cache effects are out of scope (can't drop without root);
    # report both cold-ish (first) and warm (second) loads
    for run in ("first", "warm"):
        t0 = time.time()
        model = load_model(path, mode="quantized", dtype=jnp.bfloat16)
        jax.block_until_ready(model.params["layers"][0]["attn_q"].planes
                              if hasattr(model.params["layers"][0].get("attn_q"), "planes")
                              else jax.tree.leaves(model.params)[0])
        dt = time.time() - t0
        sz = os.path.getsize(path)
        print(f"load_model[{run}]: {dt:.1f}s ({sz/dt/1e9:.2f} GB/s of wire)")
        if run == "first":
            # prove the loaded model actually steps on chip
            eng = Engine(model.params, model.config, batch_size=1, max_seq=512)
            t0 = time.time()
            eng.prefill(list(range(2, 130)))
            toks = eng.decode_greedy_tokens(np.array([5]), 16)
            print(f"first step (compile incl): {time.time()-t0:.1f}s, "
                  f"tokens {np.asarray(toks)[0, :4]}")
            # free the engine's 5.7 GB of HBM BEFORE the warm load: keeping
            # it alive makes the second upload thrash HBM (measured 390s
            # "warm" vs 92s first with the leak)
            del eng
        del model


if __name__ == "__main__":
    main()
