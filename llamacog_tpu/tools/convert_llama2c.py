"""Convert a karpathy llama2.c checkpoint (.bin) + tokenizer to GGUF
(reference examples/convert-llama2c-to-ggml/convert-llama2c-to-ggml.cpp).

llama2.c wire format (Config struct :73-81, weight order
checkpoint_init_weights :155-173): 7 little-endian int32
(dim, hidden_dim, n_layers, n_heads, n_kv_heads, vocab_size, seq_len) —
a negative vocab_size marks a non-shared classifier — followed by f32
weights: tok_emb, rms_att, wq, wk, wv, wo, rms_ffn, w1(gate), w2(down),
w3(up), rms_final, [skipped freq_cis real+imag], wcls?.

The vocab comes either from a GGUF vocab file or a llama2.c
tokenizer.bin (score f32 + len u32 + bytes per token; byte tokens are
already `<0x..>`-encoded, whitespace is escaped to U+2581 — load_vocab
:578-640). llama2.c rope is interleaved-pair (ggml NORM), so weights
copy through without the HF rotate-half permute.
"""

from __future__ import annotations

import argparse
import os
import re
import struct
import sys

import numpy as np

from ..gguf.writer import GGUFWriter

UNKNOWN_TOKEN_ID, BOS_TOKEN_ID, EOS_TOKEN_ID = 0, 1, 2
# llama_token_type values (llama.h): undefined/normal/unknown/control/byte
TT_NORMAL, TT_UNKNOWN, TT_CONTROL, TT_BYTE = 1, 2, 3, 6


def read_checkpoint(path: str):
    with open(path, "rb") as f:
        dim, hidden, n_layers, n_heads, n_kv_heads, vocab_size, seq_len = (
            struct.unpack("<7i", f.read(28))
        )
        shared = vocab_size > 0
        vocab_size = abs(vocab_size)
        if n_kv_heads <= 0 or n_kv_heads > n_heads:
            n_kv_heads = n_heads
        kv_dim = dim * n_kv_heads // n_heads
        head_size = dim // n_heads

        def rd(*shape):
            n = int(np.prod(shape))
            a = np.frombuffer(f.read(4 * n), dtype="<f4")
            if a.size != n:
                raise ValueError(f"truncated checkpoint {path!r}")
            return a.reshape(shape).astype(np.float32)

        w = {
            "tok_emb": rd(vocab_size, dim),
            "rms_att": rd(n_layers, dim),
            "wq": rd(n_layers, dim, dim),
            "wk": rd(n_layers, kv_dim, dim),
            "wv": rd(n_layers, kv_dim, dim),
            "wo": rd(n_layers, dim, dim),
            "rms_ffn": rd(n_layers, dim),
            "w1": rd(n_layers, hidden, dim),
            "w2": rd(n_layers, dim, hidden),
            "w3": rd(n_layers, hidden, dim),
            "rms_final": rd(dim),
        }
        f.seek(4 * seq_len * head_size, os.SEEK_CUR)  # freq_cis real+imag
        w["wcls"] = w["tok_emb"] if shared else rd(vocab_size, dim)
    cfg = dict(dim=dim, hidden=hidden, n_layers=n_layers, n_heads=n_heads,
               n_kv_heads=n_kv_heads, vocab_size=vocab_size, seq_len=seq_len)
    return cfg, w


def load_llama2c_vocab(path: str, n_vocab: int):
    """tokenizer.bin -> (texts, scores, types) with the reference's
    special-token and whitespace-escape handling."""
    texts, scores, types = [], [], []
    with open(path, "rb") as f:
        struct.unpack("<i", f.read(4))  # max_token_length, unused
        for tid in range(n_vocab):
            (score,) = struct.unpack("<f", f.read(4))
            (ln,) = struct.unpack("<i", f.read(4))
            text = f.read(ln).decode("utf-8", errors="replace")
            if tid == UNKNOWN_TOKEN_ID:
                text, tt = "<unk>", TT_UNKNOWN
            elif tid == BOS_TOKEN_ID:
                text, tt = "<s>", TT_CONTROL
            elif tid == EOS_TOKEN_ID:
                text, tt = "</s>", TT_CONTROL
            elif not text:
                tt = TT_CONTROL
            elif re.fullmatch(r"<0x[0-9A-Fa-f]{2}>", text):
                tt = TT_BYTE
            else:
                tt = TT_NORMAL
            texts.append(text.replace(" ", "▁"))
            scores.append(score)
            types.append(tt)
    return texts, scores, types


def load_gguf_vocab(path: str, n_vocab: int):
    from ..gguf.reader import GGUFReader

    with GGUFReader(path) as r:
        md = r.metadata
        if md.get("tokenizer.ggml.model") != "llama":
            raise ValueError("vocab GGUF must carry a llama (spm) tokenizer")
        texts = list(md["tokenizer.ggml.tokens"])
        if len(texts) != n_vocab:
            raise ValueError(
                f"vocab size mismatch: (gguf) {len(texts)} != (llama2c) {n_vocab}")
        scores = list(md.get("tokenizer.ggml.scores", [0.0] * len(texts)))
        types = list(md.get("tokenizer.ggml.token_type", [TT_NORMAL] * len(texts)))
    return texts, scores, types


def convert(model_path: str, vocab_path: str, out_path: str,
            outtype: str = "f32") -> None:
    cfg, wts = read_checkpoint(model_path)
    with open(vocab_path, "rb") as f:
        is_gguf = f.read(4) == b"GGUF"
    texts, scores, types = (
        load_gguf_vocab(vocab_path, cfg["vocab_size"]) if is_gguf
        else load_llama2c_vocab(vocab_path, cfg["vocab_size"])
    )

    w = GGUFWriter(out_path)
    w.add("general.architecture", "llama")
    w.add("general.name", os.path.basename(model_path))
    w.add("llama.context_length", cfg["seq_len"])
    w.add("llama.embedding_length", cfg["dim"])
    w.add("llama.feed_forward_length", cfg["hidden"])
    w.add("llama.attention.head_count", cfg["n_heads"])
    w.add("llama.attention.head_count_kv", cfg["n_kv_heads"])
    w.add("llama.block_count", cfg["n_layers"])
    w.add("llama.rope.dimension_count", cfg["dim"] // cfg["n_heads"])
    w.add("llama.attention.layer_norm_rms_epsilon", np.float32(1e-5))
    w.add("tokenizer.ggml.model", "llama")
    w.add("tokenizer.ggml.tokens", texts)
    w.add("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add("tokenizer.ggml.bos_token_id", BOS_TOKEN_ID)
    w.add("tokenizer.ggml.eos_token_id", EOS_TOKEN_ID)
    w.add("tokenizer.ggml.unknown_token_id", UNKNOWN_TOKEN_ID)

    from .convert_hf import _cast

    def put(name: str, arr: np.ndarray, norm=False):
        # norm vectors stay f32 (standard quantize policy); 2D may narrow
        _cast(np.asarray(arr), outtype, name, w)

    put("token_embd.weight", wts["tok_emb"])
    put("output_norm.weight", wts["rms_final"], norm=True)
    put("output.weight", wts["wcls"])
    for i in range(cfg["n_layers"]):
        put(f"blk.{i}.attn_norm.weight", wts["rms_att"][i], norm=True)
        put(f"blk.{i}.attn_q.weight", wts["wq"][i])
        put(f"blk.{i}.attn_k.weight", wts["wk"][i])
        put(f"blk.{i}.attn_v.weight", wts["wv"][i])
        put(f"blk.{i}.attn_output.weight", wts["wo"][i])
        put(f"blk.{i}.ffn_norm.weight", wts["rms_ffn"][i], norm=True)
        put(f"blk.{i}.ffn_gate.weight", wts["w1"][i])
        put(f"blk.{i}.ffn_down.weight", wts["w2"][i])
        put(f"blk.{i}.ffn_up.weight", wts["w3"][i])
    w.write()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="llamacog-convert-llama2c",
        description="Convert a llama2.c checkpoint to GGUF")
    p.add_argument("--copy-vocab-from-model", required=True,
                   help="tokenizer.bin or a GGUF file carrying an spm vocab")
    p.add_argument("--llama2c-model", required=True, help="llama2.c .bin checkpoint")
    p.add_argument("--llama2c-output-model", default="ak_llama_model.gguf")
    p.add_argument("--outtype", choices=("f32", "f16", "q8_0"), default="f32")
    a = p.parse_args(argv)
    convert(a.llama2c_model, a.copy_vocab_from_model,
            a.llama2c_output_model, a.outtype)
    print(f"wrote {a.llama2c_output_model}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
