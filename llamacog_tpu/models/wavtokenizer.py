"""WavTokenizer decoder (vocoder) — arch "wavtokenizer-dec".

The reference's llm_build_wavtokenizer_dec (src/llama-model.cpp:12553,
tensors :4049-4150): audio-code embeddings -> conv1d -> posnet stack
(resnet, resnet, single-head attention, resnet, resnet, group-norm) ->
token layer-norm -> ConvNeXt blocks -> output head producing, per code,
n_fft/2+1 log-magnitudes and phases. `embd_to_audio` then does the
hann-windowed overlap-add inverse STFT of tools/tts/tts.cpp:201-300.

Everything runs as one jitted call over the full code sequence — the
vocoder is feed-forward (no cache), a natural single XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


def _conv1d_same(x, w, b):
    """x [T, Cin], w [Cout, Cin, K], b [Cout] -> [T, Cout] (same padding)."""
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "OIW", "NWC"),
    )[0]
    return out + b


def _dw_conv1d_same(x, w, b):
    """Depthwise: x [T, C], w [C, 1, K], b [C]."""
    C = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "OIW", "NWC"), feature_group_count=C,
    )[0]
    return out + b


def _group_norm(x, w, b, n_groups, eps):
    """ggml_group_norm: x [T, C]; per channel-group stats over (T, C/g)."""
    T, C = x.shape
    g = x.reshape(T, n_groups, C // n_groups)
    mu = g.mean(axis=(0, 2), keepdims=True)
    var = ((g - mu) ** 2).mean(axis=(0, 2), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(T, C) * w + b


def _layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


@dataclass
class WavTokenizer:
    params: dict
    n_groups: int = 32
    group_eps: float = 1e-6

    def embd(self, codes: np.ndarray) -> np.ndarray:
        """codes [T] -> spectrogram embedding [T, n_fft+2] (t_embd output)."""
        out = _wavtok_jit(self.params, jnp.asarray(np.asarray(codes, np.int32)),
                          self.n_groups, self.group_eps)
        return np.asarray(out)

    def decode_audio(self, codes: np.ndarray) -> np.ndarray:
        return embd_to_audio(self.embd(codes))


from functools import partial


@partial(jax.jit, static_argnames=("n_groups",))
def _wavtok_jit(params, codes, n_groups, eps):
    x = jnp.take(params["tok_embd"], codes, axis=0)  # [T, n_feat]
    x = _conv1d_same(x, params["conv1d"], params["conv1d_b"])
    # posnet: resnet, resnet, attn, resnet, resnet, norm (:12565-12634)
    for i, layer in enumerate(params["posnet"]):
        inp = x
        if "conv1" in layer:
            h = _group_norm(x, layer["norm1"], layer["norm1_b"], n_groups, eps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_same(h, layer["conv1"], layer["conv1_b"])
            h = _group_norm(h, layer["norm2"], layer["norm2_b"], n_groups, eps)
            h = h * jax.nn.sigmoid(h)
            x = _conv1d_same(h, layer["conv2"], layer["conv2_b"]) + inp
        elif "attn_q" in layer:
            h = _group_norm(x, layer["attn_norm"], layer["attn_norm_b"], n_groups, eps)
            q = _conv1d_same(h, layer["attn_q"], layer["attn_q_b"])
            k = _conv1d_same(h, layer["attn_k"], layer["attn_k_b"])
            v = _conv1d_same(h, layer["attn_v"], layer["attn_v_b"])
            C = q.shape[-1]
            att = jax.nn.softmax(q @ k.T / jnp.sqrt(jnp.float32(C)), axis=-1)
            h = att @ v
            x = _conv1d_same(h, layer["attn_o"], layer["attn_o_b"]) + inp
        else:
            x = _group_norm(x, layer["norm"], layer["norm_b"], n_groups, eps)
    x = _layer_norm(x, params["tok_norm"], params["tok_norm_b"])
    # convnext blocks (:12646-12670)
    for layer in params["convnext"]:
        h = _dw_conv1d_same(x, layer["dw"], layer["dw_b"])
        h = _layer_norm(h, layer["norm"], layer["norm_b"])
        h = jax.nn.gelu(h @ layer["pw1"].T + layer["pw1_b"], approximate=True)
        h = h @ layer["pw2"].T + layer["pw2_b"]
        x = x + h * layer["gamma"]
    x = _layer_norm(x, params["output_norm"], params["output_norm_b"])
    return x @ params["output"].T + params["output_b"]


def load_wavtokenizer(path: str) -> WavTokenizer:
    """Load a wavtokenizer-dec GGUF (tensor names llama-arch.cpp:1549)."""
    from ..gguf import GGUFModelReader
    from ..quant.decode_np import dequantize_tensor

    reader = GGUFModelReader(path)
    md = reader.metadata
    arch = md.get("general.architecture", "wavtokenizer-dec")

    def t(name):
        r, ti = reader.tensors[name]
        w = dequantize_tensor(r.tensor_bytes(name), ti.ggml_type, ti.shape)
        return jnp.asarray(np.squeeze(np.asarray(w)))

    def t3(name):  # conv weights keep their 3D shape
        r, ti = reader.tensors[name]
        w = dequantize_tensor(r.tensor_bytes(name), ti.ggml_type, ti.shape)
        return jnp.asarray(np.asarray(w))

    params: dict = {
        "tok_embd": t3("token_embd.weight"),
        "conv1d": t3("conv1d.weight"),
        "conv1d_b": t("conv1d.bias"),
        "tok_norm": t("token_embd_norm.weight"),
        "tok_norm_b": t("token_embd_norm.bias"),
        "output_norm": t("output_norm.weight"),
        "output_norm_b": t("output_norm.bias"),
        "output": t3("output.weight"),
        "output_b": t("output.bias"),
        "posnet": [],
        "convnext": [],
    }
    n_pos = int(md.get(f"{arch}.posnet.block_count", 6))
    n_cnx = int(md.get(f"{arch}.convnext.block_count", 12))
    for i in range(n_pos):
        layer = {}
        for nm in ("norm1", "norm2", "norm", "attn_norm"):
            if f"posnet.{i}.{nm}.weight" in reader.tensors:
                layer[nm] = t(f"posnet.{i}.{nm}.weight")
                layer[nm + "_b"] = t(f"posnet.{i}.{nm}.bias")
        for nm in ("conv1", "conv2", "attn_q", "attn_k", "attn_v"):
            if f"posnet.{i}.{nm}.weight" in reader.tensors:
                layer[nm] = t3(f"posnet.{i}.{nm}.weight")
                layer[nm + "_b"] = t(f"posnet.{i}.{nm}.bias")
        if f"posnet.{i}.attn_output.weight" in reader.tensors:
            layer["attn_o"] = t3(f"posnet.{i}.attn_output.weight")
            layer["attn_o_b"] = t(f"posnet.{i}.attn_output.bias")
        params["posnet"].append(layer)
    for i in range(n_cnx):
        params["convnext"].append({
            "dw": t3(f"convnext.{i}.dw.weight"),
            "dw_b": t(f"convnext.{i}.dw.bias"),
            "norm": t(f"convnext.{i}.norm.weight"),
            "norm_b": t(f"convnext.{i}.norm.bias"),
            "pw1": t3(f"convnext.{i}.pw1.weight"),
            "pw1_b": t(f"convnext.{i}.pw1.bias"),
            "pw2": t3(f"convnext.{i}.pw2.weight"),
            "pw2_b": t(f"convnext.{i}.pw2.bias"),
            # converters that keep the HF param name write a bare
            # "convnext.N.gamma" (no .weight suffix) — accept both
            "gamma": t(f"convnext.{i}.gamma.weight"
                       if f"convnext.{i}.gamma.weight" in reader.tensors
                       else f"convnext.{i}.gamma"),
        })
    n_groups = int(md.get(f"{arch}.attention.group_norm_groups", 32))
    eps = float(md.get(f"{arch}.attention.group_norm_epsilon", 1e-6))
    reader.close()
    return WavTokenizer(params, n_groups=n_groups, group_eps=eps)


def embd_to_audio(embd: np.ndarray, n_fft: int = 1280, n_hop: int = 320) -> np.ndarray:
    """Spectrogram embedding [n_codes, n_fft+2] -> mono audio float32.

    tts.cpp embd_to_audio (:201-300): first half log-magnitudes (clamped to
    1e2), second half phases; per-frame irfft, hann-windowed overlap-add
    normalized by the folded squared window, edge padding trimmed.
    """
    embd = np.asarray(embd, np.float32)
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = mag * (np.cos(phi) + 1j * np.sin(phi))  # [n_codes, n_fft/2+1]
    frames = np.fft.irfft(spec, n=n_fft, axis=-1)  # [n_codes, n_fft]

    n = np.arange(n_fft)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)  # periodic hann
    frames = frames * hann
    env = np.broadcast_to(hann * hann, frames.shape)

    n_pad = (n_fft - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_fft
    audio = np.zeros(n_out, np.float32)
    norm = np.zeros(n_out, np.float32)
    for l in range(n_codes):  # overlap-add (fold)
        audio[l * n_hop : l * n_hop + n_fft] += frames[l]
        norm[l * n_hop : l * n_hop + n_fft] += env[l]
    audio = audio / np.maximum(norm, 1e-8)
    return audio[n_pad : n_out - n_pad].astype(np.float32)
