"""Audio multimodal: whisper-style log-mel frontend + encoder + projectors.

TPU replacement for the reference's audio path (tools/mtmd/mtmd-audio.cpp
log-mel preprocessing; tools/mtmd/clip.cpp build_whisper_enc :1432): the
mel spectrogram is numpy (host preprocessing, like the reference), the
encoder is a jitted transformer, and the projector is Ultravox
(StackAudioFrames + RMSNorm/SwiGLU MLP, clip.cpp:1479-1523) or Qwen2-Audio
(single FC).

mmproj tensor names per clip-impl.h: a.conv1d.{1,2}.{weight,bias},
a.position_embd.weight, a.blk.N.*, a.post_ln.*, mm.a.mlp.{1,2}.weight,
mm.a.norm_{pre,mid}.weight, mm.a.fc.{weight,bias}.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160


def _hann(n: int) -> np.ndarray:
    # periodic hann (torch.hann_window default; mtmd-audio.cpp:45)
    return (0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))).astype(np.float64)


def mel_filterbank(n_mels: int, n_fft: int = N_FFT, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale mel filterbank (librosa/whisper convention)."""
    fmin, fmax = 0.0, sr / 2

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4) * 27.0, mel
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)
        return f

    n_freq = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freq)
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    fb = np.zeros((n_mels, n_freq))
    for i in range(n_mels):
        lo, ce, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (freqs - lo) / max(ce - lo, 1e-10)
        down = (hi - freqs) / max(hi - ce, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        # slaney normalization
        fb[i] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def log_mel_spectrogram(samples: np.ndarray, n_mels: int = 80,
                        pad_to_frames: int | None = None) -> np.ndarray:
    """Whisper log-mel features [n_mels, n_frames] (WhisperFeatureExtractor /
    mtmd-audio.cpp semantics: reflect-pad, power spectrum, mel, log10,
    dynamic-range clamp, (x+4)/4)."""
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    if pad_to_frames is not None:
        want = pad_to_frames * HOP
        if len(x) < want:
            x = np.concatenate([x, np.zeros(want - len(x))])
    pad = N_FFT // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP
    window = _hann(N_FFT)
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * window
    spec = np.fft.rfft(frames, axis=-1)
    power = (spec.real**2 + spec.imag**2)[:-1]  # whisper drops the last frame
    mel = mel_filterbank(n_mels) @ power.T.astype(np.float32)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


@dataclass
class AudioConfig:
    n_mels: int = 80
    n_embd: int = 384
    n_ff: int = 1536
    n_layer: int = 4
    n_head: int = 6
    eps: float = 1e-5
    projector_type: str = "ultravox"  # ultravox | qwen2a
    stack_factor: int = 8


@dataclass
class AudioEncoderModel:
    config: AudioConfig
    params: dict = field(default_factory=dict)

    def encode(self, mel: np.ndarray) -> np.ndarray:
        """[n_mels, n_frames] -> projected embeddings [n_tokens, n_embd_text]."""
        static = (
            self.config.n_head, self.config.eps, self.config.projector_type,
            self.config.stack_factor,
        )
        out = _encode_jit(self.params, jnp.asarray(mel)[None], static)
        return np.asarray(out[0])


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _conv1d(x, w, b, stride):
    # x [B, C, T], w [O, C, K]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + b[None, :, None]


@partial(jax.jit, static_argnums=(2,))
def _encode_jit(params, mel, static):
    n_head, eps, proj_type, stack = static
    x = mel.astype(jnp.float32)  # [B, n_mels, T]
    x = jax.nn.gelu(_conv1d(x, params["conv1_w"], params["conv1_b"], 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"], 2),
                    approximate=False)
    x = jnp.swapaxes(x, 1, 2)  # [B, T', E]
    B, T, E = x.shape
    x = x + params["pos_embd"][:T]
    D = E // n_head
    scale = D**-0.5
    for layer in params["layers"]:
        h = _ln(x, layer["ln1"], layer["ln1_b"], eps)
        q = (h @ layer["attn_q"].T + layer["attn_q_b"]).reshape(B, T, n_head, D)
        k = (h @ layer["attn_k"].T).reshape(B, T, n_head, D)  # K has no bias
        v = (h @ layer["attn_v"].T + layer["attn_v_b"]).reshape(B, T, n_head, D)
        att = jax.nn.softmax(jnp.einsum("bthd,bshd->bhts", q, k) * scale, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, T, E)
        x = x + (o @ layer["attn_out"].T + layer["attn_out_b"])
        h = _ln(x, layer["ln2"], layer["ln2_b"], eps)
        ff = jax.nn.gelu(h @ layer["ffn_up"].T + layer["ffn_up_b"], approximate=False)
        x = x + (ff @ layer["ffn_down"].T + layer["ffn_down_b"])
    x = _ln(x, params["post_ln"], params["post_ln_b"], eps)

    if proj_type == "qwen2a":
        return x @ params["mm_fc_w"].T + params["mm_fc_b"]
    # ultravox: StackAudioFrames then RMS/SwiGLU MLP (clip.cpp:1479-1523)
    stride = E * stack
    flat = x.reshape(B, -1)
    pad = (-flat.shape[1]) % stride
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    x = flat.reshape(B, -1, stride)

    def rms(v, w):
        vf = v.astype(jnp.float32)
        return vf * jax.lax.rsqrt(jnp.mean(vf * vf, -1, keepdims=True) + 1e-6) * w

    x = rms(x, params["mm_norm_pre"])
    x = x @ params["mm_1"].T
    x0, x1 = jnp.split(x, 2, axis=-1)
    x = x0 * jax.nn.silu(x1)  # second half through silu (ultravox convention)
    x = rms(x, params["mm_norm_mid"])
    return x @ params["mm_2"].T


def load_audio_mmproj(path: str) -> AudioEncoderModel:
    from ..gguf import GGUFModelReader
    from ..quant.decode_np import dequantize_tensor

    r = GGUFModelReader(path)
    md = r.metadata
    cfg = AudioConfig(
        n_mels=int(md.get("clip.audio.num_mel_bins", 80)),
        n_embd=int(md.get("clip.audio.embedding_length", 384)),
        n_ff=int(md.get("clip.audio.feed_forward_length", 1536)),
        n_layer=int(md.get("clip.audio.block_count", 4)),
        n_head=int(md.get("clip.audio.attention.head_count", 6)),
        eps=float(md.get("clip.audio.attention.layer_norm_epsilon", 1e-5)),
        projector_type=str(md.get("clip.projector_type", "ultravox")),
        stack_factor=int(md.get("clip.audio.projector.stack_factor", 8)),
    )
    # the reference converter labels ultravox mmprojs "qwen2a" too
    # (UltravoxWhisperEncoderModel inherits the projector-type write); a
    # stack-factor key marks the ultravox StackAudioFrames+SwiGLU projector
    if (cfg.projector_type == "qwen2a"
            and "clip.audio.projector.stack_factor" in md):
        cfg.projector_type = "ultravox"

    def t(name):
        if name not in r.tensors:
            return None
        rd, ti = r.tensors[name]
        return jnp.asarray(
            dequantize_tensor(rd.tensor_bytes(name), ti.ggml_type, ti.shape), jnp.float32
        )

    def tb(name):
        # conv biases are stored [C, 1] by the reference converter (ggml
        # conv1d layout); flatten to [C]
        v = t(name)
        return None if v is None else v.reshape(-1)

    p: dict = {
        "conv1_w": t("a.conv1d.1.weight"),
        "conv1_b": tb("a.conv1d.1.bias"),
        "conv2_w": t("a.conv1d.2.weight"),
        "conv2_b": tb("a.conv1d.2.bias"),
        "pos_embd": t("a.position_embd.weight"),
        "post_ln": t("a.post_ln.weight"),
        "post_ln_b": t("a.post_ln.bias"),
    }
    layers = []
    for il in range(cfg.n_layer):
        bl = f"a.blk.{il}."
        layer = {}
        for gg, key in (("attn_q", "attn_q"), ("attn_k", "attn_k"),
                        ("attn_v", "attn_v"), ("attn_out", "attn_out"),
                        ("ln1", "ln1"), ("ln2", "ln2"),
                        ("ffn_up", "ffn_up"), ("ffn_down", "ffn_down")):
            if (w := t(bl + gg + ".weight")) is not None:
                layer[key] = w
            if (b := t(bl + gg + ".bias")) is not None:
                layer[key + "_b"] = b
        layers.append(layer)
    p["layers"] = layers
    for name, key in (("mm.a.mlp.1.weight", "mm_1"), ("mm.a.mlp.2.weight", "mm_2"),
                      ("mm.a.norm_pre.weight", "mm_norm_pre"),
                      ("mm.a.norm_mid.weight", "mm_norm_mid"),
                      ("mm.a.fc.weight", "mm_fc_w"), ("mm.a.fc.bias", "mm_fc_b")):
        if (w := t(name)) is not None:
            p[key] = w
    r.close()
    return AudioEncoderModel(cfg, p)
