"""TTS: WavTokenizer vocoder graph + inverse-STFT reconstruction + the
OuteTTS text pipeline (reference tools/tts/tts.cpp)."""

import wave

import numpy as np
import pytest

from llamacog_tpu.models.wavtokenizer import embd_to_audio, load_wavtokenizer
from llamacog_tpu.tools.tts import number_to_words, process_text, write_wav
from llamacog_tpu.utils.testing import make_tiny_wavtokenizer_gguf


def test_istft_reconstructs_signal():
    """embd built from the STFT of a known signal must reconstruct it
    (hann overlap-add with n_fft=1280, hop=320 is perfectly invertible)."""
    n_fft, n_hop = 1280, 320
    n_codes = 24
    n_out = (n_codes - 1) * n_hop + n_fft
    t = np.arange(n_out)
    # small amplitudes: the decoder clamps magnitudes at 1e2 (tts.cpp :237)
    sig = (0.05 * np.sin(2 * np.pi * 220 * t / 24000)
           + 0.02 * np.sin(2 * np.pi * 523 * t / 24000)).astype(np.float32)
    n = np.arange(n_fft)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / n_fft)
    frames = np.stack([sig[l * n_hop : l * n_hop + n_fft] * hann
                       for l in range(n_codes)])
    spec = np.fft.rfft(frames, axis=-1)
    mag = np.abs(spec)
    embd = np.concatenate([np.log(np.maximum(mag, 1e-10)), np.angle(spec)], -1)
    audio = embd_to_audio(embd.astype(np.float32), n_fft=n_fft, n_hop=n_hop)
    n_pad = (n_fft - n_hop) // 2
    ref = sig[n_pad : n_out - n_pad]
    # ends lack full window overlap; compare the interior
    s = n_fft
    err = np.abs(audio[s:-s] - ref[s:-s]).max()
    assert err < 1e-4, f"reconstruction err {err}"


def test_vocoder_forward(tmp_path):
    path = make_tiny_wavtokenizer_gguf(tmp_path / "wavtok.gguf")
    voc = load_wavtokenizer(path)
    codes = np.arange(12) % 128
    embd = voc.embd(codes)
    assert embd.shape == (12, 18)
    assert np.isfinite(embd).all()
    audio = voc.decode_audio(codes)
    assert audio.ndim == 1 and audio.size > 0
    assert np.isfinite(audio).all()


def test_number_to_words():
    assert number_to_words("42").strip() == "forty two"
    assert number_to_words("1500").strip() == "one thousand five hundred"
    assert number_to_words("3.14").strip() == "three point one four"
    assert number_to_words("0").strip() == "zero"


def test_process_text():
    out = process_text("Hello, World! It's 42 degrees.")
    assert out == ("hello<|text_sep|>world<|text_sep|>its<|text_sep|>forty"
                   "<|text_sep|>two<|text_sep|>degrees")


def test_write_wav(tmp_path):
    p = str(tmp_path / "t.wav")
    write_wav(p, np.sin(np.linspace(0, 100, 2400)).astype(np.float32))
    with wave.open(p) as f:
        assert f.getframerate() == 24000
        assert f.getnchannels() == 1
        assert f.getnframes() == 2400
