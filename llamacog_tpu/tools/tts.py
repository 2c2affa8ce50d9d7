"""llamacog-tts — OuteTTS-style text-to-speech (reference tools/tts/tts.cpp).

Pipeline: text -> OuteTTS prompt ("<|text_start|>word<|text_sep|>...") ->
LLM generates audio-code tokens -> WavTokenizer decoder (models/
wavtokenizer.py) turns codes into a spectrogram embedding -> inverse STFT
-> 24kHz mono WAV. Text preprocessing (numbers to words, lowercasing,
separator tokens) follows tts.cpp process_text (:384-419).
"""

from __future__ import annotations

import argparse
import json
import re
import wave

import numpy as np

SAMPLE_RATE = 24000
# OuteTTS v0.2/qwen2.5 vocab: audio codes live in this token-id range
# (tts.cpp :1003-1014)
CODE_START, CODE_END = 151672, 155772

_ONES = ("zero one two three four five six seven eight nine ten eleven twelve "
         "thirteen fourteen fifteen sixteen seventeen eighteen nineteen").split()
_TENS = ("", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety")


def _under_1000(n: int) -> str:
    out = []
    if n >= 100:
        out += [_ONES[n // 100], "hundred"]
        n %= 100
    if n >= 20:
        out.append(_TENS[n // 10])
        n %= 10
    if n > 0:
        out.append(_ONES[n])
    return " ".join(out)


def number_to_words(s: str) -> str:
    """tts.cpp number_to_words (:276-363)."""
    try:
        if "." in s:
            whole, frac = s.split(".", 1)
        else:
            whole, frac = s, None
        n = int(whole) if whole else 0
        if n == 0:
            res = "zero"
        else:
            parts = []
            for div, name in ((10**9, "billion"), (10**6, "million"),
                              (10**3, "thousand")):
                if n >= div:
                    parts.append(_under_1000(n // div) + f" {name}")
                    n %= div
            if n:
                parts.append(_under_1000(n))
            res = " ".join(parts)
        if frac is not None:
            res += " point " + " ".join(_ONES[int(d)] for d in frac if d.isdigit())
        return " " + res + " " if res else " "
    except Exception:
        return " "


def process_text(text: str, sep: str = "<|text_sep|>") -> str:
    """Lowercase, spell out numbers, strip punctuation, join with the
    separator token (tts.cpp process_text)."""
    text = re.sub(r"\d+(\.\d+)?", lambda m: number_to_words(m.group(0)), text)
    text = text.lower()
    text = re.sub(r"[-_/,\.\\]", " ", text)
    text = re.sub(r"[^a-z\s]", "", text)
    text = re.sub(r"\s+", " ", text).strip()
    return sep.join(text.split(" "))


def write_wav(path: str, audio: np.ndarray, sr: int = SAMPLE_RATE) -> None:
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def synthesize(model, engine, vocoder, text: str, max_tokens: int = 2048,
               code_offset: int = CODE_START) -> np.ndarray:
    """Full TTS loop: prompt -> audio-code generation -> vocoder -> audio."""
    tok = model.tokenizer
    prompt = ("<|im_start|>\n<|text_start|>" + process_text(text)
              + "<|text_end|>\n<|audio_start|>\n")
    ids = tok.tokenize(prompt, add_special=False, parse_special=True)
    audio_end = model.vocab.token_to_id.get("<|audio_end|>", -1)
    logits = engine.prefill(ids)
    out = []
    for _ in range(max_tokens):
        nxt = int(np.argmax(logits))
        if nxt == audio_end or nxt == model.vocab.eos_id:
            break
        out.append(nxt)
        logits = engine.decode_one(np.array([nxt]))[0]
    codes = np.asarray([t - code_offset for t in out
                        if code_offset <= t <= code_offset + 4100], np.int32)
    if codes.size == 0:
        return np.zeros(0, np.float32)
    return vocoder.decode_audio(codes)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llamacog-tts")
    p.add_argument("-m", "--model", required=True, help="OuteTTS LLM gguf")
    p.add_argument("-mv", "--vocoder", required=True, help="WavTokenizer gguf")
    p.add_argument("-p", "--prompt", required=True)
    p.add_argument("-o", "--output", default="output.wav")
    p.add_argument("-n", "--max-tokens", type=int, default=2048)
    p.add_argument("--device", choices=("auto", "cpu", "tpu"), default="auto")
    args = p.parse_args(argv)
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)

    from ..models.loader import load_model
    from ..models.wavtokenizer import load_wavtokenizer
    from ..runtime.engine import Engine

    model = load_model(args.model)
    engine = Engine(model.params, model.config, batch_size=1, max_seq=4096)
    vocoder = load_wavtokenizer(args.vocoder)
    audio = synthesize(model, engine, vocoder, args.prompt,
                       max_tokens=args.max_tokens)
    write_wav(args.output, audio)
    print(json.dumps({"samples": int(audio.size),
                      "seconds": round(audio.size / SAMPLE_RATE, 2),
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
