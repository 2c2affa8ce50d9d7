"""Run the reference convert_hf_to_gguf.py as a CONVERSION ORACLE.

The reference tree is available read-only; importing its converter and
running it on a hand-crafted tiny checkpoint gives a ground-truth GGUF to
diff ours against — the same compile-the-reference-at-test-time trick as
tests/oracle/ (quant codecs) and tests/test_e2e_oracle.py (llama-cli).
Reference source never enters this repo.

Tokenizer export is excluded from the comparison (set_vocab is patched to
a no-op: sentencepiece isn't installed and the BPE path hash-gates on real
tokenizers); tokenizer export has its own tests. What this oracle checks is
the part unique to a converter: HF->GGUF tensor NAME mapping, tensor
TRANSFORMS (fused-QKV splits, rope row permutes, expert stacking), and the
arch metadata keys.
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import sys

import numpy as np

_REF = None


def load_ref_converter():
    """Import /root/reference/convert_hf_to_gguf.py (cached)."""
    global _REF
    if _REF is not None:
        return _REF
    sys.path.insert(0, "/root/reference/gguf-py")
    spec = importlib.util.spec_from_file_location(
        "ref_convert_hf", "/root/reference/convert_hf_to_gguf.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _REF = mod
    return mod


def ref_convert(hf_dir: str, out_path: str, mmproj: bool = False) -> None:
    """Convert hf_dir with the reference converter at f32, tokenizer export
    disabled."""
    m = load_ref_converter()
    import gguf as ref_gguf  # noqa: F401  (reference gguf-py, path-inserted)

    cfg = json.loads((pathlib.Path(hf_dir) / "config.json").read_text())
    arch = cfg["architectures"][0]
    # upstream bug workaround: TensorNameMap.__init__ mutates the CLASS-level
    # block_mappings_cfg when an arch has arch_block_mappings_cfg overrides
    # (arctic), poisoning every later conversion in this process.  Harmless
    # upstream (one conversion per process); fatal for a shared-process oracle.
    # Restore the pristine dict before each conversion.
    tm_cls = ref_gguf.tensor_mapping.TensorNameMap
    if not hasattr(tm_cls, "_pristine_block_mappings"):
        tm_cls._pristine_block_mappings = dict(tm_cls.block_mappings_cfg)
    tm_cls.block_mappings_cfg = dict(tm_cls._pristine_block_mappings)
    mtype = m.ModelType.MMPROJ if mmproj else m.ModelType.TEXT
    if not mmproj:
        # reference main() picks the TEXT class from text_config.architectures
        # for multimodal wrappers (convert_hf_to_gguf.py:6462)
        tc_arch = (cfg.get("text_config") or {}).get("architectures")
        if tc_arch:
            arch = tc_arch[0]
    cls = m.ModelBase.from_model_architecture(arch, model_type=mtype)
    model = cls(
        pathlib.Path(hf_dir),
        m.gguf.LlamaFileType.ALL_F32,
        pathlib.Path(out_path),
        eager=True,
    )
    model.set_vocab = lambda: None
    # the reference RWKV classes accumulate fused-lerp parts in a CLASS-level
    # dict; shadow it per conversion so repeated/different conversions in one
    # process don't cross-contaminate (upstream runs one conversion/process)
    if hasattr(model, "lerp_weights"):
        model.lerp_weights = {}
    # upstream bug workaround: get_total_parameter_count does shape[-3] on any
    # tensor whose name contains "_exps." — IndexError for the 1-D
    # ffn_norm_exps (arctic).  Parameter counts only feed general.* metadata
    # (excluded from parity), so stub it out when a 1-D _exps tensor exists.
    _orig_count = model.gguf_writer.get_total_parameter_count

    def _safe_count():
        try:
            return _orig_count()
        except IndexError:
            return 0, 0, 0, 0
    model.gguf_writer.get_total_parameter_count = _safe_count
    # gemma3 trims token_embd to the sentencepiece vocab length inside
    # modify_tensors; give it a full-length stub so the trim is a no-op
    n_vocab = (cfg.get("text_config") or cfg).get("vocab_size", 0)
    model._create_vocab_sentencepiece = lambda: (
        [b""] * n_vocab, [0.0] * n_vocab, [0] * n_vocab)
    model.write()


_SKIP_KEYS = (
    "general.",       # name/size-label/quant-version metadata, not parity
    "tokenizer.",     # excluded (set_vocab no-op'd)
)


def compare_with_reference(hf_dir: str, tmp_path, our_convert, extra_skip=(),
                           tensor_rtol=0.0, mmproj: bool = False):
    """Convert hf_dir with both converters; assert tensor parity (names,
    shapes, f32 bytes) and that every arch metadata key the reference wrote
    is present here with an equal value. Returns (our_meta, ref_meta)."""
    from llamacog_tpu.gguf import GGUFReader

    ours_p = str(tmp_path / "ours.gguf")
    ref_p = str(tmp_path / "ref.gguf")
    our_convert(hf_dir, ours_p, outtype="f32")
    ref_convert(hf_dir, ref_p, mmproj=mmproj)

    from llamacog_tpu.quant.decode_np import dequantize_tensor

    ours, ref = GGUFReader(ours_p), GGUFReader(ref_p)
    missing = sorted(set(ref.tensors) - set(ours.tensors))
    extra = sorted(set(ours.tensors) - set(ref.tensors))
    assert not missing, f"tensors missing vs reference: {missing}"
    assert not extra, f"extra tensors vs reference: {extra}"
    for name, rt in ref.tensors.items():
        ot = ours.tensors[name]
        assert tuple(ot.shape) == tuple(rt.shape), (
            f"{name}: shape {ot.shape} vs ref {rt.shape}")
        a = dequantize_tensor(ours.tensor_bytes(name), ot.ggml_type, ot.shape)
        b = dequantize_tensor(ref.tensor_bytes(name), rt.ggml_type, rt.shape)
        np.testing.assert_allclose(
            a, b, rtol=tensor_rtol, atol=0,
            err_msg=f"tensor bytes differ: {name}")

    our_meta = dict(ours.metadata)
    ref_meta = dict(ref.metadata)
    skip = _SKIP_KEYS + tuple(extra_skip)
    diffs = []
    for k, v in ref_meta.items():
        if any(k.startswith(s) or k == s for s in skip):
            continue
        if k not in our_meta:
            diffs.append(f"missing {k}={v!r}")
            continue
        ov = our_meta[k]
        if isinstance(v, float):
            if not abs(ov - v) <= 1e-6 * max(1.0, abs(v)):
                diffs.append(f"{k}: {ov} vs ref {v}")
        elif isinstance(v, (list, np.ndarray)):
            if not np.array_equal(np.asarray(ov), np.asarray(v)):
                diffs.append(f"{k}: {ov} vs ref {v}")
        elif ov != v:
            diffs.append(f"{k}: {ov!r} vs ref {v!r}")
    assert not diffs, "metadata vs reference:\n  " + "\n  ".join(diffs)
    return our_meta, ref_meta
