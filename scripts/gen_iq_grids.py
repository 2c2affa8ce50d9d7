#!/usr/bin/env python3
"""Extract the i-quant codebook constants (wire-format data tables) from the
reference's ggml-common.h into a binary .npz shipped with the package.

These tables ARE the GGUF i-quant format specification: every decoder of
IQ1/IQ2/IQ3 blocks must agree on them bit-for-bit (like the IQ4_NL kvalues
already inlined in quant/decode_np.py). They are pure numeric data, extracted
mechanically — no code is copied.

Source of truth: /root/reference/ggml/src/ggml-common.h
  iq2xxs_grid[256] u64 (:518), iq2xs_grid[512] u64 (:585),
  iq2s_grid[1024] u64 (:716), iq3xxs_grid[256] u32 (:975),
  iq3s_grid[512] u32 (:1010), iq1s_grid[2048] u64 (:1085),
  ksigns_iq2xs[128] u8 (:471), kmask_iq2xs[8] u8 (:467),
  kvalues_iq4nl[16] i8 (:1077).

Run:  python scripts/gen_iq_grids.py   (requires the reference checkout)
Writes: llamacog_tpu/quant/iq_grids.npz
"""

import pathlib
import re

import numpy as np

REF = pathlib.Path("/root/reference/ggml/src/ggml-common.h")
OUT = pathlib.Path(__file__).resolve().parent.parent / "llamacog_tpu/quant/iq_grids.npz"

TABLES = {
    # name in header -> (npz key, dtype)
    "iq2xxs_grid": ("iq2xxs", np.uint64),
    "iq2xs_grid": ("iq2xs", np.uint64),
    "iq2s_grid": ("iq2s", np.uint64),
    "iq3xxs_grid": ("iq3xxs", np.uint32),
    "iq3s_grid": ("iq3s", np.uint32),
    "iq1s_grid": ("iq1s", np.uint64),
    "ksigns_iq2xs": ("ksigns", np.uint8),
    "kmask_iq2xs": ("kmask", np.uint8),
    "kvalues_iq4nl": ("kvalues_iq4nl", np.int64),  # signed values; stored wide
}


def main():
    text = REF.read_text()
    out = {}
    for tname, (key, dtype) in TABLES.items():
        m = re.search(
            r"GGML_TABLE_BEGIN\(\w+,\s*" + tname + r",\s*\w+\)(.*?)GGML_TABLE_END\(\)",
            text,
            re.DOTALL,
        )
        assert m, f"table {tname} not found"
        vals = [int(v, 0) for v in re.findall(r"-?0x[0-9a-fA-F]+|-?\d+", m.group(1))]
        arr = np.array(vals, dtype=np.int64 if min(vals) < 0 else np.uint64)
        out[key] = arr.astype(dtype) if min(vals) >= 0 else arr
    np.savez_compressed(OUT, **out)
    sizes = {k: v.shape for k, v in out.items()}
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes): {sizes}")


if __name__ == "__main__":
    main()
