"""Sequence state snapshot/restore (reference: llama_state_seq_save_file /
llama_state_save_file, include/llama.h:806-902; powers server slot
save/restore and prompt caching).

Format: npz with a versioned magic, the row's KV slice (dense or quantized
planes), the valid length, and the token history if provided.
"""

from __future__ import annotations

import numpy as np

from .engine import Engine
from .kv_cache import KVCache, QuantKVCache, SwaKVCache

STATE_MAGIC = "LCGS"
STATE_VERSION = 1


def save_row_state(engine: Engine, path: str, row: int = 0, tokens: list[int] | None = None):
    n = int(engine.seq_len[row])
    arrays: dict[str, np.ndarray] = {
        "magic": np.frombuffer(STATE_MAGIC.encode(), dtype=np.uint8),
        "version": np.array([STATE_VERSION], dtype=np.int32),
        "seq_len": np.array([n], dtype=np.int32),
        "tokens": np.asarray(tokens if tokens is not None else [], dtype=np.int32),
    }
    c = engine.cache
    if isinstance(c, QuantKVCache):
        # canonical tag "kind_k:kind_v"; planes saved positionally. bf16
        # dense planes (mixed dense/quant caches) store bit patterns.
        arrays["kind"] = np.frombuffer(
            ":".join(c.kinds).encode(), dtype=np.uint8)
        for tag, planes in (("k", c.k_planes), ("v", c.v_planes)):
            for i, p in enumerate(planes):
                a = np.asarray(p[:, row, :n])
                if str(a.dtype) == "bfloat16":
                    a = a.view(np.uint16)
                arrays[f"{tag}p{i}"] = a
    elif isinstance(c, SwaKVCache):
        arrays["kind"] = np.frombuffer(b"iswa", dtype=np.uint8)

        def u16(a):
            a = np.asarray(a)
            return a.view(np.uint16) if str(a.dtype) == "bfloat16" else a

        arrays["dtype"] = np.frombuffer(
            b"bf16" if str(c.full.k.dtype) == "bfloat16"
            else str(np.asarray(c.full.k[:0]).dtype).encode(), dtype=np.uint8)
        arrays["k"] = u16(c.full.k[:, row, :n])
        arrays["v"] = u16(c.full.v[:, row, :n])
        # ring slots encode position via seq_len; save them whole
        arrays["k_swa"] = u16(c.k_swa[:, row])
        arrays["v_swa"] = u16(c.v_swa[:, row])
    else:
        arrays["kind"] = np.frombuffer(b"dense", dtype=np.uint8)
        # bf16 isn't a native numpy dtype (npz round-trips it as void):
        # store the bit pattern as uint16 + a dtype tag
        k = np.asarray(c.k[:, row, :n])
        v = np.asarray(c.v[:, row, :n])
        if k.dtype.itemsize == 2 and k.dtype.kind == "V" or str(k.dtype) == "bfloat16":
            arrays["dtype"] = np.frombuffer(b"bf16", dtype=np.uint8)
            k = k.view(np.uint16)
            v = v.view(np.uint16)
        else:
            arrays["dtype"] = np.frombuffer(str(k.dtype).encode(), dtype=np.uint8)
        arrays["k"] = k
        arrays["v"] = v
    # write through a handle: np.savez would append ".npz" to bare paths
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_row_state(engine: Engine, path: str, row: int = 0) -> list[int]:
    """Restores a row; returns the saved token history (may be empty)."""
    import jax.numpy as jnp

    z = np.load(path)
    if bytes(z["magic"]).decode() != STATE_MAGIC:
        raise ValueError("bad state file magic")
    if int(z["version"][0]) != STATE_VERSION:
        raise ValueError(f"unsupported state version {z['version'][0]}")
    n = int(z["seq_len"][0])
    if n > engine.max_seq:
        raise ValueError(f"state length {n} exceeds engine max_seq {engine.max_seq}")
    kind = bytes(z["kind"]).decode()
    c = engine.cache
    if kind not in ("iswa", "dense") and not kind.startswith("f"):
        kinds = tuple(kind.split(":")) if ":" in kind else (kind, kind)
        if not isinstance(c, QuantKVCache) or c.kinds != kinds:
            have = c.kinds if isinstance(c, QuantKVCache) else type(c).__name__
            raise ValueError(f"state is {kinds} but engine cache is {have}")
        if "k_q" in z:  # legacy v1 layout (fixed q/s plane names)
            loaded = {"kp0": z["k_q"], "kp1": z["k_s"],
                      "vp0": z["v_q"], "vp1": z["v_s"]}
        else:
            loaded = {key: z[key] for key in z.files if key[1:2] == "p"}

        def restore(planes, tag):
            out = []
            for i, p in enumerate(planes):
                a = loaded[f"{tag}p{i}"]
                if str(p.dtype) == "bfloat16":
                    import ml_dtypes

                    a = a.view(ml_dtypes.bfloat16)
                out.append(p.at[:, row, :n].set(jnp.asarray(a)))
            return tuple(out)

        engine.cache = type(c)(
            restore(c.k_planes, "k"), restore(c.v_planes, "v"), kinds,
            c.hkv)
    elif kind == "iswa":
        if not isinstance(c, SwaKVCache):
            raise ValueError("state is iswa but engine cache is not")

        def undo(a):
            if "dtype" in z and bytes(z["dtype"]).decode() == "bf16":
                import ml_dtypes

                return a.view(ml_dtypes.bfloat16)
            return a

        full = KVCache(
            c.full.k.at[:, row, :n].set(
                jnp.asarray(undo(z["k"])).astype(c.full.k.dtype)),
            c.full.v.at[:, row, :n].set(
                jnp.asarray(undo(z["v"])).astype(c.full.v.dtype)),
        )
        engine.cache = SwaKVCache(
            full,
            c.k_swa.at[:, row].set(jnp.asarray(undo(z["k_swa"])).astype(c.k_swa.dtype)),
            c.v_swa.at[:, row].set(jnp.asarray(undo(z["v_swa"])).astype(c.v_swa.dtype)),
            c.swa_layers,
        )
    else:
        if not isinstance(c, KVCache):
            raise ValueError("state is dense but engine cache is quantized")
        k, v = z["k"], z["v"]
        if "dtype" in z and bytes(z["dtype"]).decode() == "bf16":
            import ml_dtypes

            k = k.view(ml_dtypes.bfloat16)
            v = v.view(ml_dtypes.bfloat16)
        engine.cache = KVCache(
            c.k.at[:, row, :n].set(jnp.asarray(k).astype(c.k.dtype)),
            c.v.at[:, row, :n].set(jnp.asarray(v).astype(c.v.dtype)),
        )
    engine.seq_len[row] = n
    return [int(t) for t in z["tokens"]]
