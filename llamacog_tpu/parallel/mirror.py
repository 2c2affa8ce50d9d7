"""Multi-host serving: mirror the controller's Engine calls to follower
processes.

Multi-controller JAX requires every process to dispatch the same SPMD
computations in the same order with the same (replicated) input values.
The HTTP server runs on process 0 only (SURVEY §7 hard part 6 — the
controller/per-host-data-feed problem; the reference sidesteps it with the
ggml-rpc client/server split, ggml/src/ggml-rpc/ggml-rpc.cpp). Here the
controller broadcasts each mutating Engine call (method name + host args —
tokens, rows, lengths; a few KB) to all processes via
`multihost_utils.broadcast_one_to_all`, and followers replay it on their
identically-constructed Engine. Results are only consumed on the
controller; followers keep their device state in lockstep.
"""

from __future__ import annotations

import pickle

import numpy as np

# Engine methods that dispatch device computations or mutate the host-side
# state (seq_len/pos_offset) that feeds later dispatch arguments.
MIRRORED_METHODS = (
    "prefill", "prefill_logits", "prefill_embd", "decode_one",
    "decode_greedy_tokens", "generate_greedy", "embed", "shift_row",
    "copy_row", "clear_row", "clear_row_state", "reset", "set_seq_len",
)

_BUF = 1 << 16  # max pickled command size (token lists of ~16k tokens fit)


def _bcast_bytes(payload: bytes | None) -> bytes:
    """Fixed-size byte broadcast from process 0 (length-prefixed)."""
    from jax.experimental import multihost_utils as mh

    buf = np.zeros(_BUF + 8, np.uint8)
    if payload is not None:
        data = np.frombuffer(payload, np.uint8)
        if data.size > _BUF:
            raise ValueError(f"mirror command too large: {data.size} bytes")
        buf[:8] = np.frombuffer(np.uint64(data.size).tobytes(), np.uint8)
        buf[8:8 + data.size] = data
    out = np.asarray(mh.broadcast_one_to_all(buf))
    n = int(np.frombuffer(out[:8].tobytes(), np.uint64)[0])
    return out[8:8 + n].tobytes()


class MirroredEngine:
    """Controller-side proxy: broadcasts (engine_id, method, args) before
    running the call locally. Reads (seq_len, cache, ...) pass through."""

    def __init__(self, engine, engine_id: str):
        object.__setattr__(self, "inner", engine)
        object.__setattr__(self, "_engine_id", engine_id)

    def __getattr__(self, name):
        attr = getattr(self.inner, name)
        if name in MIRRORED_METHODS and callable(attr):
            eid = self._engine_id

            def call(*args, **kwargs):
                _bcast_bytes(pickle.dumps(("call", eid, name, args, kwargs)))
                return attr(*args, **kwargs)

            return call
        return attr

    def __setattr__(self, name, value):
        setattr(self.inner, name, value)


def announce_engine(engine_id: str, ctor_kwargs: dict) -> None:
    """Controller: tell followers to construct an identical Engine (used for
    lazily-created engines, e.g. the server's embedding engine)."""
    _bcast_bytes(pickle.dumps(("create", engine_id, ctor_kwargs)))


def stop_followers() -> None:
    _bcast_bytes(pickle.dumps(("stop",)))


def follower_loop(engines: dict, make_engine) -> None:
    """Run on processes != 0. `engines` maps engine_id -> Engine;
    `make_engine(**kwargs)` services "create" commands."""
    while True:
        cmd = pickle.loads(_bcast_bytes(None))
        if cmd[0] == "stop":
            return
        if cmd[0] == "create":
            _, eid, kw = cmd
            engines[eid] = make_engine(**kw)
            continue
        _, eid, name, args, kwargs = cmd
        getattr(engines[eid], name)(*args, **kwargs)
