"""AtomSpace / MOSES / ECAN quantizers: ≤8-bit encodings of cognitive-layer
values (reference src/opencog-qat/opencog-quantization.h:16,99,177)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .atomspace import TruthValue


def _quant_u8(x: np.ndarray, lo: float, hi: float) -> tuple[np.ndarray, float, float]:
    """Uniform 8-bit affine quantization over [lo, hi]."""
    scale = (hi - lo) / 255.0 or 1.0
    q = np.clip(np.round((np.asarray(x, np.float64) - lo) / scale), 0, 255)
    return q.astype(np.uint8), scale, lo


def _dequant_u8(q: np.ndarray, scale: float, offset: float) -> np.ndarray:
    return (q.astype(np.float32) * scale + offset).astype(np.float32)


@dataclass
class QuantizedTruthValues:
    strength: np.ndarray  # uint8
    confidence: np.ndarray
    count: np.ndarray
    params: dict = field(default_factory=dict)  # per-field (scale, offset)


class AtomSpaceQuantizer:
    """8-bit uniform quantization of truth values with range calibration
    (AtomSpaceQuantizer, opencog-quantization.h:16-97)."""

    def __init__(self, strength_range=(0.0, 1.0), confidence_range=(0.0, 1.0),
                 count_range=(0.0, 1000.0)):
        self.ranges = {
            "strength": strength_range,
            "confidence": confidence_range,
            "count": count_range,
        }

    def calibrate(self, tvs: list[TruthValue]) -> None:
        if not tvs:
            return
        for fieldname in ("strength", "confidence", "count"):
            vals = np.array([getattr(t, fieldname) for t in tvs])
            self.ranges[fieldname] = (float(vals.min()), float(max(vals.max(), vals.min() + 1e-6)))

    def quantize(self, tvs: list[TruthValue]) -> QuantizedTruthValues:
        out = {}
        params = {}
        for fieldname in ("strength", "confidence", "count"):
            lo, hi = self.ranges[fieldname]
            vals = np.array([getattr(t, fieldname) for t in tvs], np.float32)
            q, scale, offset = _quant_u8(vals, lo, hi)
            out[fieldname] = q
            params[fieldname] = (scale, offset)
        return QuantizedTruthValues(
            out["strength"], out["confidence"], out["count"], params
        )

    def dequantize(self, q: QuantizedTruthValues) -> list[TruthValue]:
        s = _dequant_u8(q.strength, *q.params["strength"])
        c = _dequant_u8(q.confidence, *q.params["confidence"])
        n = _dequant_u8(q.count, *q.params["count"])
        return [TruthValue(float(a), float(b), float(d)) for a, b, d in zip(s, c, n)]

    def quantize_structure(self, atoms) -> bytes:
        """Pack the hypergraph topology: varint-free fixed-width little-endian
        (id:u32, type-hash:u16, n_out:u16, out ids u32...)."""
        chunks = []
        for a in atoms:
            th = hash(a.type) & 0xFFFF
            head = np.array([a.id], "<u4").tobytes() + np.array(
                [th, len(a.outgoing)], "<u2"
            ).tobytes()
            chunks.append(head + np.asarray(a.outgoing, "<u4").tobytes())
        return b"".join(chunks)


class MOSESQuantizer:
    """Program-tree quantization preserving genetic-operation structure
    (MOSESQuantizer, opencog-quantization.h:99-175). Nodes are (op, const)
    pairs; ops map to a 4-bit vocabulary, constants to 8-bit affine codes."""

    NODE_TYPES = (
        "and", "or", "not", "if", "gt", "lt", "eq", "add", "sub", "mul",
        "div", "var", "const", "call", "seq", "nop",
    )

    def __init__(self):
        self._op_to_code = {op: i for i, op in enumerate(self.NODE_TYPES)}

    def quantize_program(self, nodes: list[tuple[str, float]]):
        ops = np.array([self._op_to_code.get(op, 15) for op, _ in nodes], np.uint8)
        consts = np.array([c for _, c in nodes], np.float32)
        lo = float(consts.min()) if consts.size else 0.0
        hi = float(consts.max()) if consts.size else 1.0
        if hi <= lo:
            hi = lo + 1.0
        q, scale, offset = _quant_u8(consts, lo, hi)
        # pack two 4-bit ops per byte
        padded = np.concatenate([ops, np.zeros(len(ops) % 2, np.uint8)])
        packed_ops = (padded[0::2] | (padded[1::2] << 4)).astype(np.uint8)
        return {"ops": packed_ops, "consts": q, "scale": scale, "offset": offset,
                "n": len(nodes)}

    def dequantize_program(self, q) -> list[tuple[str, float]]:
        n = q["n"]
        ops = np.empty(2 * len(q["ops"]), np.uint8)
        ops[0::2] = q["ops"] & 0xF
        ops[1::2] = q["ops"] >> 4
        consts = _dequant_u8(q["consts"], q["scale"], q["offset"])
        return [
            (self.NODE_TYPES[int(ops[i])], float(consts[i])) for i in range(n)
        ]

    def fitness_preserved(self, original, roundtripped, tol: float = 1e-2) -> bool:
        """Genetic ops need exact op codes + bounded constant error."""
        if len(original) != len(roundtripped):
            return False
        for (op1, c1), (op2, c2) in zip(original, roundtripped):
            if op1 != op2 and op1 in self._op_to_code:
                return False
            if abs(c1 - c2) > tol * max(1.0, abs(c1)):
                return False
        return True


class ECANQuantizer:
    """Attention-value quantization (ECANQuantizer,
    opencog-quantization.h:177-268): STI/LTI to 8 bits, VLTI to 1 bit,
    preserving the total attention budget after dequantization."""

    def __init__(self, sti_range=(-100.0, 100.0), lti_range=(0.0, 100.0)):
        self.sti_range = sti_range
        self.lti_range = lti_range

    def calibrate(self, sti: np.ndarray, lti: np.ndarray) -> None:
        if len(sti):
            self.sti_range = (float(np.min(sti)), float(max(np.max(sti), np.min(sti) + 1e-6)))
        if len(lti):
            self.lti_range = (float(np.min(lti)), float(max(np.max(lti), np.min(lti) + 1e-6)))

    def quantize(self, sti, lti, vlti):
        sti = np.asarray(sti, np.float32)
        lti = np.asarray(lti, np.float32)
        qs, s_scale, s_off = _quant_u8(sti, *self.sti_range)
        ql, l_scale, l_off = _quant_u8(lti, *self.lti_range)
        bits = np.packbits(np.asarray(vlti, bool))
        return {
            "sti": qs, "lti": ql, "vlti": bits, "n": len(sti),
            "params": ((s_scale, s_off), (l_scale, l_off)),
            "sti_total": float(np.sum(sti)),
        }

    def dequantize(self, q):
        (ss, so), (ls, lo) = q["params"]
        sti = _dequant_u8(q["sti"], ss, so)
        # rescale so the attention economy's total budget is conserved
        tot = float(np.sum(sti))
        if abs(tot) > 1e-9 and abs(q["sti_total"]) > 1e-9:
            sti = sti * (q["sti_total"] / tot)
        lti = _dequant_u8(q["lti"], ls, lo)
        vlti = np.unpackbits(q["vlti"])[: q["n"]].astype(bool)
        return sti, lti, vlti
