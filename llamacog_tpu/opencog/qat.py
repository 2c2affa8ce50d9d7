"""OpenCog QAT framework: data-free calibration + progressive quantization
with a KL-divergence gate (reference src/opencog-qat/qat-framework.h:16,
synthetic-calibration.{h,cpp}).

Works over this framework's quant codecs (llamacog_tpu.quant), so the "QAT"
pass produces real GGUF-compatible encodings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

import numpy as np

from ..gguf.constants import GGMLType
from ..quant import dequantize, quantize


class TargetHardware(Enum):  # qat-framework.h:19-26
    CPU = "cpu"
    GPU = "gpu"
    TPU = "tpu"
    EDGE = "edge"


@dataclass
class HardwareConstraints:
    target: TargetHardware = TargetHardware.TPU
    performance_threshold: float = 0.02  # 2% accuracy loss budget
    memory_reduction_target: float = 0.75  # 75% size reduction goal


@dataclass
class QATConfig:
    # progressive schedule: try the smallest type first, back off on KL fail
    candidate_types: tuple = (
        GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0
    )
    kl_divergence_threshold: float = 0.01
    calibration_batches: int = 8
    calibration_dim: int = 256
    seed: int = 0


@dataclass
class ValidationMetrics:  # qat-framework.h:51-61
    accuracy_retention: float = 0.0
    kl_divergence_loss: float = 0.0
    memory_reduction: float = 0.0
    per_tensor_types: dict = field(default_factory=dict)


class SyntheticCalibrationGenerator:
    """Data-free calibration batches (synthetic-calibration.h): mixtures of
    gaussian / heavy-tailed / sparse activations covering the distributions
    the quantizer must survive."""

    def __init__(self, dim: int, seed: int = 0):
        self.dim = dim
        self.rng = np.random.default_rng(seed)

    def batch(self, kind: str | None = None) -> np.ndarray:
        kind = kind or self.rng.choice(["gauss", "heavy", "sparse", "bimodal"])
        if kind == "gauss":
            return self.rng.standard_normal(self.dim).astype(np.float32)
        if kind == "heavy":
            return self.rng.standard_t(3, self.dim).astype(np.float32)
        if kind == "sparse":
            x = self.rng.standard_normal(self.dim)
            x[self.rng.random(self.dim) < 0.9] = 0.0
            return x.astype(np.float32)
        # bimodal
        x = self.rng.standard_normal(self.dim) + self.rng.choice(
            [-3.0, 3.0], self.dim
        )
        return x.astype(np.float32)

    def batches(self, n: int) -> list[np.ndarray]:
        return [self.batch() for _ in range(n)]


def _kl_divergence(p_logits: np.ndarray, q_logits: np.ndarray) -> float:
    """KL(p||q) of softmax distributions over calibration outputs."""
    def softmax(x):
        e = np.exp(x - x.max())
        return e / e.sum()

    p, q = softmax(p_logits.astype(np.float64)), softmax(q_logits.astype(np.float64))
    return float(np.sum(p * np.log((p + 1e-12) / (q + 1e-12))))


class OpenCogQATFramework:
    """Progressive quantization: per tensor, pick the smallest candidate type
    whose calibration KL divergence stays under the threshold
    (qat-framework.h progressive quantization + kl_divergence_threshold)."""

    def __init__(self, constraints: HardwareConstraints | None = None,
                 config: QATConfig | None = None):
        self.constraints = constraints or HardwareConstraints()
        self.config = config or QATConfig()

    def quantize_tensor(self, w: np.ndarray) -> tuple[GGMLType | None, np.ndarray, float]:
        """Returns (chosen type, encoded bytes, kl). None type = keep f32."""
        cfg = self.config
        w = np.asarray(w, np.float32)
        k = w.shape[-1]
        gen = SyntheticCalibrationGenerator(k, cfg.seed)
        cal = gen.batches(cfg.calibration_batches)
        flat = w.reshape(-1, k)
        for t in cfg.candidate_types:
            block = 256 if t.name.endswith("_K") else 32
            if k % block:
                continue
            try:
                enc = quantize(w.reshape(-1), t)
            except NotImplementedError:
                continue
            wq = dequantize(enc, t, w.size).reshape(flat.shape)
            kl = max(
                _kl_divergence(flat @ x, wq @ x) for x in cal
            )
            if kl <= cfg.kl_divergence_threshold:
                return t, enc, kl
        return None, w.tobytes(), 0.0

    def run(self, tensors: dict[str, np.ndarray]) -> ValidationMetrics:
        """Quantize a dict of named tensors; returns aggregate metrics."""
        in_bytes = out_bytes = 0
        worst_kl = 0.0
        types = {}
        for name, w in tensors.items():
            t, enc, kl = self.quantize_tensor(w)
            in_bytes += w.size * 4
            out_bytes += len(enc) if isinstance(enc, (bytes, bytearray)) else enc.nbytes
            worst_kl = max(worst_kl, kl)
            types[name] = t.name if t else "F32"
        return ValidationMetrics(
            accuracy_retention=1.0 - worst_kl,
            kl_divergence_loss=worst_kl,
            memory_reduction=1.0 - out_bytes / max(in_bytes, 1),
            per_tensor_types=types,
        )

    def meets_constraints(self, m: ValidationMetrics) -> bool:
        return (
            m.kl_divergence_loss <= self.config.kl_divergence_threshold
            and m.memory_reduction >= self.constraints.memory_reduction_target - 1e-9
        )
