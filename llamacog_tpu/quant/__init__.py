from .decode_np import DEQUANT_FNS, KVALUES_IQ4NL, dequantize, dequantize_tensor
from .encode_np import QUANT_FNS, quantize, quantize_tensor

__all__ = [
    "DEQUANT_FNS",
    "KVALUES_IQ4NL",
    "dequantize",
    "dequantize_tensor",
    "QUANT_FNS",
    "quantize",
    "quantize_tensor",
]
