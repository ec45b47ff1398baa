"""ggml block-quantization formats, decoded/encoded with vectorized numpy.

``formats``  — bit-exact (de)quantization of GGUF block formats
               (reference semantics: /root/reference/cpp/ggml/src/ggml-quants.c).
``qtensor``  — the TPU-native device representation: packed integer payload +
               per-group scales/mins laid out for lane=128 tiling, produced by
               repacking GGUF blocks losslessly at load time.
"""

from booster_tpu.quant.formats import dequantize, quantize, SUPPORTED_DECODE, SUPPORTED_ENCODE
from booster_tpu.quant.qtensor import QTensor, repack_gguf_tensor

__all__ = [
    "dequantize",
    "quantize",
    "SUPPORTED_DECODE",
    "SUPPORTED_ENCODE",
    "QTensor",
    "repack_gguf_tensor",
]
