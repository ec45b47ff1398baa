"""GGUF file format support (v2/v3): reader, writer, type constants.

Reference behavior: the GGUF loader in /root/reference/cpp/src/llama.cpp:3582
(llama_model_loader) mmaps the file, parses typed key/value metadata and
tensor-info records, and exposes aligned tensor blobs.  This package is a
clean-room reimplementation of the *format*, returning numpy views over an
mmap so tensor bytes are zero-copy until dequantization.
"""

from booster_tpu.gguf.constants import (
    GGMLType,
    GGUFValueType,
    GGUF_MAGIC,
    GGUF_DEFAULT_ALIGNMENT,
    TYPE_TRAITS,
    TypeTraits,
)
from booster_tpu.gguf.reader import GGUFReader, GGUFTensorInfo
from booster_tpu.gguf.writer import GGUFWriter

__all__ = [
    "GGMLType",
    "GGUFValueType",
    "GGUF_MAGIC",
    "GGUF_DEFAULT_ALIGNMENT",
    "TYPE_TRAITS",
    "TypeTraits",
    "GGUFReader",
    "GGUFTensorInfo",
    "GGUFWriter",
]
