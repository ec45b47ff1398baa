"""GGUF / ggml format constants.

The enum values and block byte-layouts are the on-disk interface of the GGUF
format (public spec; reference: /root/reference/cpp/ggml/include/ggml.h:360-394
for the type ids, /root/reference/cpp/ggml/src/ggml-common.h:144-295 for block
structs, /root/reference/cpp/ggml/src/ggml.c:20767 for the file header).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

GGUF_MAGIC = 0x46554747  # b"GGUF" little-endian
GGUF_DEFAULT_ALIGNMENT = 32
GGUF_SUPPORTED_VERSIONS = (2, 3)

QK4_0 = 32
QK4_1 = 32
QK5_0 = 32
QK5_1 = 32
QK8_0 = 32
QK8_1 = 32
QK_K = 256  # super-block size for K-quants
K_SCALE_SIZE = 12


class GGMLType(enum.IntEnum):
    """Tensor data types as stored in GGUF tensor-info records."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    # 4, 5: removed (Q4_2/Q4_3)
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    IQ2_XXS = 16
    IQ2_XS = 17
    IQ3_XXS = 18
    IQ1_S = 19
    IQ4_NL = 20
    IQ3_S = 21
    IQ2_S = 22
    IQ4_XS = 23
    I8 = 24
    I16 = 25
    I32 = 26
    I64 = 27
    F64 = 28
    IQ1_M = 29
    BF16 = 30
    Q4_0_4_4 = 31
    Q4_0_4_8 = 32
    Q4_0_8_8 = 33


class GGUFValueType(enum.IntEnum):
    """Metadata value types in GGUF key/value records."""

    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


@dataclass(frozen=True)
class TypeTraits:
    """Per-type block geometry: `block_size` elements stored in `type_size` bytes."""

    block_size: int  # number of f32 elements per block
    type_size: int  # bytes per block on disk

    @property
    def bits_per_weight(self) -> float:
        return 8.0 * self.type_size / self.block_size


# Block geometry table. Byte sizes follow the block structs in
# /root/reference/cpp/ggml/src/ggml-common.h:144-295.
TYPE_TRAITS: dict[GGMLType, TypeTraits] = {
    GGMLType.F32: TypeTraits(1, 4),
    GGMLType.F16: TypeTraits(1, 2),
    GGMLType.BF16: TypeTraits(1, 2),
    GGMLType.F64: TypeTraits(1, 8),
    GGMLType.I8: TypeTraits(1, 1),
    GGMLType.I16: TypeTraits(1, 2),
    GGMLType.I32: TypeTraits(1, 4),
    GGMLType.I64: TypeTraits(1, 8),
    # d:f16 + 16B nibbles
    GGMLType.Q4_0: TypeTraits(QK4_0, 2 + 16),
    # d:f16 m:f16 + 16B nibbles
    GGMLType.Q4_1: TypeTraits(QK4_1, 2 + 2 + 16),
    # d:f16 + 4B high bits + 16B nibbles
    GGMLType.Q5_0: TypeTraits(QK5_0, 2 + 4 + 16),
    # d:f16 m:f16 + 4B high bits + 16B nibbles
    GGMLType.Q5_1: TypeTraits(QK5_1, 2 + 2 + 4 + 16),
    # d:f16 + 32 int8
    GGMLType.Q8_0: TypeTraits(QK8_0, 2 + 32),
    # d:f16 s:f16 + 32 int8
    GGMLType.Q8_1: TypeTraits(QK8_1, 2 + 2 + 32),
    # 16 scale/min bytes + 64B 2-bit quants + d:f16 + dmin:f16
    GGMLType.Q2_K: TypeTraits(QK_K, 16 + QK_K // 4 + 2 + 2),
    # 32B hmask + 64B 2-bit + 12B packed 6-bit scales + d:f16
    GGMLType.Q3_K: TypeTraits(QK_K, QK_K // 8 + QK_K // 4 + 12 + 2),
    # d:f16 dmin:f16 + 12B packed 6-bit scales/mins + 128B nibbles
    GGMLType.Q4_K: TypeTraits(QK_K, 2 + 2 + K_SCALE_SIZE + QK_K // 2),
    # Q4_K + 32B high bits
    GGMLType.Q5_K: TypeTraits(QK_K, 2 + 2 + K_SCALE_SIZE + QK_K // 8 + QK_K // 2),
    # 128B low nibbles + 64B high 2-bits + 16 int8 scales + d:f16
    GGMLType.Q6_K: TypeTraits(QK_K, QK_K // 2 + QK_K // 4 + QK_K // 16 + 2),
    # d:f32 + 256 int8 + 16 int16 bsums
    GGMLType.Q8_K: TypeTraits(QK_K, 4 + QK_K + QK_K // 16 * 2),
    # d:f16 + 16B nibble codebook indices (non-linear 4-bit)
    GGMLType.IQ4_NL: TypeTraits(32, 2 + 16),
    # d:f16 + scales_h:u16 + scales_l[4] + 128B nibbles
    GGMLType.IQ4_XS: TypeTraits(QK_K, 2 + 2 + 4 + QK_K // 2),
    # i-quant geometries (cataloged so mixed files open; decode lands later)
    GGMLType.IQ2_XXS: TypeTraits(QK_K, 2 + QK_K // 8 * 2),
    GGMLType.IQ2_XS: TypeTraits(QK_K, 2 + QK_K // 8 * 2 + QK_K // 32),
    GGMLType.IQ2_S: TypeTraits(QK_K, 2 + QK_K // 4 + QK_K // 16),
    GGMLType.IQ3_XXS: TypeTraits(QK_K, 2 + QK_K // 4 + QK_K // 8),
    GGMLType.IQ3_S: TypeTraits(QK_K, 2 + QK_K // 4 + QK_K // 8 + QK_K // 32 + 4),
    GGMLType.IQ1_S: TypeTraits(QK_K, 2 + QK_K // 8 + QK_K // 16),
    GGMLType.IQ1_M: TypeTraits(QK_K, QK_K // 8 + QK_K // 16 + QK_K // 32),
}


def ggml_type_name(t: int) -> str:
    try:
        return GGMLType(t).name
    except ValueError:
        return f"UNKNOWN({t})"


def tensor_nbytes(ggml_type: GGMLType, n_elements: int) -> int:
    """On-disk byte size of a tensor with `n_elements` elements."""
    tr = TYPE_TRAITS[ggml_type]
    if n_elements % tr.block_size != 0:
        raise ValueError(
            f"{ggml_type.name}: n_elements {n_elements} not divisible by "
            f"block size {tr.block_size}"
        )
    return n_elements // tr.block_size * tr.type_size
