"""QTensor: the TPU-native device representation of quantized weights.

ggml's block formats are byte-packed for CPU SIMD (nibble interleaves, 6-bit
packed scale fields — see /root/reference/cpp/ggml/src/ggml-common.h).  On TPU
we want lane-aligned (last dim multiple of 128) planar arrays that a Pallas
kernel can unpack with a shift/mask on the VPU while the MXU does the matmul.

At load time every GGUF block format is *losslessly* repacked into:

    value[r, c] = q[r, c] * scales[r, c // group]  -  mins[r, c // group]

with payload ``qw`` either

    kind="i4p"  uint8 [out, in // 2]  two 4-bit codes per byte, split-half
                packing: byte b → element b (low nibble) and element
                b + in/2 (high nibble), see _pack_nibbles_planar — kernels
                unpack with two mask ops and no lane shuffles
    kind="i8"   int8  [out, in]
    kind="i4t"/"i8t"  the same payloads stored K-major ([in//2, out] /
                [in, out], transpose_qtensor): scales then vary along
                SUBLANES of the weight tile, so the kernels expand them
                with a sublane broadcast+reshape instead of the one-hot
                MXU dot the lane-major layout needs (which costs
                N*(K/G)*K MACs — it measurably dominated every native-
                quant matvec; tools/tqmm_probe.py).  The serving loader
                transposes at load; lane-major stays for sharded params
                and MoE expert stacks.
    kind="dense" bf16/f32 [out, in]   (no scales)

``scales``/``mins`` are float32 (exact: ggml scale products like f16(d) * 6-bit
int need 17 mantissa bits, so f32 reproduces dequantization bit-for-bit).
Exception: transposed kinds may carry bf16 scale planes (``compact_scales``)
— the t-kernels round scales to bf16 in-kernel anyway and widen the slice to
f32 before the sublane broadcast, so the kernel path stays bit-identical
while streaming ~10% fewer bytes (set BT_SCALE_BF16=0 to keep f32).

Format mapping (group = elements per scale):
    Q4_0 → i4p g32 (scale=d,      min=8d)       Q4_1 → i4p g32 (scale=d, min=-m)
    Q4_K → i4p g32 (scale=d*sc,   min=dmin*m)   Q2_K → i4p g16 (affine)
    Q3_K → i4p g16 (q+4, min=4*scale)
    Q5_0/Q5_1/Q5_K → i8 (5-bit codes)           Q6_K → i8 g16 symmetric
    Q8_0 → i8 g32 symmetric                     IQ4_NL/XS → i8 codebook values
    F32/F16/BF16 → dense
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Any, Optional

import numpy as np

try:  # allow pure-numpy use (tools, tests) without jax installed/initialized
    import jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jax = None
    jnp = None

from booster_tpu.gguf.constants import GGMLType, QK_K, TYPE_TRAITS
from booster_tpu.quant import formats as F
from booster_tpu.quant.formats import IQ4NL_KVALUES, _blocks, _f16, _kscales_6bit


@dataclass
class QTensor:
    """Quantized 2-D weight [out_features, in_features] in TPU layout.

    Arrays may be numpy (host) or jax (device).  Registered as a JAX pytree so
    it can flow through jit/pjit/shard_map directly.
    """

    kind: str  # "i4p" | "i8" | "i4t" | "i8t" | "i8c" | "dense"
    qw: Any  # payload, see module docstring
    scales: Optional[Any]  # f32 [out, in//group] or None for dense
    mins: Optional[Any]  # f32 [out, in//group] or None
    group: int  # elements per scale group
    shape: tuple[int, int]  # logical (out, in) before padding
    source_type: GGMLType  # original GGUF type
    zero: int = 0  # integer zero point: value = (q - zero) * scale - min
    # traced i32 layer index into stacked ([L, ...]) payloads — set inside a
    # layer scan so the matmul kernels select the layer via scalar-prefetch
    # index maps instead of an XLA dynamic-slice, which MATERIALIZES a copy
    # of the whole layer's weights before every pallas_call (measured 2x:
    # 656 -> 325 GB/s, tools/slice_probe.py).  The weight analog of the
    # stacked-cache design in ops/pallas_attention.py.
    layer: Any = None

    @property
    def out_features(self) -> int:
        return self.shape[0]

    @property
    def in_features(self) -> int:
        return self.shape[1]

    @property
    def prepared(self) -> bool:
        """True when `scales` holds the kernel-block form (see
        prepare_kernel_scales): one extra trailing axis vs the payload."""
        return (self.scales is not None
                and self.scales.ndim == self.qw.ndim + 1)

    @property
    def transposed(self) -> bool:
        return self.kind in ("i4t", "i8t", "i8c")

    @property
    def scale_rows(self) -> int:
        """Scale rows per group column (2 for split-half nibble payloads —
        one row per half — else 1), excluding min rows."""
        return 2 if self.kind in ("i4p", "i4t") else 1

    def astype_device(self):
        """Move payload arrays to jax (device) arrays."""
        to = jnp.asarray
        return replace(
            self,
            qw=to(self.qw),
            scales=None if self.scales is None else to(self.scales),
            mins=None if self.mins is None else to(self.mins),
        )

    @property
    def nbytes(self) -> int:
        n = self.qw.size * self.qw.dtype.itemsize
        if self.scales is not None:
            n += self.scales.size * self.scales.dtype.itemsize
        if self.mins is not None:
            n += self.mins.size * self.mins.dtype.itemsize
        return int(n)


def repack_weights(qt: QTensor, mode: str) -> QTensor:
    """Runtime weight-format repack (serving speed/capacity dial).

    Decode matvecs are VPU-dequant bound for 4-bit payloads (~146 GB/s
    effective vs 810 GB/s raw HBM reads and 604 GB/s dense bf16 streaming —
    tools/kernel_micro.py on v5e), so when HBM has headroom it is strictly
    faster to hold the weights wider in memory:

      "bf16": exact dequantization to a dense bf16 matrix (MXU consumes it
              directly; 2 bytes/weight).
      "i8":   i4p nibbles widened to int8 with the SAME group scales/mins —
              bit-exact math, half the VPU unpack work, 1 byte/weight.
      "native": unchanged.

    The quality is identical in every mode (the dequantized values are the
    same numbers); only HBM footprint and decode speed differ.  Reference
    analog: llama.cpp's runtime aarch64 repack (ggml-aarch64.c) — a
    load-time layout change for the hardware's preferred consumption form.
    """
    if mode in ("native", None) or qt.kind == "dense":
        return qt
    if mode == "bf16":
        w = dequantize_qtensor_np(qt)
        if jnp is not None:
            w = w.astype(jnp.bfloat16)
        return QTensor("dense", w, None, None, 1, qt.shape, qt.source_type)
    if mode == "i8":
        if qt.kind != "i4p":
            return qt
        qw = np.asarray(qt.qw)
        half = qw.shape[-1]
        out = np.empty(qw.shape[:-1] + (2 * half,), np.int8)
        z = int(qt.zero)
        out[..., :half] = (qw & 0x0F).astype(np.int16) - z
        out[..., half:] = (qw >> 4).astype(np.int16) - z
        return replace(qt, kind="i8", qw=out, zero=0)
    if mode == "i8c":
        return channel_quantize(qt)
    raise ValueError(f"unknown weights mode {mode!r}")


def channel_quantize(qt: QTensor) -> QTensor:
    """Per-channel (per-output-row) symmetric int8 repack, K-major: the
    TPU mmq analog (/root/reference/cpp/ggml/src/ggml-cuda/mmq.cu role).

    One scale per output channel lets the matmul be ONE mixed bf16×int8
    MXU dot (no per-element dequant pass, no activation quantization) with
    a rank-1 output rescale — the fastest large-batch form that still
    streams 1 byte/weight.  LOSSY vs the group-quantized source: the
    channel scale is the max of the row's group scales, so narrow-range
    groups lose low bits (bounded; quantified in tests/test_i8c.py and
    tools/quant_quality.py --weights i8c).  Shape: qw [K, N] i8,
    scales [1, N] f32, group = K."""
    if qt.kind == "dense":
        return qt
    N, K = qt.shape
    w = dequantize_qtensor_np(qt).astype(np.float32)  # [N, K]
    s = np.abs(w).max(axis=1, keepdims=True) / 127.0  # [N, 1]
    s = np.maximum(s, 1e-12)
    q = np.rint(w / s).astype(np.int8)
    return QTensor("i8c", np.ascontiguousarray(q.T),
                   np.ascontiguousarray(s.reshape(1, N).astype(np.float32)),
                   None, K, qt.shape, qt.source_type)


def transpose_qtensor(qt: QTensor) -> QTensor:
    """Lane-major → K-major storage (i4p→i4t, i8→i8t), host-side, exact.

    qw [..., N, Kp] → [..., Kp, N]; prepared scales [..., N, R, SG] →
    [..., R, SG, N].  The t-kernels in ops/pallas_qmm.py consume this form;
    see the module docstring for why (sublane scale expansion beats the
    lane-major one-hot expander dot).  Requires prepared scales (or dense /
    no scales)."""
    if qt.kind in ("dense", "i4t", "i8t"):
        return qt
    if qt.kind not in ("i4p", "i8"):
        raise ValueError(f"cannot transpose kind {qt.kind!r}")
    if qt.scales is not None and not qt.prepared:
        qt = prepare_kernel_scales(qt)
    qw = np.ascontiguousarray(np.swapaxes(np.asarray(qt.qw), -1, -2))
    s = qt.scales
    if s is not None:
        s = np.asarray(s)  # [..., N, R, SG] → [..., R, SG, N]
        s = np.ascontiguousarray(np.moveaxis(s, -3, -1))
    return replace(qt, kind=qt.kind[:2] + "t", qw=qw, scales=s)


def compact_scales(qt: QTensor) -> QTensor:
    """K-major scale (+folded-min) rows → bfloat16 storage.

    The t-kernels in ops/pallas_qmm.py round scales to bf16 in-kernel before
    the dequant multiply, so storing them bf16 is bit-identical through the
    kernel while halving the scale-plane HBM traffic (q4_0 G=32: scales are
    20% of the streamed bytes; affine K-formats more).  Opt-in — the loader
    applies it after transpose_qtensor so transpose itself stays a lossless
    relayout (tests/test_pallas_qmm.py roundtrip contract).

    Non-kernel consumers of a compacted tensor (the qlinear XLA fallback,
    dequantize_qtensor[_np]) dequantize with the bf16-rounded scales — the
    same rounding the kernel applies, but a small numerics shift vs the
    pre-compaction f32-scale fallback output."""
    if not qt.transposed or qt.scales is None:
        return qt
    import ml_dtypes
    s = np.asarray(qt.scales)
    if s.dtype == ml_dtypes.bfloat16:
        return qt
    return replace(qt, scales=s.astype(ml_dtypes.bfloat16))


def untranspose_qtensor(qt: QTensor) -> QTensor:
    """Inverse of transpose_qtensor (works on numpy or jax arrays — used by
    the dequantize fallback paths)."""
    if not qt.transposed:
        return qt
    xp = np if isinstance(qt.qw, np.ndarray) else jnp
    qw = xp.swapaxes(qt.qw, -1, -2)
    s = qt.scales
    if qt.kind == "i8c":  # per-channel: scales [.., 1, N] → [.., N, 1]
        return replace(qt, kind="i8", qw=qw,
                       scales=None if s is None else xp.swapaxes(s, -1, -2))
    if s is not None:
        s = xp.moveaxis(s, -1, -3)  # [..., R, SG, N] → [..., N, R, SG]
    return replace(qt, kind="i4p" if qt.kind == "i4t" else "i8", qw=qw, scales=s)


def prepare_kernel_scales(qt: QTensor) -> QTensor:
    """Pre-shape `scales` (and fold `mins`) into the Pallas kernels' operand
    layout: i4p → [..., N, 2(+2), K/(2G)], i8 → [..., N, 1(+1), K/G] (the
    +rows hold mins when affine).

    The fused-matmul kernels would otherwise reshape+concatenate per call —
    inside a layer scan that materializes multi-MB layout copies of the
    scale planes every decode step (measured; see tools/ablate_decode.py).
    Pre-shaping at load makes each layer's slice a zero-copy view of the
    stacked array.  Done once, host-side, by the model loader."""
    if qt.kind not in ("i4p", "i8") or qt.scales is None or qt.prepared:
        return qt
    s = np.asarray(qt.scales)
    rows = 2 if qt.kind == "i4p" else 1
    sg = s.shape[-1] // rows
    s3 = s.reshape(*s.shape[:-1], rows, sg)
    if qt.mins is not None:
        m3 = np.asarray(qt.mins).reshape(*s.shape[:-1], rows, sg)
        s3 = np.concatenate([s3, m3], axis=-2)
    return replace(qt, scales=np.ascontiguousarray(s3), mins=None)


def flat_scales(qt: QTensor):
    """(scales [..., N, K/G], mins [..., N, K/G] | None) for either storage
    form — the inverse view of prepare_kernel_scales (works on numpy and jax
    arrays alike; reshapes/slices only)."""
    if qt.transposed:
        qt = untranspose_qtensor(qt)
    s = qt.scales
    if s is None or not qt.prepared:
        return s, qt.mins
    rows = qt.scale_rows
    if s.shape[-2] == rows:  # no mins folded
        return s.reshape(*s.shape[:-2], -1), None
    sc = s[..., :rows, :].reshape(*s.shape[:-2], -1)
    mn = s[..., rows:, :].reshape(*s.shape[:-2], -1)
    return sc, mn


def kernel_scales(qt: QTensor):
    """(s3 [N, R, sg] — or [R, sg, N] for transposed kinds — and has_mins)
    in the kernels' operand layout, building it in-graph when the tensor was
    not prepared at load."""
    rows = qt.scale_rows
    if qt.transposed:
        s3 = qt.scales
        return s3, s3.shape[-3] == 2 * rows
    if qt.prepared:
        s3 = qt.scales
        return s3, s3.shape[-2] == 2 * rows
    sg = qt.scales.shape[-1] // rows
    s3 = qt.scales.reshape(*qt.scales.shape[:-1], rows, sg)
    if qt.mins is not None:
        m3 = qt.mins.reshape(*qt.mins.shape[:-1], rows, sg)
        s3 = jnp.concatenate([jnp.asarray(s3), jnp.asarray(m3)], axis=-2)
        return s3, True
    return s3, False


def _tree_flatten(qt: QTensor):
    children = (qt.qw, qt.scales, qt.mins, qt.layer)
    aux = (qt.kind, qt.group, qt.shape, qt.source_type, qt.zero)
    return children, aux


def _tree_unflatten(aux, children):
    kind, group, shape, source_type, zero = aux
    qw, scales, mins, layer = children
    return QTensor(kind, qw, scales, mins, group, shape, source_type, zero,
                   layer)


if jax is not None:
    jax.tree_util.register_pytree_node(QTensor, _tree_flatten, _tree_unflatten)


# --------------------------------------------------------------------------
# Repacking: GGUF raw bytes -> QTensor (host-side numpy, done once at load)
# --------------------------------------------------------------------------


def _pack_nibbles_planar(q: np.ndarray) -> np.ndarray:
    """[rows, K] uint8 (values 0..15) → [rows, K//2] split-half packing:
    byte j = elem j (low nibble) | elem j + K/2 (high nibble).

    This layout lets kernels unpack with two mask ops and *no lane shuffles*:
    `lo = p & 0xF` covers columns [0, K/2), `hi = p >> 4` covers [K/2, K).
    """
    assert q.shape[-1] % 2 == 0
    half = q.shape[-1] // 2
    return (q[..., :half] | (q[..., half:] << 4)).astype(np.uint8)


def unpack_nibbles_planar(p: np.ndarray) -> np.ndarray:
    """Inverse of _pack_nibbles_planar (numpy)."""
    return np.concatenate([p & 0x0F, p >> 4], axis=-1).astype(np.uint8)


def _repack_q4_0(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    from booster_tpu.quant import native

    nr = native.repack_q4_0(raw, out_f, in_f)
    if nr is not None:
        qw, d = nr
        return QTensor("i4p", qw, d, None, 32, (out_f, in_f), GGMLType.Q4_0, zero=8)
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q4_0].type_size)
    d = _f16(b[:, 0:2]).reshape(out_f, in_f // 32)
    qs = b[:, 2:18]
    q = np.concatenate([(qs & 0x0F), (qs >> 4)], axis=1)  # block order 0..31
    q = q.reshape(out_f, in_f)
    return QTensor("i4p", _pack_nibbles_planar(q), d, None, 32, (out_f, in_f),
                   GGMLType.Q4_0, zero=8)


def _repack_q4_1(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q4_1].type_size)
    d = _f16(b[:, 0:2]).reshape(out_f, in_f // 32)
    m = _f16(b[:, 2:4]).reshape(out_f, in_f // 32)
    qs = b[:, 4:20]
    q = np.concatenate([(qs & 0x0F), (qs >> 4)], axis=1).reshape(out_f, in_f)
    return QTensor("i4p", _pack_nibbles_planar(q), d, -m, 32, (out_f, in_f), GGMLType.Q4_1)


def _repack_q8_0(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    from booster_tpu.quant import native

    nr = native.repack_q8_0(raw, out_f, in_f)
    if nr is not None:
        qw, d = nr
        return QTensor("i8", qw, d, None, 32, (out_f, in_f), GGMLType.Q8_0)
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q8_0].type_size)
    d = _f16(b[:, 0:2]).reshape(out_f, in_f // 32)
    q = b[:, 2:34].view(np.int8).reshape(out_f, in_f).copy()
    return QTensor("i8", q, d, None, 32, (out_f, in_f), GGMLType.Q8_0)


def _repack_q5_0(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q5_0].type_size)
    d = _f16(b[:, 0:2]).reshape(out_f, in_f // 32)
    h = F._q5_high_bits(b[:, 2:6])
    qs = b[:, 6:22]
    lo = (qs & 0x0F) | (h[:, :16] << 4)
    hi = (qs >> 4) | (h[:, 16:] << 4)
    q = (np.concatenate([lo, hi], axis=1).astype(np.int16) - 16).astype(np.int8)
    return QTensor("i8", q.reshape(out_f, in_f), d, None, 32, (out_f, in_f), GGMLType.Q5_0)


def _repack_q5_1(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q5_1].type_size)
    d = _f16(b[:, 0:2]).reshape(out_f, in_f // 32)
    m = _f16(b[:, 2:4]).reshape(out_f, in_f // 32)
    h = F._q5_high_bits(b[:, 4:8])
    qs = b[:, 8:24]
    lo = (qs & 0x0F) | (h[:, :16] << 4)
    hi = (qs >> 4) | (h[:, 16:] << 4)
    q = np.concatenate([lo, hi], axis=1).astype(np.int8)
    return QTensor("i8", q.reshape(out_f, in_f), d, -m, 32, (out_f, in_f), GGMLType.Q5_1)


def _repack_q4_k(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    from booster_tpu.quant import native

    nr = native.repack_q4_k(raw, out_f, in_f)
    if nr is not None:
        qw, scales, mins = nr
        return QTensor("i4p", qw, scales, mins, 32, (out_f, in_f), GGMLType.Q4_K)
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q4_K].type_size)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _kscales_6bit(b[:, 4:16])
    scales = (d * sc).reshape(out_f, in_f // 32).astype(np.float32)
    mins = (dmin * mn).reshape(out_f, in_f // 32).astype(np.float32)
    qs = b[:, 16:144].reshape(-1, 4, 32)
    q = np.stack([(qs & 0x0F), (qs >> 4)], axis=2).reshape(-1, 256)  # element order
    q = q.reshape(out_f, in_f)
    return QTensor("i4p", _pack_nibbles_planar(q), scales, mins, 32, (out_f, in_f), GGMLType.Q4_K)


def _repack_q5_k(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    from booster_tpu.quant import native

    nr = native.repack_q5_k(raw, out_f, in_f)
    if nr is not None:
        qw, scales, mins = nr
        return QTensor("i8", qw, scales, mins, 32, (out_f, in_f), GGMLType.Q5_K)
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q5_K].type_size)
    d = _f16(b[:, 0:2])
    dmin = _f16(b[:, 2:4])
    sc, mn = _kscales_6bit(b[:, 4:16])
    scales = (d * sc).reshape(out_f, in_f // 32).astype(np.float32)
    mins = (dmin * mn).reshape(out_f, in_f // 32).astype(np.float32)
    qh = b[:, 16:48]
    qs = b[:, 48:176].reshape(-1, 4, 32)
    j = np.arange(4)
    u1 = (1 << (2 * j)).astype(np.uint8)[None, :, None]
    u2 = (1 << (2 * j + 1)).astype(np.uint8)[None, :, None]
    qh4 = qh[:, None, :]
    lo = (qs & 0x0F) + np.where((qh4 & u1) != 0, 16, 0).astype(np.uint8)
    hi = (qs >> 4) + np.where((qh4 & u2) != 0, 16, 0).astype(np.uint8)
    q = np.stack([lo, hi], axis=2).reshape(-1, 256).astype(np.int8).reshape(out_f, in_f)
    return QTensor("i8", q, scales, mins, 32, (out_f, in_f), GGMLType.Q5_K)


def _repack_q6_k(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    from booster_tpu.quant import native

    nr = native.repack_q6_k(raw, out_f, in_f)
    if nr is not None:
        qw, scales = nr
        return QTensor("i8", qw, scales, None, 16, (out_f, in_f), GGMLType.Q6_K)
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q6_K].type_size)
    ql = b[:, 0:128].reshape(-1, 2, 64)
    qh = b[:, 128:192].reshape(-1, 2, 32)
    sc = b[:, 192:208].view(np.int8).reshape(-1, 16).astype(np.float32)
    d = _f16(b[:, 208:210])
    l = np.arange(32)
    q1 = (ql[:, :, l] & 0x0F) | (((qh[:, :, l] >> 0) & 3) << 4)
    q2 = (ql[:, :, l + 32] & 0x0F) | (((qh[:, :, l] >> 2) & 3) << 4)
    q3 = (ql[:, :, l] >> 4) | (((qh[:, :, l] >> 4) & 3) << 4)
    q4 = (ql[:, :, l + 32] >> 4) | (((qh[:, :, l] >> 6) & 3) << 4)
    q = np.concatenate([q1, q2, q3, q4], axis=2).astype(np.int16) - 32
    q = q.reshape(-1, 256).astype(np.int8).reshape(out_f, in_f)
    scales = (d * sc).reshape(out_f, in_f // 16).astype(np.float32)
    return QTensor("i8", q, scales, None, 16, (out_f, in_f), GGMLType.Q6_K)


def _repack_q2_k(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q2_K].type_size)
    scales8 = b[:, 0:16]
    qs = b[:, 16:80].reshape(-1, 2, 32)
    d = _f16(b[:, 80:82])
    dmin = _f16(b[:, 82:84])
    shift = (2 * np.arange(4))[None, None, :, None]
    q = ((qs[:, :, None, :] >> shift) & 3).reshape(-1, 256).astype(np.uint8)
    scales = (d * (scales8 & 0x0F).astype(np.float32)).reshape(out_f, in_f // 16)
    mins = (dmin * (scales8 >> 4).astype(np.float32)).reshape(out_f, in_f // 16)
    q = q.reshape(out_f, in_f)
    return QTensor("i4p", _pack_nibbles_planar(q), scales, mins, 16, (out_f, in_f), GGMLType.Q2_K)


def _repack_q3_k(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    b = _blocks(raw, TYPE_TRAITS[GGMLType.Q3_K].type_size)
    hmask = b[:, 0:32]
    qs = b[:, 32:96].reshape(-1, 2, 32)
    packed = b[:, 96:108]
    d = _f16(b[:, 108:110])
    a = np.ascontiguousarray(packed).view("<u4").astype(np.uint32)
    tmp = a[:, 2]
    out = np.empty((packed.shape[0], 4), dtype=np.uint32)
    out[:, 0] = (a[:, 0] & 0x0F0F0F0F) | (((tmp >> 0) & 0x03030303) << 4)
    out[:, 1] = (a[:, 1] & 0x0F0F0F0F) | (((tmp >> 2) & 0x03030303) << 4)
    out[:, 2] = ((a[:, 0] >> 4) & 0x0F0F0F0F) | (((tmp >> 4) & 0x03030303) << 4)
    out[:, 3] = ((a[:, 1] >> 4) & 0x0F0F0F0F) | (((tmp >> 6) & 0x03030303) << 4)
    sc6 = out.view(np.int8).reshape(-1, 16).astype(np.float32) - 32
    shift = (2 * np.arange(4))[None, None, :, None]
    q2 = ((qs[:, :, None, :] >> shift) & 3).astype(np.uint8)  # [n,2,4,32]
    bit = (4 * np.arange(2))[None, :, None, None] + np.arange(4)[None, None, :, None]
    hb = ((hmask[:, None, None, :] >> bit) & 1).astype(np.uint8)
    # store q' = q2 + 4*hbit ∈ 0..7; value = scale*(q' ) - 4*scale
    qp = (q2 + (hb << 2)).reshape(-1, 256).reshape(out_f, in_f)
    scales = (d * sc6).reshape(out_f, in_f // 16).astype(np.float32)
    return QTensor("i4p", _pack_nibbles_planar(qp), scales, None, 16, (out_f, in_f),
                   GGMLType.Q3_K, zero=4)


def _repack_iq4_nl(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    b = _blocks(raw, TYPE_TRAITS[GGMLType.IQ4_NL].type_size)
    d = _f16(b[:, 0:2]).reshape(out_f, in_f // 32)
    qs = b[:, 2:18]
    q = np.concatenate([IQ4NL_KVALUES[qs & 0x0F], IQ4NL_KVALUES[qs >> 4]], axis=1)
    return QTensor("i8", q.reshape(out_f, in_f), d, None, 32, (out_f, in_f), GGMLType.IQ4_NL)


def _repack_iq4_xs(raw: np.ndarray, out_f: int, in_f: int) -> QTensor:
    b = _blocks(raw, TYPE_TRAITS[GGMLType.IQ4_XS].type_size)
    d = _f16(b[:, 0:2])
    scales_h = np.ascontiguousarray(b[:, 2:4]).view("<u2").astype(np.uint32)
    scales_l = b[:, 4:8]
    qs = b[:, 8:136].reshape(-1, 8, 16)
    ib = np.arange(8)
    ls_l = (scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0x0F
    ls_h = ((scales_h >> (2 * ib)) & 3).astype(np.uint8)
    ls = (ls_l | (ls_h << 4)).astype(np.float32) - 32
    q = np.concatenate([IQ4NL_KVALUES[qs & 0x0F], IQ4NL_KVALUES[qs >> 4]], axis=2)
    q = q.reshape(-1, 256).reshape(out_f, in_f)
    scales = (d * ls).reshape(out_f, in_f // 32).astype(np.float32)
    return QTensor("i8", q, scales, None, 32, (out_f, in_f), GGMLType.IQ4_XS)


_REPACK = {
    GGMLType.Q4_0: _repack_q4_0,
    GGMLType.Q4_1: _repack_q4_1,
    GGMLType.Q5_0: _repack_q5_0,
    GGMLType.Q5_1: _repack_q5_1,
    GGMLType.Q8_0: _repack_q8_0,
    GGMLType.Q2_K: _repack_q2_k,
    GGMLType.Q3_K: _repack_q3_k,
    GGMLType.Q4_K: _repack_q4_k,
    GGMLType.Q5_K: _repack_q5_k,
    GGMLType.Q6_K: _repack_q6_k,
    GGMLType.IQ4_NL: _repack_iq4_nl,
    GGMLType.IQ4_XS: _repack_iq4_xs,
}


def repack_gguf_tensor(
    raw: np.ndarray | bytes,
    ggml_type: GGMLType,
    shape: tuple[int, ...],
    dense_dtype: str = "bfloat16",
) -> QTensor:
    """Raw GGUF tensor bytes → QTensor in TPU layout (host numpy arrays).

    `shape` is the logical numpy shape; tensors with >2 dims are flattened to
    [prod(leading), last] (weights are 2-D in practice).
    """
    if len(shape) == 1:
        out_f, in_f = 1, shape[0]
    else:
        in_f = shape[-1]
        out_f = 1
        for s in shape[:-1]:
            out_f *= s
    fn = _REPACK.get(ggml_type)
    if fn is None:
        # dense fallback: full dequantization
        w = F.dequantize(raw, ggml_type, shape=(out_f, in_f))
        if jnp is not None and dense_dtype == "bfloat16":
            w = w.astype(jnp.bfloat16) if hasattr(jnp, "bfloat16") else w
        return QTensor("dense", w, None, None, 1, (out_f, in_f), ggml_type)
    raw = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, (bytes, bytearray)) else raw
    return fn(raw.view(np.uint8).ravel(), out_f, in_f)


# --------------------------------------------------------------------------
# Device-side dequantization (jnp reference path; Pallas kernels in ops/)
# --------------------------------------------------------------------------


def dequantize_qtensor_np(qt: QTensor) -> np.ndarray:
    """Host-side float32 dequantization (numpy), for tests and golden checks."""
    if qt.kind == "dense":
        return np.asarray(qt.qw, dtype=np.float32)
    if qt.transposed:
        qt = untranspose_qtensor(qt)
        qt = replace(qt, qw=np.asarray(qt.qw),
                     scales=None if qt.scales is None else np.asarray(qt.scales))
    if qt.kind == "i4p":
        q = unpack_nibbles_planar(np.asarray(qt.qw)).astype(np.float32)
    else:
        q = np.asarray(qt.qw, dtype=np.float32)
    out_f, in_f = qt.shape
    if qt.zero:
        q = q - float(qt.zero)
    sc, mn = flat_scales(qt)
    s = np.repeat(np.asarray(sc, dtype=np.float32), qt.group, axis=1)
    v = q.reshape(out_f, in_f) * s
    if mn is not None:
        v = v - np.repeat(np.asarray(mn, dtype=np.float32), qt.group, axis=1)
    return v


def dequantize_qtensor(qt: QTensor, dtype=None):
    """Device-side dequantization with jnp (XLA fallback path for matmuls)."""
    dtype = dtype or jnp.bfloat16
    if qt.layer is not None:  # stacked view: resolve the layer (copies —
        # fallback only; the kernels select the layer via index maps)
        def idx(a):
            return None if a is None else jax.lax.dynamic_index_in_dim(
                jnp.asarray(a), qt.layer, 0, keepdims=False)

        qt = replace(qt, qw=idx(qt.qw), scales=idx(qt.scales),
                     mins=idx(qt.mins), layer=None)
    if qt.kind == "dense":
        return jnp.asarray(qt.qw, dtype=dtype)
    if qt.transposed:
        qt = untranspose_qtensor(
            replace(qt, qw=jnp.asarray(qt.qw),
                    scales=None if qt.scales is None else jnp.asarray(qt.scales)))
    out_f, in_f = qt.shape
    if qt.kind == "i4p":
        p = jnp.asarray(qt.qw)
        lo = (p & 0x0F).astype(jnp.float32)
        hi = (p >> 4).astype(jnp.float32)
        q = jnp.concatenate([lo, hi], axis=-1).reshape(out_f, in_f)
    else:
        q = jnp.asarray(qt.qw).astype(jnp.float32)
    g = qt.group
    if qt.zero:
        q = q - float(qt.zero)
    sc, mn = flat_scales(qt)
    v = (q.reshape(out_f, in_f // g, g) * jnp.asarray(sc)[:, :, None])
    if mn is not None:
        v = v - jnp.asarray(mn)[:, :, None]
    return v.reshape(out_f, in_f).astype(dtype)
