"""Load a GGUF model into device-ready params (QTensor pytree, layers stacked).

Reference analog: llm_load_tensors (/root/reference/cpp/src/llama.cpp:5899) —
there, per-layer tensors are assigned to device buffers; here, every weight is
repacked to the TPU QTensor layout, stacked across layers on a leading axis
(for lax.scan), and placed on device (optionally with a NamedSharding per
tensor role, supplied by booster_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from booster_tpu.gguf import GGMLType, GGUFReader
from booster_tpu.models.config import ModelConfig
from booster_tpu.ops.rope import (
    ROPE_NEOX,
    ROPE_NORM,
    rope_inv_freq,
    yarn_params,
)
from booster_tpu.ops.pallas_qmm import transposable as _transposable
from booster_tpu.quant import dequantize, repack_gguf_tensor
from booster_tpu.quant.qtensor import (
    QTensor,
    compact_scales,
    prepare_kernel_scales,
    repack_weights,
    transpose_qtensor,
)
from booster_tpu.tokenizer import Tokenizer

log = logging.getLogger(__name__)

# GGUF layer-tensor name → param key.  (naming: gguf.py TENSOR_NAMES upstream)
_LAYER_MAP = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_output.weight": "wo",
    "attn_q.bias": "bq",
    "attn_k.bias": "bk",
    "attn_v.bias": "bv",
    "attn_q_norm.weight": "q_norm",
    "attn_k_norm.weight": "k_norm",
    "post_attention_norm.weight": "post_attn_norm",
    "attn_post_norm.weight": "post_attn_norm",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
    "post_ffw_norm.weight": "post_ffn_norm",
    "ffn_post_norm.weight": "post_ffn_norm",
    "ffn_gate_inp.weight": "router",
    "ffn_gate_exps.weight": "gate_exps",
    "ffn_up_exps.weight": "up_exps",
    "ffn_down_exps.weight": "down_exps",
    # LayerNorm-family archs (gpt2/falcon/phi2/mpt/starcoder/command-r)
    "attn_norm.bias": "attn_norm_b",
    "ffn_norm.bias": "ffn_norm_b",
    "attn_output.bias": "bo",
    "ffn_up.bias": "b_up",
    "ffn_gate.bias": "b_gate",  # jais SwiGLU biases
    "ffn_down.bias": "b_down",
    # bert encoder (post-norm residuals)
    "attn_output_norm.weight": "attn_out_norm",
    "attn_output_norm.bias": "attn_out_norm_b",
    "layer_output_norm.weight": "layer_out_norm",
    "layer_output_norm.bias": "layer_out_norm_b",
    # jina-bert-v2 extras: optional second post-attn norm + q/k norm biases
    "attn_norm_2.weight": "attn_norm_2",
    "attn_norm_2.bias": "attn_norm_2_b",
    "attn_q_norm.bias": "q_norm_b",
    "attn_k_norm.bias": "k_norm_b",
    # deepseek2 MLA + shared experts
    "attn_q_a.weight": "wq_a",
    "attn_q_a_norm.weight": "q_a_norm",
    "attn_q_b.weight": "wq_b",
    "attn_kv_a_mqa.weight": "kv_a_mqa",
    "attn_kv_a_norm.weight": "kv_a_norm",
    "attn_kv_b.weight": "kv_b",
    "ffn_gate_inp_shexp.weight": "shexp_gate",
    "ffn_gate_shexp.weight": "gate_shexp",
    "ffn_up_shexp.weight": "up_shexp",
    "ffn_down_shexp.weight": "down_shexp",
    # bitnet (build_bitnet, llama.cpp:13070): rms sub-norms around the out
    # projections + explicit per-tensor weight scales ({1} tensors)
    "attn_sub_norm.weight": "attn_sub_norm",
    "ffn_sub_norm.weight": "ffn_sub_norm",
    "attn_q.scale": "wq_scale",
    "attn_k.scale": "wk_scale",
    "attn_v.scale": "wv_scale",
    "attn_output.scale": "wo_scale",
    "ffn_gate.scale": "w_gate_scale",
    "ffn_up.scale": "w_up_scale",
    "ffn_down.scale": "w_down_scale",
    # arctic (build_arctic, llama.cpp:12710): parallel-residual MoE norm
    "ffn_norm_exps.weight": "ffn_norm_exps",
    # mamba SSM blocks
    "ssm_in.weight": "ssm_in",
    "ssm_conv1d.weight": "conv_w",
    "ssm_conv1d.bias": "conv_b",
    "ssm_x.weight": "ssm_x",
    "ssm_dt.weight": "ssm_dt",
    "ssm_dt.bias": "ssm_dt_b",
    "ssm_a": "ssm_a",
    "ssm_d": "ssm_d",
    "ssm_out.weight": "ssm_out",
}

# small dense per-layer tensors loaded as plain arrays (not QTensors)
_DENSE_KEYS = {"conv_w", "conv_b", "ssm_a", "ssm_d", "ssm_dt_b"}

# T5 encoder layer tensors (enc.blk.%d.*, llama.cpp:1253-1262)
_T5_ENC_MAP = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "wq",
    "attn_k.weight": "wk",
    "attn_v.weight": "wv",
    "attn_o.weight": "wo",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "w_gate",
    "ffn_up.weight": "w_up",
    "ffn_down.weight": "w_down",
}

# T5 decoder layer tensors (dec.blk.%d.*, llama.cpp:1236-1252):
# causal self-attention + cross-attention over the encoder output
_T5_DEC_MAP = dict(_T5_ENC_MAP) | {
    "cross_attn_norm.weight": "cross_norm",
    "cross_attn_q.weight": "wq_x",
    "cross_attn_k.weight": "wk_x",
    "cross_attn_v.weight": "wv_x",
    "cross_attn_o.weight": "wo_x",
}

_NORM_KEYS = {
    "attn_norm", "ffn_norm", "q_norm", "k_norm", "post_attn_norm", "post_ffn_norm",
    "attn_norm_b", "ffn_norm_b",
    "attn_out_norm", "attn_out_norm_b", "layer_out_norm", "layer_out_norm_b",
    "q_a_norm", "kv_a_norm", "cross_norm",
    "attn_norm_2", "attn_norm_2_b", "q_norm_b", "k_norm_b",
    # bitnet sub-norms + per-tensor weight scales; arctic parallel-MoE norm
    "attn_sub_norm", "ffn_sub_norm", "ffn_norm_exps",
    "wq_scale", "wk_scale", "wv_scale", "wo_scale",
    "w_gate_scale", "w_up_scale", "w_down_scale",
}
_BIAS_KEYS = {"bq", "bk", "bv", "bo", "b_up", "b_down", "b_gate"}


def _stack_qtensors(qts: list[QTensor]) -> QTensor:
    """Stack per-layer QTensors along a new leading axis (for lax.scan)."""
    q0 = qts[0]
    for q in qts[1:]:
        if (q.kind, q.group, q.shape, q.zero) != (q0.kind, q0.group, q0.shape, q0.zero):
            raise ValueError("cannot stack heterogeneous layer tensors")
    return QTensor(
        kind=q0.kind,
        qw=np.stack([np.asarray(q.qw) for q in qts]),
        scales=None if q0.scales is None else np.stack([np.asarray(q.scales) for q in qts]),
        mins=None if q0.mins is None else np.stack([np.asarray(q.mins) for q in qts]),
        group=q0.group,
        shape=q0.shape,
        source_type=q0.source_type,
        zero=q0.zero,
    )


def _concat_rows(qts: list[QTensor]) -> Optional[QTensor]:
    """Fuse weights along out-features (e.g. q+k+v → qkv, gate+up → gateup):
    one big matmul kernel instead of several — decode is launch-overhead
    bound.  Requires identical kind/group/in_features; returns None if not."""
    q0 = qts[0]
    for q in qts[1:]:
        if (q.kind, q.group, q.shape[1], q.zero) != (q0.kind, q0.group, q0.shape[1], q0.zero):
            return None
        if (q.scales is None) != (q0.scales is None) or (q.mins is None) != (q0.mins is None):
            return None
    return QTensor(
        kind=q0.kind,
        qw=np.concatenate([np.asarray(q.qw) for q in qts], axis=0),
        scales=None if q0.scales is None else np.concatenate(
            [np.asarray(q.scales) for q in qts], axis=0
        ),
        mins=None if q0.mins is None else np.concatenate(
            [np.asarray(q.mins) for q in qts], axis=0
        ),
        group=q0.group,
        shape=(sum(q.shape[0] for q in qts), q0.shape[1]),
        source_type=q0.source_type,
        zero=q0.zero,
    )


def deinterleave_perm(n_heads: int, head_dim: int, d_rot: int) -> np.ndarray:
    """Row permutation turning interleaved-rope ("norm" style) q/k weights
    into the split-half (neox) order: within each head, new[i] = old[2i] and
    new[half+i] = old[2i+1] for the rotated prefix, identity past d_rot.

    Applying it identically to wq and wk leaves every q·k score unchanged
    (the contraction is permutation-invariant), so the model is exact — but
    rope becomes the neox form, which XLA compiles to two half-slices
    instead of the strided even/odd gathers + stack/reshape relayouts the
    interleaved form costs (~10 extra launches/layer, tools/ablate_decode).
    This mirrors (inverts) the HF→GGUF permute convert_hf_to_gguf.py applies
    to llama-family checkpoints."""
    half = d_rot // 2
    within = np.arange(head_dim)
    within[:half] = 2 * np.arange(half)
    within[half:d_rot] = 2 * np.arange(half) + 1
    return (np.arange(n_heads)[:, None] * head_dim + within[None, :]).reshape(-1)


def _permute_rows(t, perm: np.ndarray):
    """Permute out-feature rows of a dense array / QTensor (all payload and
    scale planes are row-major in out features)."""
    if t is None:
        return None
    if isinstance(t, QTensor):
        return dataclasses.replace(
            t,
            qw=np.asarray(t.qw)[perm],
            scales=None if t.scales is None else np.asarray(t.scales)[perm],
            mins=None if t.mins is None else np.asarray(t.mins)[perm],
        )
    return np.asarray(t)[perm]


def _split_rows(qt: QTensor, sizes: list[int]) -> list[QTensor]:
    """Split a QTensor along the out-features axis (e.g. fused qkv → q,k,v)."""
    out = []
    start = 0
    for s in sizes:
        sl = slice(start, start + s)
        out.append(
            QTensor(
                kind=qt.kind,
                qw=np.asarray(qt.qw)[sl],
                scales=None if qt.scales is None else np.asarray(qt.scales)[sl],
                mins=None if qt.mins is None else np.asarray(qt.mins)[sl],
                group=qt.group,
                shape=(s, qt.shape[1]),
                source_type=qt.source_type,
                zero=qt.zero,
            )
        )
        start += s
    assert start == qt.shape[0], f"split sizes {sizes} != rows {qt.shape[0]}"
    return out


@dataclasses.dataclass
class LoadedModel:
    cfg: ModelConfig
    params: dict[str, Any]
    tokenizer: Tokenizer
    metadata: dict[str, Any]
    file_types: dict[str, GGMLType]


def load_model(
    path: str,
    device_put: Optional[Callable[[Any, str], Any]] = None,
    keep_reader: bool = False,
    fuse: bool = True,
    weights: str = "native",
    batch_hint: int = 0,
) -> LoadedModel:
    """Read a GGUF file and build the params pytree (host numpy arrays unless
    `device_put(array, role)` is given — the parallel layer supplies one that
    shards per role onto the mesh).

    `weights`: runtime weight-format repack (quant.qtensor.repack_weights):
    "native" keeps the file's quantization, "bf16"/"i8" hold the weights
    wider in HBM for decode speed (exact), "auto" picks per the measured
    crossover (tools/qmm_clean.py, v5e): K-major native quant matvecs beat
    the bf16 stream at batch 1 (1.1B Q4_0: 313 vs 273 tok/s), bf16 wins for
    large decode batches (B=64: 8428 vs 7098 tok/s aggregate) when it fits.
    `batch_hint` = expected decode batch (0 = unknown → assume batched).
    MoE expert stacks stay native (the grouped-dispatch kernel streams
    them quantized)."""
    reader = GGUFReader(path)
    cfg = ModelConfig.from_gguf_metadata(reader.metadata)
    if weights == "auto":
        n_elems = sum(
            int(np.prod(info.shape)) for info in reader.tensors.values()
        )
        max_gb = float(os.environ.get("BT_WEIGHTS_BF16_MAX_GB", "6"))
        fits = 2 * n_elems <= max_gb * 2**30
        kmaj = os.environ.get("BT_TQMM", "1") != "0"
        if 0 < batch_hint < 8 and kmaj:
            weights = "native"
        else:
            weights = "bf16" if fits else "native"
        log.info(f"weights=auto -> {weights} "
                 f"({2 * n_elems / 2**30:.1f} GB as bf16, "
                 f"batch_hint={batch_hint})")
    tokenizer = None
    if "tokenizer.ggml.tokens" in reader.metadata:
        tokenizer = Tokenizer.from_gguf_metadata(reader.metadata)

    # commit weights to device ONCE — numpy leaves would be re-transferred on
    # every jit dispatch (catastrophic through a remote-TPU tunnel)
    put = device_put or (lambda arr, role: jnp.asarray(arr))
    if device_put is not None:
        # fused qkv rows would split across tp shards at q/k/v-mixing
        # boundaries; keep projections separate under explicit sharding
        fuse = False
    file_types: dict[str, GGMLType] = {}

    def load_dense(name: str, dtype=np.float32) -> Optional[np.ndarray]:
        info = reader.tensors.get(name)
        if info is None:
            return None
        file_types[name] = info.ggml_type
        return dequantize(reader.tensor_bytes(info), info.ggml_type, shape=info.shape).astype(dtype)

    def load_q(name: str) -> Optional[QTensor]:
        info = reader.tensors.get(name)
        if info is None:
            return None
        file_types[name] = info.ggml_type
        qt = repack_gguf_tensor(reader.tensor_bytes(info), info.ggml_type, info.shape)
        if weights not in ("native", "i8c") and "_exps" not in name:
            # i8c defers to stack time: per-channel scales don't survive the
            # rope row de-interleave / qkv row fusion that happens first
            qt = repack_weights(qt, weights)
        return qt

    # -- global tensors ------------------------------------------------------
    params: dict[str, Any] = {}
    emb = load_dense("token_embd.weight", np.float32)
    if emb is None:
        raise ValueError("model has no token_embd.weight")
    params["tok_embd"] = put(emb.astype(jnp.bfloat16), "embedding")
    # bert-family encoder globals
    ttypes = load_dense("token_types.weight")
    if ttypes is not None:
        params["token_types"] = put(ttypes, "embedding")
    tok_norm = load_dense("token_embd_norm.weight")
    if tok_norm is not None:
        params["tok_norm"] = put(tok_norm, "norm")
        tn_b = load_dense("token_embd_norm.bias")
        if tn_b is not None:
            params["tok_norm_b"] = put(tn_b, "norm")
    out_norm = load_dense("output_norm.weight")
    if out_norm is None and tok_norm is not None:
        out_norm = tok_norm  # encoder models have no final norm
    # olmo's LayerNorm is non-parametric: no tensor at all is legitimate
    params["output_norm"] = None if out_norm is None else put(out_norm, "norm")
    out_norm_b = load_dense("output_norm.bias")
    if out_norm_b is not None:
        params["output_norm_b"] = put(out_norm_b, "norm")
    pos_embd = load_dense("position_embd.weight")
    if pos_embd is not None:  # gpt2/starcoder learned positions
        params["pos_embd"] = put(pos_embd.astype(jnp.bfloat16), "embedding")
    out_q = load_q("output.weight")
    if out_q is not None and weights == "i8c" and out_q.kind in ("i4p", "i8"):
        from booster_tpu.quant.qtensor import channel_quantize

        out_q = channel_quantize(out_q)
    if out_q is not None and out_q.kind in ("i4p", "i8") and (
            os.environ.get("BT_TQMM", "1") != "0"):
        out_q = prepare_kernel_scales(out_q)
        if _transposable(out_q):
            out_q = transpose_qtensor(out_q)
            if os.environ.get("BT_SCALE_BF16", "1") != "0":
                out_q = compact_scales(out_q)
    params["output"] = None if out_q is None else jax.tree.map(
        lambda a: put(a, "lm_head:t" if out_q.transposed else "lm_head"),
        prepare_kernel_scales(out_q)
    )
    out_b = load_dense("output.bias")
    if out_b is not None:  # phi2 lm head bias
        params["output_b"] = put(out_b, "lm_head")

    rope_factors = load_dense("rope_freqs.weight")
    inv_freq = rope_inv_freq(cfg, rope_factors)
    pos_scale, mscale = yarn_params(cfg)
    params["rope"] = {
        "inv_freq": put((inv_freq * pos_scale).astype(np.float32), "norm"),
        "mscale": put(np.float32(mscale), "norm"),
    }

    # T5 encoder: enc.* namespace; relative bias table is global (block 0)
    t5_enc = cfg.arch in ("t5", "t5encoder")
    t5_full = cfg.arch == "t5"  # encoder-decoder: dec.* is the main stack
    if t5_enc:
        rel = load_dense("enc.blk.0.attn_rel_b.weight")
        if rel is not None:
            params["rel_b"] = put(rel, "norm")
        enc_norm = load_dense("enc.output_norm.weight")
        if enc_norm is not None:
            params["enc_norm" if t5_full else "output_norm"] = put(enc_norm, "norm")
    if t5_full:
        rel = load_dense("dec.blk.0.attn_rel_b.weight")
        if rel is not None:
            params["dec_rel_b"] = put(rel, "norm")
        dec_norm = load_dense("dec.output_norm.weight")
        if dec_norm is not None:
            params["output_norm"] = put(dec_norm, "norm")

    # -- per-layer tensors ---------------------------------------------------
    layer_dicts: list[dict[str, Any]] = []
    layer_map = (_T5_DEC_MAP if t5_full
                 else _T5_ENC_MAP if t5_enc else _LAYER_MAP)
    # interleaved-rope models: de-interleave q/k rows at load so runtime
    # rope is the cheap neox form (see deinterleave_perm); exact.
    # MLA (deepseek2) ropes packed sub-slices of q/kv projections — skip.
    deint = (cfg.rope_style == ROPE_NORM and cfg.kv_lora_rank == 0
             and cfg.rope_dims > 1 and not (t5_enc or t5_full))
    did_deint = False
    for i in range(cfg.n_layers):
        prefix = (f"dec.blk.{i}." if t5_full
                  else f"enc.blk.{i}." if t5_enc else f"blk.{i}.")
        lp: dict[str, Any] = {}
        for suffix, key in layer_map.items():
            name = prefix + suffix
            if name not in reader.tensors:
                continue
            if key in _NORM_KEYS or key in _BIAS_KEYS or key in _DENSE_KEYS:
                lp[key] = load_dense(name)
            else:
                lp[key] = load_q(name)

        # fused projections (phi3/gpt2/falcon/mpt): attn_qkv → q/k/v
        if "wq" not in lp and prefix + "attn_qkv.weight" in reader.tensors:
            qkv = load_q(prefix + "attn_qkv.weight")
            h_l = cfg.heads_per_layer[i] if cfg.heads_per_layer else cfg.n_heads
            kv_l = (cfg.kv_heads_per_layer[i] if cfg.kv_heads_per_layer
                    else cfg.n_kv_heads)
            d_q = h_l * cfg.head_dim
            d_kv = kv_l * cfg.head_dim
            lp["wq"], lp["wk"], lp["wv"] = _split_rows(qkv, [d_q, d_kv, d_kv])
            bqkv = load_dense(prefix + "attn_qkv.bias")
            if bqkv is not None:
                lp["bq"] = bqkv[:d_q]
                lp["bk"] = bqkv[d_q:d_q + d_kv]
                lp["bv"] = bqkv[d_q + d_kv:]
        if "w_gate" not in lp and "w_up" in lp and lp["w_up"].shape[0] == 2 * cfg.n_ff:
            lp["w_gate"], lp["w_up"] = _split_rows(lp["w_up"], [cfg.n_ff, cfg.n_ff])

        if deint and "wq" in lp and "wk" in lp:
            h_l = cfg.heads_per_layer[i] if cfg.heads_per_layer else cfg.n_heads
            kv_l = (cfg.kv_heads_per_layer[i] if cfg.kv_heads_per_layer
                    else cfg.n_kv_heads)
            pq = deinterleave_perm(h_l, cfg.head_dim, cfg.rope_dims)
            pk = deinterleave_perm(kv_l, cfg.head_dim, cfg.rope_dims)
            ph = deinterleave_perm(1, cfg.head_dim, cfg.rope_dims)
            for key, perm in (("wq", pq), ("bq", pq), ("wq_scale", None),
                              ("wk", pk), ("bk", pk), ("wk_scale", None)):
                if key in lp and perm is not None and lp[key] is not None:
                    lp[key] = _permute_rows(lp[key], perm)
            for key in ("q_norm", "k_norm", "q_norm_b", "k_norm_b"):
                v = lp.get(key)
                if v is None:
                    continue  # per-tensor scales (wq_scale) need no permute
                v = np.asarray(v)
                lp[key] = (v[ph] if v.shape[0] == cfg.head_dim
                           else _permute_rows(v, pq if "q" in key else pk))
            did_deint = True

        # fuse q/k/v and gate/up into single matmuls (decode launch overhead)
        if t5_enc:
            fuse = False  # t5 encode() consumes separate projections
        if cfg.arch == "dbrx" and "attn_out_norm" in lp:
            # dbrx's attn_out_norm is its ffn norm (build_dbrx :9500)
            lp["ffn_norm"] = lp.pop("attn_out_norm")
        if cfg.arch == "grok":
            # grok reuses bert's GGUF tensor names for its post norms
            # (attn_output_norm/layer_output_norm) but applies them
            # pre-residual like gemma2's post norms (build_grok :9330)
            if "attn_out_norm" in lp:
                lp["post_attn_norm"] = lp.pop("attn_out_norm")
            if "layer_out_norm" in lp:
                lp["post_ffn_norm"] = lp.pop("layer_out_norm")
        if (fuse and {"wq", "wk", "wv"} <= set(lp) and "bq" not in lp
                and not cfg.q_norm and "wq_scale" not in lp):
            fused = _concat_rows([lp["wq"], lp["wk"], lp["wv"]])
            if fused is not None:
                lp["wqkv"] = fused
                del lp["wq"], lp["wk"], lp["wv"]
        if (fuse and {"w_gate", "w_up"} <= set(lp)
                and "w_gate_scale" not in lp and "ffn_sub_norm" not in lp
                and "b_gate" not in lp and "b_up" not in lp):
            fused = _concat_rows([lp["w_gate"], lp["w_up"]])
            if fused is not None:
                lp["w_gateup"] = fused
                del lp["w_gate"], lp["w_up"]
        layer_dicts.append(lp)

    if not layer_dicts:
        raise ValueError("no layers found")
    if did_deint:
        cfg = dataclasses.replace(cfg, rope_style=ROPE_NEOX,
                                  rope_deinterleaved=True)

    # K-major weight layout for the fused matmul kernels (BT_TQMM=0 reverts):
    # the lane-major layout's scale expansion is a one-hot MXU dot that
    # dominates every native-quant matvec (ops/pallas_qmm.py).  MoE expert
    # stacks keep lane-major (the grouped-dispatch kernel addresses [N, K]).
    # Sharded params stay K-major too (r3): transposed leaves are tagged
    # ":t" so parallel.mesh maps the [out, in] spec onto [.., K, N] axes —
    # multi-chip serving keeps the measured single-stream fast path
    # (reference analog: row split streams quantized rows on every GPU,
    # /root/reference/cpp/src/llama.cpp:5971-5995).
    transpose = os.environ.get("BT_TQMM", "1") != "0"

    # bf16 scale planes for the K-major kernels: bit-identical through the
    # kernel (it rounds scales to bf16 in-kernel anyway), ~10% fewer streamed
    # bytes for q4_0 decode.  BT_SCALE_BF16=0 reverts for ablation.
    compact = os.environ.get("BT_SCALE_BF16", "1") != "0"

    def maybe_transpose(qt: QTensor, key: str) -> QTensor:
        if not transpose or "exps" in key or qt.kind not in ("i4p", "i8"):
            return qt
        if not _transposable(qt):  # keep the lane-major kernel, not fallback
            return qt
        qt = transpose_qtensor(qt)
        return compact_scales(qt) if compact else qt

    def stack_group(dicts: list[dict[str, Any]]) -> dict[str, Any]:
        stacked: dict[str, Any] = {}
        for key in sorted(dicts[0]):
            vals = [lp[key] for lp in dicts]
            if isinstance(vals[0], QTensor):
                if (weights == "i8c" and "exps" not in key
                        and vals[0].kind in ("i4p", "i8")):
                    from booster_tpu.quant.qtensor import channel_quantize

                    vals = [channel_quantize(v) for v in vals]
                qt = prepare_kernel_scales(_stack_qtensors(vals))
                qt = maybe_transpose(qt, key)
                role = key + (":t" if qt.transposed else "")
                stacked[key] = jax.tree.map(lambda a: put(a, role), qt)
            else:
                stacked[key] = put(np.stack(vals), key)
        return stacked

    # t5 encoder stack (enc.blk.*) alongside the decoder's main stack
    if t5_full:
        enc_dicts: list[dict[str, Any]] = []
        for i in range(cfg.n_layers):
            lp = {}
            for suffix, key in _T5_ENC_MAP.items():
                name = f"enc.blk.{i}.{suffix}"
                if name in reader.tensors:
                    lp[key] = load_dense(name) if key in _NORM_KEYS else load_q(name)
            enc_dicts.append(lp)
        params["enc_layers"] = stack_group(enc_dicts)

    # consecutive layers with identical key sets AND tensor shapes stack
    # into one lax.scan group; heterogeneous models (deepseek2: leading
    # dense layers before the MoE stack; openelm: per-layer head counts)
    # produce multiple groups that forward() runs in sequence
    def _sig(lp: dict[str, Any]):
        def shape_of(v):
            return v.shape if not isinstance(v, QTensor) else (v.kind, v.shape)

        return tuple(sorted((k, shape_of(v)) for k, v in lp.items()))

    runs: list[tuple[int, int]] = []
    start = 0
    for i in range(1, len(layer_dicts)):
        if _sig(layer_dicts[i]) != _sig(layer_dicts[start]):
            runs.append((start, i))
            start = i
    runs.append((start, len(layer_dicts)))
    if len(runs) == 1:
        params["layers"] = stack_group(layer_dicts)
    else:
        params["layer_groups"] = [stack_group(layer_dicts[s:e]) for s, e in runs]

    md = dict(reader.metadata)
    if not keep_reader:
        reader.close()
    return LoadedModel(cfg=cfg, params=params, tokenizer=tokenizer, metadata=md, file_types=file_types)
