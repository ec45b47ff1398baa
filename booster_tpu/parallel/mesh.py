"""Mesh + per-role PartitionSpecs for weights, KV cache, and activations.

Sharding plan ("megatron" style over the `tp` axis):
  - q/k/v projections: shard output features (head dim groups)
  - o projection and ffn down: shard input features (contraction → psum)
  - gate/up: shard output features
  - lm head: shard vocab rows (logits all-gathered by GSPMD at the sampler)
  - KV cache: shard the kv-heads axis when tp divides n_kv_heads
  - embeddings/norms: replicated
The `dp` axis shards the batch/slot dimension of activations and KV.

QTensor payloads shard like their logical weight: qw [L, out, in/2] follows
(None, spec_out, spec_in) — packed nibble columns halve K but keep
divisibility because tp tiles are powers of two.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from booster_tpu.ops.kv_cache import KVCache


def make_mesh(
    n_devices: Optional[int] = None, tp: Optional[int] = None, dp: Optional[int] = None
) -> Mesh:
    """Build a ("dp", "tp") mesh.  Defaults: all devices on tp."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != devices({n})")
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# role → PartitionSpec for the *logical 2-D weight* [out, in].
# Stacked layer tensors get None prepended for the layer axis automatically.
PARAM_SPECS: dict[str, P] = {
    # attention
    "wq": P("tp", None),
    "wk": P("tp", None),
    "wv": P("tp", None),
    "wo": P(None, "tp"),
    "bq": P("tp"),
    "bk": P("tp"),
    "bv": P("tp"),
    # mlp
    "w_gate": P("tp", None),
    "w_up": P("tp", None),
    "w_down": P(None, "tp"),
    # moe (experts stacked into rows: [E*ff, in] — shard rows)
    "router": P(None, None),
    "gate_exps": P("tp", None),
    "up_exps": P("tp", None),
    "down_exps": P(None, "tp"),
    # globals
    "embedding": P(None, None),
    "lm_head": P("tp", None),
    "norm": P(),  # replicated 1-D
    # per-layer norms / rope
    "attn_norm": P(),
    "ffn_norm": P(),
    "q_norm": P(),
    "k_norm": P(),
    "post_attn_norm": P(),
    "post_ffn_norm": P(),
}


def _spec_for(role: str, ndim: int, stacked: bool) -> P:
    transposed = role.endswith(":t")
    if transposed:
        role = role[:-2]
    base = PARAM_SPECS.get(role, P())
    if transposed:
        # K-major QTensor leaves (loader tags them ":t"): qw [.., K, N] and
        # scale planes [.., R, SG, N] — the logical [out, in] spec lands as
        # (.., in, out) on the last two axes (SG tracks K; N is last), so
        # multi-chip serving keeps the K-major fast path (reference: row
        # split streams quantized rows, llama.cpp:5971-5995)
        o = base[0] if len(base) > 0 else None
        i = base[1] if len(base) > 1 else None
        parts = [None] * max(ndim - 2, 0) + [i, o]
        return P(*parts[:ndim])
    parts = list(base)
    if stacked:
        parts = [None] + parts
    # pad to ndim by inserting None *before the last* spec entry: extra dims
    # come from kernel-block scale planes [.., N, R, sg] (prepare_kernel_scales)
    # whose trailing sg axis tracks the logical K axis — the K shard must land
    # on sg, not on the scale/min row axis R
    while len(parts) < ndim:
        parts.insert(max(len(parts) - 1, 0), None)
    return P(*parts[:ndim])


def make_device_put(mesh: Mesh) -> Callable[[Any, str], Any]:
    """Returns loader's device_put(array, role) that shards per PARAM_SPECS.

    Layer-stacked arrays (role in the per-layer key set) get a leading None
    axis for the stacking dim.
    """
    layer_roles = {
        "wq", "wk", "wv", "wo", "bq", "bk", "bv", "w_gate", "w_up", "w_down",
        "router", "gate_exps", "up_exps", "down_exps",
        "attn_norm", "ffn_norm", "q_norm", "k_norm", "post_attn_norm", "post_ffn_norm",
    }

    def put(arr, role: str):
        a = np.asarray(arr)
        base_role = role[:-2] if role.endswith(":t") else role
        spec = _spec_for(role, a.ndim, stacked=base_role in layer_roles)
        # guard: only shard axes the array can actually divide
        parts = []
        for dim, ax in zip(a.shape, spec):
            if ax is None:
                parts.append(None)
            else:
                size = mesh.shape[ax]
                parts.append(ax if dim % size == 0 else None)
        return jax.device_put(a, NamedSharding(mesh, P(*parts)))

    return put


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    """Place the KV cache: [L, B, H_kv, S, D] → dp on B, tp on H_kv."""

    def put(arr, spec):
        if arr is None:
            return None
        parts = []
        for dim, ax in zip(arr.shape, spec):
            parts.append(ax if ax is not None and dim % mesh.shape[ax] == 0 else None)
        return jax.device_put(arr, NamedSharding(mesh, P(*parts)))

    kv_spec = (None, "dp", "tp", None, None)
    return KVCache(
        k=put(cache.k, kv_spec),
        v=put(cache.v, kv_spec),
        lengths=put(cache.lengths, ("dp",)),
        k_scale=put(cache.k_scale, kv_spec),
        v_scale=put(cache.v_scale, kv_spec),
    )
