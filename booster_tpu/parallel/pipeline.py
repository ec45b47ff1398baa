"""Pipeline parallelism: GPipe-style micro-batch overlap over a "pp" mesh
axis.

Reference analog: ggml_backend_sched's pipeline parallelism — n_copies=4
rotating input copies + event sync between per-GPU layer splits
(/root/reference/cpp/ggml/src/ggml-backend.c:1066-1076, :1751-1846, enabled
at llama.cpp:16946-16957).  TPU redesign: layer-stacked params shard along
the layer axis over `pp` stages inside one `shard_map`; micro-batches flow
stage-to-stage with `lax.ppermute` on the ICI ring, and the classic
(M + pp − 1)-step schedule keeps every stage busy once the pipeline fills —
the compiler overlaps each stage's compute with its neighbor transfers.

Scope: prefill (full-sequence self-attention, no cache) — where the
reference's pipeline applies too (it pipelines prompt processing across
GPUs; decode is latency-bound on one token).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from booster_tpu.models.config import ModelConfig
from booster_tpu.models.llama import _act, rms_norm
from booster_tpu.ops.attention import attention
from booster_tpu.ops.linear import qlinear
from booster_tpu.ops.rope import apply_rope_tables, rope_tables


def make_pp_mesh(n_devices: int) -> Mesh:
    devices = np.asarray(jax.devices()[:n_devices])
    return Mesh(devices.reshape(n_devices), ("pp",))


def _stage_layer(x, lp, rope_cos, rope_sin, cfg: ModelConfig):
    """One llama layer, prefill-only (self-attention over the microbatch)."""
    B, T, C = x.shape
    H, Hkv, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    h = rms_norm(x, lp["attn_norm"], cfg.rms_eps, cfg.norm_eps_add_one)
    q = qlinear(h, lp["wq"]).reshape(B, T, H, D)
    k = qlinear(h, lp["wk"]).reshape(B, T, Hkv, D)
    v = qlinear(h, lp["wv"]).reshape(B, T, Hkv, D)
    q = apply_rope_tables(q, rope_cos, rope_sin, cfg.rope_style)
    k = apply_rope_tables(k, rope_cos, rope_sin, cfg.rope_style)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    scale = cfg.attn_scale if cfg.attn_scale > 0 else 1.0 / (D ** 0.5)
    attn = attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        positions, jnp.full(B, T, jnp.int32), scale,
        logit_softcap=cfg.attn_logit_softcap,
    )
    x = x + qlinear(attn.reshape(B, T, H * D), lp["wo"])
    h = rms_norm(x, lp["ffn_norm"], cfg.rms_eps, cfg.norm_eps_add_one)
    gate = qlinear(h, lp["w_gate"])
    up = qlinear(h, lp["w_up"])
    return x + qlinear(_act(gate, cfg.act) * up, lp["w_down"])


@partial(jax.jit, static_argnames=("cfg", "n_micro", "mesh"))
def pipeline_prefill(
    params: dict,
    cfg: ModelConfig,
    tokens: jnp.ndarray,  # [B, T] — B must divide into n_micro microbatches
    mesh: Mesh,
    n_micro: int = 4,
) -> jnp.ndarray:
    """Pipelined prefill logits [B, T, V] over the pp mesh axis."""
    from jax import shard_map

    pp = mesh.shape["pp"]
    B, T = tokens.shape
    mb = B // n_micro

    emb = params["tok_embd"]
    x = emb[tokens].astype(jnp.bfloat16)
    if cfg.embedding_scale != 1.0:
        x = (x.astype(jnp.float32) * cfg.embedding_scale).astype(x.dtype)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (mb, T))
    rope_cos, rope_sin = rope_tables(
        positions, params["rope"]["inv_freq"], params["rope"]["mscale"]
    )
    x_mb = x.reshape(n_micro, mb, T, cfg.n_embd)

    layers = params["layers"]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("pp"), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(stage_layers, x_all):
        stage = jax.lax.axis_index("pp")

        def stage_fn(x):
            def body(x, lp):
                return _stage_layer(x, lp, rope_cos, rope_sin, cfg), None

            x, _ = jax.lax.scan(body, x, stage_layers)
            return x

        buf = jnp.zeros((mb, T, cfg.n_embd), x_all.dtype)
        outs = jnp.zeros_like(x_all)
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        for t in range(n_micro + pp - 1):  # pipeline schedule (static)
            feed = x_all[min(t, n_micro - 1)]
            x_in = jnp.where(stage == 0, feed, buf)
            y = stage_fn(x_in)
            mb_idx = jnp.clip(t - stage, 0, n_micro - 1)
            active = (t - stage >= 0) & (t - stage < n_micro)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(active, y, jax.lax.dynamic_index_in_dim(
                    outs, mb_idx, 0, keepdims=False)),
                mb_idx, 0,
            )
            buf = jax.lax.ppermute(y, "pp", perm)
        # only the last stage's outputs are the final hidden states
        is_last = (stage == pp - 1).astype(outs.dtype)
        return jax.lax.psum(outs * is_last, "pp")

    x = run(layers, x_mb).reshape(B, T, cfg.n_embd)
    x = rms_norm(x, params["output_norm"], cfg.rms_eps, cfg.norm_eps_add_one)
    out_w = params.get("output")
    if out_w is not None:
        logits = qlinear(x, out_w)
    else:
        logits = jax.lax.dot_general(
            x.astype(jnp.bfloat16), emb.astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
    return logits.astype(jnp.float32)
