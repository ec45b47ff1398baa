#!/usr/bin/env python
"""Per-component on-chip timing of the B=64 7B-shape decode step:
attention (per layer x L), deferred KV append, the vectorized sampler,
and the matmul total — to find where the step time beyond the weight
stream goes (config 3 gap analysis)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tools.qmm_clean import timeit


def main():
    L, B, H, Hkv, S, D = 32, 64, 32, 8, 512, 128
    V = 32000
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    import booster_tpu.ops.pallas_attention as pa
    from booster_tpu.ops.pallas_kv import kv_append_all_layers

    kc = jnp.asarray(rng.integers(-127, 127, (L, B, Hkv, S, D)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 127, (L, B, Hkv, S, D)), jnp.int8)
    ks = jnp.asarray(rng.random((L, B, Hkv, S, 1)), jnp.float32)
    vs = jnp.asarray(rng.random((L, B, Hkv, S, 1)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)), jnp.bfloat16)
    newk = jnp.asarray(rng.normal(size=(B, Hkv, D)), jnp.bfloat16)
    self_ok = jnp.ones((B,), bool)
    lens = jnp.full((B,), 140, jnp.int32)  # bench-like live length

    def attn(qc, kc, vc, ks, vs):
        out = pa.decode_attention_stacked(
            qc, kc, vc, ks, vs, jnp.int32(3), lens, scale=0.125,
            self_kv=(newk, newk, self_ok))
        return out.astype(qc.dtype)

    dt = timeit("attention 1 layer", attn, q, kc, vc, ks, vs,
                iters=(128, 512))
    if dt:
        print(f"attention: {dt*1e6:.1f} us/layer -> {dt*L*1e3:.2f} ms/step",
              flush=True)

    # deferred all-layer append (one call per STEP)
    newk_all = jnp.asarray(rng.normal(size=(L, B, Hkv, D)), jnp.bfloat16)
    offs = jnp.asarray(rng.integers(0, S - 1, (B,)), jnp.int32)

    def append(caches, newk_all, offs):
        kc, vc, ks, vs = caches
        return kv_append_all_layers(kc, vc, newk_all, newk_all, offs,
                                    ks, vs)

    try:
        dt = timeit("kv_append_all_layers", append, (kc, vc, ks, vs),
                    newk_all, offs, iters=(128, 512))
        if dt:
            print(f"append: {dt*1e6:.1f} us/step", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"append: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)

    # the vectorized sampler at [B, V]
    from booster_tpu.sampling.samplers import make_sampler_state
    from booster_tpu.sampling.vector import VectorSampling, sample_vectorized
    from booster_tpu.sampling.params import SamplingParams

    vp = VectorSampling.from_params(
        [SamplingParams(temp=0.8, top_k=40, seed=i) for i in range(B)])
    state = make_sampler_state(B, 256, seed=0)
    lg = jnp.asarray(rng.normal(size=(B, V)), jnp.float32)

    def sampler(state, lg, vp):
        tok, state = sample_vectorized(lg, state, vp,
                                       features=("nopenalties",))
        return state

    dt = timeit("sample_vectorized [64, 32000]", sampler, state, lg, vp,
                iters=(128, 512))
    if dt:
        print(f"sampler: {dt*1e6:.1f} us/step", flush=True)

    # sampler sub-components
    def topk_only(acc, lg):
        v, i = jax.lax.top_k(lg, 256)
        return acc + v[:, :128]

    def approx_topk(acc, lg):
        v, i = jax.lax.approx_max_k(lg, 256, recall_target=0.95)
        return acc + v[:, :128]

    def cat_only(acc, lg):
        key = jax.random.PRNGKey(0)
        t = jax.random.categorical(key, lg, axis=-1)
        return acc + t[:, None].astype(jnp.float32)[:, :1]

    for name, fn in (("lax.top_k(256)", topk_only),
                     ("approx_max_k(256)", approx_topk),
                     ("categorical [B,V]", cat_only)):
        try:
            dt = timeit(name, fn, jnp.zeros((B, 128), jnp.float32), lg,
                        iters=(128, 512))
            if dt:
                print(f"{name}: {dt*1e6:.1f} us", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {str(e).splitlines()[0][:120]}", flush=True)

    # rope tables + norms proxy: one [B, C] rmsnorm x 2L
    C = 4096
    x = jnp.asarray(rng.normal(size=(B, 1, C)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(C,)), jnp.float32)

    def norm(xc, g):
        from booster_tpu.models.llama import rms_norm
        return rms_norm(xc, g, 1e-5).astype(xc.dtype)

    try:
        dt = timeit("rms_norm [64,1,4096]", norm, x, g, iters=(512, 2048))
        if dt:
            print(f"norm: {dt*1e6:.2f} us x {2*L} = {dt*2*L*1e3:.2f} ms",
                  flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"norm: FAIL {e}", flush=True)


if __name__ == "__main__":
    main()
