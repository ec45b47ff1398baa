#!/usr/bin/env python
"""Vectorized-sampler cost attribution at [B=64, V=32k] (config-3 sampler
was 2.4 ms in-situ, tools/step_residual.py — where does it go?)."""

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
    B, V, K = 64, 32000, 256
    rng = np.random.default_rng(0)
    lg = jnp.asarray(rng.normal(size=(B, V)), jnp.float32)
    print("backend:", jax.default_backend(), flush=True)

    from booster_tpu.sampling.params import SamplingParams
    from booster_tpu.sampling.samplers import make_sampler_state
    from booster_tpu.sampling.vector import (VectorSampling, _chain_keep,
                                             sample_vectorized,
                                             topk_shortlist)

    vp = VectorSampling.from_params(
        [SamplingParams(temp=0.8, top_k=40, seed=i) for i in range(B)])
    state = make_sampler_state(B, 256, seed=0)

    def full(st, lg, vp):
        tok, st = sample_vectorized(lg, st, vp, features=("nopenalties",))
        return st

    def argmax_only(acc, lg):
        return acc + jnp.argmax(lg, axis=-1)[:, None].astype(jnp.float32)

    def shortlist_only(acc, lg):
        v, i = topk_shortlist(lg, K)
        return acc + v[:, :128]

    def approx95(acc, lg):
        v, i = jax.lax.approx_max_k(lg, K, recall_target=0.95)
        return acc + v[:, :128]

    def approx99(acc, lg):
        v, i = jax.lax.approx_max_k(lg, K, recall_target=0.99)
        return acc + v[:, :128]

    def detect_only(acc, lg):
        v, i = jax.lax.approx_max_k(lg, K, recall_target=0.99)
        vmin = v[:, -1:]
        n_greater = jnp.sum(lg > vmin, axis=-1)
        return acc + n_greater[:, None].astype(jnp.float32)

    def chain(acc, lg, vp):
        v, i = jax.lax.approx_max_k(lg, K, recall_target=0.99)
        keep = _chain_keep(v, vp, ())
        return acc + keep[:, :128].astype(jnp.float32)

    def categ(acc, lg, key):
        slg = lg[:, :K]
        pos = jax.vmap(lambda kk, l: jax.random.categorical(kk, l))(
            key, slg)
        return acc + pos[:, None].astype(jnp.float32)

    def keysplit(acc, key):
        keys = jax.vmap(jax.random.split, in_axes=(0, None))(key, 2)
        return acc + keys[:, 0, :1].astype(jnp.float32)

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    zero = jnp.zeros((B, 128), jnp.float32)
    for name, fn, args in (
        ("argmax [B,V]", argmax_only, (lg,)),
        ("approx rt=.95", approx95, (lg,)),
        ("approx rt=.99", approx99, (lg,)),
        ("detect pass", detect_only, (lg,)),
        ("topk_shortlist (verified)", shortlist_only, (lg,)),
        ("chain_keep", chain, (lg, vp)),
        ("categorical [B,256] vmap", categ, (lg, keys)),
        ("key split vmap", keysplit, (keys,)),
    ):
        dt = timeit(name, fn, zero, *args, iters=(128, 512))
        if dt:
            print(f"{name}: {dt*1e6:8.1f} us", flush=True)

    dt = timeit("sample_vectorized FULL", full, state, lg, vp,
                iters=(128, 512))
    if dt:
        print(f"sample_vectorized FULL: {dt*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
