#!/usr/bin/env python
"""Does a per-layer dynamic-slice of stacked weights COPY before a Pallas
call?  The layer scan slices [L, K, N] stacked payloads each step; if XLA
materializes the slice, every weight byte is read+written+read — 3x the
traffic the kernel thinks it streams.  Compares back-to-back qmm on a
direct [K, N] tensor vs the same tensor sliced from an [L, ...] stack
inside the loop (traced index), at the 7B gateup shape."""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tools.qmm_clean import timeit

from booster_tpu.gguf import GGMLType
from booster_tpu.ops.linear import qlinear
from booster_tpu.quant import repack_gguf_tensor
from booster_tpu.quant.formats import quantize
from booster_tpu.quant.qtensor import (prepare_kernel_scales,
                                       transpose_qtensor)


def main():
    M = int(os.environ.get("MM", "64"))
    N, K, L = 28672, 4096, 4
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), " M =", M, flush=True)

    w = rng.normal(size=(N, K)).astype(np.float32) * 0.05
    raw = quantize(w, GGMLType.Q8_0)
    qt = transpose_qtensor(prepare_kernel_scales(
        repack_gguf_tensor(raw, GGMLType.Q8_0, (N, K))))
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)

    qt_dev = qt.astype_device()

    def direct(acc, x, qt=qt_dev):
        y = qlinear(x.reshape(M, 1, K), qt).reshape(M, N)
        return acc + y[:, :128]

    dt = timeit("direct [K,N]", direct, jnp.zeros((M, 128), jnp.float32), x,
                iters=(64, 256))
    if dt:
        print(f"direct: {dt*1e6:.1f} us -> {N*K/dt/1e9:.0f} GB/s", flush=True)

    # stacked: same tensor repeated L times, layer picked by traced index
    import dataclasses

    qt_st = dataclasses.replace(
        qt_dev,
        qw=jnp.broadcast_to(qt_dev.qw[None], (L,) + qt_dev.qw.shape).copy(),
        scales=jnp.broadcast_to(qt_dev.scales[None],
                                (L,) + qt_dev.scales.shape).copy(),
    )

    def sliced_step(carry, x, qw_st, s_st):
        acc, i = carry
        qt_i = dataclasses.replace(
            qt_dev,
            qw=jax.lax.dynamic_index_in_dim(qw_st, i, 0, keepdims=False),
            scales=jax.lax.dynamic_index_in_dim(s_st, i, 0, keepdims=False),
        )
        y = qlinear(x.reshape(M, 1, K), qt_i).reshape(M, N)
        return (acc + y[:, :128], (i + 1) % L)

    dt = timeit("sliced from [L,K,N] (traced idx)", sliced_step,
                (jnp.zeros((M, 128), jnp.float32), jnp.int32(0)), x,
                qt_st.qw, qt_st.scales, iters=(64, 256))
    if dt:
        print(f"sliced: {dt*1e6:.1f} us -> {N*K/dt/1e9:.0f} GB/s", flush=True)

    # stacked-view: whole array to the kernel, layer via scalar prefetch
    def view_step(carry, x, qw_st, s_st):
        acc, i = carry
        qt_i = dataclasses.replace(qt_dev, qw=qw_st, scales=s_st, layer=i)
        y = qlinear(x.reshape(M, 1, K), qt_i).reshape(M, N)
        return (acc + y[:, :128], (i + 1) % L)

    dt = timeit("stacked view (scalar prefetch)", view_step,
                (jnp.zeros((M, 128), jnp.float32), jnp.int32(0)), x,
                qt_st.qw, qt_st.scales, iters=(64, 256))
    if dt:
        print(f"stacked view: {dt*1e6:.1f} us -> {N*K/dt/1e9:.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
