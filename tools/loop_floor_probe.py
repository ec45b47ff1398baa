#!/usr/bin/env python
"""What does one on-device loop iteration cost through axon, and does
optimization_barrier distort it?  Variants of a trivial body, each at
several trip counts so fixed dispatch cost separates from per-iteration."""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def run(name, make_loop):
    for iters in (256, 2048):
        loop = jax.jit(make_loop(iters))
        c = jnp.zeros((8, 128), jnp.float32)
        r = loop(c)
        np.asarray(r.ravel()[0])
        t0 = time.perf_counter()
        r = loop(c)
        np.asarray(r.ravel()[0])
        dt = time.perf_counter() - t0
        print(f"{name} iters={iters}: total {dt*1e3:.2f} ms "
              f"-> {dt/iters*1e6:.2f} us/iter")


def main():
    print("backend:", jax.default_backend())

    def scan_barrier(iters):
        def loop(c):
            def body(c, _):
                c, = jax.lax.optimization_barrier((c,))
                return c + 1.0, None
            c, _ = jax.lax.scan(body, c, None, length=iters)
            return c
        return loop

    def scan_dep(iters):
        def loop(c):
            def body(c, _):
                return c * 1.0000001 + 1.0, None
            c, _ = jax.lax.scan(body, c, None, length=iters)
            return c
        return loop

    def fori_dep(iters):
        def loop(c):
            return jax.lax.fori_loop(
                0, iters, lambda i, c: c * 1.0000001 + 1.0, c)
        return loop

    def scan_dep_matmul(iters):
        w = jnp.full((128, 128), 0.001, jnp.bfloat16)
        def loop(c):
            def body(c, _):
                y = jax.lax.dot_general(c.astype(jnp.bfloat16), w,
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return c * 0.9999 + y * 1e-6, None
            c, _ = jax.lax.scan(body, c, None, length=iters)
            return c
        return loop

    run("scan+barrier", scan_barrier)
    run("scan+arith-dep", scan_dep)
    run("fori+arith-dep", fori_dep)
    run("scan+tiny-matmul", scan_dep_matmul)


if __name__ == "__main__":
    main()
