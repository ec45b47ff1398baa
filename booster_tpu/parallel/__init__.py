"""Device mesh construction and named shardings (tensor/data parallel).

The reference's multi-GPU story is layer-split / row-split buffer assignment
plus sched-inserted copies (/root/reference/cpp/src/llama.cpp:5932-5995,
ggml-backend.c:1751).  TPU-native replacement: one jax.sharding.Mesh with
("dp", "tp") axes; weights and KV get NamedShardings and GSPMD inserts the
collectives (all-gather / reduce-scatter over ICI) — no manual copies.
"""

from booster_tpu.parallel.mesh import (
    make_mesh,
    make_device_put,
    shard_cache,
    PARAM_SPECS,
)

__all__ = ["make_mesh", "make_device_put", "shard_cache", "PARAM_SPECS"]
