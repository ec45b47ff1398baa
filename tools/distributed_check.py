#!/usr/bin/env python
"""Multi-process distributed decode check.

Runs the SAME sharded prefill+decode on a jax.distributed cluster of N
processes (CPU backend, each with its own virtual devices) and verifies the
greedy token stream matches the single-process result — the multi-host
counterpart of the reference's RPC offload (/root/reference/cpp/ggml/src/
ggml-rpc.cpp), replaced here by GSPMD collectives over a (dp, tp) mesh.

Usage (driver spawns workers):
    python tools/distributed_check.py --model /tmp/tiny.gguf \
        --nprocs 2 --tp 4 --dp 2 --out /tmp/dist_tokens.json

Each worker re-execs this script with --proc-id set.  A --proc-id -1 run
computes the single-process reference instead.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_model(mesh, model_path: str, steps: int = 8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from booster_tpu.models import load_model
    from booster_tpu.models.llama import forward
    from booster_tpu.ops.kv_cache import KVCache
    from booster_tpu.parallel.mesh import make_device_put, shard_cache

    put = make_device_put(mesh) if mesh is not None else None
    model = load_model(model_path, device_put=put)
    cfg = model.cfg
    B, S = 2, 64
    cache = KVCache.create(cfg.n_layers, B, S, cfg.n_kv_heads, cfg.head_dim)
    if mesh is not None:
        cache = shard_cache(cache, mesh)
    prompt = np.tile(np.arange(4, 20, dtype=np.int32)[None, :], (B, 1))
    prompt[1] = prompt[1][::-1]
    logits, cache = forward(model.params, cfg, jnp.asarray(prompt), cache,
                            last_only=True)
    def read(a):
        if mesh is None:
            return np.asarray(a).tolist()
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True)).tolist()

    toks = []
    tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    for _ in range(steps):
        toks.append(read(tok))
        logits, cache = forward(model.params, cfg, tok[:, None], cache,
                                last_only=True)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return toks


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--port", type=int, default=9911)
    ap.add_argument("--proc-id", type=int, default=None)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.proc_id is None:
        # driver: reference run + spawn the cluster
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count={args.local_devices}")
        ref = subprocess.run(
            [sys.executable, __file__, "--model", args.model, "--proc-id", "-1",
             "--out", args.out + ".ref"],
            env=env, capture_output=True, text=True, timeout=600,
        )
        if ref.returncode != 0:
            sys.stderr.write(ref.stderr)
            return 1
        procs = []
        for pid in range(args.nprocs):
            procs.append(subprocess.Popen(
                [sys.executable, __file__, "--model", args.model,
                 "--proc-id", str(pid), "--nprocs", str(args.nprocs),
                 "--tp", str(args.tp), "--dp", str(args.dp),
                 "--port", str(args.port), "--out", args.out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            ))
        ok = True
        for p in procs:
            out, err = p.communicate(timeout=600)
            if p.returncode != 0:
                sys.stderr.write(err)
                ok = False
        if not ok:
            return 1
        want = json.load(open(args.out + ".ref"))
        got = json.load(open(args.out))
        if want != got:
            sys.stderr.write(f"token mismatch:\nref={want}\ndist={got}\n")
            return 1
        print(json.dumps({"ok": True, "nprocs": args.nprocs,
                          "tp": args.tp, "dp": args.dp, "tokens": got}))
        return 0

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.proc_id < 0:
        # single-process reference on one CPU device mesh (tp=1, dp=1)
        toks = run_model(None, args.model)
        json.dump(toks, open(args.out, "w"))
        return 0

    from booster_tpu.parallel.distributed import init_distributed
    from booster_tpu.parallel.mesh import make_mesh

    init_distributed(f"127.0.0.1:{args.port}", args.nprocs, args.proc_id)
    mesh = make_mesh(args.tp * args.dp, tp=args.tp, dp=args.dp)
    toks = run_model(mesh, args.model)
    if jax.process_index() == 0:
        json.dump(toks, open(args.out, "w"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
