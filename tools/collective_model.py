#!/usr/bin/env python
"""Analytic per-collective cost model for the megatron sharding plan.

Prints, for each driver-config model shape and tp degree, the bytes each
decode step moves over ICI and the projected overhead vs the weight-stream
floor — the numbers SCALING.md's projection table cites.  Pure arithmetic
(no devices needed): the plan in parallel/mesh.py PARAM_SPECS implies

  per layer:  psum(attn-out [B, C])  +  psum(ffn-down [B, C])
  per step :  all-gather(logits [B, V/tp] -> [B, V]) for the sampler

Ring collectives move 2*(tp-1)/tp * bytes per chip (all-reduce) and
(tp-1)/tp * bytes (all-gather).  v5e: ~200 GB/s/chip aggregate ICI
(public spec 1600 Gbps), ~1.5 us practical small-collective latency;
weight streams measured by tools/qmm_clean.py (K-major q4_0 ~365 GB/s,
q8_0 ~639 GB/s, bf16 ~604 GB/s on one chip).
"""

from __future__ import annotations

ICI_GBPS = 200e9  # per chip, aggregate (v5e public spec)
COLL_LAT = 1.5e-6  # practical per-collective launch+sync floor
HBM_GBPS = {"q4": 365e9, "q5": 450e9, "q8": 639e9, "bf16": 604e9}

CONFIGS = [
    # name, params(B), bits/w, C, L, V, wfmt
    ("config 2: Llama-3-8B Q4_K_M", 8.03e9, 4.85, 4096, 32, 128256, "q4"),
    ("config 3: Mistral-7B Q8_0", 7.24e9, 8.5, 4096, 32, 32000, "q8"),
    ("config 4: Gemma-2-27B Q5_K", 27.2e9, 5.5, 4608, 46, 256000, "q5"),
    ("config 5: Llama-3-70B Q4_K_M", 70.6e9, 4.85, 8192, 80, 128256, "q4"),
]


def step_model(params, bits, C, L, V, wfmt, tp, B=1):
    wbytes = params * bits / 8
    t_weights = wbytes / tp / HBM_GBPS[wfmt]
    # 2 ring all-reduces of [B, C] bf16 per layer + 1 logits all-gather
    ar = 2 * (tp - 1) / tp * (B * C * 2)
    ag = (tp - 1) / tp * (B * V * 2)
    ici_bytes = L * 2 * ar + ag
    n_coll = L * 2 + 1
    t_ici = ici_bytes / ICI_GBPS + (n_coll * COLL_LAT if tp > 1 else 0.0)
    return wbytes, t_weights, ici_bytes, n_coll, t_ici


def main():
    for name, p, bits, C, L, V, wf in CONFIGS:
        print(f"\n{name}  (C={C} L={L} V={V}, "
              f"{p * bits / 8 / 2**30:.1f} GiB quantized)")
        print(f"{'tp':>3} {'GiB/chip':>9} {'t_weights':>10} "
              f"{'ICI KB/tok':>11} {'colls':>6} {'t_ici':>9} {'overhead':>9} "
              f"{'tok/s/replica':>14}")
        for tp in (1, 2, 4, 8):
            wb, tw, ib, nc, ti = step_model(p, bits, C, L, V, wf, tp)
            tot = tw + ti
            print(f"{tp:>3} {wb / tp / 2**30:>9.2f} {tw * 1e3:>9.2f}ms "
                  f"{ib / 1e3:>10.1f} {nc:>6} {ti * 1e6:>8.1f}us "
                  f"{ti / tot * 100:>8.1f}% {1 / tot:>14.1f}")


if __name__ == "__main__":
    main()
