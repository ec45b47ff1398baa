#!/usr/bin/env python
"""Quantization quality report: perplexity Δ of quantized formats vs the
F16 reference on identical weights (BASELINE.md metric 3 tooling; the
reference's own roadmap lists perplexity as unimplemented, roadmap.md:44).

With no real checkpoint available in the build environment (zero egress),
the measurement runs on the synthetic benchmark model: identical random
weights are written at F16 / Q8_0 / Q4_K / Q4_0, and the NLL delta over a
fixed token corpus isolates exactly the quantization-induced distortion.

    python tools/quant_quality.py [--shape tiny|1b] [--tokens 4096] [--ctx 512]

Prints one JSON line: {"f16_ppl", "deltas": {fmt: ppl - f16_ppl, ...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/booster_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def requantize(src: str, dst: str, gt) -> None:
    """Rewrite a GGUF with all eligible 2-D weights at `gt` (the
    tools/quantize.py path, inlined so --model mode needs no subprocess)."""
    from booster_tpu.gguf import GGMLType, GGUFReader, GGUFWriter
    from booster_tpu.gguf.constants import TYPE_TRAITS
    from booster_tpu.quant import dequantize, quantize

    with GGUFReader(src) as r:
        w = GGUFWriter(alignment=r.alignment)
        for key, val in r.metadata.items():
            if key == "general.alignment":
                continue
            w.add(key, val)
        for info in r:
            raw = r.tensor_bytes(info)
            is_matrix = len(info.shape) >= 2 and "norm" not in info.name
            tt = gt if is_matrix else GGMLType.F32
            if tt != GGMLType.F32 and info.shape[-1] % TYPE_TRAITS[tt].block_size:
                tt = GGMLType.F16  # non-block-aligned rows
            if tt == info.ggml_type:
                data = bytes(raw)
            else:
                data = quantize(dequantize(raw, info.ggml_type,
                                           shape=info.shape), tt)
            w.add_tensor(info.name, data, info.shape, tt)
        w.write(dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="tiny", choices=["tiny", "1b"])
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--model", default="",
                    help="REAL checkpoint mode (BASELINE metric 3 proper): "
                         "an F16/BF16 GGUF — or an HF model dir, converted "
                         "via convert/hf.py — requantized to each format "
                         "and scored on --text")
    ap.add_argument("--text", default="",
                    help="text file for the real-checkpoint corpus "
                         "(tokenized with the model's own tokenizer); "
                         "required with --model")
    args = ap.parse_args()

    from booster_tpu.eval import perplexity
    from booster_tpu.gguf import GGMLType
    from booster_tpu.models import load_model
    from tools.make_test_model import make_model

    fmts = [("f16", GGMLType.F16), ("q8_0", GGMLType.Q8_0),
            ("q4_k", GGMLType.Q4_K), ("q4_0", GGMLType.Q4_0)]

    if args.model:
        # real-checkpoint mode: the moment a checkpoint is available this
        # produces the llama.cpp-comparable Q4-vs-F16 ppl delta
        src = os.path.expanduser(args.model)
        if os.path.isdir(src):  # HF model dir → GGUF first
            from booster_tpu.convert.hf import convert_hf_model

            out = os.path.join("/tmp", "qq_real_f16.gguf")
            convert_hf_model(src, out, quant="F16")
            src = out
        if not args.text:
            ap.error("--model requires --text (corpus file)")
        model = load_model(src)
        with open(args.text, encoding="utf-8") as f:
            corpus = np.asarray(model.tokenizer.encode(f.read()), np.int32)
        corpus = corpus[: args.tokens] if args.tokens else corpus
        results = {}
        r = perplexity(model, corpus, n_ctx=args.ctx)
        results["f16"] = r["ppl"]
        sys.stderr.write(f"[qq] f16: ppl {r['ppl']:.4f}\n")
        for name, fmt in fmts[1:]:
            path = f"/tmp/qq_real_{name}.gguf"
            if not os.path.exists(path):
                requantize(src, path, fmt)
            m = load_model(path)
            results[name] = perplexity(m, corpus, n_ctx=args.ctx)["ppl"]
            sys.stderr.write(f"[qq] {name}: ppl {results[name]:.4f}\n")
            if name == "q8_0":
                m2 = load_model(path, weights="i8c")
                results["q8_0+i8c"] = perplexity(m2, corpus,
                                                 n_ctx=args.ctx)["ppl"]
        f16 = results["f16"]
        print(json.dumps({
            "mode": "real",
            "model": args.model,
            "tokens": int(len(corpus)),
            "f16_ppl": round(f16, 4),
            "deltas": {n: round(v - f16, 4) for n, v in results.items()
                       if n != "f16"},
        }))
        return

    shapes = {
        "tiny": dict(vocab_size=512, hidden=256, layers=4, heads=8,
                     kv_heads=4, ff=512),
        "1b": dict(vocab_size=32000, hidden=2048, layers=22, heads=32,
                   kv_heads=4, ff=5632),
    }[args.shape]

    rng = np.random.default_rng(123)
    corpus = rng.integers(3, shapes["vocab_size"] - 1, args.tokens).astype(np.int32)

    results = {}
    for name, fmt in fmts:
        path = f"/tmp/qq_{args.shape}_{name}.gguf"
        if not os.path.exists(path):
            make_model(path, quant=fmt, seed=0, **shapes)  # same seed = same weights
        model = load_model(path)
        r = perplexity(model, corpus, n_ctx=args.ctx)
        results[name] = r["ppl"]
        sys.stderr.write(f"[qq] {name}: ppl {r['ppl']:.4f}\n")
        if name == "q8_0":
            # the lossy --weights i8c serving repack, measured off the same
            # q8_0 checkpoint (its realistic source format)
            m2 = load_model(path, weights="i8c")
            r2 = perplexity(m2, corpus, n_ctx=args.ctx)
            results["q8_0+i8c"] = r2["ppl"]
            sys.stderr.write(f"[qq] q8_0+i8c: ppl {r2['ppl']:.4f}\n")

    f16 = results["f16"]
    print(json.dumps({
        "mode": "synthetic",
        "caveat": ("random-weight model: deltas support RELATIVE ranking "
                   "only (q8_0 < i8c < q4_0) and are NOT comparable to "
                   "llama.cpp's real-checkpoint ppl deltas — use --model "
                   "for the BASELINE metric-3 number"),
        "shape": args.shape,
        "tokens": args.tokens,
        "f16_ppl": round(f16, 4),
        "deltas": {n: round(v - f16, 4) for n, v in results.items()
                   if n != "f16"},
    }))


if __name__ == "__main__":
    main()
