#!/usr/bin/env python
"""Requantize a GGUF model (llama-quantize analog).

    python tools/quantize.py in.gguf out.gguf Q4_K [--imatrix im.npz]

An importance matrix (from tools/imatrix.py) weights the Q4_0 rounding
toward high-activation columns (ggml-quants.c quant_weights paths).
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("type", help="target type (Q4_0, Q4_K, Q5_K, Q6_K, Q8_0, F16...)")
    ap.add_argument("--keep-output-f16", action="store_true",
                    help="keep the lm head at F16 (quality)")
    ap.add_argument("--imatrix", help="importance matrix .npz (tools/imatrix.py)")
    args = ap.parse_args()

    from booster_tpu.gguf import GGMLType, GGUFReader, GGUFWriter
    from booster_tpu.gguf.constants import TYPE_TRAITS
    from booster_tpu.quant import SUPPORTED_ENCODE, dequantize, quantize
    from booster_tpu.quant.imatrix import load_imatrix, quantize_imatrix

    imatrix = load_imatrix(args.imatrix) if args.imatrix else None

    target = GGMLType[args.type]
    if target not in SUPPORTED_ENCODE:
        sys.exit(f"cannot encode {target.name}; supported: "
                 f"{sorted(t.name for t in SUPPORTED_ENCODE)}")

    with GGUFReader(args.input) as r:
        w = GGUFWriter(alignment=r.alignment)
        for key, val in r.metadata.items():
            if key == "general.alignment":
                continue
            w.add(key, val)
        total_in = total_out = 0
        for info in r:
            raw = r.tensor_bytes(info)
            is_matrix = len(info.shape) >= 2 and "norm" not in info.name
            tt = target if is_matrix else GGMLType.F32
            if args.keep_output_f16 and info.name == "output.weight":
                tt = GGMLType.F16
            if tt != GGMLType.F32 and info.shape[-1] % TYPE_TRAITS[tt].block_size:
                tt = GGMLType.F16  # non-block-aligned rows
            if tt == info.ggml_type:
                data = bytes(raw)
            else:
                vals = dequantize(raw, info.ggml_type, shape=info.shape)
                qw = (imatrix or {}).get(info.name)
                if qw is not None and len(qw) == info.shape[-1]:
                    data = quantize_imatrix(vals, tt, qw)
                else:
                    data = quantize(vals, tt)
            w.add_tensor(info.name, data, info.shape, tt)
            total_in += info.nbytes
            total_out += len(data)
            print(f"  {info.name}: {info.ggml_type.name} -> {tt.name}", file=sys.stderr)
        w.write(args.output)
    print(f"{args.input} ({total_in/1e6:.1f} MB) -> {args.output} "
          f"({total_out/1e6:.1f} MB) as {target.name}")


if __name__ == "__main__":
    main()
