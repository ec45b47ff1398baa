#!/usr/bin/env python
"""Collect an importance matrix from calibration text (llama-imatrix analog).

    python tools/imatrix.py model.gguf calib.txt -o imatrix.npz [--ctx 512]

The output feeds tools/quantize.py --imatrix: per-column mean squared input
activations weight the quantization rounding (ggml-quants.c quant_weights).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("textfile")
    ap.add_argument("-o", "--output", default="imatrix.npz")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=0)
    args = ap.parse_args()

    from booster_tpu.models import load_model
    from booster_tpu.quant.imatrix import collect_imatrix, save_imatrix

    model = load_model(args.model)
    text = open(args.textfile, encoding="utf-8", errors="replace").read()
    ids = model.tokenizer.encode(text)
    if args.max_tokens:
        ids = ids[: args.max_tokens]
    print(f"tokens: {len(ids)}, chunks of {args.ctx}", file=sys.stderr)

    def progress(i, n):
        print(f"[{i}/{n}]", file=sys.stderr)

    im = collect_imatrix(model, ids, n_ctx=args.ctx, progress=progress)
    save_imatrix(args.output, im)
    print(f"wrote {args.output}: {len(im)} tensors")


if __name__ == "__main__":
    main()
