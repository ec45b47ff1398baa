#!/usr/bin/env python
"""Perplexity CLI: compare quantized vs FP models on a text file.

    python tools/perplexity.py model.gguf wiki.txt [--ctx 512]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("textfile")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=0)
    args = ap.parse_args()

    from booster_tpu.eval import perplexity
    from booster_tpu.models import load_model

    model = load_model(args.model)
    text = open(args.textfile, encoding="utf-8", errors="replace").read()
    ids = model.tokenizer.encode(text)
    if args.max_tokens:
        ids = ids[: args.max_tokens]
    print(f"tokens: {len(ids)}, chunks of {args.ctx}", file=sys.stderr)

    def progress(i, n, ppl):
        print(f"[{i}/{n}] ppl={ppl:.4f}", file=sys.stderr)

    result = perplexity(model, ids, n_ctx=args.ctx, progress=progress)
    print(f"perplexity: {result['ppl']:.4f} over {result['tokens']} tokens")


if __name__ == "__main__":
    main()
