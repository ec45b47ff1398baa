#!/usr/bin/env python
"""Convert a local HuggingFace checkpoint directory to GGUF.

    python tools/convert_hf.py /path/to/hf_model out.gguf [--quant Q8_0]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("output")
    ap.add_argument("--quant", default="F16")
    args = ap.parse_args()

    import transformers

    from booster_tpu.convert import convert_hf_model
    from booster_tpu.gguf import GGMLType

    model = transformers.AutoModelForCausalLM.from_pretrained(
        args.model_dir, torch_dtype="float32", local_files_only=True
    )
    vocab_meta = {}
    try:
        tok = transformers.AutoTokenizer.from_pretrained(
            args.model_dir, local_files_only=True
        )
        # byte-level BPE vocabs convert directly; SPM needs the .model file
        if hasattr(tok, "get_vocab"):
            vocab = tok.get_vocab()
            ordered = [t for t, _ in sorted(vocab.items(), key=lambda kv: kv[1])]
            vocab_meta = {
                "tokenizer.ggml.model": "gpt2",
                "tokenizer.ggml.tokens": ordered,
                "tokenizer.ggml.bos_token_id": tok.bos_token_id or 0,
                "tokenizer.ggml.eos_token_id": tok.eos_token_id or 0,
            }
            merges = getattr(getattr(tok, "backend_tokenizer", None), "model", None)
    except Exception as e:  # tokenizer omitted, model still converts
        print(f"tokenizer not embedded: {e}", file=sys.stderr)

    path = convert_hf_model(
        model, tokenizer_vocab=vocab_meta, out_path=args.output,
        quant_type=GGMLType[args.quant],
    )
    print(path)


if __name__ == "__main__":
    main()
