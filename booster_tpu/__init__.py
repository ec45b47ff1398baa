"""booster-tpu: a TPU-native quantized LLM inference framework.

Built from scratch with the capabilities of gotzmann/booster (see SURVEY.md),
designed idiomatically for JAX/XLA/Pallas/pjit:

- ``booster_tpu.gguf``      — GGUF v2/v3 file reader/writer (mmap, zero-copy).
- ``booster_tpu.quant``     — ggml block quant formats (Q4_0..Q6_K, IQ*, F16)
                              decoded into TPU-friendly tiled int layouts.
- ``booster_tpu.tokenizer`` — SPM + byte-level-BPE tokenizers from GGUF vocab.
- ``booster_tpu.models``    — functional decoder forward passes (llama family,
                              mistral, qwen2, gemma2, phi3, mixtral ...).
- ``booster_tpu.ops``       — Pallas kernels: fused dequant matmul, flash /
                              paged attention with quantized KV.
- ``booster_tpu.sampling``  — on-device sampling suite incl. Janus.
- ``booster_tpu.parallel``  — mesh construction + named shardings (tp/dp).
- ``booster_tpu.serving``   — continuous-batching scheduler + async HTTP API
                              (/jobs, OpenAI, Ollama endpoints).
"""

__version__ = "0.1.0"
