"""Server configuration: CLI flags + JSON/YAML config files.

Parity with the reference's three-layer config
(/root/reference/pkg/booster/booster.go:52-90 Options;
 /root/reference/pkg/server/server.go:161-179 Config with pods/models/
 prompts/samplings maps; "8K"→8192 normalization at :143-163; sampling alias
 fields at :167-184).  Pods become engine slot-groups: `pods.N.batch` maps to
 continuous-batching slots.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

from booster_tpu.sampling import SamplingParams


def human_size(v: Any, default: int = 0) -> int:
    """'8K' → 8192, '1M' → 1048576; ints pass through."""
    if v is None:
        return default
    if isinstance(v, (int, float)):
        return int(v)
    s = str(v).strip().upper()
    if not s:
        return default
    mult = 1
    if s.endswith("K"):
        mult, s = 1024, s[:-1]
    elif s.endswith("M"):
        mult, s = 1024 * 1024, s[:-1]
    return int(float(s) * mult)


@dataclass
class ModelSpec:
    id: str
    path: str
    name: str = ""
    context: int = 8192
    predict: int = 1024
    janus: int = 0
    mirostat: int = 0
    temp: float = 0.1
    top_k: int = 8
    top_p: float = 0.4


@dataclass
class PromptSpec:
    id: str
    locale: str = "en_US"
    prompt: str = ""  # system preamble; {DATE} substituted
    system: str = "{PROMPT}"
    user: str = "\n{USER}"
    assistant: str = "\n{ASSISTANT}"


@dataclass
class PodSpec:
    id: str
    model: str = "default"
    prompt: str = "default"
    sampling: str = "default"
    count: int = 1  # replica slots (continuous-batching lanes)
    batch: int = 512  # prefill chunk tokens
    threads: int = 0  # accepted for config parity; XLA manages threads


@dataclass
class ServerConfig:
    id: str = "booster"
    host: str = "localhost"
    port: int = 8080
    log: str = ""
    deadline: int = 180  # seconds, queued-job eviction
    debug: str = ""
    swap: str = ""
    pods: dict[str, PodSpec] = field(default_factory=dict)
    models: dict[str, ModelSpec] = field(default_factory=dict)
    prompts: dict[str, PromptSpec] = field(default_factory=dict)
    samplings: dict[str, SamplingParams] = field(default_factory=dict)

    def validate(self) -> None:
        for pod_id, pod in self.pods.items():
            if pod.model not in self.models:
                raise ValueError(f"pod {pod_id}: unknown model {pod.model!r}")
            if pod.prompt not in self.prompts:
                raise ValueError(f"pod {pod_id}: unknown prompt {pod.prompt!r}")
            if pod.sampling not in self.samplings:
                raise ValueError(f"pod {pod_id}: unknown sampling {pod.sampling!r}")
        for mid, m in self.models.items():
            path = os.path.expanduser(m.path)
            if not os.path.exists(path):
                raise ValueError(f"model {mid}: file not found {path}")
            m.path = path


def _sampling_from_dict(d: dict) -> SamplingParams:
    """Accepts both the canonical and the alias field names the reference
    normalizes (temp/temperature, top_k/topk, repetition_penalty, ...)."""
    def pick(*names, default=None):
        for n in names:
            if n in d and d[n] is not None:
                return d[n]
        return default

    kw: dict[str, Any] = {}
    kw["temp"] = float(pick("temp", "temperature", default=0.8))
    kw["top_k"] = int(pick("top_k", "topk", default=40))
    kw["top_p"] = float(pick("top_p", "topp", default=0.95))
    kw["min_p"] = float(pick("min_p", "minp", default=0.05))
    kw["typical_p"] = float(pick("typical_p", "typicalp", default=1.0))
    kw["tfs_z"] = float(pick("tfs_z", "tfs", default=1.0))
    kw["penalty_repeat"] = float(
        pick("penalty_repeat", "repetition_penalty", "penaltyrepeat", default=1.0)
    )
    # frequency/presence penalties are first-class in the reference
    # (llama_sampling_params penalty_freq/penalty_present, common/sampling.h;
    # OpenAI-style frequency_penalty/presence_penalty aliases)
    kw["penalty_freq"] = float(
        pick("penalty_freq", "frequency_penalty", "penaltyfreq", default=0.0)
    )
    kw["penalty_present"] = float(
        pick("penalty_present", "presence_penalty", "penaltypresent", default=0.0)
    )
    kw["penalize_nl"] = bool(pick("penalize_nl", "penalizenl", default=True))
    last_n = int(pick("penalty_last_n", "penaltylastn", default=64))
    kw["penalty_last_n"] = 64 if last_n < 0 else last_n
    kw["dynatemp_range"] = float(
        pick("dynatemp_range", "dynatemprange", default=0.0))
    kw["dynatemp_exponent"] = float(
        pick("dynatemp_exponent", "dynatempexponent", default=1.0))
    kw["cfg_scale"] = float(pick("cfg_scale", "cfgscale", default=1.0))
    kw["cfg_negative_prompt"] = str(
        pick("cfg_negative_prompt", "negative_prompt", default=""))
    kw["samplers_sequence"] = str(
        pick("samplers_sequence", "samplers", default="kfypmt"))
    kw["mirostat"] = int(pick("mirostat", default=0))
    kw["mirostat_tau"] = float(pick("mirostat_tau", "mirostatent", default=5.0))
    kw["mirostat_eta"] = float(pick("mirostat_eta", "mirostatlr", default=0.1))
    kw["janus"] = int(pick("janus", default=0))
    kw["janus_depth"] = int(pick("janus_depth", "depth", default=200))
    kw["janus_scale"] = float(pick("janus_scale", "scale", default=0.97))
    kw["janus_hi"] = float(pick("hi", "janus_hi", default=0.99))
    kw["janus_lo"] = float(pick("lo", "janus_lo", default=0.96))
    kw["seed"] = int(pick("seed", default=-1))
    return SamplingParams(**kw)


def load_config(path: str) -> ServerConfig:
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml

        raw = yaml.safe_load(text)
    else:
        raw = json.loads(text)
    return config_from_dict(raw or {})


def config_from_dict(raw: dict) -> ServerConfig:
    cfg = ServerConfig(
        id=str(raw.get("id", "booster")),
        host=str(raw.get("host", "localhost")),
        port=int(raw.get("port", 8080)),
        log=str(raw.get("log", "") or ""),
        deadline=int(raw.get("deadline", 180)),
        debug=str(raw.get("debug", "") or ""),
        swap=str(raw.get("swap", "") or ""),
    )
    for mid, m in (raw.get("models") or {}).items():
        cfg.models[mid] = ModelSpec(
            id=mid,
            path=str(m.get("path", "")),
            name=str(m.get("name", mid)),
            context=human_size(m.get("context"), 8192),
            predict=human_size(m.get("predict"), 1024),
        )
    for pid, p in (raw.get("prompts") or {}).items():
        cfg.prompts[pid] = PromptSpec(
            id=pid,
            locale=str(p.get("locale", "en_US")),
            prompt=str(p.get("prompt", "")),
            system=str(p.get("system", "{PROMPT}")),
            user=str(p.get("user", "\n{USER}")),
            assistant=str(p.get("assistant", "\n{ASSISTANT}")),
        )
    for sid, s in (raw.get("samplings") or {}).items():
        cfg.samplings[sid] = _sampling_from_dict(s or {})
    for pod_id, p in (raw.get("pods") or {}).items():
        cfg.pods[pod_id] = PodSpec(
            id=pod_id,
            model=str(p.get("model", "default")),
            prompt=str(p.get("prompt", "default")),
            sampling=str(p.get("sampling", "default")),
            count=int(p.get("count", 1)),
            batch=human_size(p.get("batch"), 512),
            threads=int(p.get("threads", 0) or 0),
        )
    return cfg


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        "booster_tpu", description="TPU-native LLM inference server"
    )
    ap.add_argument("--model", help="path to a GGUF model file")
    ap.add_argument("--config", help="config file path (config.yaml/json by default)")
    ap.add_argument("--prompt", help="one-shot prompt text")
    ap.add_argument("--server", action="store_true", help="start REST API server")
    ap.add_argument("--chat", action="store_true", help="interactive chat mode")
    ap.add_argument("--host", default="localhost")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--log", default="", help="log file (JSON lines)")
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--silent", action="store_true", help="hide the logo")
    ap.add_argument("--deadline", type=int, default=180)
    ap.add_argument("--context", default="8K", help="context size (e.g. 8K)")
    ap.add_argument("--predict", default="1K", help="max tokens to predict")
    ap.add_argument("--batch-size", type=int, default=512, dest="batch_size")
    ap.add_argument("--slots", type=int, default=1, help="continuous-batching slots")
    ap.add_argument("--seed", type=int, default=-1)
    ap.add_argument("--temp", type=float, default=0.1)
    ap.add_argument("--top-k", type=int, default=8, dest="top_k")
    ap.add_argument("--top-p", type=float, default=0.4, dest="top_p")
    ap.add_argument("--typical-p", type=float, default=1.0, dest="typical_p")
    ap.add_argument("--penalty-repeat", type=float, default=1.1, dest="penalty_repeat")
    ap.add_argument("--penalty-last-n", type=int, default=-1, dest="penalty_last_n")
    ap.add_argument("--janus", type=int, default=0)
    ap.add_argument("--mirostat", type=int, default=0)
    ap.add_argument("--mirostat-ent", type=float, default=5.0, dest="mirostat_tau")
    ap.add_argument("--mirostat-lr", type=float, default=0.1, dest="mirostat_eta")
    ap.add_argument("--kv-quant", action="store_true", help="int8 KV cache")
    ap.add_argument("--weights", default="auto",
                    choices=("auto", "native", "bf16", "i8", "i8c"),
                    help="runtime weight-format repack: hold quantized "
                         "weights wider in HBM for decode speed. "
                         "bf16/i8 are exact; i8c is per-channel int8 "
                         "(LOSSY, mmq-style: one mixed bf16*int8 MXU dot, "
                         "fastest large-batch form at 1 byte/weight — "
                         "synthetic-model NLL delta ~3x q8_0's; requires "
                         "--allow-lossy). auto = bf16 when the model "
                         "comfortably fits")
    ap.add_argument("--allow-lossy", action="store_true", dest="allow_lossy",
                    help="acknowledge that --weights i8c changes model "
                         "outputs (per-channel requantization; measured "
                         "ranking q8_0 < i8c < q4_0 on the synthetic ppl "
                         "harness, tools/quant_quality.py — real-checkpoint "
                         "numbers need --model mode there)")
    ap.add_argument("--paged-kv", action="store_true",
                    help="paged KV cache (page pool + per-slot tables, "
                         "cross-slot shared-prefix page dedup)")
    ap.add_argument("--page-size", type=int, default=256,
                    help="paged KV page size in tokens (default 256)")
    ap.add_argument("--model-draft", default="", dest="model_draft",
                    help="draft model GGUF for speculative decoding. "
                         "NOTE (r5 chip measurements, BENCH_EXTRA_r05): a "
                         "draft only pays when it is much cheaper than the "
                         "target AND accepts most proposals — a same-size "
                         "draft caps at ~1x (k drafts + 1 verify for k+1 "
                         "tokens) and a poorly-matched one costs up to 5x. "
                         "For repetitive text, --lookup-decoding gives the "
                         "speedup with no draft model at all")
    ap.add_argument("--draft-k", type=int, default=8, dest="draft_k",
                    help="draft tokens per speculative round")
    ap.add_argument("--lookup-decoding", action="store_true",
                    dest="lookup_decoding",
                    help="prompt-lookup speculation (greedy): draft tokens "
                         "from the longest n-gram suffix match in the "
                         "context — free draft, big wins on repetitive/"
                         "extractive text (ngram-cache analog)")
    ap.add_argument("--grammar-file", default="", dest="grammar_file",
                    help="GBNF grammar constraining generation")
    ap.add_argument("--self-extend-group", type=int, default=0, dest="se_group")
    ap.add_argument("--self-extend-window", type=int, default=512, dest="se_window")
    ap.add_argument("--decode-chunk", type=int, default=8, dest="decode_chunk")
    ap.add_argument("--tp", type=int, default=0, help="tensor-parallel degree (0=auto)")
    ap.add_argument("--profile", nargs="?", const="/tmp/booster_tpu_trace",
                    default="", metavar="DIR",
                    help="write a JAX/TPU profiler trace to DIR "
                         "(the reference's pprof flag analog)")
    return ap


def config_from_args(args: argparse.Namespace) -> ServerConfig:
    """Build a single-pod config purely from CLI flags (reference behavior
    when no config file exists; defaults at booster.go:472-528)."""
    sampling = SamplingParams(
        temp=args.temp,
        top_k=args.top_k,
        top_p=args.top_p,
        typical_p=args.typical_p,
        penalty_repeat=args.penalty_repeat,
        penalty_last_n=64 if args.penalty_last_n < 0 else args.penalty_last_n,
        janus=args.janus,
        mirostat=args.mirostat,
        mirostat_tau=args.mirostat_tau,
        mirostat_eta=args.mirostat_eta,
        seed=args.seed,
    )
    cfg = ServerConfig(host=args.host, port=args.port, log=args.log,
                       deadline=args.deadline,
                       debug="all" if args.debug else "")
    cfg.models["default"] = ModelSpec(
        id="default",
        path=args.model or "",
        context=human_size(args.context, 8192),
        predict=human_size(args.predict, 1024),
    )
    cfg.prompts["default"] = PromptSpec(id="default")
    cfg.samplings["default"] = sampling
    cfg.pods["default"] = PodSpec(
        id="default", count=args.slots, batch=args.batch_size
    )
    return cfg
