"""CLI entry: `python -m booster_tpu [--server|--chat|--prompt ...]`.

Lifecycle parity: /root/reference/pkg/booster/booster.go:102 Run() —
flag parsing → config feed → logger → signal handling → server or
interactive loop; graceful shutdown drains the queue.
"""

from __future__ import annotations

import asyncio
import logging
import os
import signal
import sys
import uuid

LOGO = r"""
 ___                  _               _____ ___  _   _
| . > ___  ___  ___ _| |_ ___  _ _   |_   _| . \| | | |
| . \/ . \/ . \<_-<  | | / ._>| '_>    | | |  _/| ' | |
|___/\___/\___//__/  |_| \___.|_|      |_| |_|  `___'
"""


def main(argv=None) -> int:
    from booster_tpu.serving.config import (
        build_arg_parser,
        config_from_args,
        load_config,
    )
    from booster_tpu.utils import setup_logging

    args = build_arg_parser().parse_args(argv)
    log = setup_logging(args.log, args.debug)

    # persistent jit cache: remote-TPU compiles take minutes; restarts and
    # repeat invocations should hit the cache (must be set before first
    # backend use)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/booster_tpu_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    config = None
    for candidate in ([args.config] if args.config else ["config.yaml", "config.json"]):
        if candidate and os.path.exists(candidate):
            config = load_config(candidate)
            log.info(f"config loaded from {candidate}")
            break
    if config is None or args.model:
        config = config_from_args(args)
    config.host = args.host if args.host != "localhost" or not config.host else config.host
    if args.port != 8080:
        config.port = args.port

    if not args.silent:
        print(LOGO)

    model_spec = next(iter(config.models.values()), None)
    if model_spec is None or not model_spec.path:
        log.error("no model specified (use --model or a config file)")
        return 1
    if not os.path.exists(os.path.expanduser(model_spec.path)):
        log.error(f"model file not found: {model_spec.path}")
        return 1

    import jax

    from booster_tpu.models import load_model
    from booster_tpu.sampling import SamplingParams
    from booster_tpu.serving import Engine
    from booster_tpu.serving.config import PodSpec
    from booster_tpu.serving.scheduler import Scheduler

    if args.weights == "i8c" and not getattr(args, "allow_lossy", False):
        log.error(
            "--weights i8c is LOSSY (per-channel int8 requantization; "
            "synthetic-harness NLL delta ~3x q8_0's — tools/quant_quality.py"
            "); pass --allow-lossy to acknowledge, or use the exact repacks "
            "--weights bf16|i8|auto"
        )
        return 2
    log.info(f"loading model {model_spec.path} on {jax.default_backend()}")
    device_put = None
    if args.tp and args.tp > 1:
        from booster_tpu.parallel import make_device_put, make_mesh

        mesh = make_mesh(tp=args.tp, dp=1)
        device_put = make_device_put(mesh)
        log.info(f"tensor-parallel over {args.tp} devices")
    pod_hint = next(iter(config.pods.values()), None)
    batch_hint = max(pod_hint.count, 1) if (args.server and pod_hint) else 1
    model = load_model(os.path.expanduser(model_spec.path),
                       device_put=device_put, weights=args.weights,
                       batch_hint=batch_hint)
    log.info(
        f"arch={model.cfg.arch} layers={model.cfg.n_layers} "
        f"embd={model.cfg.n_embd} vocab={model.cfg.n_vocab}"
    )

    pod = next(iter(config.pods.values()), PodSpec(id="default"))
    sampling = config.samplings.get(pod.sampling, SamplingParams())
    prompt_spec = config.prompts.get(pod.prompt)

    if model.cfg.arch == "t5":
        # encoder-decoder: explicit-state generation (no KV-cache Engine);
        # one-shot CLI only
        if not args.prompt or args.server or args.chat:
            log.error(f"arch {model.cfg.arch}: only one-shot --prompt mode")
            return 1
        from booster_tpu.models.t5 import generate_t5

        ids = model.tokenizer.encode(args.prompt)
        out = generate_t5(model, ids, max_new_tokens=model_spec.predict,
                          temp=sampling.temp)
        print(model.tokenizer.decode(out))
        return 0
    # mamba (recurrent) runs through the same Engine/scheduler as attention
    # models — MambaCache replaces the KVCache (llama.cpp:2711 analog)
    engine = Engine(
        model,
        max_batch=max(pod.count, 1),
        max_seq=model_spec.context,
        kv_quantized=args.kv_quant,
        decode_chunk=args.decode_chunk,
        paged=args.paged_kv,
        page_size=args.page_size,
    )

    profiling = bool(getattr(args, "profile", ""))
    if profiling:
        # pkg/profile pprof analog: device-level trace viewable in
        # tensorboard / xprof (booster.go:84,:189-191)
        platform = jax.devices()[0].platform
        if platform == "axon":
            # the remote-TPU tunnel cannot serve device traces (start/stop
            # hang); profile on a directly-attached backend instead
            log.warning("--profile unsupported on the remote 'axon' tunnel; "
                        "skipping trace")
        else:
            jax.profiler.start_trace(args.profile)
            log.info(f"profiler trace -> {args.profile}")
            import atexit

            atexit.register(jax.profiler.stop_trace)

    if args.prompt and not args.server and not args.chat:
        # one-shot generation (plain / speculative / grammar-constrained)
        ids = model.tokenizer.encode(args.prompt)
        if model.cfg.arch == "mamba":
            from booster_tpu.models.mamba import generate_mamba

            out = generate_mamba(model, ids, max_new_tokens=model_spec.predict,
                                 temp=sampling.temp)
            print(model.tokenizer.decode(out))
            return 0
        if args.lookup_decoding:
            from booster_tpu.serving.speculative import (
                generate_lookup_chained,
            )

            if sampling.temp > 0:
                log.warning(
                    "--lookup-decoding is greedy-only: temperature/top-k "
                    "and other sampling settings are ignored")
            result = generate_lookup_chained(
                engine, ids, max_new_tokens=model_spec.predict,
                k=args.draft_k,
            )
            log.info(f"lookup acceptance {result.acceptance_rate:.0%}")
        elif args.model_draft:
            from booster_tpu.serving.speculative import generate_speculative

            draft_model = load_model(os.path.expanduser(args.model_draft), weights=args.weights)
            draft = Engine(draft_model, max_batch=1, max_seq=model_spec.context)
            result = generate_speculative(
                engine, draft, ids, max_new_tokens=model_spec.predict,
                k=args.draft_k,
            )
            log.info(f"speculative acceptance {result.acceptance_rate:.0%}")
        elif args.grammar_file:
            gbnf = open(args.grammar_file).read()
            result = engine.generate_grammar(
                ids, gbnf, sampling, max_new_tokens=model_spec.predict
            )
        else:
            result = engine.generate(
                ids, sampling, max_new_tokens=model_spec.predict,
                self_extend_group=args.se_group,
                self_extend_window=args.se_window,
            )
        print(result.text)
        log.info(
            f"prompt {result.prompt_ms_per_token:.1f} ms/tok · "
            f"generate {result.gen_ms_per_token:.1f} ms/tok · "
            f"{result.n_generated} tokens [{result.finish_reason}]"
        )
        return 0

    draft_engine = None
    if args.model_draft:
        draft_model = load_model(os.path.expanduser(args.model_draft), weights=args.weights)
        # batched multi-slot speculation: the draft mirrors the target's
        # slot layout (serving/spec_batch.py)
        draft_engine = Engine(draft_model, max_batch=engine.max_batch,
                              max_seq=engine.max_seq)

    scheduler = Scheduler(
        engine,
        prompt_spec=prompt_spec,
        default_sampling=sampling,
        default_max_tokens=model_spec.predict,
        deadline_s=config.deadline,
        swap_dir=config.swap,
        draft_engine=draft_engine,
        lookup_decoding=args.lookup_decoding,
    )

    if args.server:
        from aiohttp import web

        from booster_tpu.serving.server import make_app

        log.info("warming up (compiling prefill + decode)...")
        engine.warmup()
        if draft_engine is not None:
            draft_engine.warmup()
        log.info("warmup done")

        async def monitor():
            """--debug job monitor (booster.go:374-435): periodic job table."""
            import sys as _sys

            while True:
                await asyncio.sleep(2.0)
                h = scheduler.health()
                rows = [
                    f"  {j.id[:8]}  {j.status:<10} in:{j.n_prompt_tokens:<5} "
                    f"out:{j.n_generated:<5} {j.finish_reason or '-'}"
                    for j in list(scheduler.jobs.values())[-16:]
                ]
                _sys.stderr.write(
                    f"[monitor] slots {h['slots_busy']}/{h['slots_total']} "
                    f"queued {h['jobs_queued']} tok/s {h['tokens_per_sec']} "
                    f"ttft_p50 {h['ttft_p50_ms']}ms\n" + "\n".join(rows)
                    + ("\n" if rows else "")
                )

        async def serve():
            scheduler.start()
            if args.debug:
                asyncio.get_event_loop().create_task(monitor())
            app = make_app(scheduler, config, model_name=model_spec.name or "default")
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, config.host, config.port)
            await site.start()
            log.info(f"listening on http://{config.host}:{config.port}")
            stop = asyncio.Event()
            loop = asyncio.get_event_loop()
            for sig in (signal.SIGINT, signal.SIGTERM):
                loop.add_signal_handler(sig, stop.set)
            await stop.wait()
            log.info("shutting down (draining jobs)...")
            await scheduler.shutdown(drain=True)
            await runner.cleanup()

        asyncio.run(serve())
        return 0

    # interactive chat loop (booster.go:316-370; console.cpp color handling)
    async def chat():
        from booster_tpu.utils.console import CYAN, DIM, GREEN, colorize, stream_print

        scheduler.start()
        session = str(uuid.uuid4())
        print(colorize("chat mode — empty line or Ctrl-D to exit", DIM))
        loop = asyncio.get_event_loop()
        prompt_str = colorize("\n> ", CYAN)
        while True:
            try:
                line = await loop.run_in_executor(None, input, prompt_str)
            except EOFError:
                break
            if not line.strip():
                break
            job = scheduler.place_job(prompt=line, session_id=session)
            printed = 0
            while not job._done.is_set():
                await asyncio.sleep(0.1)
                delta = job.output[printed:]
                if delta:
                    printed += len(delta)
                    stream_print(delta, GREEN)
            stream_print(job.output[printed:], GREEN)
        await scheduler.shutdown(drain=False)

    asyncio.run(chat())
    return 0


if __name__ == "__main__":
    sys.exit(main())
