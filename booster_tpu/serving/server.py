"""HTTP API server: Booster async /jobs API + OpenAI + Ollama endpoints.

Route parity: /root/reference/pkg/server/router.go:38-187 —
  POST/GET/DELETE /jobs, POST /v1/chat/completions, POST /api/chat (NDJSON
  streaming), GET /api/tags, GET /api/version, GET /health.
Upgrades over the reference: SSE streaming for /v1/chat/completions
(`"stream": true`), and token deltas pushed from the scheduler instead of the
reference's 1 s polling loop (router.go:113-179).
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Optional

from aiohttp import web

from booster_tpu import __version__
from booster_tpu.sampling import SamplingParams
from booster_tpu.serving.config import ServerConfig, _sampling_from_dict
from booster_tpu.serving.scheduler import (
    STATUS_FINISHED,
    STATUS_PROCESSING,
    STATUS_QUEUED,
    Scheduler,
)


def _chat_to_prompt(scheduler: Scheduler, messages: list[dict]) -> str:
    """buildCompletion (server.go:1339): render chat messages with the pod's
    prompt template."""
    spec = scheduler.prompt_spec
    import datetime

    date = datetime.datetime.now().strftime("%B %d, %Y")
    out = []
    assistant_parts = spec.assistant.split("{ASSISTANT}")
    a_prefix = assistant_parts[0]
    a_suffix = assistant_parts[1] if len(assistant_parts) > 1 else ""
    for m in messages:
        role = m.get("role", "user")
        content = str(m.get("content", ""))
        if role == "system":
            out.append(spec.system.replace("{PROMPT}", content.replace("{DATE}", date)))
        elif role == "assistant":
            out.append(a_prefix + content + a_suffix)
        else:
            out.append(spec.user.replace("{USER}", content))
    out.append(a_prefix)
    return "".join(out)


def make_app(scheduler: Scheduler, config: Optional[ServerConfig] = None,
             model_name: str = "default") -> web.Application:
    app = web.Application()
    started = time.time()

    def job_json(job) -> dict:
        return {
            "id": job.id,
            "status": job.status,
            "prompt": job.prompt,
            "output": job.output,
            "created": int(job.created_at),
            "started": int(job.started_at),
            "finished": int(job.finished_at),
            "model": model_name,
            "session": job.session_id,
            "finish_reason": job.finish_reason,
            "prompt_tokens": job.n_prompt_tokens,
            "completion_tokens": job.n_generated,
            # effective RNG seed — lets a sampled generation be reproduced
            # from the job record (reference getSeed, bridge.cpp:825-835)
            "seed": job.seed,
        }

    def _stop_list(body: dict) -> tuple[str, ...]:
        stop = body.get("stop")
        if stop is None:
            return ()
        if isinstance(stop, str):
            return (stop,) if stop else ()
        return tuple(str(s) for s in stop if s)

    # standard OpenAI sampling fields → SamplingParams (presence/frequency
    # penalties included — the reference treats them first-class,
    # llama-sampling.cpp repetition impl)
    _OPENAI_FIELDS = ("temperature", "top_p", "top_k", "seed",
                      "presence_penalty", "frequency_penalty",
                      "repetition_penalty", "min_p", "typical_p")

    def _openai_sampling(body: dict) -> Optional[SamplingParams]:
        present = {k: body[k] for k in _OPENAI_FIELDS if body.get(k) is not None}
        return _sampling_from_dict(present) if present else None

    # Ollama `options` (api/generate, api/chat): modelfile-parameter names
    _OLLAMA_FIELDS = ("temperature", "top_k", "top_p", "min_p", "seed",
                      "repeat_penalty", "repeat_last_n", "presence_penalty",
                      "frequency_penalty", "tfs_z", "typical_p", "mirostat",
                      "mirostat_tau", "mirostat_eta", "penalize_newline")
    _OLLAMA_ALIASES = {"repeat_penalty": "penalty_repeat",
                       "repeat_last_n": "penalty_last_n",
                       "penalize_newline": "penalize_nl"}

    def _ollama_request(body: dict) -> dict:
        """options → (sampling, max_tokens, stop) kwargs for place_job."""
        opts = body.get("options") or {}
        present = {
            _OLLAMA_ALIASES.get(k, k): opts[k]
            for k in _OLLAMA_FIELDS if opts.get(k) is not None
        }
        kw: dict = {
            "sampling": _sampling_from_dict(present) if present else None,
            "stop": _stop_list(opts) or _stop_list(body),
        }
        n = opts.get("num_predict")
        if n is not None and int(n) > 0:
            kw["max_tokens"] = int(n)
        return kw

    # -- Booster async jobs API ---------------------------------------------

    async def new_job(request: web.Request) -> web.Response:
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid JSON"}, status=400)
        job_id = str(body.get("id", "") or "")
        if job_id:
            try:
                uuid.UUID(job_id)
            except ValueError:
                return web.json_response(
                    {"error": "id must be a valid UUID v4"}, status=400
                )
            if job_id in scheduler.jobs:
                return web.json_response({"error": "duplicate id"}, status=400)
        prompt = str(body.get("prompt", "") or "")
        if not prompt and not body.get("session"):
            return web.json_response({"error": "prompt is empty"}, status=400)
        sampling = None
        if isinstance(body.get("sampling"), dict):
            sampling = _sampling_from_dict(body["sampling"])
        try:
            job = scheduler.place_job(
                job_id=job_id,
                prompt=prompt,
                session_id=str(body.get("session", "") or ""),
                sampling=sampling,
                max_tokens=int(body.get("max_tokens", 0) or 0),
                grammar=str(body.get("grammar", "") or ""),
                stop=_stop_list(body),
            )
        except RuntimeError:
            return web.json_response({"error": "shutting down"}, status=503)
        return web.json_response(job_json(job), status=201)

    async def get_job(request: web.Request) -> web.Response:
        job = scheduler.jobs.get(request.match_info["id"])
        if job is None:
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response(job_json(job))

    async def delete_job(request: web.Request) -> web.Response:
        if not scheduler.stop_job(request.match_info["id"]):
            return web.json_response({"error": "not found"}, status=404)
        return web.json_response({"status": "stopped"})

    # -- OpenAI API ----------------------------------------------------------

    async def chat_completions(request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid JSON"}, status=400)
        messages = body.get("messages") or []
        if not messages:
            return web.json_response({"error": "messages required"}, status=400)
        full_prompt = _chat_to_prompt(scheduler, messages)
        sampling = _openai_sampling(body)
        grammar = ""
        rf = body.get("response_format") or {}
        if rf.get("type") == "json_schema":
            from booster_tpu.grammar import json_schema_to_gbnf

            schema = (rf.get("json_schema") or {}).get("schema", rf.get("json_schema"))
            grammar = json_schema_to_gbnf(schema or {})
        elif rf.get("type") == "json_object":
            from booster_tpu.grammar import json_schema_to_gbnf

            grammar = json_schema_to_gbnf({"type": "object"})
        job = scheduler.place_job(
            prompt="",
            full_prompt=full_prompt,
            sampling=sampling,
            max_tokens=int(body.get("max_tokens", 0) or 0),
            grammar=grammar,
            stop=_stop_list(body),
        )
        created = int(time.time())
        if body.get("stream"):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream",
                         "Cache-Control": "no-cache"}
            )
            await resp.prepare(request)
            sent = 0
            while True:
                await asyncio.sleep(0.05)
                delta = job.output[sent:]
                if delta:
                    sent += len(delta)
                    chunk = {
                        "id": f"chatcmpl-{job.id}",
                        "object": "chat.completion.chunk",
                        "created": created,
                        "model": model_name,
                        "choices": [{"index": 0,
                                     "delta": {"content": delta},
                                     "finish_reason": None}],
                    }
                    await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
                if job._done.is_set() and sent >= len(job.output):
                    chunk = {
                        "id": f"chatcmpl-{job.id}",
                        "object": "chat.completion.chunk",
                        "created": created,
                        "model": model_name,
                        "choices": [{"index": 0, "delta": {},
                                     "finish_reason": job.finish_reason or "stop"}],
                    }
                    await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
                    await resp.write(b"data: [DONE]\n\n")
                    break
            await resp.write_eof()
            return resp

        try:
            await scheduler.wait_job(job.id, timeout=float(
                request.headers.get("X-Timeout", scheduler.deadline_s)
            ))
        except asyncio.TimeoutError:
            scheduler.stop_job(job.id)
            return web.json_response({"error": "deadline exceeded"}, status=504)
        return web.json_response({
            "id": f"chatcmpl-{job.id}",
            "object": "chat.completion",
            "created": created,
            "model": model_name,
            "choices": [{
                "index": 0,
                "message": {"role": "assistant", "content": job.output},
                "finish_reason": job.finish_reason or "stop",
            }],
            "usage": {
                "prompt_tokens": job.n_prompt_tokens,
                "completion_tokens": job.n_generated,
                "total_tokens": job.n_prompt_tokens + job.n_generated,
            },
        })

    async def completions(request: web.Request) -> web.Response:
        """OpenAI legacy /v1/completions (raw prompt, non-chat)."""
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid JSON"}, status=400)
        prompt = body.get("prompt")
        if isinstance(prompt, list):
            prompt = prompt[0] if prompt else ""
        if not prompt:
            return web.json_response({"error": "prompt required"}, status=400)
        sampling = _openai_sampling(body)
        job = scheduler.place_job(
            prompt="", full_prompt=str(prompt), sampling=sampling,
            max_tokens=int(body.get("max_tokens", 0) or 0),
            stop=_stop_list(body),
        )
        try:
            await scheduler.wait_job(job.id, timeout=scheduler.deadline_s)
        except asyncio.TimeoutError:
            scheduler.stop_job(job.id)
            return web.json_response({"error": "deadline exceeded"}, status=504)
        return web.json_response({
            "id": f"cmpl-{job.id}",
            "object": "text_completion",
            "created": int(time.time()),
            "model": model_name,
            "choices": [{"index": 0, "text": job.output,
                         "finish_reason": job.finish_reason or "stop"}],
            "usage": {
                "prompt_tokens": job.n_prompt_tokens,
                "completion_tokens": job.n_generated,
                "total_tokens": job.n_prompt_tokens + job.n_generated,
            },
        })

    async def list_models(request: web.Request) -> web.Response:
        return web.json_response({
            "object": "list",
            "data": [{"id": model_name, "object": "model",
                      "created": int(started), "owned_by": "booster-tpu"}],
        })

    # -- Ollama API ----------------------------------------------------------

    async def ollama_chat(request: web.Request) -> web.StreamResponse:
        """NDJSON streaming chat (router.go:89-179)."""
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid JSON"}, status=400)
        messages = body.get("messages") or []
        full_prompt = _chat_to_prompt(scheduler, messages)
        job = scheduler.place_job(prompt="", full_prompt=full_prompt,
                                  **_ollama_request(body))
        stream = body.get("stream", True)

        if not stream:
            await scheduler.wait_job(job.id, timeout=scheduler.deadline_s)
            return web.json_response({
                "model": model_name,
                "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "message": {"role": "assistant", "content": job.output},
                "done": True,
                "done_reason": job.finish_reason or "stop",
            })

        resp = web.StreamResponse(
            headers={"Content-Type": "application/x-ndjson"}
        )
        await resp.prepare(request)
        sent = 0
        while True:
            await asyncio.sleep(0.05)
            delta = job.output[sent:]
            if delta:
                sent += len(delta)
                line = {
                    "model": model_name,
                    "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "message": {"role": "assistant", "content": delta},
                    "done": False,
                }
                await resp.write((json.dumps(line) + "\n").encode())
            if job._done.is_set() and sent >= len(job.output):
                line = {
                    "model": model_name,
                    "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "message": {"role": "assistant", "content": ""},
                    "done": True,
                    "done_reason": job.finish_reason or "stop",
                }
                await resp.write((json.dumps(line) + "\n").encode())
                break
        await resp.write_eof()
        return resp

    async def ollama_generate(request: web.Request) -> web.StreamResponse:
        """Ollama /api/generate: raw-prompt NDJSON streaming."""
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"error": "invalid JSON"}, status=400)
        prompt = str(body.get("prompt", "") or "")
        if not prompt:
            return web.json_response({"error": "prompt required"}, status=400)
        raw = bool(body.get("raw", False))
        job = scheduler.place_job(
            prompt="" if raw else prompt,
            full_prompt=prompt if raw else "",
            **_ollama_request(body),
        )
        if not body.get("stream", True):
            await scheduler.wait_job(job.id, timeout=scheduler.deadline_s)
            return web.json_response({
                "model": model_name,
                "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "response": job.output,
                "done": True,
                "done_reason": job.finish_reason or "stop",
            })
        resp = web.StreamResponse(headers={"Content-Type": "application/x-ndjson"})
        await resp.prepare(request)
        sent = 0
        while True:
            await asyncio.sleep(0.05)
            delta = job.output[sent:]
            if delta:
                sent += len(delta)
                await resp.write((json.dumps({
                    "model": model_name,
                    "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "response": delta,
                    "done": False,
                }) + "\n").encode())
            if job._done.is_set() and sent >= len(job.output):
                await resp.write((json.dumps({
                    "model": model_name,
                    "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    "response": "",
                    "done": True,
                    "done_reason": job.finish_reason or "stop",
                }) + "\n").encode())
                break
        await resp.write_eof()
        return resp

    async def ollama_tags(request: web.Request) -> web.Response:
        return web.json_response({"models": [{
            "name": model_name, "model": model_name,
            "modified_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(started)),
            "size": 0, "digest": "", "details": {"format": "gguf"},
        }]})

    async def version(request: web.Request) -> web.Response:
        return web.json_response({"version": __version__})

    async def health(request: web.Request) -> web.Response:
        return web.json_response(scheduler.health())

    async def embeddings(request: web.Request) -> web.Response:
        """OpenAI-style /v1/embeddings (encoder models — bert family)."""
        engine = scheduler.engine
        if engine.cfg.arch not in ("bert", "nomic-bert", "jina-bert-v2"):
            return web.json_response(
                {"error": f"model arch '{engine.cfg.arch}' is not an "
                          "embedding model"}, status=400)
        try:
            body = await request.json()
        except Exception:
            return web.json_response({"error": "invalid json"}, status=400)
        inputs = body.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        if not inputs or not all(isinstance(t, str) for t in inputs):
            return web.json_response({"error": "input required"}, status=400)

        from booster_tpu.models.bert import embed_texts

        loop = asyncio.get_event_loop()
        vecs = await loop.run_in_executor(
            None, lambda: embed_texts(engine.model, inputs)
        )
        return web.json_response({
            "object": "list",
            "model": model_name,
            "data": [
                {"object": "embedding", "index": i,
                 "embedding": [float(x) for x in v]}
                for i, v in enumerate(vecs)
            ],
            "usage": {"prompt_tokens": sum(len(t.split()) for t in inputs),
                      "total_tokens": sum(len(t.split()) for t in inputs)},
        })

    app.router.add_post("/jobs", new_job)
    app.router.add_post("/v1/embeddings", embeddings)
    app.router.add_get("/jobs/{id}", get_job)
    app.router.add_delete("/jobs/{id}", delete_job)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/completions", completions)
    app.router.add_get("/v1/models", list_models)
    app.router.add_post("/api/chat", ollama_chat)
    app.router.add_post("/api/generate", ollama_generate)
    app.router.add_get("/api/tags", ollama_tags)
    app.router.add_get("/api/version", version)
    app.router.add_get("/health", health)
    return app
