"""Generation engine: compiled prefill/decode steps over a slot-based batch.

This is the TPU-native replacement for the reference's per-pod generation loop
(do_inference, /root/reference/cpp/bridge.cpp:175-658): instead of one model
instance per concurrent request, one engine owns a static-shape KV cache with
B slots and runs *batched* decode steps; the scheduler (scheduler.py) maps
requests onto slots (continuous batching — the reference's roadmap item).

Context overflow handling reproduces the reference's context-shift semantics
(bridge.cpp:487-507): keep the first n_keep tokens, drop half the rest, at the
engine level by re-prefilling the compacted history (simpler than in-cache
shifts, identical observable behavior).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from booster_tpu.models.config import ModelConfig
from booster_tpu.models.llama import forward as _dense_forward
from booster_tpu.models.loader import LoadedModel
from booster_tpu.ops.kv_cache import KVCache
from booster_tpu.sampling import (
    JanusTables,
    SamplerState,
    SamplingParams,
    janus_sample,
    make_sampler_state,
    make_seeded_state,
)
from booster_tpu.sampling.samplers import (
    accept_token,
    apply_guidance,
    sample,
    seed_prompt_row,
)


def forward(params, cfg: ModelConfig, tokens, cache, **kw):
    """Per-arch forward dispatch (cfg is a static jit arg, so this resolves
    at trace time): attention models run llama.forward over a KVCache;
    the recurrent family runs mamba.forward_slots over a MambaCache."""
    if cfg.arch == "mamba":
        from booster_tpu.models.mamba import forward_slots

        return forward_slots(params, cfg, tokens, cache, **kw)
    return _dense_forward(params, cfg, tokens, cache, **kw)


@dataclasses.dataclass
class GenerationResult:
    token_ids: list[int]
    text: str
    n_prompt: int
    n_generated: int
    prompt_ms_per_token: float
    gen_ms_per_token: float
    finish_reason: str  # "stop" | "length" | "cancelled"


def _se_rope_positions(lengths, se_group: int, se_window: int):
    """Self-Extend position compression (bridge.cpp:509-525 semantics):
    positions beyond the window advance at 1/g — the effective rope range
    stays within the trained context."""
    pos = lengths[:, None]
    return jnp.where(
        pos < se_window, pos, se_window + (pos - se_window) // se_group
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "params_sampling", "se_group",
                                   "se_window", "nl_token"),
         donate_argnames=("cache", "state"))
def _decode_step(
    params,
    cfg: ModelConfig,
    cache: KVCache,
    tokens: jnp.ndarray,  # [B, 1]
    state: SamplerState,
    params_sampling: SamplingParams,
    max_predict: jnp.ndarray,  # scalar f32 (traced: avoids recompiles)
    janus_scales=None,
    janus_types=None,
    janus_pedantic=None,
    janus_eos: int = 0,
    se_group: int = 0,
    se_window: int = 0,
    nl_token: int = -1,
):
    rope_positions = (
        _se_rope_positions(cache.lengths, se_group, se_window)
        if se_group > 1 else None
    )
    logits, cache = forward(params, cfg, tokens, cache, last_only=True,
                            rope_positions=rope_positions)
    lg = logits[:, -1, :]
    if params_sampling.janus:
        keys = jax.vmap(jax.random.split, in_axes=(0, None))(state.key, 2)
        step_key, next_key = keys[:, 0], keys[:, 1]
        next_tok = janus_sample(
            lg,
            state.prev_tokens,
            state.prev_pos,
            state.prompt_len,
            max_predict,
            janus_scales,
            janus_types,
            janus_pedantic,
            janus_eos,
            params_sampling,
            step_key,
        )
        state = SamplerState(state.prev_tokens, state.prev_pos,
                             state.mirostat_mu, next_key, state.prompt_len)
        state = accept_token(state, next_tok)
    else:
        next_tok, state = sample(lg, state, params_sampling, nl_token)
    return next_tok, cache, state


@partial(jax.jit, static_argnames=("cfg", "params_sampling", "n_steps",
                                   "se_group", "se_window", "nl_token"),
         donate_argnames=("cache", "state"))
def _decode_chunk(
    params,
    cfg: ModelConfig,
    cache: KVCache,
    tokens: jnp.ndarray,  # [B, 1] last sampled token per slot
    state: SamplerState,
    params_sampling: SamplingParams,
    max_predict: jnp.ndarray,
    n_steps: int,
    eog_mask: jnp.ndarray,  # [V] bool: True at end-of-generation token ids
    janus_scales=None,
    janus_types=None,
    janus_pedantic=None,
    janus_eos: int = 0,
    se_group: int = 0,
    se_window: int = 0,
    nl_token: int = -1,
):
    """Run `n_steps` decode iterations fully on device (one dispatch).

    Amortizes host↔device round-trips: the reference pays one cgo call per
    token (bridge.cpp:467-643); a remote TPU pays ~100ms per dispatch, so we
    scan the step on device and stream per chunk.  Once a slot emits an EOG
    token it keeps decoding (static shapes) but `done` marks where to cut.
    """

    def step(carry, _):
        cache, tok, state = carry
        next_tok, cache, state = _decode_step(
            params, cfg, cache, tok, state, params_sampling, max_predict,
            janus_scales, janus_types, janus_pedantic, janus_eos,
            se_group, se_window, nl_token,
        )
        return (cache, next_tok[:, None], state), next_tok

    (cache, _, state), toks = jax.lax.scan(
        step, (cache, tokens, state), None, length=n_steps
    )
    toks = toks.T  # [B, n_steps]
    done = eog_mask[toks]
    return toks, done, cache, state


@partial(jax.jit, static_argnames=("cfg", "params_sampling", "n_steps", "nl_token"),
         donate_argnames=("cache", "gcache", "state"))
def _decode_chunk_cfg(
    params,
    cfg: ModelConfig,
    cache: KVCache,
    gcache: KVCache,  # guidance (negative-prompt) context cache
    tokens: jnp.ndarray,  # [B, 1]
    state: SamplerState,
    params_sampling: SamplingParams,
    n_steps: int,
    eog_mask: jnp.ndarray,
    nl_token: int = -1,
):
    """Decode chunk with classifier-free guidance: every step runs the model
    over both the main and the guidance context (reference: ctx_guidance in
    llama_sampling_sample_impl, common/sampling.cpp) and combines the logit
    rows with apply_guidance before the sampler chain.

    This dedicated path remains only for paged engines (scheduler routes
    everything else to the batched CFG in _decode_chunk_vec, which also
    composes with janus/mirostat/self-extend).  Limitations here: the
    chain is samplers.sample (no janus) and no self-extend positions —
    combinations needing those use a dense cache and ride the batch."""

    def step(carry, _):
        cache, gcache, tok, state = carry
        logits, cache = forward(params, cfg, tok, cache, last_only=True)
        glogits, gcache = forward(params, cfg, tok, gcache, last_only=True)
        lg = apply_guidance(
            logits[:, -1, :], glogits[:, -1, :], params_sampling.cfg_scale
        )
        nxt, state = sample(lg, state, params_sampling, nl_token)
        return (cache, gcache, nxt[:, None], state), nxt

    (cache, gcache, _, state), toks = jax.lax.scan(
        step, (cache, gcache, tokens, state), None, length=n_steps
    )
    toks = toks.T
    done = eog_mask[toks]
    return toks, done, cache, gcache, state


@partial(jax.jit, static_argnames=("cfg", "params_sampling", "nl_token"),
         donate_argnames=("cache", "state"))
def _masked_decode_step(
    params,
    cfg: ModelConfig,
    cache: KVCache,
    tokens: jnp.ndarray,  # [B, 1]
    state: SamplerState,
    params_sampling: SamplingParams,
    mask: jnp.ndarray,  # [V] bool: grammar-feasible tokens
    nl_token: int = -1,
):
    """One decode step sampling only grammar-feasible tokens (full chain
    applied first, infeasible logits at -inf — common/sampling.cpp:430)."""
    logits, cache = forward(params, cfg, tokens, cache, last_only=True)
    lg = jnp.where(mask[None, :], logits[:, -1, :], -jnp.inf)
    tok, state = sample(lg, state, params_sampling, nl_token)
    return tok, cache, state


@partial(jax.jit, static_argnames=("cfg", "features", "nl_token"),
         donate_argnames=("cache", "state"))
def _prefill_batched(params, cfg: ModelConfig, cache: KVCache, tokens, n_valid,
                     state: SamplerState, vp, admit_mask,
                     features=(), janus_tables=None, nl_token: int = -1,
                     guidance_logits=None):
    """Prefill any subset of slots (n_valid=0 rows are no-ops) and sample the
    first token for admitted rows.  With "cfg" in features, rows with an
    active cfg_scale combine with their guidance context's last-position
    logits (captured by prefill_guidance) before sampling."""
    from booster_tpu.sampling.vector import sample_vectorized

    gather = jnp.maximum(n_valid - 1, 0)
    logits, cache = forward(
        params, cfg, tokens, cache, gather_idx=gather, n_valid=n_valid
    )
    lg = logits[:, 0, :]
    if "cfg" in features and guidance_logits is not None:
        cfg_on = vp.cfg_scale != 1.0
        guided = apply_guidance(lg, guidance_logits, vp.cfg_scale[:, None])
        lg = jnp.where(cfg_on[:, None], guided, lg)
    tok, state = sample_vectorized(
        lg, state, vp, mask=admit_mask,
        features=features, janus_tables=janus_tables, nl_token=nl_token,
    )
    return tok, cache, state


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("gcache",))
def _prefill_guidance_chunk(params, cfg: ModelConfig, gcache, tokens, n_valid):
    """Advance guidance contexts by a chunk of negative-prompt tokens (rows
    with n_valid=0 are no-ops); returns the last-position logit rows (used
    by _prefill_batched to guide the first sampled token)."""
    gather = jnp.maximum(n_valid - 1, 0)
    logits, gcache = forward(params, cfg, tokens, gcache, gather_idx=gather,
                             n_valid=n_valid)
    return logits[:, 0, :], gcache


@partial(jax.jit, static_argnames=("cfg", "n_steps", "features", "nl_token"),
         donate_argnames=("cache", "gcache", "state"))
def _decode_chunk_vec(params, cfg: ModelConfig, cache: KVCache, last_tok,
                      state: SamplerState, vp, active, n_steps: int, eog_mask,
                      features=(), janus_tables=None, nl_token: int = -1,
                      rope_pos_vec=None, gcache=None):
    """n_steps batched decode iterations with per-slot sampling params.

    Rows become inactive once they emit EOG (their cache stops advancing).
    `rope_pos_vec` = (se_group [B], se_window [B]) enables per-slot
    Self-Extend position compression.  With "cfg" in features, `gcache`
    (the per-slot guidance contexts, prefilled with the negative prompts)
    rides the chunk: each step runs a second forward over it and combines
    logit rows per slot (llama_sample_apply_guidance_impl runs per pod,
    concurrently — /root/reference/cpp/src/llama-sampling.cpp:484).
    Returns (tokens [B, n], emitted [B, n] bool, cache, gcache, state).
    """
    from booster_tpu.sampling.vector import sample_vectorized

    use_cfg = "cfg" in features and gcache is not None

    def step(carry, _):
        cache, gcache, tok, state, live = carry
        rope_positions = None
        if rope_pos_vec is not None:
            se_g, se_w = rope_pos_vec
            pos = cache.lengths[:, None]
            comp = jnp.where(pos < se_w[:, None], pos,
                             se_w[:, None] + (pos - se_w[:, None]) // jnp.maximum(se_g[:, None], 1))
            rope_positions = jnp.where(se_g[:, None] > 1, comp, pos).astype(jnp.int32)
        logits, cache = forward(
            params, cfg, tok, cache, last_only=True,
            n_valid=live.astype(jnp.int32),
            rope_positions=rope_positions,
        )
        lg = logits[:, -1, :]
        if use_cfg:
            cfg_on = vp.cfg_scale != 1.0
            glogits, gcache = forward(
                params, cfg, tok, gcache, last_only=True,
                n_valid=(live & cfg_on).astype(jnp.int32),
            )
            guided = apply_guidance(lg, glogits[:, -1, :],
                                    vp.cfg_scale[:, None])
            lg = jnp.where(cfg_on[:, None], guided, lg)
        nxt, state = sample_vectorized(
            lg, state, vp, mask=live,
            features=features, janus_tables=janus_tables, nl_token=nl_token,
        )
        nxt = jnp.where(live, nxt, tok[:, 0])
        emitted = live
        live = live & ~eog_mask[nxt]
        return (cache, gcache, nxt[:, None], state, live), (nxt, emitted)

    (cache, gcache, _, state, _), (toks, emitted) = jax.lax.scan(
        step, (cache, gcache, last_tok, state, active), None, length=n_steps
    )
    return toks.T, emitted.T, cache, gcache, state


@partial(jax.jit, static_argnames=("cfg", "features", "nl_token"),
         donate_argnames=("cache", "state"))
def _masked_step_vec(params, cfg: ModelConfig, cache: KVCache, last_tok,
                     state: SamplerState, vp, active, logit_mask,
                     features=(), janus_tables=None, nl_token: int = -1):
    """One batched decode step with per-row logit feasibility masks: the
    grammar-violation redo for slots riding the continuous batch (the
    reference resamples from the grammar-feasible set per pod,
    common/sampling.cpp:430 — here all violating slots redo in ONE
    dispatch).  Rows with active=False neither append KV nor advance
    sampler state; their mask rows stay all-True so the shared softmax
    never sees an all--inf row."""
    from booster_tpu.sampling.vector import sample_vectorized

    logits, cache = forward(params, cfg, last_tok, cache, last_only=True,
                            n_valid=active.astype(jnp.int32))
    lg = jnp.where(logit_mask, logits[:, -1, :], -jnp.inf)
    tok, state = sample_vectorized(
        lg, state, vp, mask=active,
        features=features, janus_tables=janus_tables, nl_token=nl_token,
    )
    return tok, cache, state


class Engine:
    """Owns compiled step functions + the KV cache for B slots."""

    def __init__(
        self,
        model: LoadedModel,
        max_batch: int = 1,
        max_seq: int = 2048,
        kv_quantized: bool = False,
        kv_dtype=jnp.bfloat16,
        history_window: int = 256,
        decode_chunk: int = 1,
        paged: bool = False,
        page_size: int = 256,
        n_pages: int = 0,  # 0 → B·ceil(max_seq/P) + one slot's worth slack
    ):
        self.model = model
        self.cfg = model.cfg
        self.params = model.params
        self.tokenizer = model.tokenizer
        self.max_batch = max_batch
        # not clamped to n_ctx_train: Self-Extend / YaRN legitimately exceed it
        self.max_seq = max_seq
        self.kv_quantized = kv_quantized
        self.kv_dtype = kv_dtype
        self.history_window = history_window
        # tokens per device dispatch; >1 amortizes host↔device latency
        self.decode_chunk = max(1, decode_chunk)
        self._janus_tables: Optional[JanusTables] = None
        # paged KV serving mode (ops/paged_kv.py): physical page pool +
        # per-slot tables; pages are allocated on demand between dispatches
        # and shared across slots for common prompt prefixes
        self.paged = paged
        self.page_size = page_size
        if paged:
            from booster_tpu.ops.paged_kv import PageAllocator

            if self.cfg.arch == "mamba":
                raise ValueError("paged KV is for attention caches; "
                                 "recurrent state is O(1) already")
            maxp = -(-max_seq // page_size)
            total = n_pages or (max_batch * maxp + maxp + 1)
            self.n_pages = total
            self.page_alloc = PageAllocator(total, page_size)
            # physical page 0 is the permanent scratch page: unallocated
            # table entries point at it, so padding/inactive-row writes and
            # speculative DMA land harmlessly (paged_kv.py docstring)
            scratch = self.page_alloc.alloc(1)
            assert scratch == [0]
            self._slot_pages: dict[int, list[int]] = {
                s: [] for s in range(max_batch)
            }
        self.cache = self._new_cache()
        # per-slot CFG guidance contexts (allocated lazily on the first CFG
        # job; a second full dense cache — freed when no slot uses CFG)
        self.gcache = None
        self._eog_mask = None
        if model.tokenizer is not None:
            V = model.cfg.n_vocab
            mask = np.zeros(V, bool)
            for t in model.tokenizer.vocab.eog_ids:
                if 0 <= t < V:
                    mask[t] = True
            self._eog_mask = jnp.asarray(mask)

    def _new_cache(self, dense: bool = False):
        """Batch cache for the slot API; `dense=True` forces a plain dense
        cache (the single-sequence paths — generate/grammar/CFG/speculative
        — build private caches outside the page pool)."""
        if self.cfg.arch == "mamba":
            from booster_tpu.models.mamba import MambaCache

            return MambaCache.create(self.cfg, self.max_batch)
        if self.paged and not dense:
            from booster_tpu.ops.paged_kv import PagedKVCache

            return PagedKVCache.create(
                self.cfg.n_layers,
                self.max_batch,
                self.max_seq,
                self.cfg.n_kv_heads,
                self.cfg.head_dim,
                dtype=self.kv_dtype,
                quantized=self.kv_quantized,
                head_dim_v=self.cfg.head_dim_v,
                page_size=self.page_size,
                n_pages=self.n_pages,
            )
        return KVCache.create(
            self.cfg.n_layers,
            self.max_batch,
            self.max_seq,
            self.cfg.n_kv_heads,
            self.cfg.head_dim,
            dtype=self.kv_dtype,
            quantized=self.kv_quantized,
            head_dim_v=self.cfg.head_dim_v,  # MLA (deepseek2): v dim ≠ qk dim
        )

    # -- paged-mode page bookkeeping (host side, between dispatches) ---------

    def ensure_slot_pages(self, slot: int, upto: int) -> None:
        """Grow a slot's page table so logical positions [0, upto) are backed
        by physical pages (covers padded dispatch widths — padding rows must
        land in owned pages, not the shared scratch page)."""
        if not self.paged:
            return
        P = self.page_size
        need = min(-(-upto // P), self.cache.table.shape[1])
        have = len(self._slot_pages[slot])
        if need <= have:
            return
        newp = self.page_alloc.alloc(need - have)
        if newp is None:
            raise RuntimeError(
                f"KV page pool exhausted ({self.page_alloc.stats()})"
            )
        import numpy as _np

        table = self.cache.table.at[slot, have:need].set(
            jnp.asarray(_np.array(newp, _np.int32))
        )
        self.cache = dataclasses.replace(self.cache, table=table)
        self._slot_pages[slot].extend(newp)

    def trim_slot_pages(self, slot: int) -> None:
        """Give back pages past the slot's actual length (prefill buckets
        over-cover by up to the padded width; the padding is garbage)."""
        if not self.paged:
            return
        need = -(-int(self.slot_lengths[slot]) // self.page_size)
        have = len(self._slot_pages[slot])
        if have <= need:
            return
        self.page_alloc.release(self._slot_pages[slot][need:])
        self._slot_pages[slot] = self._slot_pages[slot][:need]
        table = self.cache.table.at[slot, need:have].set(0)
        self.cache = dataclasses.replace(self.cache, table=table)

    def release_slot_pages(self, slot: int) -> None:
        if not self.paged or not self._slot_pages[slot]:
            return
        self.page_alloc.release(self._slot_pages[slot])
        n = len(self._slot_pages[slot])
        self._slot_pages[slot] = []
        table = self.cache.table.at[slot, :n].set(jnp.zeros(n, jnp.int32))
        self.cache = dataclasses.replace(self.cache, table=table)

    def adopt_prefix(self, slot: int, ids: list[int]) -> int:
        """Map already-resident pages whose token chain matches the prompt's
        leading pages into this slot (cross-slot shared-prefix dedup, zero
        copies — the paged replacement for serving/prefix_cache.py).
        Returns how many prompt tokens are already covered."""
        if not self.paged:
            return 0
        P = self.page_size
        pages, covered = self.page_alloc.lookup_prefix(ids)
        # keep ≥ 1 token to prefill (fresh logits needed to sample from)
        while pages and covered > len(ids) - 1:
            pages.pop()
            covered -= P
        # prefix-sharing hit telemetry (surfaced on /health)
        self.prefix_lookups = getattr(self, "prefix_lookups", 0) + 1
        if not pages:
            return 0
        self.prefix_hits = getattr(self, "prefix_hits", 0) + 1
        self.prefix_tokens_reused = (
            getattr(self, "prefix_tokens_reused", 0) + covered)
        import numpy as _np

        self.page_alloc.retain(pages)
        assert not self._slot_pages[slot]  # reset_slot ran first
        self._slot_pages[slot] = list(pages)
        table = self.cache.table.at[slot, : len(pages)].set(
            jnp.asarray(_np.array(pages, _np.int32))
        )
        self.cache = dataclasses.replace(
            self.cache, table=table,
            lengths=self.cache.lengths.at[slot].set(covered),
        )
        self.slot_lengths[slot] = covered
        return covered

    def publish_slot_prefix(self, slot: int, ids: list[int]) -> None:
        """Register the slot's full, final pages as dedup candidates."""
        if not self.paged:
            return
        full = min(len(ids) // self.page_size, len(self._slot_pages[slot]))
        if full > 0:
            self.page_alloc.publish_prefix(ids, self._slot_pages[slot][:full])

    def janus_tables(self) -> JanusTables:
        if self._janus_tables is None:
            if self.tokenizer is None:
                raise ValueError("janus sampling requires a tokenizer")
            self._janus_tables = JanusTables.build(self.tokenizer)
        return self._janus_tables

    # -- slot-based continuous batching API (used by serving.scheduler) ------

    def init_batch_state(self, window: Optional[int] = None) -> None:
        from booster_tpu.sampling.vector import VectorSampling

        B = self.max_batch
        self.state = make_sampler_state(B, window or self.history_window, seed=0)
        self.vp = VectorSampling.from_params([SamplingParams()] * B)
        # device-resident last sampled token per slot: lets consecutive decode
        # chunks chain on device with zero host round-trips (pipelining)
        self._last_dev = jnp.zeros((B, 1), jnp.int32)
        # host-side upper bound of each slot's cache occupancy (avoids device
        # syncs in the scheduler's flow control)
        self.slot_lengths = np.zeros(B, np.int64)
        # host-side per-slot feature flags → static `features` jit arg (one
        # compile variant per distinct feature set that actually occurs)
        self._slot_janus = np.zeros(B, bool)
        self._slot_mirostat = np.zeros(B, bool)
        self._slot_penalties = np.zeros(B, bool)
        self._slot_exttail = np.zeros(B, bool)
        self._slot_cfg = np.zeros(B, bool)
        self._slot_fullv = np.zeros(B, bool)
        self.gcache = None
        self._guidance_logits = None
        # per-slot Self-Extend knobs (0 = off)
        self._slot_se_group = np.zeros(B, np.int32)
        self._slot_se_window = np.zeros(B, np.int32)
        if self._eog_mask is None:
            self._eog_mask = jnp.zeros(self.cfg.n_vocab, bool)

    def warmup(self) -> None:
        """Compile the serving hot path (prefill + one decode chunk) before
        accepting jobs.  First compiles on a remote TPU take minutes (axon
        tunnel) and the scheduler's job deadline (reference server.go:646)
        counts from submission — without this, a fresh server's first request
        can be deadline-evicted while jit compiles."""
        from booster_tpu.sampling import SamplingParams

        self.init_batch_state()
        self.reset_slot(0, SamplingParams(temp=0.0), seed=0)
        ids = [self.cfg.n_vocab - 1, self.cfg.n_vocab - 1]
        if self.tokenizer is not None:
            try:
                ids = self.tokenizer.encode("warmup") or ids
            except Exception:
                pass
        first = self.prefill_slots({0: ids})
        self.decode_slots(first, n_steps=None)  # default (scheduler) chunk
        self.init_batch_state()  # drop warmup sampler/cache bookkeeping
        self.cache = self._new_cache()

    @property
    def nl_token(self) -> int:
        """Vocab linefeed id (llama_token_nl parity), found by tokenizing."""
        if not hasattr(self, "_nl_token"):
            self._nl_token = -1
            if self.tokenizer is not None:
                try:
                    ids = self.tokenizer.encode("\n", add_bos=False)
                    self._nl_token = ids[-1] if ids else -1
                except Exception:
                    pass
        return self._nl_token

    def _vector_features(self) -> tuple:
        feats = []
        if self._slot_janus.any():
            feats.append("janus")
        if self._slot_mirostat.any():
            feats.append("mirostat")
        if self._slot_exttail.any():
            # tfs/typical/dynatemp filters compile only when a slot uses them
            feats.append("exttail")
        if self._slot_cfg.any():
            # CFG guidance: the decode chunk runs a second forward over the
            # per-slot guidance contexts only while a CFG job is active
            feats.append("cfg")
        if self._slot_fullv.any():
            # a slot samples from the full vocabulary (no subset filter):
            # the batched sampler scatters the survivor mask to [B, V];
            # otherwise it samples in shortlist space (sampling/vector.py)
            feats.append("fullv")
        if not self._slot_penalties.any():
            # the [B, V] penalty scatter compiles out when nothing uses it
            feats.append("nopenalties")
        return tuple(feats)

    def _vector_janus_tables(self, features):
        if "janus" not in features:
            return None
        jt = self.janus_tables()
        if not hasattr(self, "_jt_dev"):
            self._jt_dev = (
                jnp.asarray(jt.scales), jnp.asarray(jt.types),
                jnp.asarray(jt.pedantic), jnp.asarray(jt.factors), jt.eos_id,
            )
        return self._jt_dev

    def reset_slot(self, slot: int, sampling: SamplingParams, seed: int,
                   max_predict: Optional[int] = None,
                   se_group: int = 0, se_window: int = 0) -> None:
        """Free/claim a slot: zero its cache length and sampler-state row."""
        import jax as _jax

        if hasattr(self.cache, "conv"):  # recurrent: zero the slot's state
            self.cache = dataclasses.replace(
                self.cache,
                conv=self.cache.conv.at[:, slot].set(0.0),
                ssm=self.cache.ssm.at[:, slot].set(0.0),
                lengths=self.cache.lengths.at[slot].set(0),
            )
        else:
            if self.paged:
                self.release_slot_pages(slot)
            self.cache = dataclasses.replace(
                self.cache, lengths=self.cache.lengths.at[slot].set(0)
            )
        st = self.state
        self.state = SamplerState(
            prev_tokens=st.prev_tokens.at[slot].set(-1),
            prev_pos=st.prev_pos.at[slot].set(0),
            mirostat_mu=st.mirostat_mu.at[slot].set(0.0),
            key=st.key.at[slot].set(_jax.random.PRNGKey(seed)),
            prompt_len=st.prompt_len.at[slot].set(0),
        )
        self.vp = self.vp.set_slot(slot, sampling, max_predict=max_predict)
        self._slot_janus[slot] = bool(sampling.janus)
        self._slot_mirostat[slot] = sampling.mirostat in (1, 2)
        self._slot_penalties[slot] = (
            sampling.penalty_repeat != 1.0 or sampling.penalty_freq != 0.0
            or sampling.penalty_present != 0.0
        )
        self._slot_exttail[slot] = (
            sampling.tfs_z < 1.0 or sampling.typical_p < 1.0
            or sampling.dynatemp_range > 0.0
        )
        self._slot_fullv[slot] = (
            sampling.temp > 0 and sampling.mirostat == 0
            and not sampling.janus
            and sampling.top_k <= 0 and sampling.top_p >= 1.0
            and sampling.min_p <= 0.0 and sampling.tfs_z >= 1.0
            and sampling.typical_p >= 1.0
        )
        self._slot_cfg[slot] = sampling.cfg_scale != 1.0 and not self.paged
        if self._slot_cfg[slot] and self.gcache is None:
            self.gcache = self._new_cache(dense=True)
        elif self.gcache is not None:
            if not self._slot_cfg.any():
                self.gcache = None  # last CFG slot gone: free the memory
            else:
                self.gcache = dataclasses.replace(
                    self.gcache,
                    lengths=self.gcache.lengths.at[slot].set(0))
        self._slot_se_group[slot] = se_group
        self._slot_se_window[slot] = se_window
        if hasattr(self, "slot_lengths"):
            self.slot_lengths[slot] = 0

    def prefill_slots(self, jobs: dict[int, list[int]], chunk: int = 512,
                      full_history: Optional[dict[int, list[int]]] = None,
                      ) -> dict[int, int]:
        """Prefill prompts into their slots (chunked); returns first sampled
        token per slot.  Slots must have been reset_slot()'d first (or had a
        session state restored — then `jobs` holds only the unseen suffix and
        `full_history` the complete token history for penalty seeding)."""
        from booster_tpu.sampling.samplers import seed_prompt_row

        B = self.max_batch
        # seed penalty history with the prompt (reference accepts prompt
        # tokens into the sampling context, bridge.cpp:618)
        for s, ids in jobs.items():
            self.state = seed_prompt_row(
                self.state, s, (full_history or {}).get(s, ids)
            )
        remaining = {s: list(ids) for s, ids in jobs.items()}
        first: dict[int, int] = {}
        while remaining:
            max_take = max(min(len(r), chunk) for r in remaining.values())
            T = max(16, 1 << (max_take - 1).bit_length())
            T = min(T, chunk)
            tokens = np.zeros((B, T), np.int32)
            n_valid = np.zeros(B, np.int32)
            admit = np.zeros(B, bool)
            done_slots = []
            for s, ids in remaining.items():
                take = min(len(ids), T)
                tokens[s, :take] = ids[:take]
                n_valid[s] = take
                # padded width T, not take: padding rows also write KV
                self.ensure_slot_pages(s, int(self.slot_lengths[s]) + T)
                self.slot_lengths[s] += take
                remaining[s] = ids[take:]
                if not remaining[s]:
                    admit[s] = True
                    done_slots.append(s)
            admit_dev = jnp.asarray(admit)
            feats = self._vector_features()
            tok, self.cache, self.state = _prefill_batched(
                self.params, self.cfg, self.cache, jnp.asarray(tokens),
                jnp.asarray(n_valid), self.state, self.vp, admit_dev,
                features=feats,
                janus_tables=self._vector_janus_tables(feats),
                nl_token=self.nl_token,
                guidance_logits=(getattr(self, "_guidance_logits", None)
                                 if "cfg" in feats else None),
            )
            self._last_dev = jnp.where(admit_dev[:, None], tok[:, None], self._last_dev)
            tok_np = np.asarray(tok)
            for s in done_slots:
                first[s] = int(tok_np[s])
                self.trim_slot_pages(s)
                del remaining[s]
        return first

    def prefill_guidance(self, slot: int, ids: list[int],
                         chunk: int = 512) -> None:
        """Prefill one slot's CFG guidance context (the negative prompt)
        into the shared per-slot guidance cache.  Batched analog of the
        reference's per-pod ctx_guidance decode (common/sampling.cpp;
        llama-sampling.cpp:484)."""
        if self.gcache is None:
            self.gcache = self._new_cache(dense=True)
        B = self.max_batch
        if not hasattr(self, "_guidance_logits") or self._guidance_logits is None:
            self._guidance_logits = jnp.zeros((B, self.cfg.n_vocab),
                                              jnp.float32)
        self.gcache = dataclasses.replace(
            self.gcache, lengths=self.gcache.lengths.at[slot].set(0))
        if not ids:
            # empty negative prompt (add_bos=False vocabs can tokenize ""
            # to []): treat as cfg-off for the slot — disable the row's
            # guidance mix entirely rather than mixing with stale logits
            self._guidance_logits = self._guidance_logits.at[slot].set(0.0)
            self._slot_cfg[slot] = False
            self.vp = dataclasses.replace(
                self.vp, cfg_scale=self.vp.cfg_scale.at[slot].set(1.0))
            return
        rem = list(ids)
        while rem:
            take = min(len(rem), chunk)
            T = min(max(16, 1 << (take - 1).bit_length()), chunk)
            tokens = np.zeros((B, T), np.int32)
            tokens[slot, :take] = rem[:take]
            nv = np.zeros(B, np.int32)
            nv[slot] = take
            glg, self.gcache = _prefill_guidance_chunk(
                self.params, self.cfg, self.gcache, jnp.asarray(tokens),
                jnp.asarray(nv))
            rem = rem[take:]
        self._guidance_logits = self._guidance_logits.at[slot].set(glg[slot])

    def decode_slots_start(
        self, active_slots, n_steps: Optional[int] = None,
        last_tokens: Optional[dict[int, int]] = None,
    ):
        """Dispatch one batched decode chunk (async).  Chains from the
        device-resident last tokens (or explicit host overrides)."""
        B = self.max_batch
        n = n_steps or self.decode_chunk
        active = np.zeros(B, bool)
        for s in active_slots:
            active[s] = True
        last = self._last_dev
        if last_tokens:
            host = np.zeros((B, 1), np.int32)
            mask = np.zeros(B, bool)
            for s, t in last_tokens.items():
                host[s, 0] = t
                mask[s] = True
            last = jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(host), last)
        for s in active_slots:
            self.ensure_slot_pages(s, int(self.slot_lengths[s]) + n)
            self.slot_lengths[s] += n
        active_dev = jnp.asarray(active)
        feats = self._vector_features()
        rope_pos_vec = None
        if (self._slot_se_group > 1).any():
            rope_pos_vec = (
                jnp.asarray(self._slot_se_group),
                jnp.asarray(self._slot_se_window),
            )
        toks, emitted, self.cache, self.gcache, self.state = _decode_chunk_vec(
            self.params, self.cfg, self.cache, last, self.state,
            self.vp, active_dev, n, self._eog_mask,
            features=feats,
            janus_tables=self._vector_janus_tables(feats),
            nl_token=self.nl_token,
            rope_pos_vec=rope_pos_vec,
            gcache=self.gcache if "cfg" in feats else None,
        )
        self._last_dev = jnp.where(active_dev[:, None], toks[:, -1:], self._last_dev)
        return (toks, emitted, list(active_slots))

    def decode_slots_finish(self, handle):
        """Block on a dispatched chunk; returns per-slot tokens + eog flags."""
        toks_dev, emitted_dev, slots = handle
        toks = np.asarray(toks_dev)
        emitted = np.asarray(emitted_dev)
        eog_np = np.asarray(self._eog_mask)
        out: dict[int, list[int]] = {}
        hit: dict[int, bool] = {}
        for s in slots:
            row = [int(t) for t, e in zip(toks[s], emitted[s]) if e]
            out[s] = row
            hit[s] = bool(row and eog_np[row[-1]])
        return out, hit

    def decode_slots(
        self, last_tokens: dict[int, int], n_steps: Optional[int] = None
    ) -> tuple[dict[int, list[int]], dict[int, bool]]:
        """Batched decode chunk over the active slots (dispatch + wait)."""
        handle = self.decode_slots_start(
            list(last_tokens), n_steps=n_steps, last_tokens=last_tokens
        )
        return self.decode_slots_finish(handle)

    def masked_decode_slots(
        self, fixes: dict[int, tuple[int, int, np.ndarray]]
    ) -> dict[int, int]:
        """Grammar-violation redo for batched slots: rewind each slot's
        cache to its last grammar-valid position and redo ONE decode step
        under its [V] feasibility mask — all fixing slots in one dispatch.

        `fixes`: {slot: (new_len, prev_token, mask)} where `new_len` is the
        cache length before the rejected token's KV write, `prev_token` the
        last accepted token (re-forwarded at position new_len, exactly as
        the dedicated path's _masked_decode_step), and `mask` a [V] bool
        feasibility array.  Returns the corrected token per slot and chains
        it into the device-resident last-token row so the next batched
        chunk continues from it."""
        B = self.max_batch
        V = self.cfg.n_vocab
        lengths = self.cache.lengths
        active = np.zeros(B, bool)
        prev = np.zeros((B, 1), np.int32)
        mask = np.ones((B, V), bool)
        for s, (new_len, prev_tok, m) in fixes.items():
            lengths = lengths.at[s].set(new_len)
            self.slot_lengths[s] = new_len
            self.ensure_slot_pages(s, new_len + 1)
            active[s] = True
            prev[s, 0] = prev_tok
            mask[s] = m
        self.cache = dataclasses.replace(self.cache, lengths=lengths)
        active_dev = jnp.asarray(active)
        feats = self._vector_features()
        tok, self.cache, self.state = _masked_step_vec(
            self.params, self.cfg, self.cache, jnp.asarray(prev), self.state,
            self.vp, active_dev, jnp.asarray(mask),
            features=feats, janus_tables=self._vector_janus_tables(feats),
            nl_token=self.nl_token,
        )
        for s in fixes:
            self.slot_lengths[s] += 1
        self._last_dev = jnp.where(active_dev[:, None], tok[:, None],
                                   self._last_dev)
        tok_np = np.asarray(tok)
        return {s: int(tok_np[s]) for s in fixes}

    def shift_slot(self, slot: int, n_keep: int = 0,
                   n_discard: Optional[int] = None) -> int:
        """Batched-path context shift (bridge.cpp:487-507 semantics): drop
        `n_discard` tokens after the first `n_keep` from this slot's cache,
        in place, with exact rope correction — the slot keeps generating with
        no re-prefill.  Returns the number of discarded tokens."""
        from booster_tpu.ops.kv_cache import shift_slot_cache

        length = int(self.slot_lengths[slot])
        if n_discard is None:
            n_discard = max(1, (length - n_keep) // 2)
        if self.cfg.arch == "mamba":
            # recurrent state is O(1): nothing to discard, only the host
            # bookkeeping moves (infinite generation is native)
            self.slot_lengths[slot] = length - n_discard
            return n_discard
        if self.paged:
            self._shift_slot_paged(slot, n_keep, n_discard, length)
            self.slot_lengths[slot] = length - n_discard
            return n_discard
        self.cache = shift_slot_cache(
            self.cache, jnp.int32(slot), jnp.int32(n_keep),
            jnp.int32(n_discard), self.params["rope"]["inv_freq"],
            self.cfg.rope_style,
        )
        if getattr(self, "_slot_cfg", None) is not None and \
                self._slot_cfg[slot] and self.gcache is not None:
            # keep the slot's guidance context in step (its length differs —
            # negative prompt vs main prompt — so clamp the discard)
            g_disc = jnp.minimum(
                jnp.int32(n_discard),
                jnp.maximum(self.gcache.lengths[slot] - n_keep, 0))
            self.gcache = shift_slot_cache(
                self.gcache, jnp.int32(slot), jnp.int32(n_keep), g_disc,
                self.params["rope"]["inv_freq"], self.cfg.rope_style,
            )
        self.slot_lengths[slot] = length - n_discard
        return n_discard

    def _shift_slot_paged(self, slot: int, n_keep: int, n_discard: int,
                          length: int) -> None:
        """Context shift for a paged slot: gather the slot's pages to a
        dense single-slot view, run the exact dense shift (rope-delta
        rotation, ops/kv_cache.shift_slot_cache), then scatter into FRESH
        private pages (shared prefix pages must not be rewritten — the
        shift invalidates their published token chains for this slot)."""
        from booster_tpu.ops.kv_cache import shift_slot_cache as _shift
        from booster_tpu.ops.paged_kv import gather_layer, scatter_layer

        cache = self.cache
        row = cache.table[slot : slot + 1]  # [1, MAXP]
        gk = jax.vmap(gather_layer, in_axes=(0, None))(cache.k, row)
        gv = jax.vmap(gather_layer, in_axes=(0, None))(cache.v, row)
        gks = gvs = None
        if cache.k_scale is not None:
            gks = jax.vmap(gather_layer, in_axes=(0, None))(cache.k_scale, row)
            gvs = jax.vmap(gather_layer, in_axes=(0, None))(cache.v_scale, row)
        temp = KVCache(
            k=gk, v=gv, lengths=jnp.asarray([length], jnp.int32),
            k_scale=gks, v_scale=gvs,
        )
        temp = _shift(
            temp, jnp.int32(0), jnp.int32(n_keep), jnp.int32(n_discard),
            self.params["rope"]["inv_freq"], self.cfg.rope_style,
        )
        # swap to a fresh private page set (old pages were already copied
        # out by the gather; releasing first lets the allocator reuse them)
        import numpy as _np

        new_len = length - n_discard
        old_n = len(self._slot_pages[slot])
        self.page_alloc.release(self._slot_pages[slot])
        self._slot_pages[slot] = []
        need = -(-new_len // self.page_size)
        newp = self.page_alloc.alloc(need)
        if newp is None:
            raise RuntimeError("KV page pool exhausted during context shift")
        self._slot_pages[slot] = list(newp)
        new_row = _np.zeros(cache.table.shape[1], _np.int32)
        new_row[:need] = newp
        table = cache.table.at[slot].set(jnp.asarray(new_row))
        row_new = table[slot : slot + 1]
        k = jax.vmap(scatter_layer, in_axes=(0, None, 0))(cache.k, row_new, temp.k)
        v = jax.vmap(scatter_layer, in_axes=(0, None, 0))(cache.v, row_new, temp.v)
        ks = vs = None
        if cache.k_scale is not None:
            ks = jax.vmap(scatter_layer, in_axes=(0, None, 0))(
                cache.k_scale, row_new, temp.k_scale)
            vs = jax.vmap(scatter_layer, in_axes=(0, None, 0))(
                cache.v_scale, row_new, temp.v_scale)
        self.cache = dataclasses.replace(
            cache, k=k, v=v, table=table,
            lengths=cache.lengths.at[slot].set(new_len),
            k_scale=ks, v_scale=vs,
        )

    def _prefill_aux(self, cache: KVCache, ids: list[int]):
        """Prefill an auxiliary cache (e.g. the CFG guidance context) on slot
        0; returns (cache, last-position logits [B, V])."""
        n = max(len(ids), 1)
        T = min(max(16, 1 << (n - 1).bit_length()), self.max_seq)
        arr = np.zeros((self.max_batch, T), np.int32)
        arr[0, :n] = ids[:T]
        nv = np.zeros(self.max_batch, np.int32)
        nv[0] = n
        g = np.zeros(self.max_batch, np.int32)
        g[0] = n - 1
        logits, cache = forward(
            self.params, self.cfg, jnp.asarray(arr), cache,
            gather_idx=jnp.asarray(g), n_valid=jnp.asarray(nv),
        )
        return cache, logits[:, -1, :]

    # -- single-sequence generation (pod-style; scheduler batches above this)

    def generate_grammar(
        self,
        prompt_ids: list[int],
        grammar_gbnf: str,
        sampling: SamplingParams = SamplingParams(),
        max_new_tokens: int = 128,
        stop_check: Optional[Callable[[], bool]] = None,
        on_token: Optional[Callable[[int], None]] = None,
    ) -> GenerationResult:
        """GBNF-constrained generation, optimistically chunked.

        Reference flow (common/sampling.cpp:430): run the full sampler chain,
        sample, validate against the grammar, resample from the feasible set
        on violation.  TPU redesign: decode chunks run UNCONSTRAINED on
        device (full chain, zero per-token host sync); the host automaton
        validates the chunk, accepts the grammar-valid prefix, and only on a
        violation rewinds the cache one position and redoes that token with
        an on-device [V] feasibility mask (_masked_decode_step).  When the
        model mostly emits grammar-valid text — the typical case — the
        throughput equals the unconstrained chunked path."""
        import dataclasses

        from booster_tpu.grammar import GrammarSampler, parse_gbnf
        from booster_tpu.sampling.samplers import seed_prompt_row

        if self.cfg.arch == "mamba":
            raise ValueError("grammar decoding needs a rewindable KV cache; "
                             "unsupported for recurrent models")
        sampling = sampling.normalized()
        gs = GrammarSampler(parse_gbnf(grammar_gbnf), self.tokenizer)
        cfg = self.cfg
        vocab = self.tokenizer.vocab
        V = cfg.n_vocab
        seed = sampling.seed if sampling.seed >= 0 else int(time.time_ns() % (1 << 31))
        n_prompt = len(prompt_ids)

        def fresh_state(n_gen: int):
            st = make_sampler_state(
                self.max_batch,
                max(self.history_window, sampling.penalty_last_n),
                seed=seed + n_gen,
            )
            return seed_prompt_row(st, 0, list(prompt_ids) + generated)

        def rewind(cache, n):
            return dataclasses.replace(
                cache, lengths=cache.lengths.at[0].set(n)
            )

        generated: list[int] = []
        cache = self._new_cache(dense=True)
        state = fresh_state(0)
        T = min(max(16, 1 << (n_prompt - 1).bit_length()), self.max_seq)
        ids = np.zeros((self.max_batch, T), np.int32)
        ids[0, :n_prompt] = prompt_ids
        nv = np.zeros(self.max_batch, np.int32)
        nv[0] = n_prompt
        g = np.zeros(self.max_batch, np.int32)
        g[0] = n_prompt - 1

        t0 = time.perf_counter()
        logits, cache = forward(
            self.params, cfg, jnp.asarray(ids), cache,
            gather_idx=jnp.asarray(g), n_valid=jnp.asarray(nv),
        )
        mask0 = gs.mask(V)
        lg = jnp.where(jnp.asarray(mask0)[None, :], logits[:, -1, :], -jnp.inf)
        finish = "length"
        if not mask0.any():
            finish = "stop" if gs.can_stop else "error"
            t_prompt = time.perf_counter() - t0
            return GenerationResult([], "", n_prompt, 0,
                                    1000.0 * t_prompt / max(n_prompt, 1), 0.0,
                                    finish)
        tok, state = sample(lg, state, sampling, self.nl_token)
        t_prompt = time.perf_counter() - t0

        def push(t: int) -> bool:
            """Accept token t; returns True when generation should stop."""
            nonlocal finish
            if vocab.is_eog(t):
                finish = "stop"
                return True
            gs.accept(t)
            generated.append(t)
            if on_token:
                on_token(t)
            return len(generated) >= max_new_tokens

        t1 = time.perf_counter()
        first = int(np.asarray(tok)[0])
        stopped = push(first)
        host_len = n_prompt  # valid KV entries (consumed tokens)
        device_tok = tok[:, None]
        chunk = max(2, min(self.decode_chunk, 16))
        eog_mask = (self._eog_mask if self._eog_mask is not None
                    else jnp.zeros(V, bool))
        while not stopped:
            if stop_check and stop_check():
                finish = "cancelled"
                break
            if host_len + chunk >= self.max_seq - 1:
                finish = "length"
                break
            toks, _done, cache, state = _decode_chunk(
                self.params, cfg, cache, device_tok, state, sampling,
                jnp.float32(max_new_tokens), chunk, eog_mask,
                nl_token=self.nl_token,
            )
            toks_np = [int(t) for t in np.asarray(toks)[0]]
            rejected_at = None
            for i, t in enumerate(toks_np):
                if gs.token_allowed(t):
                    if push(t):
                        stopped = True
                        break
                else:
                    rejected_at = i
                    break
            if stopped:
                break
            if rejected_at is None:
                host_len += chunk
                device_tok = toks[:, -1:]
                continue
            # violation: rewind to the last valid KV, redo with the mask
            valid = host_len + rejected_at
            cache = rewind(cache, valid)
            host_len = valid
            state = fresh_state(len(generated))
            m = gs.mask(V)
            if not m.any():
                finish = "stop" if gs.can_stop else "error"
                break
            prev = generated[-1] if rejected_at > 0 or generated else first
            cur = np.zeros((self.max_batch, 1), np.int32)
            cur[0, 0] = prev
            tok, cache, state = _masked_decode_step(
                self.params, cfg, cache, jnp.asarray(cur), state, sampling,
                jnp.asarray(m), self.nl_token,
            )
            host_len += 1
            t2 = int(np.asarray(tok)[0])
            if not gs.token_allowed(t2):
                finish = "stop" if gs.can_stop else "error"
                break
            if push(t2):
                break
            device_tok = tok[:, None]
        t_gen = time.perf_counter() - t1

        return GenerationResult(
            token_ids=generated,
            text=self.tokenizer.decode(generated),
            n_prompt=n_prompt,
            n_generated=len(generated),
            prompt_ms_per_token=1000.0 * t_prompt / max(n_prompt, 1),
            gen_ms_per_token=1000.0 * t_gen / max(len(generated), 1),
            finish_reason=finish,
        )

    def generate(
        self,
        prompt_ids: list[int],
        sampling: SamplingParams = SamplingParams(),
        max_new_tokens: int = 128,
        n_keep: int = 0,
        stop_check: Optional[Callable[[], bool]] = None,
        on_token: Optional[Callable[[int], None]] = None,
        self_extend_group: int = 0,
        self_extend_window: int = 512,
    ) -> GenerationResult:
        """Generate on slot 0 (single sequence).  Mirrors do_inference's
        shape: prompt rejection, context shift, EOG stop, per-phase timings;
        `self_extend_group/window` enable grp_attn position compression."""
        sampling = sampling.normalized()
        cfg = self.cfg
        if cfg.arch == "mamba":
            raise ValueError("recurrent models: use models.mamba.generate_mamba"
                             " (or the batched scheduler path)")
        if len(prompt_ids) > self.max_seq - 4:
            raise ValueError(
                f"prompt too long: {len(prompt_ids)} > {self.max_seq - 4}"
            )

        cache = self._new_cache(dense=True)
        # state init + prompt seeding fused into one dispatch (TTFT: the
        # unfused pair issued ~6 tunnel round-trips before prefill could
        # start); prompt seeding = bridge.cpp:618 parity
        state = make_seeded_state(
            self.max_batch,
            max(self.history_window, sampling.penalty_last_n, sampling.janus_depth),
            sampling.seed if sampling.seed >= 0 else int(time.time_ns() % (1 << 31)),
            prompt_ids,
        )
        use_cfg = sampling.cfg_scale != 1.0
        gcache = None
        neg_ids: list[int] = []
        if use_cfg:
            neg_ids = (
                self.tokenizer.encode(sampling.cfg_negative_prompt)
                if sampling.cfg_negative_prompt else list(prompt_ids)
            )
            gcache = self._new_cache(dense=True)
        jt = self.janus_tables() if sampling.janus else None
        # per-request janus_scale: the table is affine in scale
        # (JanusTables.factors), so rebuild is one host multiply — parity
        # with the reference's per-pod scale (bridge.cpp:734,759)
        _jscale = sampling.normalized().janus_scale
        janus_args = dict(
            janus_scales=(jnp.asarray(1.0 - (1.0 - _jscale) * jt.factors)
                          if jt else None),
            janus_types=jnp.asarray(jt.types) if jt else None,
            janus_pedantic=jnp.asarray(jt.pedantic) if jt else None,
            janus_eos=jt.eos_id if jt else 0,
        )

        # bucket the prompt length to a power of two: one compiled prefill
        # per bucket instead of one per distinct prompt length
        n_prompt = len(prompt_ids)
        T = min(max(16, 1 << (n_prompt - 1).bit_length()), self.max_seq)
        ids = np.zeros((self.max_batch, T), np.int32)
        ids[0, :n_prompt] = prompt_ids
        n_valid = np.zeros(self.max_batch, np.int32)
        n_valid[0] = n_prompt
        gather = np.zeros(self.max_batch, np.int32)
        gather[0] = n_prompt - 1
        se_g, se_w = self_extend_group, self_extend_window

        def se_map(pos: np.ndarray) -> np.ndarray:
            return np.where(pos < se_w, pos, se_w + (pos - se_w) // se_g)

        rope_prefill = None
        if se_g > 1:
            rope_prefill = jnp.asarray(
                np.tile(se_map(np.arange(T))[None, :],
                        (self.max_batch, 1)).astype(np.int32)
            )

        t0 = time.perf_counter()
        logits, cache = forward(
            self.params, cfg, jnp.asarray(ids), cache,
            gather_idx=jnp.asarray(gather), n_valid=jnp.asarray(n_valid),
            rope_positions=rope_prefill,
        )
        lg = logits[:, -1, :]
        if use_cfg:
            gcache, glg = self._prefill_aux(gcache, neg_ids)
            lg = apply_guidance(lg, glg, sampling.cfg_scale)
        if sampling.janus:
            keys = jax.vmap(jax.random.split, in_axes=(0, None))(state.key, 2)
            tok = janus_sample(
                lg, state.prev_tokens, state.prev_pos, state.prompt_len,
                max_new_tokens,
                janus_args["janus_scales"], janus_args["janus_types"],
                janus_args["janus_pedantic"], janus_args["janus_eos"],
                sampling, keys[:, 0],
            )
            state = SamplerState(state.prev_tokens, state.prev_pos,
                                 state.mirostat_mu, keys[:, 1], state.prompt_len)
            state = accept_token(state, tok)
        else:
            tok, state = sample(lg, state, sampling, self.nl_token)
        tok.block_until_ready()
        t_prompt = time.perf_counter() - t0

        generated = [int(np.asarray(tok)[0])]
        finish = "length"
        vocab = self.tokenizer.vocab if self.tokenizer else None
        if on_token:
            on_token(generated[-1])
        if vocab is not None and vocab.is_eog(generated[-1]):
            finish = "stop"
            max_new_tokens = 1

        t1 = time.perf_counter()
        n_steps = 0
        chunk = self.decode_chunk
        eog_mask = (
            self._eog_mask
            if self._eog_mask is not None
            else jnp.zeros(cfg.n_vocab, bool)
        )
        # host-tracked cache occupancy: avoids a device→host sync per chunk
        host_len = len(prompt_ids)

        def consume(chunk_out) -> bool:
            """Pull a finished chunk's tokens to host; True → generation ends."""
            nonlocal finish
            toks_np = np.asarray(chunk_out[0])[0]
            done_np = np.asarray(chunk_out[1])[0]
            for i, t in enumerate(toks_np):
                if len(generated) >= max_new_tokens:
                    return True
                generated.append(int(t))
                if on_token:
                    on_token(int(t))
                if done_np[i]:
                    finish = "stop"
                    return True
            return len(generated) >= max_new_tokens

        device_tok = tok[:, None]  # [B, 1] on device, no host round-trip
        inflight = None
        while True:
            if stop_check and stop_check():
                finish = "cancelled"
                break
            if host_len + chunk >= self.max_seq - 1:
                # drain pipeline, then context shift: keep n_keep tokens,
                # drop half of the rest, re-prefill (bridge.cpp:487-507).
                # The pending token (generated[-1]) is NOT prefilled — it is
                # fed as the next decode input so its KV lands exactly once.
                if inflight is not None:
                    if consume(inflight):
                        inflight = None
                        break
                    inflight = None
                kept = list(prompt_ids[:n_keep]) if n_keep else []
                tail = (list(prompt_ids[n_keep:]) + generated)
                tail = tail[len(tail) // 2 :]
                cache = self._new_cache(dense=True)
                keep_ids = (kept + tail)[:-1]
                Ts = min(max(16, 1 << (max(len(keep_ids), 1) - 1).bit_length()),
                         self.max_seq)
                ids = np.zeros((self.max_batch, Ts), np.int32)
                ids[0, : len(keep_ids)] = keep_ids
                nv = np.zeros(self.max_batch, np.int32)
                nv[0] = len(keep_ids)
                _, cache = forward(self.params, cfg, jnp.asarray(ids), cache,
                                   last_only=True, n_valid=jnp.asarray(nv))
                host_len = len(keep_ids)
                if use_cfg:
                    gcache = self._new_cache(dense=True)
                    gcache, _ = self._prefill_aux(gcache, neg_ids + tail[:-1])
                cur = np.zeros((self.max_batch, 1), np.int32)
                cur[0, 0] = generated[-1]
                device_tok = jnp.asarray(cur)
            if len(generated) + (chunk if inflight is not None else 0) >= max_new_tokens:
                # enough tokens already dispatched
                if inflight is not None and consume(inflight):
                    inflight = None
                break
            # dispatch the next chunk (async), then consume the previous one —
            # the host readback overlaps with device compute
            if use_cfg:
                toks, done, cache, gcache, state = _decode_chunk_cfg(
                    self.params, cfg, cache, gcache, device_tok, state,
                    sampling, chunk, eog_mask, self.nl_token,
                )
            else:
                toks, done, cache, state = _decode_chunk(
                    self.params, cfg, cache, device_tok, state, sampling,
                    jnp.float32(max_new_tokens), chunk, eog_mask,
                    nl_token=self.nl_token, **janus_args,
                )
            device_tok = toks[:, -1:]
            host_len += chunk
            n_steps += chunk
            if inflight is not None and consume(inflight):
                inflight = None
                break
            inflight = (toks, done)
        if inflight is not None:
            consume(inflight)
        t_gen = time.perf_counter() - t1

        text = self.tokenizer.decode(generated) if self.tokenizer else ""
        return GenerationResult(
            token_ids=generated,
            text=text,
            n_prompt=len(prompt_ids),
            n_generated=len(generated),
            prompt_ms_per_token=1000.0 * t_prompt / max(len(prompt_ids), 1),
            gen_ms_per_token=1000.0 * t_gen / max(n_steps, 1),
            finish_reason=finish,
        )
