"""Paged KV cache: a physical page pool + per-slot page tables.

Reference analog: llama_kv_cache cell bookkeeping with sequence sharing
(/root/reference/cpp/src/llama.cpp:2495-2540 — cells carry a seq_id set, so
several sequences can reference the same cells; find_slot :3028).  The TPU
redesign keeps every shape static: K/V live in a pool of fixed-size pages
[L, Np, Hkv, P, D] and each serving slot owns a row of physical page ids
[B, MAXP].  Sharing is first-class — several slots may map the same physical
page (read-only by convention: the scheduler only appends into pages with
refcount 1), which is what gives cross-slot shared-prefix dedup without
copying (the vLLM PagedAttention idea, re-expressed with static shapes and
scalar-prefetched DMA steering for the attention kernel).

Page bookkeeping (alloc/free/refcount/prefix-hash) is host-side in
PageAllocator — no dynamic structures inside jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PagedKVCache:
    """Pytree: k/v pools [L, Np, Hkv, P, D] (+ scales [L, Np, Hkv, P, 1]
    when int8), per-slot page tables [B, MAXP] i32, lengths [B] i32.

    Logical position p of slot b lives at (table[b, p // P], p % P) in the
    pool.  Table entries beyond a slot's allocated pages are 0 — a valid
    physical page, so speculative DMA of never-attended tiles stays safe.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    table: jnp.ndarray  # [B, MAXP] int32 physical page per logical page
    lengths: jnp.ndarray  # [B] int32 valid tokens per slot
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        return self.table.shape[1] * self.page_size

    @classmethod
    def create(
        cls,
        n_layers: int,
        batch: int,
        max_len: int,
        n_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
        head_dim_v: int = 0,
        page_size: int = 256,
        n_pages: int = 0,  # 0 → batch * ceil(max_len / page_size)
    ) -> "PagedKVCache":
        from booster_tpu.ops.kv_cache import pad_head_dim

        P = page_size
        maxp = -(-max_len // P)
        np_total = n_pages or batch * maxp
        dv = head_dim_v or head_dim
        # lane-padded storage like the dense cache (pad_head_dim: zero extra
        # HBM — the minor dim is tile-padded to 128 anyway — and the logical
        # shape matches the physical tiling, so no per-layer relayouts)
        k_shape = (n_layers, np_total, n_kv_heads, P, pad_head_dim(head_dim))
        v_shape = (n_layers, np_total, n_kv_heads, P, pad_head_dim(dv))
        table = jnp.zeros((batch, maxp), jnp.int32)
        if quantized:
            return cls(
                k=jnp.zeros(k_shape, jnp.int8),
                v=jnp.zeros(v_shape, jnp.int8),
                table=table,
                lengths=jnp.zeros(batch, jnp.int32),
                k_scale=jnp.zeros(k_shape[:-1] + (1,), jnp.float32),
                v_scale=jnp.zeros(v_shape[:-1] + (1,), jnp.float32),
            )
        return cls(
            k=jnp.zeros(k_shape, dtype),
            v=jnp.zeros(v_shape, dtype),
            table=table,
            lengths=jnp.zeros(batch, jnp.int32),
        )


jax.tree_util.register_pytree_node(
    PagedKVCache,
    lambda c: ((c.k, c.v, c.table, c.lengths, c.k_scale, c.v_scale), None),
    lambda aux, ch: PagedKVCache(*ch),
)


def _pad_last(new: jnp.ndarray, width: int) -> jnp.ndarray:
    """Zero-pad the last dim to the (lane-padded) pool storage width."""
    d = new.shape[-1]
    if d == width:
        return new
    return jnp.pad(new, ((0, 0),) * (new.ndim - 1) + ((0, width - d),))


def append_paged_layer(
    pool_k: jnp.ndarray,  # [Np, Hkv, P, D] one layer's pool slice
    pool_v: jnp.ndarray,
    new_k: jnp.ndarray,  # [B, T, Hkv, D]
    new_v: jnp.ndarray,
    offsets: jnp.ndarray,  # [B] logical write positions (slot lengths)
    table: jnp.ndarray,  # [B, MAXP]
    pool_ks: Optional[jnp.ndarray] = None,  # [Np, Hkv, P, 1]
    pool_vs: Optional[jnp.ndarray] = None,
):
    """Scatter new tokens into their (physical page, in-page offset) homes.

    One scatter op per tensor — the paged analog of ops/kv_cache.update_layer.
    Padding rows (positions past a slot's n_valid) land inside already-
    allocated pages and are overwritten when real tokens arrive, exactly like
    the dense path's past-length writes.
    """
    from booster_tpu.ops.kv_cache import _quantize_kv

    new_k = _pad_last(new_k, pool_k.shape[-1])
    new_v = _pad_last(new_v, pool_v.shape[-1])
    B, T, Hkv, D = new_k.shape
    P = pool_k.shape[2]
    pos = offsets[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # [B,T]
    logical_raw = pos // P
    logical = jnp.minimum(logical_raw, table.shape[1] - 1)
    phys = jnp.take_along_axis(table, logical, axis=1)  # [B, T]
    # positions past the table range (padding at the very end of a full
    # cache) divert to physical page 0 — the reserved scratch page — so they
    # can never overwrite the last real page (engine.py reserves page 0)
    phys = jnp.where(logical_raw < table.shape[1], phys, 0)
    o = pos % P
    b_idx = phys[:, :, None]  # [B, T, 1] broadcast over heads
    h_idx = jnp.arange(Hkv, dtype=jnp.int32)[None, None, :]
    o_idx = o[:, :, None]

    if pool_ks is not None:
        qk, sk = _quantize_kv(new_k)  # [B, T, Hkv, D], [B, T, Hkv, 1]
        qv, sv = _quantize_kv(new_v)
        pool_k = pool_k.at[b_idx, h_idx, o_idx].set(qk)
        pool_v = pool_v.at[b_idx, h_idx, o_idx].set(qv)
        pool_ks = pool_ks.at[b_idx, h_idx, o_idx].set(sk)
        pool_vs = pool_vs.at[b_idx, h_idx, o_idx].set(sv)
        return pool_k, pool_v, pool_ks, pool_vs

    pool_k = pool_k.at[b_idx, h_idx, o_idx].set(new_k.astype(pool_k.dtype))
    pool_v = pool_v.at[b_idx, h_idx, o_idx].set(new_v.astype(pool_v.dtype))
    return pool_k, pool_v, None, None


def paged_append_all_layers(
    pool_k: jnp.ndarray,  # [L, Np, Hkv, P, D] the whole stacked pool
    pool_v: jnp.ndarray,
    new_k: jnp.ndarray,  # [L, B, Hkv, D] one decode token per slot, all layers
    new_v: jnp.ndarray,
    offsets: jnp.ndarray,  # [B] logical write positions (slot lengths)
    table: jnp.ndarray,  # [B, MAXP]
    pool_ks: Optional[jnp.ndarray] = None,  # [L, Np, Hkv, P, 1]
    pool_vs: Optional[jnp.ndarray] = None,
):
    """Deferred decode append for the paged pool: ONE scatter lands every
    layer's new row (the paged sibling of ops/pallas_kv.kv_append_all_layers
    — per-layer scatters inside the scan both serialize with attention and
    force XLA to materialize per-layer pool slices).

    Positions past the table range divert to physical page 0 (the reserved
    scratch page), exactly like append_paged_layer."""
    from booster_tpu.ops.kv_cache import _quantize_kv

    new_k = _pad_last(new_k, pool_k.shape[-1])
    new_v = _pad_last(new_v, pool_v.shape[-1])
    L, B, Hkv, D = new_k.shape
    P = pool_k.shape[3]
    logical_raw = offsets // P
    logical = jnp.minimum(logical_raw, table.shape[1] - 1)
    phys = jnp.take_along_axis(table, logical[:, None], axis=1)[:, 0]  # [B]
    phys = jnp.where(logical_raw < table.shape[1], phys, 0)
    o = offsets % P
    l_idx = jnp.arange(L, dtype=jnp.int32)[:, None, None]  # [L, 1, 1]
    b_idx = phys[None, :, None]
    h_idx = jnp.arange(Hkv, dtype=jnp.int32)[None, None, :]
    o_idx = o[None, :, None]

    if pool_ks is not None:
        qk, sk = _quantize_kv(new_k)  # [L, B, Hkv, D], [L, B, Hkv, 1]
        qv, sv = _quantize_kv(new_v)
        pool_k = pool_k.at[l_idx, b_idx, h_idx, o_idx].set(qk)
        pool_v = pool_v.at[l_idx, b_idx, h_idx, o_idx].set(qv)
        pool_ks = pool_ks.at[l_idx, b_idx, h_idx, o_idx].set(sk)
        pool_vs = pool_vs.at[l_idx, b_idx, h_idx, o_idx].set(sv)
        return pool_k, pool_v, pool_ks, pool_vs

    pool_k = pool_k.at[l_idx, b_idx, h_idx, o_idx].set(
        new_k.astype(pool_k.dtype))
    pool_v = pool_v.at[l_idx, b_idx, h_idx, o_idx].set(
        new_v.astype(pool_v.dtype))
    return pool_k, pool_v, None, None


def gather_layer(pool: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Materialize a slot-dense view [B, Hkv, MAXP*P, D*] of one layer's
    pool — the prefill / fallback attention path (reads the same bytes the
    dense cache would; one extra write of the gathered view)."""
    B, MAXP = table.shape
    g = pool[table]  # [B, MAXP, Hkv, P, D*]
    _, _, Hkv, P, D = g.shape
    return g.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, MAXP * P, D)


def scatter_layer(pool: jnp.ndarray, table: jnp.ndarray,
                  dense: jnp.ndarray) -> jnp.ndarray:
    """Inverse of gather_layer for one slot-dense view: write [B, Hkv, S, D*]
    back through the page table (context-shift roundtrip; aliased pages must
    not be written — callers pass single-slot private tables)."""
    B, MAXP = table.shape
    _, Hkv, S, D = dense.shape
    P = S // MAXP
    d = dense.reshape(B, Hkv, MAXP, P, D).transpose(0, 2, 1, 3, 4)
    return pool.at[table].set(d.astype(pool.dtype))


class PageAllocator:
    """Host-side physical page bookkeeping: free list + refcounts + a
    content hash (token-chain) per immutable full page for prefix dedup.

    The reference's cell seq_id sets (llama.cpp:2495) collapse to refcounts:
    a page with refcount > 1 is shared and read-only; appends only ever
    target refcount-1 tail pages (the scheduler guarantees this by copying
    on admission when a shared page would be written — in practice the tail
    is always freshly allocated, so no copy is needed).
    """

    def __init__(self, n_pages: int, page_size: int):
        self.n_pages = n_pages
        self.page_size = page_size
        self.refcount = np.zeros(n_pages, np.int32)
        self.free_list = list(range(n_pages - 1, -1, -1))
        # prefix dedup: hash(token chain through page end) → physical page
        self._by_hash: dict[int, int] = {}
        self._hash_of: dict[int, int] = {}
        # released-but-hashed pages stay resident for future prefix hits and
        # are only evicted (LRU) when the free list runs dry — the paged
        # analog of the reference keeping a session's cells warm
        self._cached: dict[int, None] = {}  # insertion-ordered set

    @property
    def n_free(self) -> int:
        return len(self.free_list) + len(self._cached)

    def _evict_one(self) -> Optional[int]:
        if not self._cached:
            return None
        p = next(iter(self._cached))
        del self._cached[p]
        h = self._hash_of.pop(p, None)
        if h is not None and self._by_hash.get(h) == p:
            del self._by_hash[h]
        return p

    def alloc(self, n: int) -> Optional[list[int]]:
        if n > self.n_free:
            return None
        pages = []
        for _ in range(n):
            if self.free_list:
                pages.append(self.free_list.pop())
            else:
                pages.append(self._evict_one())
        for p in pages:
            self.refcount[p] = 1
        return pages

    def retain(self, pages: list[int]) -> None:
        for p in pages:
            if self.refcount[p] == 0:  # revive a cached (hashed) page
                self._cached.pop(p, None)
            self.refcount[p] += 1

    def release(self, pages: list[int]) -> None:
        for p in pages:
            self.refcount[p] -= 1
            if self.refcount[p] == 0:
                if p in self._hash_of:
                    self._cached[p] = None  # keep resident for prefix hits
                else:
                    self.free_list.append(p)

    # ---- prefix dedup -------------------------------------------------
    @staticmethod
    def chain_hashes(ids: list[int], page_size: int) -> list[int]:
        """Rolling hash of the token chain at each full-page boundary, so a
        page is only shared when its *entire history* matches."""
        out = []
        h = 0
        for i, t in enumerate(ids):
            h = hash((h, int(t)))
            if (i + 1) % page_size == 0:
                out.append(h)
        return out

    def lookup_prefix(self, ids: list[int]) -> tuple[list[int], int]:
        """Longest run of already-resident full pages matching the prompt's
        leading token chain.  Returns (physical pages, tokens covered); the
        caller must `retain` them before mapping into a slot table."""
        pages = []
        for h in self.chain_hashes(ids, self.page_size):
            p = self._by_hash.get(h)
            if p is None or (self.refcount[p] <= 0 and p not in self._cached):
                break
            pages.append(p)
        return pages, len(pages) * self.page_size

    def publish_prefix(self, ids: list[int], pages: list[int]) -> None:
        """Register a slot's full pages as dedup candidates (after their
        contents are written and will no longer change)."""
        for h, p in zip(self.chain_hashes(ids, self.page_size), pages):
            if h not in self._by_hash and self.refcount[p] > 0:
                self._by_hash[h] = p
                self._hash_of[p] = h

    def stats(self) -> dict:
        return {
            "n_pages": self.n_pages,
            "free": self.n_free,
            "shared": int((self.refcount > 1).sum()),
            "hashed": len(self._by_hash),
        }
