"""Shared-prefix KV cache: device-resident snapshots of prompt prefixes,
reused across jobs (system prompts, few-shot headers).

Reference analog: llama.cpp's cell-level prefix reuse in llama_kv_cache
(find_slot + seq bookkeeping, /root/reference/cpp/src/llama.cpp:2495-2540,
:3028) — there, sequences share cells via copy-on-write bookkeeping.  TPU
redesign: the slot cache is statically shaped, so sharing happens at admit
time — the longest cached token-prefix match is copied into the new slot's
rows (device-to-device, no recompute) and only the unseen suffix is
prefilled.  Snapshots are LRU-evicted by byte budget.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional


@dataclasses.dataclass
class _Entry:
    tokens: tuple
    arrays: dict[str, Any]  # device arrays: k/v (+scales) [L, H, nb, D*]
    n: int  # valid prefix length (≤ nb, the padded buffer length)
    nbytes: int
    last_used: float


class PrefixCache:
    """LRU of device-resident KV prefixes keyed by token prefix."""

    def __init__(self, max_bytes: int = 512 * 1024 * 1024,
                 min_prefix: int = 16, max_entries: int = 16):
        self.max_bytes = max_bytes
        self.min_prefix = min_prefix
        self.max_entries = max_entries
        self.entries: list[_Entry] = []

    def _bytes(self) -> int:
        return sum(e.nbytes for e in self.entries)

    def lookup(self, ids: list[int]) -> Optional[tuple[_Entry, int]]:
        """(entry, common) with the longest common token prefix vs `ids`
        (capped at len(ids)-1 so at least one token remains to prefill)."""
        best = None
        best_n = 0
        for e in self.entries:
            common = 0
            for a, b in zip(e.tokens, ids):
                if a != b:
                    break
                common += 1
            common = min(common, len(ids) - 1, e.n)
            if common > best_n:
                best, best_n = e, common
        if best is None or best_n < self.min_prefix:
            return None
        best.last_used = time.time()
        return best, best_n

    def insert(self, tokens: list[int], arrays: dict[str, Any], n: int) -> None:
        if n < self.min_prefix:
            return
        key = tuple(tokens[:n])
        for e in self.entries:
            if e.tokens == key:
                e.last_used = time.time()
                return
        nbytes = sum(int(a.size) * a.dtype.itemsize for a in arrays.values())
        self.entries.append(_Entry(key, arrays, n, nbytes, time.time()))
        while (self._bytes() > self.max_bytes
               or len(self.entries) > self.max_entries):
            self.entries.sort(key=lambda e: e.last_used)
            self.entries.pop(0)

    def stats(self) -> dict:
        return {"entries": len(self.entries), "bytes": self._bytes()}


def snapshot_slot_prefix(engine, slot: int, n: int) -> Optional[dict[str, Any]]:
    """Copy the first `n` cache rows of a slot to standalone device arrays
    (padded to a power-of-two bucket so few jit variants exist)."""
    if n <= 0:
        return None
    nb = min(1 << (n - 1).bit_length(), engine.max_seq)
    cache = engine.cache
    out = {
        "k": cache.k[:, slot, :, :nb],
        "v": cache.v[:, slot, :, :nb],
    }
    if cache.k_scale is not None:
        out["ks"] = cache.k_scale[:, slot, :, :nb]
        out["vs"] = cache.v_scale[:, slot, :, :nb]
    return out


def restore_slot_prefix(engine, slot: int, entry: _Entry, n: int) -> int:
    """Write the first `n` rows of a cached prefix into `slot`.  Rows past n
    inside the copied buffer are stale but sit beyond kv_valid (never
    attended) and are overwritten as the suffix prefills."""
    import dataclasses as dc

    cache = engine.cache
    nb = entry.arrays["k"].shape[2]
    k = cache.k.at[:, slot, :, :nb].set(entry.arrays["k"])
    v = cache.v.at[:, slot, :, :nb].set(entry.arrays["v"])
    ks = vs = None
    if cache.k_scale is not None:
        ks = cache.k_scale.at[:, slot, :, :nb].set(entry.arrays["ks"])
        vs = cache.v_scale.at[:, slot, :, :nb].set(entry.arrays["vs"])
    engine.cache = dc.replace(
        cache, k=k, v=v,
        lengths=cache.lengths.at[slot].set(n),
        k_scale=ks, v_scale=vs,
    )
    engine.slot_lengths[slot] = n
    return n
