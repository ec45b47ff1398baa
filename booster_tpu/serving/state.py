"""Per-sequence KV state save/restore ("session swap", fixed).

Reference analog: llama_state_seq_get_data / set_data
(/root/reference/cpp/src/llama.cpp:18159-18290) — serializes tokens + the
sequence's KV tensors.  Booster's use of it was scaffolded but commented out
after bugs (bridge.cpp:224-263); here it works: a slot's cache slice plus its
token history round-trips through a single .npz blob, so a session can resume
without re-prefilling.
"""

from __future__ import annotations

import io
import json
from typing import Optional

import jax.numpy as jnp
import numpy as np

STATE_MAGIC = "booster-tpu-state-v1"


def save_slot_state(engine, slot: int, token_ids: list[int]) -> bytes:
    """Serialize one slot's KV prefix + token history."""
    cache = engine.cache
    length = int(np.asarray(cache.lengths)[slot])
    buf = io.BytesIO()

    def storable(a):
        a = np.asarray(a)
        # bfloat16 has no portable npz representation: store as uint16 bits
        if str(a.dtype) == "bfloat16":
            return a.view(np.uint16)
        return a

    arrays = {
        "k": storable(cache.k[:, slot, :, :length]),
        "v": storable(cache.v[:, slot, :, :length]),
        "tokens": np.asarray(token_ids, np.int32),
    }
    if cache.k_scale is not None:
        arrays["k_scale"] = np.asarray(cache.k_scale[:, slot, :, :length])
        arrays["v_scale"] = np.asarray(cache.v_scale[:, slot, :, :length])
    meta = {
        "magic": STATE_MAGIC,
        "kv_dtype": str(np.asarray(cache.k[:1, 0, :1]).dtype),
        "length": length,
        "n_layers": engine.cfg.n_layers,
        "n_kv_heads": engine.cfg.n_kv_heads,
        "head_dim": engine.cfg.head_dim,
        "arch": engine.cfg.arch,
        "quantized": cache.k_scale is not None,
    }
    np.savez_compressed(buf, meta=json.dumps(meta), **arrays)
    return buf.getvalue()


def peek_tokens(blob: bytes) -> list[int]:
    """Token history of a state blob without restoring it."""
    data = np.load(io.BytesIO(blob), allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("magic") != STATE_MAGIC:
        raise ValueError("not a booster-tpu state blob")
    return [int(t) for t in data["tokens"]]


def kv_length(blob: bytes) -> int:
    data = np.load(io.BytesIO(blob), allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    return int(meta["length"])


def load_slot_state(engine, slot: int, blob: bytes,
                    max_len: Optional[int] = None) -> list[int]:
    """Restore a saved sequence into `slot`; returns its token history.

    `max_len` truncates the restored prefix (session swap restores only the
    portion that matches the new prompt's tokens)."""
    import dataclasses

    data = np.load(io.BytesIO(blob), allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("magic") != STATE_MAGIC:
        raise ValueError("not a booster-tpu state blob")
    for key, want in (("n_layers", engine.cfg.n_layers),
                      ("n_kv_heads", engine.cfg.n_kv_heads),
                      ("head_dim", engine.cfg.head_dim)):
        if meta[key] != want:
            raise ValueError(f"state/model mismatch: {key} {meta[key]} != {want}")
    if bool(meta["quantized"]) != (engine.cache.k_scale is not None):
        raise ValueError("state/engine KV quantization mismatch")
    length = int(meta["length"])
    if max_len is not None:
        length = min(length, max_len)
    if length > engine.max_seq:
        raise ValueError(f"state length {length} exceeds engine max_seq")

    cache = engine.cache

    def restore(a):
        a = np.asarray(a)
        if a.dtype == np.uint16 and meta.get("kv_dtype") == "bfloat16":
            import ml_dtypes

            return a.view(ml_dtypes.bfloat16)
        return a

    k = cache.k.at[:, slot, :, :length].set(
        jnp.asarray(restore(data["k"])[:, :, :length]))
    v = cache.v.at[:, slot, :, :length].set(
        jnp.asarray(restore(data["v"])[:, :, :length]))
    ks = vs = None
    if cache.k_scale is not None:
        ks = cache.k_scale.at[:, slot, :, :length].set(
            jnp.asarray(data["k_scale"][:, :, :length]))
        vs = cache.v_scale.at[:, slot, :, :length].set(
            jnp.asarray(data["v_scale"][:, :, :length]))
    engine.cache = dataclasses.replace(
        cache,
        k=k,
        v=v,
        lengths=cache.lengths.at[slot].set(length),
        k_scale=ks,
        v_scale=vs,
    )
    if hasattr(engine, "slot_lengths"):
        engine.slot_lengths[slot] = length
    return [int(t) for t in data["tokens"]]
