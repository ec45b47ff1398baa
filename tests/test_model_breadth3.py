"""Architecture sweep, round 2: chatglm (HF GLM parity), xverse, refact,
plamo, codeshell, grok, arctic, bitnet.

chatglm/xverse verify against HF transformers.  The rest have no
transformers implementation (remote-code models), so each is checked
against an independent numpy reference that implements the reference
builder's documented graph directly (build_refact llama.cpp:9652,
build_plamo :10950, build_codeshell :11159, build_grok :9265,
build_arctic :12710, build_bitnet :13070) — two implementations, one spec.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from booster_tpu.gguf import GGUFWriter
from booster_tpu.models import load_model
from booster_tpu.models.llama import forward
from booster_tpu.ops.kv_cache import KVCache
from tests.test_model_families import check_model

IDS = np.array([[3, 17, 42, 99, 7]], np.int32)


# ---------------------------------------------------------------------------
# HF-parity archs
# ---------------------------------------------------------------------------

def test_chatglm(tmp_path):
    """GLM-4 family → GGUF chatglm: fused-interleaved partial rope ("norm"
    style, no permute), gate_up fused MLP, qkv biases."""
    cfg = transformers.GlmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=128, tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=2, bos_token_id=1,
    )
    torch.manual_seed(0)
    hf = transformers.GlmForCausalLM(cfg).eval()
    loaded = check_model(hf, str(tmp_path / "chatglm.gguf"), IDS)
    assert loaded.cfg.arch == "chatglm"
    # chatglm is an interleaved-rope ("norm") arch; the loader de-interleaves
    # q/k rows at load so the runtime style is neox (exact — parity above)
    assert loaded.cfg.rope_style == "neox" and loaded.cfg.rope_deinterleaved
    assert loaded.cfg.rope_dims == 8  # partial_rotary_factor 0.5 × head 16


def test_xverse(tmp_path):
    """xverse is graph-identical to llama (build_xverse :9042); verify both
    the HF parity and the exact equality with the llama-arch conversion."""
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    loaded = check_model(hf, str(tmp_path / "xverse.gguf"), IDS, arch="xverse")
    assert loaded.cfg.arch == "xverse"

    llama = check_model(hf, str(tmp_path / "llama.gguf"), IDS)
    cache = KVCache.create(2, 1, 32, 4, 16, dtype=jnp.float32)
    got_x, _ = forward(loaded.params, loaded.cfg, jnp.asarray(IDS), cache)
    cache = KVCache.create(2, 1, 32, 4, 16, dtype=jnp.float32)
    got_l, _ = forward(llama.params, llama.cfg, jnp.asarray(IDS), cache)
    np.testing.assert_array_equal(np.asarray(got_x), np.asarray(got_l))


# ---------------------------------------------------------------------------
# numpy reference machinery
# ---------------------------------------------------------------------------

def np_rms(x, w, eps=1e-5):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def np_ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def np_gelu(x):  # tanh approximation (ggml_gelu)
    return 0.5 * x * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))


def np_rope(x, positions, rd, style, base=10000.0):
    """x [T, H, D]; rotate the first `rd` dims per head."""
    T, H, D = x.shape
    out = x.copy()
    inv = base ** (-np.arange(0, rd, 2, dtype=np.float64) / rd)  # [rd/2]
    ang = positions[:, None].astype(np.float64) * inv[None, :]  # [T, rd/2]
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]  # [T, 1, rd/2]
    if style == "norm":  # interleaved adjacent pairs
        x0, x1 = x[..., 0:rd:2], x[..., 1:rd:2]
        out[..., 0:rd:2] = x0 * cos - x1 * sin
        out[..., 1:rd:2] = x0 * sin + x1 * cos
    elif style == "neox":  # half-split within the rotated span
        h = rd // 2
        x0, x1 = x[..., :h], x[..., h:rd]
        out[..., :h] = x0 * cos - x1 * sin
        out[..., h:rd] = x0 * sin + x1 * cos
    return out


def np_attention(q, k, v, scale, slopes=None):
    """q [T,H,D], k/v [T,Hkv,D] causal full attention with GQA; `slopes`
    adds ALiBi bias slope·key_pos (softmax-shift-equivalent to the
    relative form)."""
    T, H, D = q.shape
    Hkv = k.shape[1]
    G = H // Hkv
    out = np.zeros_like(q)
    mask = np.tril(np.ones((T, T), bool))
    for h in range(H):
        s = (q[:, h] @ k[:, h // G].T) * scale
        if slopes is not None:
            s = s + slopes[h] * np.arange(T)[None, :]
        s = np.where(mask, s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out[:, h] = p @ v[:, h // G]
    return out


def np_moe(x, lp, E, k, act):
    """softmax → top-k → renormalize → mix (llm_build_moe_ffn, norm_w=true)."""
    T, C = x.shape
    logits = x @ lp["gate_inp"].T  # [T, E]
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    for t in range(T):
        top = np.argsort(-p[t])[:k]
        wts = p[t][top] / p[t][top].sum()
        for e, wt in zip(top, wts):
            g = act(x[t] @ lp["gate_exps"][e].T)
            u = x[t] @ lp["up_exps"][e].T
            out[t] += wt * ((g * u) @ lp["down_exps"][e].T)
    return out


class Spec:
    """Tiny arch spec driving both the GGUF writer and the numpy model."""

    def __init__(self, arch, rope_style, hidden=64, heads=4, kv_heads=2,
                 ff=128, layers=2, vocab=256, rope_dim=None, norm="rms",
                 act="silu", parallel=False, ffn_norm=True, fused_qkv=False,
                 qkv_bias=False, ffn_bias=False, post_norms=False,
                 sub_norms=False, scales=False, experts=0, experts_used=0,
                 moe_parallel=False, tied=False, emb_scale=1.0,
                 logit_scale=1.0, res_scale=1.0, attn_scale=None,
                 norm_bias=True, alibi=0.0, clamp=0.0,
                 ffn_norm_name="ffn_norm"):
        self.__dict__.update(locals())
        self.head_dim = hidden // heads
        self.rd = rope_dim or self.head_dim


def build_gguf(spec, path, seed=0):
    rng = np.random.default_rng(seed)
    sc = 0.25

    def W(*shape):
        return (rng.normal(size=shape) * sc / np.sqrt(shape[-1])).astype(np.float32)

    s = spec
    hd, Hkv = s.head_dim, s.kv_heads
    w = GGUFWriter()
    a = s.arch
    w.add("general.architecture", a)
    w.add(f"{a}.block_count", s.layers)
    w.add(f"{a}.context_length", 128)
    w.add(f"{a}.embedding_length", s.hidden)
    w.add(f"{a}.feed_forward_length", s.ff)
    w.add(f"{a}.attention.head_count", s.heads)
    w.add(f"{a}.attention.head_count_kv", Hkv)
    w.add(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{a}.attention.layer_norm_epsilon", 1e-5)
    w.add(f"{a}.rope.freq_base", 10000.0)
    w.add(f"{a}.rope.dimension_count", s.rd)
    w.add(f"{a}.vocab_size", s.vocab)
    if s.experts:
        w.add(f"{a}.expert_count", s.experts)
        w.add(f"{a}.expert_used_count", s.experts_used)
    if s.alibi:
        w.add(f"{a}.attention.max_alibi_bias", s.alibi)
    if s.clamp:
        w.add(f"{a}.attention.clamp_kqv", s.clamp)

    t = {"token_embd.weight": W(s.vocab, s.hidden),
         "output_norm.weight": 1.0 + W(s.hidden)}
    if s.norm == "layer" and s.norm_bias:
        t["output_norm.bias"] = W(s.hidden)
    if not s.tied:
        t["output.weight"] = W(s.vocab, s.hidden)
    for i in range(s.layers):
        p = f"blk.{i}."
        t[p + "attn_norm.weight"] = 1.0 + W(s.hidden)
        if s.norm == "layer" and s.norm_bias:
            t[p + "attn_norm.bias"] = W(s.hidden)
        if s.fused_qkv:
            t[p + "attn_qkv.weight"] = W(s.hidden + 2 * Hkv * hd, s.hidden)
            if s.qkv_bias:
                t[p + "attn_qkv.bias"] = W(s.hidden + 2 * Hkv * hd)
        else:
            t[p + "attn_q.weight"] = W(s.hidden, s.hidden)
            t[p + "attn_k.weight"] = W(Hkv * hd, s.hidden)
            t[p + "attn_v.weight"] = W(Hkv * hd, s.hidden)
        t[p + "attn_output.weight"] = W(s.hidden, s.hidden)
        if s.ffn_bias:
            t[p + "attn_output.bias"] = W(s.hidden)
        if s.post_norms:
            t[p + "attn_output_norm.weight"] = 1.0 + W(s.hidden)
            t[p + "layer_output_norm.weight"] = 1.0 + W(s.hidden)
        if s.sub_norms:
            t[p + "attn_sub_norm.weight"] = 1.0 + W(s.hidden)
            t[p + "ffn_sub_norm.weight"] = 1.0 + W(s.ff)
        if s.scales:
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output",
                       "ffn_gate", "ffn_up", "ffn_down"):
                t[p + nm + ".scale"] = np.asarray(
                    [float(rng.uniform(0.5, 1.5))], np.float32)
        if s.ffn_norm:
            t[p + s.ffn_norm_name + ".weight"] = 1.0 + W(s.hidden)
            if s.norm == "layer" and s.norm_bias:
                t[p + s.ffn_norm_name + ".bias"] = W(s.hidden)
        if s.moe_parallel:
            t[p + "ffn_norm_exps.weight"] = 1.0 + W(s.hidden)
        if s.experts and not s.moe_parallel:
            pass  # grok/dbrx: MoE replaces the dense FFN entirely
        else:
            if s.act == "silu":
                t[p + "ffn_gate.weight"] = W(s.ff, s.hidden)
                if s.ffn_bias:
                    t[p + "ffn_gate.bias"] = W(s.ff)
            t[p + "ffn_up.weight"] = W(s.ff, s.hidden)
            t[p + "ffn_down.weight"] = W(s.hidden, s.ff)
            if s.ffn_bias:
                t[p + "ffn_up.bias"] = W(s.ff)
                t[p + "ffn_down.bias"] = W(s.hidden)
        if s.experts:
            t[p + "ffn_gate_inp.weight"] = W(s.experts, s.hidden)
            t[p + "ffn_gate_exps.weight"] = W(s.experts, s.ff, s.hidden)
            t[p + "ffn_up_exps.weight"] = W(s.experts, s.ff, s.hidden)
            t[p + "ffn_down_exps.weight"] = W(s.experts, s.hidden, s.ff)
    from booster_tpu.gguf import GGMLType

    for name, arr in t.items():
        w.add_tensor(name, arr.astype(np.float32), arr.shape, GGMLType.F32)
    w.write(path)
    return t


def np_forward(spec, t, ids):
    """Numpy reference decoder for the synthetic archs."""
    s = spec
    hd, Hkv, H = s.head_dim, s.kv_heads, s.heads
    act = np_silu if s.act == "silu" else np_gelu
    T = ids.shape[0]
    pos = np.arange(T)
    a_scale = s.attn_scale or 1.0 / np.sqrt(s.head_dim)
    slopes = None
    if s.alibi:
        n2 = 2 ** int(np.floor(np.log2(s.heads)))
        m0 = 2.0 ** (-s.alibi / n2)
        m1 = 2.0 ** (-(s.alibi / 2.0) / n2)
        slopes = np.array(
            [m0 ** (h + 1) for h in range(n2)]
            + [m1 ** (2 * (h - n2) + 1) for h in range(n2, s.heads)]
        )
    x = t["token_embd.weight"][ids].astype(np.float64) * s.emb_scale
    for i in range(s.layers):
        p = f"blk.{i}."

        def norm(v, key):
            if s.norm == "layer":
                return np_ln(v, t[p + key + ".weight"],
                             t.get(p + key + ".bias", 0.0))
            return np_rms(v, t[p + key + ".weight"])

        def scl(nm):
            return t[p + nm + ".scale"][0] if s.scales else 1.0

        h = norm(x, "attn_norm")
        if s.fused_qkv:
            qkv = h @ t[p + "attn_qkv.weight"].T
            if s.qkv_bias:
                qkv = qkv + t[p + "attn_qkv.bias"]
            q = qkv[:, : s.hidden]
            k = qkv[:, s.hidden : s.hidden + Hkv * hd]
            v = qkv[:, s.hidden + Hkv * hd :]
        else:
            q = h @ t[p + "attn_q.weight"].T * scl("attn_q")
            k = h @ t[p + "attn_k.weight"].T * scl("attn_k")
            v = h @ t[p + "attn_v.weight"].T * scl("attn_v")
        if s.clamp:
            q, k, v = (np.clip(z, -s.clamp, s.clamp) for z in (q, k, v))
        q = q.reshape(T, H, hd)
        k = k.reshape(T, Hkv, hd)
        v = v.reshape(T, Hkv, hd)
        if s.rope_style != "none":
            q = np_rope(q, pos, s.rd, s.rope_style)
            k = np_rope(k, pos, s.rd, s.rope_style)
        attn = np_attention(q, k, v, a_scale, slopes).reshape(T, -1)
        if s.sub_norms:
            attn = np_rms(attn, t[p + "attn_sub_norm.weight"])
        attn = attn @ t[p + "attn_output.weight"].T * scl("attn_output")
        if s.ffn_bias:
            attn = attn + t[p + "attn_output.bias"]
        if s.post_norms:
            attn = np_rms(attn, t[p + "attn_output_norm.weight"])

        attn = attn * s.res_scale
        if s.parallel:
            fh = h  # no ffn_norm: FFN reads the attn_norm output (plamo)
            resid = x
        else:
            x = x + attn
            fh = norm(x, s.ffn_norm_name)
            resid = x

        if s.experts and not s.moe_parallel:  # grok: MoE is the FFN
            ffn = np_moe(fh, {
                "gate_inp": t[p + "ffn_gate_inp.weight"],
                "gate_exps": t[p + "ffn_gate_exps.weight"],
                "up_exps": t[p + "ffn_up_exps.weight"],
                "down_exps": t[p + "ffn_down_exps.weight"],
            }, s.experts, s.experts_used, act)
        elif s.act == "silu":
            g = fh @ t[p + "ffn_gate.weight"].T * scl("ffn_gate")
            if s.ffn_bias:
                g = g + t[p + "ffn_gate.bias"]
            g = act(g)
            u = fh @ t[p + "ffn_up.weight"].T * scl("ffn_up")
            if s.ffn_bias:
                u = u + t[p + "ffn_up.bias"]
            mid = g * u
            if s.sub_norms:
                mid = np_rms(mid, t[p + "ffn_sub_norm.weight"])
            ffn = mid @ t[p + "ffn_down.weight"].T * scl("ffn_down")
            if s.ffn_bias:
                ffn = ffn + t[p + "ffn_down.bias"]
        else:
            u = fh @ t[p + "ffn_up.weight"].T
            if s.ffn_bias:
                u = u + t[p + "ffn_up.bias"]
            ffn = act(u) @ t[p + "ffn_down.weight"].T
            if s.ffn_bias:
                ffn = ffn + t[p + "ffn_down.bias"]
        if s.post_norms:
            ffn = np_rms(ffn, t[p + "layer_output_norm.weight"])
        if s.moe_parallel:  # arctic: routed MoE on a parallel residual
            moe_in = np_rms(resid, t[p + "ffn_norm_exps.weight"])
            ffn = ffn + np_moe(moe_in, {
                "gate_inp": t[p + "ffn_gate_inp.weight"],
                "gate_exps": t[p + "ffn_gate_exps.weight"],
                "up_exps": t[p + "ffn_up_exps.weight"],
                "down_exps": t[p + "ffn_down_exps.weight"],
            }, s.experts, s.experts_used, act)
        ffn = ffn * s.res_scale

        x = resid + attn + ffn if s.parallel else resid + ffn

    if s.norm == "layer":
        x = np_ln(x, t["output_norm.weight"], t.get("output_norm.bias", 0.0))
    else:
        x = np_rms(x, t["output_norm.weight"])
    out_w = t.get("output.weight", t["token_embd.weight"])
    return (x @ out_w.T) * s.logit_scale


SPECS = {
    "refact": Spec("refact", "none", kv_heads=1),
    "plamo": Spec("plamo", "norm", kv_heads=4, parallel=True, ffn_norm=False),
    "codeshell": Spec("codeshell", "neox", kv_heads=1, norm="layer",
                      act="gelu", fused_qkv=True, qkv_bias=True,
                      ffn_bias=True),
    "grok": Spec("grok", "neox", act="gelu", post_norms=True, experts=4,
                 experts_used=2, tied=True, emb_scale=78.38367176906169,
                 logit_scale=0.5773502691896257),
    "arctic": Spec("arctic", "norm", experts=4, experts_used=2,
                   moe_parallel=True),
    "bitnet": Spec("bitnet", "neox", sub_norms=True, scales=True),
    # build_minicpm (:11514): llama graph + fixed embedding/residual/lm-head
    # multipliers (12, 1.4/sqrt(L), 256/n_embd)
    "minicpm": Spec("minicpm", "norm", emb_scale=12.0,
                    res_scale=1.4 / np.sqrt(2.0), logit_scale=256.0 / 64),
    # build_orion (:11277): mean-centered LayerNorm, silu gate FFN
    "orion": Spec("orion", "norm", norm="layer"),
    # build_internlm2 (:10540) / build_baichuan (:8930): llama clones
    "internlm2": Spec("internlm2", "norm"),
    "baichuan": Spec("baichuan", "norm", kv_heads=4),
    # build_qwen (:10166): fused biased qkv, rms, neox rope, silu gate
    "qwen": Spec("qwen", "neox", kv_heads=4, fused_qkv=True, qkv_bias=True),
    # build_dbrx (:9450): biasless LayerNorm, fused clamped qkv, MoE-only
    # FFN normed by attn_output_norm
    "dbrx": Spec("dbrx", "neox", norm="layer", norm_bias=False,
                 fused_qkv=True, experts=4, experts_used=2, clamp=0.03,
                 ffn_norm_name="attn_output_norm"),
    # build_jais (:13560): gpt2-style fused qkv + LayerNorm, but SwiGLU
    # FFN with biases, ALiBi, 1/head_dim attention scale
    "jais": Spec("jais", "none", kv_heads=4, norm="layer", fused_qkv=True,
                 qkv_bias=True, ffn_bias=True, attn_scale=1.0 / 16,
                 alibi=8.0),
}


def test_openelm(tmp_path):
    """build_openelm (llama.cpp:12443): per-layer head/kv/ff counts, fused
    per-head qkv, per-head q/k rms norms, neox rope, silu gate FFN, tied
    head.  Layers with different shapes load as separate scan groups with
    per-group config overrides; the KV cache pads to the max kv heads."""
    from booster_tpu.gguf import GGMLType

    rng = np.random.default_rng(11)
    HID, HD, V = 64, 16, 256
    HEADS, KVH, FFS = [2, 4], [1, 2], [96, 128]

    def W(*shape):
        return (rng.normal(size=shape) * 0.25 / np.sqrt(shape[-1])).astype(np.float32)

    w = GGUFWriter()
    a = "openelm"
    w.add("general.architecture", a)
    w.add(f"{a}.block_count", 2)
    w.add(f"{a}.context_length", 128)
    w.add(f"{a}.embedding_length", HID)
    w.add(f"{a}.feed_forward_length", FFS)
    w.add(f"{a}.attention.head_count", HEADS)
    w.add(f"{a}.attention.head_count_kv", KVH)
    w.add(f"{a}.attention.key_length", HD)
    w.add(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{a}.rope.freq_base", 10000.0)
    w.add(f"{a}.rope.dimension_count", HD)
    w.add(f"{a}.vocab_size", V)

    t = {"token_embd.weight": W(V, HID), "output_norm.weight": 1.0 + W(HID)}
    for i in range(2):
        p, h, kv, ff = f"blk.{i}.", HEADS[i], KVH[i], FFS[i]
        t[p + "attn_norm.weight"] = 1.0 + W(HID)
        t[p + "attn_qkv.weight"] = W((h + 2 * kv) * HD, HID)
        t[p + "attn_q_norm.weight"] = 1.0 + W(HD)
        t[p + "attn_k_norm.weight"] = 1.0 + W(HD)
        t[p + "attn_output.weight"] = W(HID, h * HD)
        t[p + "ffn_norm.weight"] = 1.0 + W(HID)
        t[p + "ffn_gate.weight"] = W(ff, HID)
        t[p + "ffn_up.weight"] = W(ff, HID)
        t[p + "ffn_down.weight"] = W(HID, ff)
    for name, arr in t.items():
        w.add_tensor(name, arr.astype(np.float32), arr.shape, GGMLType.F32)
    path = str(tmp_path / "openelm.gguf")
    w.write(path)

    # numpy reference
    ids = IDS[0]
    T = len(ids)
    pos = np.arange(T)
    x = t["token_embd.weight"][ids].astype(np.float64)
    for i in range(2):
        p, h, kv, ff = f"blk.{i}.", HEADS[i], KVH[i], FFS[i]
        hcur = np_rms(x, t[p + "attn_norm.weight"])
        qkv = hcur @ t[p + "attn_qkv.weight"].T
        q = qkv[:, : h * HD].reshape(T, h, HD)
        k = qkv[:, h * HD : (h + kv) * HD].reshape(T, kv, HD)
        v = qkv[:, (h + kv) * HD :].reshape(T, kv, HD)
        q = np_rms(q, t[p + "attn_q_norm.weight"])
        k = np_rms(k, t[p + "attn_k_norm.weight"])
        q = np_rope(q, pos, HD, "neox")
        k = np_rope(k, pos, HD, "neox")
        attn = np_attention(q, k, v, 1.0 / np.sqrt(HD)).reshape(T, -1)
        x = x + attn @ t[p + "attn_output.weight"].T
        fh = np_rms(x, t[p + "ffn_norm.weight"])
        g = np_silu(fh @ t[p + "ffn_gate.weight"].T)
        x = x + (g * (fh @ t[p + "ffn_up.weight"].T)) @ t[p + "ffn_down.weight"].T
    x = np_rms(x, t["output_norm.weight"])
    want = x @ t["token_embd.weight"].T

    loaded = load_model(path)
    assert loaded.cfg.arch == "openelm"
    assert loaded.cfg.heads_per_layer == (2, 4)
    assert "layer_groups" in loaded.params  # heterogeneous shapes split
    cache = KVCache.create(2, 1, 32, loaded.cfg.n_kv_heads,
                           loaded.cfg.head_dim, dtype=jnp.float32)
    got, _ = forward(loaded.params, loaded.cfg, jnp.asarray(IDS), cache)
    got = np.asarray(got)[0]
    top2 = np.sort(want, axis=-1)[..., -2:]
    decisive = (top2[..., 1] - top2[..., 0]) > 0.02
    np.testing.assert_array_equal(
        got.argmax(-1)[decisive], want.argmax(-1)[decisive]
    )
    np.testing.assert_allclose(got, want.astype(np.float32), atol=0.4,
                               rtol=0.05)


@pytest.mark.parametrize("arch", list(SPECS))
def test_numpy_reference_parity(arch, tmp_path):
    spec = SPECS[arch]
    path = str(tmp_path / f"{arch}.gguf")
    tensors = build_gguf(spec, path, seed=hash(arch) % 1000)
    want = np_forward(spec, tensors, IDS[0])

    loaded = load_model(path)
    assert loaded.cfg.arch == arch
    cache = KVCache.create(
        loaded.cfg.n_layers, 1, 32, loaded.cfg.n_kv_heads,
        loaded.cfg.head_dim, dtype=jnp.float32,
    )
    got, _ = forward(loaded.params, loaded.cfg, jnp.asarray(IDS), cache)
    got = np.asarray(got)[0]

    top2 = np.sort(want, axis=-1)[..., -2:]
    decisive = (top2[..., 1] - top2[..., 0]) > 0.02
    np.testing.assert_array_equal(
        got.argmax(-1)[decisive], want.argmax(-1)[decisive]
    )
    np.testing.assert_allclose(got, want.astype(np.float32), atol=0.4,
                               rtol=0.05)
