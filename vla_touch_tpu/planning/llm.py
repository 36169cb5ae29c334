"""Decoder-only multimodal LLM for the Octopi tactile stack, TPU-native.

Replaces the reference's HF-loaded LLaMA-3.1-8B / Qwen2.5-7B
(``/root/reference/octopi/octopi_s/utils/llm.py:15-113``) with an in-repo
Qwen2-style transformer as pure functions over an explicit parameter tree:

- GQA attention with rotary embeddings + qkv bias, RMSNorm, SwiGLU MLP —
  the Qwen2 architecture, so real checkpoints port 1:1 (HF key map in
  :func:`hf_key_map`);
- the forward consumes input EMBEDDINGS, so tactile-token splicing
  (``llm_splice.py``) is a straight concatenation before the call
  (reference ``llm.py:158-194``);
- LoRA adapters on every projection (reference peft path ``llm.py:86-113``)
  as explicit (A, B) factor trees — training differentiates through only
  LoRA + the tactile projector;
- greedy decode as a ``lax.scan`` over a preallocated KV cache, returning
  per-step token ENTROPY (the reference's introspection, ``llm.py:223-241``);
- multi-chip serving via NamedSharding TP specs (:func:`llm_tp_spec`)
  instead of the reference's ``infer_auto_device_map`` GPU dispatch
  (``llm.py:45-75``).

A byte-level tokenizer keeps the whole stack runnable without network
access; the same interfaces accept a HF tokenizer when one is available.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Config
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 384
    hidden_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    num_kv_heads: int = 2
    mlp_dim: int = 256
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    tie_embeddings: bool = True
    qkv_bias: bool = True              # Qwen2 convention
    # Qwen2-VL multimodal rotary (M-RoPE): per-frequency-slot position
    # component split (temporal, height, width) over head_dim//2 slots.
    # None = standard RoPE.  With mrope set, 2-D (B, L) positions still
    # mean standard RoPE (all three components equal — HF's behavior for
    # pure text); pass (3, B, L) positions to rotate vision spans by their
    # grid coordinates (planning/qwen2vl.py builds them).
    mrope_section: Optional[tuple] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def qwen2_tiny(**kw) -> LLMConfig:
    return LLMConfig(**kw)


def qwen25_7b() -> LLMConfig:
    """The reference's Qwen2.5-7B-Instruct dims (llm.py:24-31)."""
    return LLMConfig(vocab_size=152064, hidden_size=3584, num_layers=28,
                     num_heads=28, num_kv_heads=4, mlp_dim=18944,
                     rope_theta=1e6, tie_embeddings=False)


def llama31_8b() -> LLMConfig:
    """The reference's LLaMA-3.1-8B dims (llm.py:15-23; no qkv bias)."""
    return LLMConfig(vocab_size=128256, hidden_size=4096, num_layers=32,
                     num_heads=32, num_kv_heads=8, mlp_dim=14336,
                     rope_theta=5e5, tie_embeddings=False, qkv_bias=False)


def backbone(model_type: str):
    """The reference's three planner backbones by name
    (``octopi/octopi_s/utils/llm.py:15-31``): returns the text
    :class:`LLMConfig`, plus the vision config for the VL variant.

    'llama-3.1-8b' -> LLMConfig; 'qwen2.5-7b' -> LLMConfig;
    'qwen2-vl-7b' -> (LLMConfig with M-RoPE, Qwen2VLVisionConfig).
    """
    if model_type == "llama-3.1-8b":
        return llama31_8b()
    if model_type == "qwen2.5-7b":
        return qwen25_7b()
    if model_type == "qwen2-vl-7b":
        from vla_touch_tpu.planning.qwen2vl import (
            qwen2vl_7b, qwen2vl_7b_vision)

        return qwen2vl_7b(), qwen2vl_7b_vision()
    raise ValueError(f"unknown model_type {model_type!r} (expected "
                     "'llama-3.1-8b', 'qwen2.5-7b' or 'qwen2-vl-7b')")


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------


def init_llm(cfg: LLMConfig, key) -> dict:
    ks = jax.random.split(key, cfg.num_layers + 2)

    def dense(k, din, dout, bias):
        p = {"kernel": jax.random.normal(k, (din, dout), jnp.float32)
             * (din ** -0.5)}
        if bias:
            p["bias"] = jnp.zeros((dout,), jnp.float32)
        return p

    D, hd = cfg.hidden_size, cfg.head_dim
    layers = []
    for i in range(cfg.num_layers):
        kq, kk, kv, ko, kg, ku, kd = jax.random.split(ks[i], 7)
        layers.append({
            "input_norm": jnp.ones((D,), jnp.float32),
            "q": dense(kq, D, cfg.num_heads * hd, cfg.qkv_bias),
            "k": dense(kk, D, cfg.num_kv_heads * hd, cfg.qkv_bias),
            "v": dense(kv, D, cfg.num_kv_heads * hd, cfg.qkv_bias),
            "o": dense(ko, cfg.num_heads * hd, D, False),
            "post_norm": jnp.ones((D,), jnp.float32),
            "gate": dense(kg, D, cfg.mlp_dim, False),
            "up": dense(ku, D, cfg.mlp_dim, False),
            "down": dense(kd, cfg.mlp_dim, D, False),
        })
    params = {
        "embed": jax.random.normal(ks[-2], (cfg.vocab_size, D), jnp.float32)
        * 0.02,
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(ks[-1], D, cfg.vocab_size, False)
    return params


def hf_key_map(cfg: LLMConfig) -> dict:
    """HF safetensors key -> (tree path, transpose) for Qwen2/LLaMA ports.

    Linear weights are stored (out, in) in torch; ours are (in, out)."""
    m = {"model.embed_tokens.weight": (("embed",), False)}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        t = ("layers", i)
        m.update({
            p + "input_layernorm.weight": (t + ("input_norm",), False),
            p + "self_attn.q_proj.weight": (t + ("q", "kernel"), True),
            p + "self_attn.q_proj.bias": (t + ("q", "bias"), False),
            p + "self_attn.k_proj.weight": (t + ("k", "kernel"), True),
            p + "self_attn.k_proj.bias": (t + ("k", "bias"), False),
            p + "self_attn.v_proj.weight": (t + ("v", "kernel"), True),
            p + "self_attn.v_proj.bias": (t + ("v", "bias"), False),
            p + "self_attn.o_proj.weight": (t + ("o", "kernel"), True),
            p + "post_attention_layernorm.weight": (t + ("post_norm",), False),
            p + "mlp.gate_proj.weight": (t + ("gate", "kernel"), True),
            p + "mlp.up_proj.weight": (t + ("up", "kernel"), True),
            p + "mlp.down_proj.weight": (t + ("down", "kernel"), True),
        })
    m["model.norm.weight"] = (("final_norm",), False)
    if not cfg.tie_embeddings:
        m["lm_head.weight"] = (("lm_head", "kernel"), True)
    return m


def load_llm_from_hf(cfg: LLMConfig, model_dir: str, weights=None,
                     dtype=jnp.bfloat16, fuse: bool = False) -> dict:
    """Stream a Qwen2/LLaMA safetensors checkpoint into the tree.

    ``weights='int8'|'int4'`` quantizes each decoder layer AS IT LOADS, so
    peak memory is the quantized tree plus one bf16 layer — a 7.6B Qwen2.5
    fits a single 16 GB chip (a load-everything-then-quantize pass peaks at
    bf16+int8 ≈ 23 GB and OOMs).  Replaces the reference's
    ``infer_auto_device_map`` + disk-offload loading (llm.py:45-75).
    ``fuse=True`` (quantized loads only) additionally applies
    :func:`fuse_quantized_layers` — measured a slight loss on v5e (see
    that function's docstring), so the default stays unfused.
    """
    if fuse and weights is None:
        raise ValueError("fuse=True requires weights='int8'|'int4'")
    import glob
    import os

    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {model_dir}")
    handles = {fp: safe_open(fp, framework="numpy") for fp in files}
    where = {}
    for fp, f in handles.items():
        for k in f.keys():
            where[k] = fp

    kmap = hf_key_map(cfg)
    # every mapped tensor must exist — a silently-dropped qkv bias or shard
    # produces a wrong model with no diagnostic
    missing = sorted(k for k in kmap if k not in where)
    if missing:
        raise KeyError(
            f"checkpoint at {model_dir} is missing {len(missing)} tensors "
            f"the config requires, e.g. {missing[:4]} — wrong config "
            f"(qkv_bias/tie_embeddings/num_layers?) or incomplete download")

    def get(hf_key):
        path, transpose = kmap[hf_key]
        a = handles[where[hf_key]].get_tensor(hf_key)
        a = np.ascontiguousarray(a.T) if transpose else a
        return jnp.asarray(a, dtype if a.ndim >= 2 else jnp.float32)

    # group the map by destination: per-layer subtrees stream one at a time
    by_layer: dict = {}
    top = {}
    for hf_key, (path, _) in kmap.items():
        if path[0] == "layers":
            by_layer.setdefault(path[1], []).append((hf_key, path[2:]))
        else:
            top[hf_key] = path

    if weights is not None:
        from vla_touch_tpu.ops.quant import quantize_tree, quantize_tree_w4

        # jit fuses the cast/scale/round/pack pipeline: peak transient per
        # tensor = bf16 input + packed output, instead of 3-4 eager f32
        # copies (for the 2.2 GB Qwen lm_head that is the difference
        # between fitting beside the already-resident tree and OOMing).
        qt = jax.jit({"int8": quantize_tree,
                      "int4": quantize_tree_w4}[weights])

    layers = []
    for i in range(cfg.num_layers):
        lp: dict = {}
        for hf_key, sub in sorted(by_layer.get(i, [])):
            node = lp
            for p in sub[:-1]:
                node = node.setdefault(p, {})
            node[sub[-1]] = get(hf_key)
        if weights is not None:
            lp = jax.block_until_ready(qt(lp))
        layers.append(lp)

    params: dict = {"layers": layers}
    for hf_key, path in top.items():
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = get(hf_key)
    if weights is not None and "lm_head" in params:
        params["lm_head"] = qt(params["lm_head"])
    if fuse:
        params = fuse_quantized_layers(params)
    return params


# --------------------------------------------------------------------------
# LoRA (reference llm.py:86-113, peft)
# --------------------------------------------------------------------------

LORA_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def init_lora(cfg: LLMConfig, key, rank: int = 8, alpha: float = 16.0,
              targets=LORA_TARGETS) -> dict:
    """Per-layer (A, B) factors; B zero-initialized so the adapted model
    starts exactly at the base model."""
    dims = {
        "q": (cfg.hidden_size, cfg.num_heads * cfg.head_dim),
        "k": (cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim),
        "v": (cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim),
        "o": (cfg.num_heads * cfg.head_dim, cfg.hidden_size),
        "gate": (cfg.hidden_size, cfg.mlp_dim),
        "up": (cfg.hidden_size, cfg.mlp_dim),
        "down": (cfg.mlp_dim, cfg.hidden_size),
    }
    keys = jax.random.split(key, cfg.num_layers * len(targets))
    layers = []
    ki = 0
    for _ in range(cfg.num_layers):
        lp = {}
        for t in targets:
            din, dout = dims[t]
            lp[t] = {"A": jax.random.normal(keys[ki], (din, rank),
                                            jnp.float32) * (din ** -0.5),
                     "B": jnp.zeros((rank, dout), jnp.float32)}
            ki += 1
        layers.append(lp)
    return {"layers": layers, "scale": float(alpha) / float(rank)}


def _dense(x, p, lora=None, scale=1.0):
    if "kernel" not in p:
        # quantized leaf (int8 / grouped int4, see quantize_llm_params);
        # the LoRA residual stays full-precision (QLoRA-style serving)
        from vla_touch_tpu.ops.quant import qdense_any

        if "w4_pack" in p and jax.default_backend() == "tpu":
            # XLA's grouped-int4 lowering materializes the unpacked int8
            # weights to HBM, which makes w4 DECODE 8x slower than int8
            # (measured 12 vs 93 tok/s at Qwen2.5-7B scale).  The Pallas
            # nibble-streaming kernel reads 0.5 byte/param; its dispatcher
            # falls back to XLA for large-M (prompt/train) and
            # kernel-unfriendly dims.  Numerics identical to qdense_w4.
            from vla_touch_tpu.ops.pallas_matmul import qdense_pallas_w4

            y = qdense_pallas_w4(x, p, out_dtype=x.dtype)
        else:
            y = qdense_any(x, p, out_dtype=x.dtype)
    else:
        y = x @ p["kernel"]
        if "bias" in p:
            y = y + p["bias"]
    if lora is not None:
        y = y + (x @ lora["A"]) @ lora["B"] * scale
    return y


def merge_lora(params: dict, lora: dict) -> dict:
    """Fold trained LoRA factors into the base kernels
    (``W' = W + A @ B * scale`` — the PeftModel ``merge_and_unload``
    analogue, reference llm.py:86-113).  Returns a new tree; the merged
    model needs no adapter at serving time and can be quantized."""
    scale = lora["scale"]
    out = {k: v for k, v in params.items()}
    layers = []
    for lp, lol in zip(params["layers"], lora["layers"]):
        nlp = {k: v for k, v in lp.items()}
        for t, ab in (lol or {}).items():
            d = dict(nlp[t])
            d["kernel"] = (jnp.asarray(d["kernel"], jnp.float32)
                           + ab["A"] @ ab["B"] * scale)
            nlp[t] = d
        layers.append(nlp)
    out["layers"] = layers
    return out


def quantize_llm_params(params: dict, weights: str = "int8") -> dict:
    """Serving-time weight quantization of every decoder matmul (q/k/v/o/
    gate/up/down and the untied lm_head) through the shared quant engine
    (``ops/quant.py``) — int8 per-channel or grouped int4.  Embeddings and
    norms stay full precision (gather / tiny).  The quantized tree drops
    into every forward/decode surface here unchanged: ``_dense`` dispatches
    on the leaf layout.  Merge LoRA first (:func:`merge_lora`) or keep the
    adapters separate — the residual is applied in full precision either
    way."""
    from vla_touch_tpu.ops.quant import quantize_tree, quantize_tree_w4

    qt = quantize_tree_w4 if weights == "int4" else quantize_tree
    if weights not in ("int8", "int4"):
        raise ValueError(weights)
    out = {k: v for k, v in params.items()}
    out["layers"] = [qt(lp) for lp in params["layers"]]
    if "lm_head" in params:
        out["lm_head"] = qt(params["lm_head"])
    return out


def fuse_quantized_layers(params: dict) -> dict:
    """Launch fusion for a QUANTIZED tree: concatenate q/k/v into one
    ``qkv`` leaf and gate/up into ``gateup``.

    The int8 and grouped-int4 layouts are column-independent (per-channel
    / per-(group, channel) scales), so output-axis concatenation is EXACT
    — the fused forward is numerically identical to the unfused one.  The
    intended win was per-token launch count (7 -> 4 launches per layer),
    but ON-CHIP MEASUREMENT (v5e, 7B w4 decode, tools/bench_llm7b.py)
    shows the concat fusion is a slight LOSS: 92.2 vs 97.6 tok/s unfused
    — launch overhead is not the bottleneck, and the wider fused matmuls
    tile slightly worse.  Retained as opt-in; the loader default is
    ``fuse=False``.  Single-chip decode serving only — the TP specs
    (:func:`llm_tp_spec`) key on the unfused names, and
    :func:`merge_lora` must run BEFORE fusing (runtime LoRA residuals on
    a fused tree still work; merging does not).
    """
    def cat(leaves):
        first = leaves[0]
        if any(set(l.keys()) != set(first.keys()) for l in leaves):
            return None
        out = {}
        if "w4_pack" in first:
            if len({l["scale4"].shape[0] for l in leaves}) != 1:
                return None           # differing group grids can't share
            out["w4_pack"] = jnp.concatenate(
                [l["w4_pack"] for l in leaves], axis=1)
            out["scale4"] = jnp.concatenate(
                [l["scale4"] for l in leaves], axis=1)
        elif "w_i8" in first:
            out["w_i8"] = jnp.concatenate(
                [l["w_i8"] for l in leaves], axis=1)
            out["scale"] = jnp.concatenate(
                [l["scale"] for l in leaves], axis=0)
        else:
            return None               # not a quantized leaf
        if "bias" in first:
            out["bias"] = jnp.concatenate([l["bias"] for l in leaves],
                                          axis=0)
        return out

    layers = []
    for lp in params["layers"]:
        nlp = dict(lp)
        qkv = cat([lp["q"], lp["k"], lp["v"]])
        if qkv is not None:
            nlp["qkv"] = qkv
            for t in ("q", "k", "v"):
                del nlp[t]
        gu = cat([lp["gate"], lp["up"]])
        if gu is not None:
            nlp["gateup"] = gu
            del nlp["gate"], nlp["up"]
        layers.append(nlp)
    return {**params, "layers": layers}


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _rmsnorm(x, w, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _rope(x, positions, theta, mrope_section=None):
    """x (B, L, H, hd), positions (B, L) -> rotated (NEOX half-split).

    M-RoPE (Qwen2-VL): with ``positions`` (3, B, L) and ``mrope_section``
    = (t, h, w) summing to hd//2, frequency slot i takes its angle from
    the temporal/height/width position component its section assigns
    (HF ``apply_multimodal_rotary_pos_emb``).  2-D positions fall back to
    standard RoPE (equivalent to all three components equal)."""
    B, L, H, hd = x.shape
    half = hd // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    if positions.ndim == 3:
        assert mrope_section is not None and sum(mrope_section) == half
        ang3 = (positions.astype(jnp.float32)[:, :, :, None]
                * freqs[None, None, None, :])        # (3, B, L, half)
        pieces, lo = [], 0
        for c, sec in enumerate(mrope_section):
            pieces.append(ang3[c, :, :, lo:lo + sec])
            lo += sec
        ang = jnp.concatenate(pieces, axis=-1)       # (B, L, half)
    else:
        ang = positions.astype(jnp.float32)[:, :, None] * freqs[None, None, :]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    xr = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
    return xr.astype(x.dtype)


def _attend(q, k, v, mask):
    """q (B,Lq,H,hd); k/v (B,Lk,Hkv,hd); mask (B,Lq,Lk) bool True=attend."""
    B, Lq, H, hd = q.shape
    Hkv = k.shape[2]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (hd ** -0.5)
    s = jnp.where(mask[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)
                      ).astype(q.dtype).reshape(B, Lq, H * hd)


def _lora_res(y, ab, h, scale):
    """Full-precision LoRA residual applied to a (possibly fused) base."""
    return y if ab is None else y + (h @ ab["A"]) @ ab["B"] * scale


def _proj_qkv(cfg: LLMConfig, lp, lo, lscale, h, B, L):
    """q/k/v projections, via the single fused ``qkv`` leaf when present
    (:func:`fuse_quantized_layers`) — exact, one launch instead of 3."""
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv" in lp:
        nq, nkv = H * hd, Hkv * hd
        q, k, v = jnp.split(_dense(h, lp["qkv"]), [nq, nq + nkv], axis=-1)
        q = _lora_res(q, lo.get("q"), h, lscale)
        k = _lora_res(k, lo.get("k"), h, lscale)
        v = _lora_res(v, lo.get("v"), h, lscale)
    else:
        q = _dense(h, lp["q"], lo.get("q"), lscale)
        k = _dense(h, lp["k"], lo.get("k"), lscale)
        v = _dense(h, lp["v"], lo.get("v"), lscale)
    return (q.reshape(B, L, H, hd), k.reshape(B, L, Hkv, hd),
            v.reshape(B, L, Hkv, hd))


# Measured dispatch policy (v5e, Qwen2.5-7B arch, w4, 64-token decode,
# tools/bench_llm7b.py, 2026-08): per-matmul kernels 97.6 tok/s > concat
# fusion 92.2 > +SwiGLU megakernel 75.8 > +post-attention megakernel 52.8.
# Launch overhead is NOT the decode bottleneck on this stack — the
# megakernels' phase barriers (VMEM scratch + in-kernel quantize between
# weight streams) cost more than the launches they remove, so they default
# OFF and the decode path runs the measured winner.  The kernels remain
# correct, differentiable, and parity-pinned (tests/test_quant.py); flip
# this flag to re-evaluate on new hardware or shapes.  NOTE: the flag is
# read at TRACE time inside the module-level-jitted decode entries, so
# flipping it in-process only takes effect after ``jax.clear_caches()``
# (or in a fresh process) — a same-shape call otherwise reuses the cached
# trace compiled under the old value.
MEGAKERNELS = False


def _swiglu_megakernel_ok(lp, lo) -> bool:
    """The single-launch SwiGLU megakernel applies when both MLP leaves are
    grouped-int4 in the fused ``gateup`` layout and no LoRA residual needs
    the separate g/u/act intermediates (serving merges LoRA first)."""
    return ("gateup" in lp and "w4_pack" in lp["gateup"]
            and "w4_pack" in lp.get("down", {})
            and not any(lo.get(k) for k in ("gate", "up", "down")))


def _postattn_megakernel_ok(lp, lo) -> bool:
    """The post-attention megakernel (o + residual + norm + SwiGLU MLP +
    residual in one launch — a w4 decode layer becomes TWO pallas launches)
    additionally needs the o projection in w4 and LoRA-free."""
    return ("w4_pack" in lp.get("o", {}) and not lo.get("o")
            and _swiglu_megakernel_ok(lp, lo))


def _mlp(lp, lo, lscale, h):
    """SwiGLU MLP, via the fused ``gateup`` leaf when present."""
    # bf16-activation gate: the megakernel keeps its intermediates in bf16
    # (matching the unfused path only when activations already are); f32
    # activation trees keep the per-op route, whose residual/act dtypes
    # follow x.dtype exactly.
    if (MEGAKERNELS and _swiglu_megakernel_ok(lp, lo)
            and jax.default_backend() == "tpu"
            and h.dtype == jnp.bfloat16):
        # gateup + silu*mul + down as ONE pallas launch (w4 decode serving;
        # numerics identical to the unfused chain — tests/test_quant.py)
        from vla_touch_tpu.ops.pallas_matmul import qdense_pallas_swiglu

        return qdense_pallas_swiglu(h, lp["gateup"], lp["down"],
                                    out_dtype=h.dtype)
    if "gateup" in lp:
        g, u = jnp.split(_dense(h, lp["gateup"]), 2, axis=-1)
        g = _lora_res(g, lo.get("gate"), h, lscale)
        u = _lora_res(u, lo.get("up"), h, lscale)
    else:
        g = _dense(h, lp["gate"], lo.get("gate"), lscale)
        u = _dense(h, lp["up"], lo.get("up"), lscale)
    return _dense(jax.nn.silu(g) * u, lp["down"], lo.get("down"), lscale)


def _layer(cfg: LLMConfig, lp, x, positions, mask, lora, lscale,
           kv_in=None):
    """One decoder block.  ``kv_in``: optional cached (k, v) to prepend
    (decode step); returns (x, (k_new, v_new))."""
    B, L, _ = x.shape
    h = _rmsnorm(x, lp["input_norm"], cfg.rms_eps)
    lo = lora or {}
    q, k, v = _proj_qkv(cfg, lp, lo, lscale, h, B, L)
    q = _rope(q, positions, cfg.rope_theta, cfg.mrope_section)
    k = _rope(k, positions, cfg.rope_theta, cfg.mrope_section)
    if kv_in is not None:
        k = jnp.concatenate([kv_in[0], k], axis=1)
        v = jnp.concatenate([kv_in[1], v], axis=1)
    att = _attend(q, k, v, mask)
    x = x + _dense(att, lp["o"], lo.get("o"), lscale)
    h = _rmsnorm(x, lp["post_norm"], cfg.rms_eps)
    x = x + _mlp(lp, lo, lscale, h)
    return x, (k, v)


def llm_forward(cfg: LLMConfig, params: dict, embeds, positions=None,
                attn_mask=None, lora: Optional[dict] = None,
                return_kv: bool = False):
    """Causal forward over input embeddings.

    embeds (B, L, D); positions (B, L) default arange; attn_mask (B, L)
    True=real token (padding masked out of attention AND never attended).
    Returns hidden (B, L, D) (and per-layer (k, v) if ``return_kv``).
    """
    B, L, D = embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    causal = jnp.tril(jnp.ones((L, L), bool))[None]          # (1, L, L)
    mask = causal if attn_mask is None else (
        causal & attn_mask[:, None, :])
    lscale = (lora or {}).get("scale", 0.0)
    llayers = (lora or {}).get("layers", [None] * cfg.num_layers)
    x = embeds
    kvs = []
    for lp, lol in zip(params["layers"], llayers):
        x, kv = _layer(cfg, lp, x, positions, mask, lol, lscale)
        kvs.append(kv)
    x = _rmsnorm(x, params["final_norm"], cfg.rms_eps)
    return (x, kvs) if return_kv else x


def lm_logits(cfg: LLMConfig, params: dict, hidden):
    if cfg.tie_embeddings:
        return hidden @ params["embed"].T
    return _dense(hidden, params["lm_head"])


def embed_tokens(params: dict, ids):
    return jnp.take(params["embed"], ids, axis=0)


def lm_loss(cfg: LLMConfig, params: dict, input_embeds, target_ids,
            loss_mask, lora: Optional[dict] = None):
    """Teacher-forced CE: position t predicts ``target_ids[t]`` (already
    shifted by the caller).  Differentiable w.r.t. ``input_embeds`` (the
    tactile projector trains through this) and ``lora``."""
    hidden = llm_forward(cfg, params, input_embeds, lora=lora)
    logits = lm_logits(cfg, params, hidden).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None], -1)[..., 0]
    denom = jnp.maximum(jnp.sum(loss_mask), 1.0)
    return jnp.sum(nll * loss_mask) / denom


def token_entropy(logits):
    """Shannon entropy (nats) of the next-token distribution per position.

    A distribution-level uncertainty signal reported alongside the
    reference's per-token surprisal (see :func:`token_surprisal`); both are
    exposed on the decode surfaces."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def token_surprisal(logits, tok, temperature=None):
    """-log2 p(tok) under the distribution the token was drawn from — the
    reference's introspection signal (``get_sentence_entropy``,
    octopi/octopi_s/utils/llm.py:223-243: despite its name it accumulates
    the emitted token's negative log2-probability from the generation
    scores, which HF tempers before sampling)."""
    lg = logits.astype(jnp.float32)
    if temperature is not None:
        lg = lg / temperature
    logp = jax.nn.log_softmax(lg, axis=-1)
    chosen = jnp.take_along_axis(logp, tok[..., None], -1)[..., 0]
    return -chosen / jnp.log(2.0)


def sequence_avg_surprisal(surprisals, lengths):
    """Average -log2 p per emitted token, per sequence — the reference's
    ``avg_entropy_per_token`` (utils/llm.py:236-241).  Averaged over the
    first ``lengths[i]`` steps (up to and including EOS); the reference
    divides by the full padded generation length including post-EOS pad
    steps (llm.py:238), a padding artifact not reproduced."""
    T = surprisals.shape[1]
    mask = (jnp.arange(T)[None] < lengths[:, None]).astype(jnp.float32)
    total = jnp.sum(surprisals * mask, axis=1)
    return total / jnp.maximum(lengths, 1).astype(jnp.float32)


def _generate_impl(cfg: LLMConfig, params: dict, prompt_embeds,
                   max_new_tokens: int, eos_id: int, lora: Optional[dict],
                   temperature: Optional[float], key,
                   num_return_sequences: int, prompt_positions=None):
    """Shared decode loop: prompt pass + preallocated-KV ``lax.scan``.

    ``temperature is None`` → greedy argmax (``key`` unused); otherwise
    categorical sampling from tempered logits.  ``num_return_sequences``
    tiles the prompt-pass KV cache N× (the prompt forward runs ONCE at B —
    the reference's HF ``generate`` expands the inputs and pays the prompt
    N times) so rows [b*N, (b+1)*N) are independent samples of input b.

    ``prompt_positions`` ((B, Lp) or M-RoPE (3, B, Lp)) rotates the prompt
    by explicit positions (vision splices, ``planning/qwen2vl.py``);
    decode then continues at max(position)+1 per row with all components
    equal — HF ``get_rope_index`` decode semantics (for multimodal
    prompts that offset is SMALLER than the prompt length).

    Returns (tokens (B*N, T), entropies, surprisals, lengths)."""
    B, Lp, D = prompt_embeds.shape
    T = max_new_tokens
    N = num_return_sequences
    sampling = temperature is not None

    def select(logits, k):
        if not sampling:
            return jnp.argmax(logits, axis=-1)
        return jax.random.categorical(
            k, logits.astype(jnp.float32) / temperature, axis=-1)

    # Prompt pass (at B; samples share it)
    hidden, kvs = llm_forward(cfg, params, prompt_embeds, lora=lora,
                              positions=prompt_positions, return_kv=True)
    if prompt_positions is None:
        pos_start = jnp.full((B,), Lp, jnp.int32)
    else:
        pp = prompt_positions
        pos_start = (jnp.max(pp, axis=(0, 2)) if pp.ndim == 3
                     else jnp.max(pp, axis=1)).astype(jnp.int32) + 1
    logits0 = lm_logits(cfg, params, hidden[:, -1])
    if N > 1:
        logits0 = jnp.repeat(logits0, N, axis=0)
        kvs = [(jnp.repeat(k, N, axis=0), jnp.repeat(v, N, axis=0))
               for k, v in kvs]
    BN = B * N
    if key is None:
        key = jax.random.PRNGKey(0)
    if sampling:
        key, k0 = jax.random.split(key)
    else:
        k0 = key
    tok0 = select(logits0, k0)
    ent0 = token_entropy(logits0)
    surp0 = token_surprisal(logits0, tok0, temperature)

    Lmax = Lp + T

    def grow(kv):
        k, v = kv
        pad = ((0, 0), (0, T), (0, 0), (0, 0))
        return jnp.pad(k, pad), jnp.pad(v, pad)

    cache = [grow(kv) for kv in kvs]
    kv_len0 = jnp.full((BN,), Lp, jnp.int32)
    if N > 1:
        pos_start = jnp.repeat(pos_start, N, axis=0)
    rope_delta = pos_start - Lp                    # decode pos = kv_len + Δ

    lscale = (lora or {}).get("scale", 0.0)
    llayers = (lora or {}).get("layers", [None] * cfg.num_layers)

    def step(carry, _):
        cache, tok, kv_len, done, key = carry
        if sampling:
            key, ks = jax.random.split(key)
        else:
            ks = key
        x = embed_tokens(params, tok)[:, None]            # (BN, 1, D)
        pos = (kv_len + rope_delta)[:, None]
        valid = (jnp.arange(Lmax)[None, None] < (kv_len + 1)[:, None, None])
        new_cache = []
        for li, (lp, lol) in enumerate(zip(params["layers"], llayers)):
            kc, vc = cache[li]
            h = _rmsnorm(x, lp["input_norm"], cfg.rms_eps)
            lo = lol or {}
            q, k, v = _proj_qkv(cfg, lp, lo, lscale, h, BN, 1)
            q = _rope(q, pos, cfg.rope_theta)
            k = _rope(k, pos, cfg.rope_theta)
            kc = jax.vmap(
                lambda c, upd, i: jax.lax.dynamic_update_slice(
                    c, upd, (i, 0, 0)))(kc, k, kv_len)
            vc = jax.vmap(
                lambda c, upd, i: jax.lax.dynamic_update_slice(
                    c, upd, (i, 0, 0)))(vc, v, kv_len)
            att = _attend(q, kc, vc, valid)
            if (MEGAKERNELS and _postattn_megakernel_ok(lp, lo)
                    and jax.default_backend() == "tpu"
                    and x.dtype == jnp.bfloat16):
                # the whole post-attention half of the layer as ONE pallas
                # launch (ops/pallas_matmul.py::w4_postattn_fused)
                from vla_touch_tpu.ops.pallas_matmul import w4_postattn_fused

                x = w4_postattn_fused(x, att, lp["o"], lp["gateup"],
                                      lp["down"], lp["post_norm"],
                                      eps=cfg.rms_eps, out_dtype=x.dtype)
            else:
                x2 = x + _dense(att, lp["o"], lo.get("o"), lscale)
                h2 = _rmsnorm(x2, lp["post_norm"], cfg.rms_eps)
                x = x2 + _mlp(lp, lo, lscale, h2)
            new_cache.append((kc, vc))
        x = _rmsnorm(x, params["final_norm"], cfg.rms_eps)
        logits = lm_logits(cfg, params, x[:, 0])
        nxt = select(logits, ks)
        ent = token_entropy(logits)
        nxt = jnp.where(done, eos_id, nxt)
        surp = token_surprisal(logits, nxt, temperature)
        new_done = done | (nxt == eos_id)
        return (new_cache, nxt, kv_len + 1, new_done, key), (nxt, ent, surp)

    done0 = tok0 == eos_id
    if T > 1:
        _, (toks, ents, surps) = jax.lax.scan(
            step, (cache, tok0, kv_len0, done0, key), None, length=T - 1)
        tokens = jnp.concatenate([tok0[None], toks], axis=0).T   # (BN, T)
        entropies = jnp.concatenate([ent0[None], ents], axis=0).T
        surprisals = jnp.concatenate([surp0[None], surps], axis=0).T
    else:
        tokens, entropies = tok0[:, None], ent0[:, None]
        surprisals = surp0[:, None]
    lengths = jnp.sum(tokens != eos_id, axis=1) + (
        jnp.any(tokens == eos_id, axis=1)).astype(jnp.int32)
    return tokens, entropies, surprisals, lengths


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "eos_id"))
def greedy_generate(cfg: LLMConfig, params: dict, prompt_embeds,
                    max_new_tokens: int = 32, eos_id: int = 1,
                    lora: Optional[dict] = None, prompt_positions=None):
    """Greedy decode with a preallocated KV cache (one ``lax.scan``).

    prompt_embeds (B, Lp, D).  Returns (tokens (B, T), entropies (B, T),
    lengths (B,)) — positions after EOS hold EOS.  ``prompt_positions``:
    explicit (M-)RoPE prompt positions for multimodal splices."""
    tokens, entropies, _, lengths = _generate_impl(
        cfg, params, prompt_embeds, max_new_tokens, eos_id, lora,
        temperature=None, key=None, num_return_sequences=1,
        prompt_positions=prompt_positions)
    return tokens, entropies, lengths


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "eos_id",
                                   "temperature", "num_return_sequences"))
def sample_generate(cfg: LLMConfig, params: dict, prompt_embeds, key,
                    max_new_tokens: int = 32, eos_id: int = 1,
                    lora: Optional[dict] = None,
                    temperature: float = 1.0,
                    num_return_sequences: int = 1, prompt_positions=None):
    """Temperature sampling with N return sequences per input — the
    reference's reasoning-mode generation (``run_llm.py:273``:
    ``do_sample=True, temperature=…, num_return_sequences=…``).

    prompt_embeds (B, Lp, D); rows [b*N, (b+1)*N) of the outputs are the N
    samples of input b.  Returns (tokens (B*N, T), entropies (B*N, T),
    surprisals (B*N, T) — per-token -log2 p under the tempered sampling
    distribution, see :func:`token_surprisal` — and lengths (B*N,)).
    ``temperature`` is a static compile-time constant (one program per
    distinct value)."""
    return _generate_impl(cfg, params, prompt_embeds, max_new_tokens,
                          eos_id, lora, temperature=float(temperature),
                          key=key,
                          num_return_sequences=int(num_return_sequences),
                          prompt_positions=prompt_positions)


# --------------------------------------------------------------------------
# TP sharding (replaces the reference's infer_auto_device_map, llm.py:45-75)
# --------------------------------------------------------------------------


def llm_tp_spec(path: tuple):
    """Megatron TP: shard q/k/v/gate/up on output features, o/down on input
    features, embed on vocab; XLA inserts the all-reduces."""
    from jax.sharding import PartitionSpec as P

    keys = [getattr(p, "key", getattr(p, "idx", p)) for p in path]
    keys = [str(k) for k in keys]
    name = "/".join(keys)
    if keys and keys[0] == "embed":
        return P("model", None)
    if name.endswith("kernel"):
        # lm_head (D, V) is column-sharded over the vocab (Megatron
        # convention): per-chip logits shards instead of an all-reduce over
        # the full (B, L, V) tensor every decode step.
        if any(f"/{t}/" in f"/{name}/"
               for t in ("q", "k", "v", "gate", "up", "lm_head")):
            return P(None, "model")
        if any(f"/{t}/" in f"/{name}/" for t in ("o", "down")):
            return P("model", None)
    if name.endswith("bias"):
        if any(f"/{t}/" in f"/{name}/" for t in ("q", "k", "v")):
            return P("model")
    return P()


def shard_llm_params(mesh, params):
    from jax.sharding import NamedSharding

    shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, llm_tp_spec(path)), params)
    return jax.device_put(params, shardings)


# --------------------------------------------------------------------------
# Byte-level tokenizer (network-free; HF tokenizers drop in via duck typing)
# --------------------------------------------------------------------------


class ByteTokenizer:
    """bytes 0..255 -> ids 0..255; specials above."""

    BOS = 256
    EOS = 257
    TACTILE_START = 258
    TACTILE_END = 259
    PAD = 260
    vocab_size = 384     # rounded up for layout friendliness

    def encode(self, text: str, add_bos: bool = False) -> list:
        ids = list(text.encode("utf-8", errors="replace"))
        return ([self.BOS] if add_bos else []) + ids

    def decode(self, ids) -> str:
        bs = bytes(int(i) for i in np.asarray(ids).reshape(-1)
                   if 0 <= int(i) < 256)
        return bs.decode("utf-8", errors="replace")


# --------------------------------------------------------------------------
# Full-parameter LM training (base-model pretraining / finetuning)
# --------------------------------------------------------------------------


def train_lm(cfg: LLMConfig, params: dict, texts, tokenizer=None,
             steps: int = 200, lr: float = 1e-2, seed: int = 0):
    """Plain full-parameter causal-LM training on a list of strings.

    The LoRA path (like the reference's peft finetuning, llm.py:86-113)
    presumes a PRETRAINED base — with a random 0.02-scale tied embedding the
    final RMSNorm caps attainable logits at ~|h|*|e| ~= 1.3 and LoRA alone
    plateaus near ln(V).  This helper provides that base in-repo (and is the
    full-finetune alternative the reference also supports)."""
    import optax

    tok = tokenizer or ByteTokenizer()
    seqs = [[tok.BOS] + list(tok.encode(t)) + [tok.EOS] for t in texts]
    Lmax = max(len(s) for s in seqs)
    ids = np.full((len(seqs), Lmax), tok.PAD, np.int32)
    msk = np.zeros((len(seqs), Lmax), np.float32)
    for i, s in enumerate(seqs):
        ids[i, :len(s)] = s
        msk[i, 1:len(s)] = 1.0          # predict everything after BOS
    ids = jnp.asarray(ids)
    # shifted teacher forcing: position t predicts ids[t+1]
    inp, tgt = ids[:, :-1], ids[:, 1:]
    attn = jnp.asarray(msk[:, :-1] > -1)    # all positions attendable
    lmask = jnp.asarray(msk[:, 1:])

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_of(p):
            e = embed_tokens(p, inp)
            return lm_loss(cfg, p, e, tgt, lmask)

        loss, g = jax.value_and_grad(loss_of)(params)
        updates, new_opt = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    loss = None
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
    return params, float(loss)
