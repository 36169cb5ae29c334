"""Qwen2-VL planner backbone: vision tower + M-RoPE + multimodal splice.

The reference's third LLM backbone (``/root/reference/octopi/octopi_s/
utils/llm.py:26-31,54-64`` loads ``Qwen2VLForConditionalGeneration``) is a
vision-language model: a ~675M ViT (patch 14, temporal patch 2, 2x2
spatial merge, 2-D rotary in attention) whose merged tokens are spliced
into the Qwen2 decoder, which rotates positions with multimodal RoPE
(three position components — temporal/height/width — split over the
frequency slots).  The decoder body is ``planning/llm.py``'s Qwen2 (the
``mrope_section`` config field enables M-RoPE); this module adds the
vision tower, the HF weight port, the M-RoPE position builder, and the
image+tactile embedding splice.

TPU-first notes: the Conv3d patch embed is a single (N, 1176)x(1176, D)
matmul; vision attention is full (block-diagonal over images via segment
ids) and runs as one fused XLA attention over all patches; everything is
static-shape and jit-compatible.  Parity vs the HF oracle is pinned at
tiny scale in ``tests/test_qwen2vl.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vla_touch_tpu.planning.llm import LLMConfig


@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    """Qwen2-VL ViT hyperparameters (HF ``Qwen2VLVisionConfig``)."""

    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    mlp_ratio: int = 4
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_size: int = 3584            # decoder width the merger maps into
    rope_theta: float = 1e4
    ln_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return (self.in_channels * self.temporal_patch_size
                * self.patch_size ** 2)

    @property
    def mlp_dim(self) -> int:
        return self.embed_dim * self.mlp_ratio

    @property
    def merge_dim(self) -> int:
        return self.embed_dim * self.spatial_merge_size ** 2


def qwen2vl_7b() -> LLMConfig:
    """Qwen2-VL-7B-Instruct text decoder: Qwen2.5-7B dims + M-RoPE
    (mrope_section [16, 24, 24] over head_dim//2 = 64 slots)."""
    return LLMConfig(vocab_size=152064, hidden_size=3584, num_layers=28,
                     num_heads=28, num_kv_heads=4, mlp_dim=18944,
                     rope_theta=1e6, tie_embeddings=False,
                     mrope_section=(16, 24, 24))


def qwen2vl_7b_vision() -> Qwen2VLVisionConfig:
    return Qwen2VLVisionConfig()


def qwen2vl_tiny(**kw):
    """(text cfg, vision cfg) pair for tests."""
    text = LLMConfig(vocab_size=256, hidden_size=64, num_layers=2,
                     num_heads=4, num_kv_heads=2, mlp_dim=128,
                     rope_theta=1e6, tie_embeddings=False,
                     mrope_section=(2, 3, 3))
    vis = Qwen2VLVisionConfig(depth=2, embed_dim=32, num_heads=2,
                              mlp_ratio=4, patch_size=4,
                              temporal_patch_size=2, spatial_merge_size=2,
                              hidden_size=64)
    return dataclasses.replace(text, **kw), vis


# --------------------------------------------------------------------------
# Vision parameters
# --------------------------------------------------------------------------


def init_vision(vcfg: Qwen2VLVisionConfig, key) -> dict:
    ks = jax.random.split(key, vcfg.depth + 2)

    def dense(k, din, dout):
        return {"kernel": jax.random.normal(k, (din, dout), jnp.float32)
                * (din ** -0.5), "bias": jnp.zeros((dout,), jnp.float32)}

    def ln(d):
        return {"scale": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)}

    D = vcfg.embed_dim
    blocks = []
    for i in range(vcfg.depth):
        kq, ko, k1, k2 = jax.random.split(ks[i], 4)
        blocks.append({
            "norm1": ln(D), "norm2": ln(D),
            "qkv": dense(kq, D, 3 * D),
            "proj": dense(ko, D, D),
            "fc1": dense(k1, D, vcfg.mlp_dim),
            "fc2": dense(k2, vcfg.mlp_dim, D),
        })
    km, kh = jax.random.split(ks[-1])
    return {
        "patch_embed": {"kernel": jax.random.normal(
            ks[-2], (vcfg.patch_dim, D), jnp.float32) * 0.02},
        "blocks": blocks,
        "merger": {"ln_q": ln(D),
                   "fc1": dense(km, vcfg.merge_dim, vcfg.merge_dim),
                   "fc2": dense(kh, vcfg.merge_dim, vcfg.hidden_size)},
    }


# --------------------------------------------------------------------------
# Vision forward
# --------------------------------------------------------------------------


def vision_rot_pos_ids(grid_thw: Sequence[tuple],
                       merge: int) -> np.ndarray:
    """(N, 2) [h, w] rotary position ids in the HF patch order: the
    processor flattens each (t, h, w) grid MERGE-GROUP-major — (h//m, w//m,
    m, m) — so consecutive groups of m*m patches form one merged token
    (HF ``Qwen2VisionTransformerPretrainedModel.rot_pos_emb``)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.arange(h)[:, None].repeat(w, 1)
        wp = np.arange(w)[None, :].repeat(h, 0)

        def regroup(x):
            return x.reshape(h // merge, merge, w // merge, merge
                             ).transpose(0, 2, 1, 3).reshape(-1)

        hw = np.stack([regroup(hp), regroup(wp)], axis=-1)   # (h*w, 2)
        out.append(np.tile(hw, (t, 1)))
    return np.concatenate(out, axis=0)


def vision_segment_ids(grid_thw: Sequence[tuple]) -> np.ndarray:
    """(N,) attention segment per patch: HF builds cu_seqlens as h*w
    repeated t times per image — attention is restricted to each TEMPORAL
    FRAME of each image, not the whole sequence."""
    segs, base = [], 0
    for t, h, w in grid_thw:
        segs.append(base + np.repeat(np.arange(t), h * w))
        base += t
    return np.concatenate(segs)


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _dense_b(x, p):
    return x @ p["kernel"] + p["bias"]


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _vision_rope(x, ang):
    """x (N, H, hd), ang (N, hd//2) -> NEOX half-split rotation."""
    cos = jnp.cos(ang)[:, None, :]
    sin = jnp.sin(ang)[:, None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           -1).astype(x.dtype)


def vision_forward(vcfg: Qwen2VLVisionConfig, params: dict, patches,
                   pos_ids, segment_ids=None):
    """patches (N, patch_dim) -> merged tokens (N // merge**2, hidden).

    ``pos_ids`` (N, 2) from :func:`vision_rot_pos_ids`; ``segment_ids``
    (N,) restricts attention to within-frame blocks
    (:func:`vision_segment_ids` ≙ HF cu_seqlens) — None = a single
    temporal frame (full attention).
    """
    N = patches.shape[0]
    H, hd = vcfg.num_heads, vcfg.head_dim
    x = patches @ params["patch_embed"]["kernel"]

    # 2-D rotary: hd//2 slots = [h-freqs (hd//4), w-freqs (hd//4)]
    quarter = hd // 4
    freqs = vcfg.rope_theta ** (
        -jnp.arange(0, quarter, dtype=jnp.float32) / quarter)
    ang = jnp.concatenate(
        [pos_ids[:, 0].astype(jnp.float32)[:, None] * freqs[None],
         pos_ids[:, 1].astype(jnp.float32)[:, None] * freqs[None]], -1)

    if segment_ids is None:
        mask = jnp.ones((N, N), bool)
    else:
        mask = segment_ids[:, None] == segment_ids[None, :]

    for bp in params["blocks"]:
        h = _ln(x, bp["norm1"], vcfg.ln_eps)
        qkv = _dense_b(h, bp["qkv"]).reshape(N, 3, H, hd)
        q = _vision_rope(qkv[:, 0], ang)
        k = _vision_rope(qkv[:, 1], ang)
        v = qkv[:, 2]
        s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (hd ** -0.5)
        s = jnp.where(mask[None], s, -1e30)
        att = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(s, -1),
                         v.astype(jnp.float32)).reshape(N, H * hd)
        x = x + _dense_b(att.astype(x.dtype), bp["proj"])
        h = _ln(x, bp["norm2"], vcfg.ln_eps)
        x = x + _dense_b(_quick_gelu(_dense_b(h, bp["fc1"])), bp["fc2"])

    m = params["merger"]
    x = _ln(x, m["ln_q"], vcfg.ln_eps).reshape(-1, vcfg.merge_dim)
    return _dense_b(jax.nn.gelu(_dense_b(x, m["fc1"]), approximate=False),
                    m["fc2"])


# --------------------------------------------------------------------------
# M-RoPE positions + splice
# --------------------------------------------------------------------------


def mrope_positions(segments: Sequence[tuple], merge: int = 2) -> np.ndarray:
    """(3, L) M-RoPE position ids for a segment list, mirroring HF
    ``get_rope_index``: text tokens advance all three components together;
    a vision segment ("image", (t, h, w)) — RAW patch grid, pre-merge —
    places temporal/height/width components on its merged grid starting at
    the running offset; the next text segment resumes at max(position)+1.

    segments: [("text", n), ("image", (t, h, w)), ...]
    """
    cols = []
    offset = 0
    for kind, spec in segments:
        if kind == "text":
            n = int(spec)
            p = np.arange(offset, offset + n)
            cols.append(np.stack([p, p, p]))
            offset += n
        else:
            t, h, w = spec
            hm, wm = h // merge, w // merge
            tt = np.repeat(np.arange(t), hm * wm)
            hh = np.tile(np.repeat(np.arange(hm), wm), t)
            ww = np.tile(np.arange(wm), t * hm)
            cols.append(offset + np.stack([tt, hh, ww]))
            offset += int(max(t, hm, wm))
    return np.concatenate(cols, axis=1)


def splice_embeds(text_embeds, vision_tokens, start: int):
    """Insert vision tokens into (L, D) text embeddings at ``start``
    (replacing the image-pad placeholders, HF semantics)."""
    n = vision_tokens.shape[0]
    return jnp.concatenate([text_embeds[:start],
                            vision_tokens.astype(text_embeds.dtype),
                            text_embeds[start + n:]], axis=0)


# --------------------------------------------------------------------------
# HF weight port
# --------------------------------------------------------------------------


def vision_hf_key_map(vcfg: Qwen2VLVisionConfig) -> dict:
    """HF ``visual.*`` key -> (tree path, transform) map.

    transform: 't' = transpose 2-D weight (torch stores (out, in)),
    'conv' = Conv3d (D, C, T, P, P) -> (C*T*P*P, D), None = as-is.
    """
    m = {"visual.patch_embed.proj.weight": (("patch_embed", "kernel"),
                                            "conv")}
    for i in range(vcfg.depth):
        hf = f"visual.blocks.{i}"
        ours = ("blocks", i)
        for hfn, on in [("norm1", "norm1"), ("norm2", "norm2")]:
            m[f"{hf}.{hfn}.weight"] = (ours + (on, "scale"), None)
            m[f"{hf}.{hfn}.bias"] = (ours + (on, "bias"), None)
        for hfn, on in [("attn.qkv", "qkv"), ("attn.proj", "proj"),
                        ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2")]:
            m[f"{hf}.{hfn}.weight"] = (ours + (on, "kernel"), "t")
            m[f"{hf}.{hfn}.bias"] = (ours + (on, "bias"), None)
    m["visual.merger.ln_q.weight"] = (("merger", "ln_q", "scale"), None)
    m["visual.merger.ln_q.bias"] = (("merger", "ln_q", "bias"), None)
    m["visual.merger.mlp.0.weight"] = (("merger", "fc1", "kernel"), "t")
    m["visual.merger.mlp.0.bias"] = (("merger", "fc1", "bias"), None)
    m["visual.merger.mlp.2.weight"] = (("merger", "fc2", "kernel"), "t")
    m["visual.merger.mlp.2.bias"] = (("merger", "fc2", "bias"), None)
    return m


def load_qwen2vl_from_hf(tcfg: LLMConfig, vcfg: Qwen2VLVisionConfig,
                         model_dir: str, weights=None,
                         dtype=jnp.bfloat16):
    """Stream a Qwen2-VL safetensors checkpoint -> (text tree, vision tree).

    Text decoder streams through :func:`~vla_touch_tpu.planning.llm.
    load_llm_from_hf` (same ``model.layers.*`` key space as Qwen2.5, with
    optional layer-by-layer int8/int4 quantization); the vision tower
    (~675M, runs once per image/video — not decode-bound) loads bf16.
    Replaces the reference's ``infer_auto_device_map`` + offload loading
    of ``Qwen2VLForConditionalGeneration`` (octopi utils/llm.py:54-64)."""
    import glob
    import os

    from safetensors import safe_open

    from vla_touch_tpu.planning.llm import load_llm_from_hf

    tparams = load_llm_from_hf(tcfg, model_dir, weights=weights, dtype=dtype)

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    handles = {fp: safe_open(fp, framework="numpy") for fp in files}
    where = {}
    for fp, f in handles.items():
        for k in f.keys():
            where[k] = fp
    kmap = vision_hf_key_map(vcfg)
    missing = sorted(k for k in kmap if k not in where)
    if missing:
        raise KeyError(f"checkpoint at {model_dir} is missing "
                       f"{len(missing)} vision tensors, e.g. {missing[:4]}")
    state = {}
    for hf_key in kmap:
        state[hf_key] = handles[where[hf_key]].get_tensor(hf_key)
    vparams = port_vision_state_dict(vcfg, state)
    vparams = jax.tree.map(
        lambda a: jnp.asarray(a, dtype if a.ndim >= 2 else jnp.float32),
        vparams)
    return tparams, vparams


def port_vision_state_dict(vcfg: Qwen2VLVisionConfig, state: dict) -> dict:
    """torch ``visual.*`` state dict -> vision param tree (numpy)."""
    params = jax.tree.map(np.zeros_like,
                          jax.tree.map(np.asarray,
                                       init_vision(vcfg,
                                                   jax.random.PRNGKey(0))))

    def setleaf(path, val):
        node = params
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == val.shape, (path, val.shape,
                                                   node[path[-1]].shape)
        node[path[-1]] = val

    kmap = vision_hf_key_map(vcfg)
    for hf_key, (path, tf) in kmap.items():
        w = np.asarray(state[hf_key], np.float32)
        if tf == "t":
            w = w.T
        elif tf == "conv":
            w = w.reshape(w.shape[0], -1).T
        setleaf(path, w)
    return params
