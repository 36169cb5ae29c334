"""Serving twin of the ViT towers (SigLIP / DinoV2): pure-function forward
over a prepared parameter tree, with an optional int8 w8a8 tier.

Why a twin (same design as ``models/rdt/quant_serve.py``):

- **Attention**: the flax ``ViTEncoder`` computes attention as two einsums
  with an f32 softmax between them; at the deployment shape (6 images x
  729 tokens x 16 heads) the f32 score tile is 204 MB — far past the
  ~80 MB XLA fusion budget measured in ``ops/attention.py`` — so it spills
  to HBM every layer.  The twin routes attention through
  :func:`vla_touch_tpu.ops.attention.dot_product_attention`, whose
  head-group chunking keeps each score tile fused (the policy that bought
  2.46x on B=4 RDT serving).
- **int8 w8a8**: every block matmul (q/k/v/out, fc1/fc2 — >99% of the
  tower's FLOPs) can run as dynamic-int8 x per-channel-int8 on the MXU
  (``ops/quant.py``), the same recipe as the RDT denoise tiers.  The
  SigLIP encode is the largest stage of the full control tick (64% cold,
  BENCH_r04), and unlike the B=1 denoise loop it is COMPUTE-bound at
  4374 tokens, so the win rides the MXU int8 rate, not HBM bytes.
- The patchify conv is expressed as one (N, p*p*3) x (p*p*3, D) matmul
  (stride = kernel size makes them identical); it stays bf16 (<0.2% of
  FLOPs, and its input distribution — raw normalized pixels — is the one
  place activation quantization is risky).

Serving-only and opt-in: training, HF porting and the parity surface keep
the flax module; the twin is parity-tested against it at tiny scale
(``tests/test_vit_serve.py``) and the int8 tier is gated end-to-end on the
refined-chunk correlation in ``bench.py`` exactly like the RDT tiers.

Reference hot path this accelerates: the per-step SigLIP encode of the
6-image window, ``/root/reference/VLA/scripts/franka_model_eef.py:243-289``
(tower loaded in ``VLA/models/multimodal_encoder/siglip_encoder.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vla_touch_tpu.models.encoders.vit import ViTConfig, _interpolate_pos_embed
from vla_touch_tpu.ops.attention import dot_product_attention
from vla_touch_tpu.ops.quant import is_linear, qdense, quantize_tree


def quantize_vit_params(params: dict, weights: str = "int8",
                        keep_bf16_last: int = 0) -> dict:
    """Prepare a ``ViTEncoder``/``SiglipVisionEncoder`` flax tree for the
    serving twin.

    ``weights='int8'``: per-output-channel int8 on every 2-D Dense inside
    the transformer blocks (qkv/out, fc1/fc2); ``weights='bf16'``: same
    tree with the block matmul kernels cast to bf16 (the twin's fused-
    attention forward without quantization).  Patch embed, positional
    embeddings and norms stay high-precision either way.  The returned
    tree is structurally distinct from the flax tree (int8 leaves carry
    ``w_i8``; bf16 trees carry a ``serve_bf16`` marker), which is what the
    policy wrapper dispatches on (static under jit).

    The per-block q/k/v Denses are FUSED into one (D, 3D) ``qkv`` leaf:
    one activation-quant pass and one 3x-wider MXU matmul instead of three
    (the per-output-channel scales concatenate exactly, so the math is
    unchanged).

    ``keep_bf16_last``: number of FINAL blocks whose matmuls stay bf16
    under ``weights='int8'``.  Late-block quantization error lands
    directly on the output tokens (no later mixing to average it out);
    keeping the last 2 of SigLIP's 27 blocks bf16 buys most of the
    accuracy back for ~7% of the speedup."""
    def fuse_qkv(node):
        if not (isinstance(node, dict) and "attention" in node
                and "query" in node.get("attention", {})):
            return node
        a = node["attention"]
        fused = {"kernel": jnp.concatenate(
            [jnp.asarray(a[n]["kernel"], jnp.float32)
             for n in ("query", "key", "value")], axis=1)}
        if "bias" in a["query"]:
            fused["bias"] = jnp.concatenate(
                [jnp.asarray(a[n]["bias"], jnp.float32)
                 for n in ("query", "key", "value")])
        return dict(node, attention={"qkv": fused, "output": a["output"]})

    def prep(node, path):
        if not isinstance(node, dict):
            return node
        if any(p.startswith("block") for p in path):
            node = fuse_qkv(node)
        return {k: prep(v, path + (k,)) for k, v in node.items()}

    params = prep(params, ())

    def _block_idx(path):
        for p in path:
            if p.startswith("block"):
                return int(p[len("block"):])
        return None

    def in_block(path, leaf):
        return _block_idx(path) is not None

    if weights == "int8":
        vp = params.get("vit", params)
        n_blocks = sum(1 for k in vp if k.startswith("block"))
        cut = n_blocks - keep_bf16_last

        def quant_pred(path, leaf):
            i = _block_idx(path)
            return i is not None and i < cut

        qt = quantize_tree(params, quant_pred)
        if keep_bf16_last > 0:
            def cast_kept(node, path):
                i = _block_idx(path)
                if is_linear(node) and i is not None and i >= cut:
                    out = {"kernel": jnp.asarray(node["kernel"],
                                                 jnp.bfloat16)}
                    if "bias" in node:
                        out["bias"] = jnp.asarray(node["bias"], jnp.float32)
                    return out
                if isinstance(node, dict):
                    return {k: cast_kept(v, path + (k,))
                            for k, v in node.items()}
                return node
            qt = cast_kept(qt, ())
        return qt
    assert weights == "bf16", weights

    def rec(node, path):
        if is_linear(node) and in_block(path, node):
            out = {"kernel": jnp.asarray(node["kernel"], jnp.bfloat16)}
            if "bias" in node:
                out["bias"] = jnp.asarray(node["bias"], jnp.float32)
            return out
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    out = rec(params, ())
    out["serve_bf16"] = jnp.zeros((), jnp.int8)
    return out


def _lin(x, p, dtype=jnp.bfloat16):
    """Dense on a prepared leaf: int8 w8a8 when quantized, bf16 otherwise."""
    if "w_i8" in p:
        return qdense(x, p, out_dtype=dtype)
    y = jnp.dot(x.astype(dtype), jnp.asarray(p["kernel"], dtype),
                preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + jnp.asarray(p["bias"], jnp.float32)
    return y.astype(dtype)


def _layernorm(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * jnp.asarray(p["scale"], jnp.float32)
            + jnp.asarray(p["bias"], jnp.float32)).astype(jnp.bfloat16)


def _block(x, p, cfg: ViTConfig, dtype=jnp.bfloat16):
    B, N, D = x.shape
    hd = D // cfg.num_heads
    h = _layernorm(x, p["norm1"], cfg.layernorm_eps)
    a = p["attention"]
    if "qkv" in a:
        qkv = _lin(h, a["qkv"], dtype).reshape(B, N, 3, cfg.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:  # pre-fusion tree (split q/k/v leaves)
        q = _lin(h, a["query"], dtype).reshape(B, N, cfg.num_heads, hd)
        k = _lin(h, a["key"], dtype).reshape(B, N, cfg.num_heads, hd)
        v = _lin(h, a["value"], dtype).reshape(B, N, cfg.num_heads, hd)
    o = dot_product_attention(q, k, v).reshape(B, N, D)
    h = _lin(o, a["output"], dtype)
    if cfg.use_layerscale:
        h = h * jnp.asarray(p["layerscale1"], dtype)
    x = x + h
    h = _layernorm(x, p["norm2"], cfg.layernorm_eps)
    h = _lin(h, p["fc1"], dtype)
    if cfg.quick_gelu:
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h, approximate=cfg.gelu_tanh)
    h = _lin(h, p["fc2"], dtype)
    if cfg.use_layerscale:
        h = h * jnp.asarray(p["layerscale2"], dtype)
    return x + h


def vit_encode_serve(cfg: ViTConfig, params: dict, pixels,
                     dtype=jnp.bfloat16):
    """Pure-function ``ViTEncoder`` forward on a prepared tree.

    ``pixels``: (B, H, W, 3) already normalized, channels-last (same
    contract as the flax module).  Returns post-final-LayerNorm tokens
    (B, N(+cls), D)."""
    vp = params["vit"] if "vit" in params else params
    B, H, W, _ = pixels.shape
    p = cfg.patch_size
    grid = (H - p) // p + 1
    crop = pixels[:, : grid * p, : grid * p, :].astype(dtype)
    # stride==kernel VALID conv == per-patch matmul: flatten each (p, p, 3)
    # patch in (h, w, c) order, matching the HWIO conv kernel reshape.
    patches = crop.reshape(B, grid, p, grid, p, 3)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, grid * grid, p * p * 3)
    pe = vp["patch_embed"]
    x = jnp.dot(patches, jnp.asarray(pe["kernel"], dtype).reshape(
        p * p * 3, cfg.hidden_size), preferred_element_type=jnp.float32)
    if "bias" in pe:
        x = x + jnp.asarray(pe["bias"], jnp.float32)
    x = x.astype(dtype)

    if cfg.use_cls_token:
        cls = jnp.broadcast_to(jnp.asarray(vp["cls_token"], dtype),
                               (B, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
    pos = _interpolate_pos_embed(
        jnp.asarray(vp["pos_embed"], jnp.float32), grid,
        cfg.image_size // cfg.patch_size, cfg.hidden_size, cfg.use_cls_token)
    x = x + pos.astype(dtype)
    if cfg.use_pre_norm:
        x = _layernorm(x, vp["pre_norm"], cfg.layernorm_eps)

    for i in range(cfg.num_layers):
        x = _block(x, vp[f"block{i}"], cfg, dtype)
    return _layernorm(x, vp["final_norm"], cfg.layernorm_eps).astype(dtype)


def is_vit_serve_tree(params: dict) -> bool:
    """True when the vision tree was prepared by
    :func:`quantize_vit_params` (checked on dict structure only — static
    under jit)."""
    if not isinstance(params, dict):
        return False
    if "serve_bf16" in params:
        return True
    vp = params.get("vit", params)
    a = vp.get("block0", {}).get("attention", {})
    return "w_i8" in a.get("qkv", a.get("query", {}))
