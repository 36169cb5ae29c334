"""Qwen2-VL planner backbone: parity vs the HF oracle at tiny scale.

The reference's third LLM backbone
(``/root/reference/octopi/octopi_s/utils/llm.py:26-31,54-64``) is
``Qwen2VLForConditionalGeneration``.  These tests pin our TPU-native
vision tower + M-RoPE decoder against the HF modeling code the reference
loads into, with randomly initialized tiny weights ported through the
same key maps the real checkpoint uses.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vla_touch_tpu.planning import llm as L  # noqa: E402
from vla_touch_tpu.planning import qwen2vl as VL  # noqa: E402

TCFG, VCFG = VL.qwen2vl_tiny()


def _hf_model():
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLForConditionalGeneration)

    cfg = Qwen2VLConfig(
        vocab_size=TCFG.vocab_size, hidden_size=TCFG.hidden_size,
        num_hidden_layers=TCFG.num_layers,
        num_attention_heads=TCFG.num_heads,
        num_key_value_heads=TCFG.num_kv_heads,
        intermediate_size=TCFG.mlp_dim, rope_theta=TCFG.rope_theta,
        rms_norm_eps=TCFG.rms_eps, tie_word_embeddings=False,
        rope_scaling={"type": "mrope",
                      "mrope_section": list(TCFG.mrope_section)},
        vision_config=dict(
            depth=VCFG.depth, embed_dim=VCFG.embed_dim,
            num_heads=VCFG.num_heads, mlp_ratio=VCFG.mlp_ratio,
            patch_size=VCFG.patch_size,
            temporal_patch_size=VCFG.temporal_patch_size,
            spatial_merge_size=VCFG.spatial_merge_size,
            hidden_size=VCFG.hidden_size, in_channels=VCFG.in_channels),
        vision_start_token_id=3, vision_end_token_id=4,
        image_token_id=5, video_token_id=6)
    torch.manual_seed(0)
    return Qwen2VLForConditionalGeneration(cfg).eval().float()


def _norm_keys(sd):
    """Map 4.5x attribute names back to the hub checkpoint convention
    (``model.layers.*`` text, ``visual.*`` vision) our key maps target."""
    out = {}
    for k, v in sd.items():
        k = k.replace("model.language_model.", "model.")
        k = k.replace("model.visual.", "visual.")
        out[k] = v
    return out


def _port(model):
    sd = _norm_keys({k: v.detach().numpy() for k, v in
                     model.state_dict().items()})
    vparams = VL.port_vision_state_dict(VCFG, sd)
    tparams = jax.tree.map(np.zeros_like, jax.tree.map(
        np.asarray, L.init_llm(TCFG, jax.random.PRNGKey(0))))
    for hf_key, (path, transpose) in L.hf_key_map(TCFG).items():
        w = np.asarray(sd[hf_key], np.float32)
        node = tparams
        for p in path[:-1]:
            node = node[p]
        assert node[path[-1]].shape == (w.T.shape if transpose else w.shape)
        node[path[-1]] = w.T if transpose else w
    return tparams, vparams


@pytest.fixture(scope="module")
def oracle():
    model = _hf_model()
    tparams, vparams = _port(model)
    return model, tparams, vparams


GRID = (2, 4, 4)          # t x h x w raw patches -> 32 patches, 8 merged


def _patches(rng):
    n = GRID[0] * GRID[1] * GRID[2]
    return rng.normal(size=(n, VCFG.patch_dim)).astype(np.float32)


def test_vision_tower_matches_hf(oracle, rng):
    model, _, vparams = oracle
    patches = _patches(rng)
    grid = torch.tensor([list(GRID)])
    with torch.no_grad():
        visual = getattr(model, "visual", None) or model.model.visual
        want = visual(torch.from_numpy(patches),
                      grid_thw=grid).numpy()
    pos = VL.vision_rot_pos_ids([GRID], VCFG.spatial_merge_size)
    seg = VL.vision_segment_ids([GRID])
    got = np.asarray(VL.vision_forward(VCFG, vparams, jnp.asarray(patches),
                                       jnp.asarray(pos),
                                       segment_ids=jnp.asarray(seg)))
    assert got.shape == want.shape == (8, VCFG.hidden_size)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_full_multimodal_forward_matches_hf(oracle, rng):
    """Text + image logits: vision splice + M-RoPE positions end to end."""
    model, tparams, vparams = oracle
    patches = _patches(rng)
    n_img = 8
    pre = [7, 3] + [5] * n_img + [4]      # text, vis_start, img pads, vis_end
    post = [9, 11, 2]
    ids = np.asarray(pre + post)[None]
    with torch.no_grad():
        want = model(input_ids=torch.from_numpy(ids),
                     pixel_values=torch.from_numpy(patches),
                     image_grid_thw=torch.tensor([list(GRID)])
                     ).logits.numpy()

    pos_v = VL.vision_rot_pos_ids([GRID], VCFG.spatial_merge_size)
    seg_v = VL.vision_segment_ids([GRID])
    vtok = VL.vision_forward(VCFG, vparams, jnp.asarray(patches),
                             jnp.asarray(pos_v),
                             segment_ids=jnp.asarray(seg_v))
    embeds = L.embed_tokens(tparams, jnp.asarray(ids))[0]
    start = ids[0].tolist().index(5)
    embeds = VL.splice_embeds(embeds, vtok, start)
    segs = [("text", start), ("image", GRID),
            ("text", ids.shape[1] - start - n_img)]
    mpos = VL.mrope_positions(segs, VCFG.spatial_merge_size)
    hidden = L.llm_forward(TCFG, tparams, embeds[None],
                           positions=jnp.asarray(mpos)[:, None, :])
    got = np.asarray(L.lm_logits(TCFG, tparams, hidden))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_mrope_text_only_reduces_to_standard_rope(rng):
    """(3, B, L) positions with equal components == (B, L) positions —
    pure-text prompts through the VL decoder match the text decoder."""
    params = L.init_llm(TCFG, jax.random.PRNGKey(1))
    x = jnp.asarray(rng.normal(size=(2, 6, TCFG.hidden_size)), jnp.float32)
    p2 = jnp.broadcast_to(jnp.arange(6)[None], (2, 6))
    p3 = jnp.broadcast_to(jnp.arange(6)[None, None], (3, 2, 6))
    a = L.llm_forward(TCFG, params, x, positions=p2)
    b = L.llm_forward(TCFG, params, x, positions=p3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_vision_key_map_covers_tree(oracle):
    model, _, _ = oracle
    sd = _norm_keys(model.state_dict())
    hf_vision = {k for k in sd if k.startswith("visual.")}
    ours = set(VL.vision_hf_key_map(VCFG))
    assert ours == hf_vision, (ours ^ hf_vision)


def test_mrope_positions_match_hf(oracle):
    """Our segment-based M-RoPE position builder equals HF get_rope_index."""
    model, _, _ = oracle
    n_img = 8
    ids = np.asarray([7, 3] + [5] * n_img + [4, 9, 11, 2])[None]
    fn = getattr(model, "get_rope_index", None) or \
        model.model.get_rope_index
    pos_hf, _ = fn(torch.from_numpy(ids),
                   image_grid_thw=torch.tensor([list(GRID)]))
    start = ids[0].tolist().index(5)
    segs = [("text", start), ("image", GRID),
            ("text", ids.shape[1] - start - n_img)]
    mpos = VL.mrope_positions(segs, VCFG.spatial_merge_size)
    np.testing.assert_array_equal(mpos, pos_hf[:, 0].numpy())


def test_greedy_generate_matches_hf_multimodal(oracle, rng):
    """Greedy decode through a spliced image prompt: tokens match HF
    ``generate`` (which re-derives M-RoPE decode offsets internally —
    max(prompt position)+1, NOT the prompt length)."""
    model, tparams, vparams = oracle
    patches = _patches(rng)
    n_img, T = 8, 6
    ids = np.asarray([7, 3] + [5] * n_img + [4, 9, 11, 2])[None]
    with torch.no_grad():
        out = model.generate(
            input_ids=torch.from_numpy(ids),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([list(GRID)]),
            max_new_tokens=T, min_new_tokens=T, do_sample=False)
    want = out[0, ids.shape[1]:].numpy()

    pos_v = VL.vision_rot_pos_ids([GRID], VCFG.spatial_merge_size)
    seg_v = VL.vision_segment_ids([GRID])
    vtok = VL.vision_forward(VCFG, vparams, jnp.asarray(patches),
                             jnp.asarray(pos_v),
                             segment_ids=jnp.asarray(seg_v))
    embeds = L.embed_tokens(tparams, jnp.asarray(ids))[0]
    start = ids[0].tolist().index(5)
    embeds = VL.splice_embeds(embeds, vtok, start)
    segs = [("text", start), ("image", GRID),
            ("text", ids.shape[1] - start - n_img)]
    mpos = VL.mrope_positions(segs, VCFG.spatial_merge_size)
    toks, _, _ = L.greedy_generate(
        TCFG, tparams, embeds[None], max_new_tokens=T, eos_id=0,
        prompt_positions=jnp.asarray(mpos)[:, None, :])
    np.testing.assert_array_equal(np.asarray(toks)[0], want)


def test_backbone_registry():
    """All three reference model types resolve (octopi llm.py:15-31)."""
    t = L.backbone("qwen2.5-7b")
    assert t.hidden_size == 3584 and t.mrope_section is None
    t = L.backbone("llama-3.1-8b")
    assert t.qkv_bias is False
    t, v = L.backbone("qwen2-vl-7b")
    assert t.mrope_section == (16, 24, 24) and v.depth == 32
    with pytest.raises(ValueError):
        L.backbone("gpt-5")
