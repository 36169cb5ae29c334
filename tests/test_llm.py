"""In-repo decoder LLM: causality, KV-cache decode parity, LoRA, entropy,
TP sharding, and end-to-end projection+LoRA training through the real model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.planning import llm as L

CFG = L.qwen2_tiny(vocab_size=384, hidden_size=64, num_layers=2,
                   num_heads=4, num_kv_heads=2, mlp_dim=128)


@pytest.fixture(scope="module")
def params():
    return L.init_llm(CFG, jax.random.PRNGKey(0))


def test_causality(params, rng):
    """hidden[t] must not depend on embeds[t+1:]."""
    e1 = jnp.asarray(rng.normal(size=(1, 6, CFG.hidden_size)), jnp.float32)
    e2 = e1.at[0, 4:].set(rng.normal(size=(2, CFG.hidden_size)))
    h1 = L.llm_forward(CFG, params, e1)
    h2 = L.llm_forward(CFG, params, e2)
    np.testing.assert_allclose(np.asarray(h1[0, :4]), np.asarray(h2[0, :4]),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(h1[0, 5]), np.asarray(h2[0, 5]))


def test_padding_mask(params, rng):
    """Padded positions must not influence real tokens."""
    e = jnp.asarray(rng.normal(size=(1, 5, CFG.hidden_size)), jnp.float32)
    epad = jnp.concatenate(
        [e, jnp.asarray(rng.normal(size=(1, 3, CFG.hidden_size)),
                        jnp.float32)], axis=1)
    # padding sits AFTER the real tokens; causal mask already blocks it
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]], bool)
    h = L.llm_forward(CFG, params, epad, attn_mask=mask)
    href = L.llm_forward(CFG, params, e)
    np.testing.assert_allclose(np.asarray(h[0, :5]), np.asarray(href[0]),
                               rtol=1e-5, atol=1e-6)


def test_greedy_decode_matches_full_forward(params, rng):
    """KV-cache scan decode == argmax chain of repeated full forwards."""
    Lp, T = 4, 5
    prompt = jnp.asarray(rng.normal(size=(1, Lp, CFG.hidden_size)),
                         jnp.float32)
    toks, ents, _ = L.greedy_generate(CFG, params, prompt,
                                      max_new_tokens=T, eos_id=-1)
    # oracle: repeatedly run the full (uncached) forward
    e = prompt
    want = []
    for _ in range(T):
        h = L.llm_forward(CFG, params, e)
        nxt = int(jnp.argmax(L.lm_logits(CFG, params, h[:, -1]), -1)[0])
        want.append(nxt)
        e = jnp.concatenate([e, L.embed_tokens(params,
                                               jnp.asarray([[nxt]]))], axis=1)
    assert [int(t) for t in np.asarray(toks[0])] == want
    assert ents.shape == (1, T) and bool(jnp.all(ents >= 0))


def test_lora_zero_is_identity_and_trains(params, rng):
    e = jnp.asarray(rng.normal(size=(1, 5, CFG.hidden_size)), jnp.float32)
    lora = L.init_lora(CFG, jax.random.PRNGKey(1), rank=4)
    h0 = L.llm_forward(CFG, params, e)
    h1 = L.llm_forward(CFG, params, e, lora=lora)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)

    # one LoRA grad step moves the output; base params untouched
    tgt = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(1, 5)))
    msk = jnp.ones((1, 5), jnp.float32)

    def loss(lo_layers):
        return L.lm_loss(CFG, params, e, tgt, msk,
                         lora={"layers": lo_layers, "scale": lora["scale"]})

    l0 = float(loss(lora["layers"]))
    g = jax.grad(loss)(lora["layers"])
    gnorm = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree.leaves(g))
    assert gnorm > 0
    stepped = jax.tree.map(lambda p, gg: p - 0.1 * gg, lora["layers"], g)
    assert float(loss(stepped)) < l0


def test_hf_key_map_covers_tree(params):
    m = L.hf_key_map(CFG)
    paths = set()
    for pth, _ in m.values():
        paths.add(pth)

    def walk(node, path=()):
        if isinstance(node, dict):
            for k, v in node.items():
                yield from walk(v, path + (k,))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                yield from walk(v, path + (i,))
        else:
            yield path

    for leaf_path in walk(params):
        assert leaf_path in paths, leaf_path


def test_tp_sharding_runs_on_mesh(params, rng):
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("model",))
    sharded = L.shard_llm_params(mesh, params)
    e = jnp.asarray(rng.normal(size=(1, 5, CFG.hidden_size)), jnp.float32)

    @jax.jit
    def f(p, e):
        return L.lm_logits(CFG, p, L.llm_forward(CFG, p, e))

    with mesh:
        got = f(sharded, e)
    want = f(params, e)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_byte_tokenizer_roundtrip():
    tok = L.ByteTokenizer()
    s = "press the sponge, then report hardness 3/10"
    assert tok.decode(tok.encode(s)) == s
    assert tok.vocab_size > tok.PAD


@pytest.mark.slow
def test_e2e_projection_lora_training(tmp_path):
    """The VERDICT item-5 'done' bar: tiny-scale end-to-end QA training with
    decreasing loss and a greedy-decode test dump through the REAL decoder."""
    import cv2

    from vla_touch_tpu.models.encoders.vit import ViTConfig
    from vla_touch_tpu.planning import encoder as PE
    from vla_touch_tpu.planning.datasets import TactileLLMDataset
    from vla_touch_tpu.planning import run_llm as RL

    tiny_clip = ViTConfig(hidden_size=32, num_layers=1, num_heads=4,
                          mlp_dim=64, patch_size=16, image_size=32,
                          use_layerscale=False, quick_gelu=True,
                          use_pre_norm=True, layernorm_eps=1e-5,
                          patch_bias=False)
    rng = np.random.default_rng(0)
    rows = []
    for i, ans in enumerate(["hard", "soft"]):
        vdir = tmp_path / f"video{i}"
        vdir.mkdir()
        for t in range(3):
            cv2.imwrite(str(vdir / f"{t:03d}.jpg"),
                        np.full((32, 32, 3), 80 + 60 * i, np.uint8))
        rows.append({"split": "train", "question": "the surface is <tact>",
                     "tactile": [str(vdir)], "answer": ans})
    qa_path = str(tmp_path / "qa.json")
    json.dump(rows, open(qa_path, "w"))

    st = PE.init_tactile_encoder(tiny_clip, jax.random.PRNGKey(0))
    params = L.init_llm(CFG, jax.random.PRNGKey(3))
    # LoRA finetunes a PRETRAINED base (as in the reference); pretrain the
    # tiny base on the answer language first (full-param path).
    params, pre_loss = L.train_lm(
        CFG, params, ["the surface is hard", "the surface is soft"],
        steps=150, lr=1e-2)
    assert pre_loss < 1.0, pre_loss
    ds = TactileLLMDataset([qa_path], split_name="train")
    out = str(tmp_path / "out")
    proj, lora = RL.train_projection_and_lora(
        st, CFG, params, ds, out, epochs=25, lr=3e-3, lora_rank=4,
        frame_size=32)
    logged = [json.loads(l) for l in open(os.path.join(
        out, "llm_training.jsonl"))]
    first, last = logged[0]["loss"], logged[-1]["loss"]
    assert last < first * 0.7, (first, last)

    # greedy-decode dump through the real decoder
    iface = RL.make_llm_interface(CFG, params, lora=lora, max_new_tokens=8)
    preds = RL.test_llm(st, iface, proj, ds, out, frame_size=32)
    assert len(preds) == 2 and all("prediction" in p for p in preds)
    assert iface.last_entropy is not None and iface.last_entropy.ndim == 1


def test_merge_lora_equals_adapter_forward(params, rng):
    """W + A@B*scale folded into the kernels == running with the adapter."""
    lora = L.init_lora(CFG, jax.random.PRNGKey(3), rank=4)
    # randomize B so the adapter actually does something
    for lp in lora["layers"]:
        for t in lp:
            lp[t]["B"] = jnp.asarray(
                rng.normal(size=lp[t]["B"].shape) * 0.05, jnp.float32)
    e = jnp.asarray(rng.normal(size=(2, 5, CFG.hidden_size)), jnp.float32)
    with_adapter = L.llm_forward(CFG, params, e, lora=lora)
    merged = L.merge_lora(params, lora)
    folded = L.llm_forward(CFG, merged, e)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(with_adapter),
                               rtol=1e-4, atol=1e-4)
    # base params untouched
    assert params["layers"][0]["q"]["kernel"] is not \
        merged["layers"][0]["q"]["kernel"]


def test_quantized_llm_decode(params, rng):
    """int8-quantized decoder: same surfaces, bounded drift; w4 runs too."""
    qp8 = L.quantize_llm_params(params)
    assert "w_i8" in qp8["layers"][0]["q"]
    assert "w_i8" in qp8["layers"][1]["down"]
    assert qp8["layers"][0]["input_norm"].ndim == 1          # passthrough
    e = jnp.asarray(rng.normal(size=(1, 6, CFG.hidden_size)), jnp.float32)
    h_ref = np.asarray(L.llm_forward(CFG, params, e))
    h_q = np.asarray(L.llm_forward(CFG, qp8, e))
    corr = np.corrcoef(h_ref.ravel(), h_q.ravel())[0, 1]
    assert corr > 0.99, corr

    toks, ents, _ = L.greedy_generate(CFG, qp8, e, max_new_tokens=6)
    assert toks.shape == (1, 6) and np.isfinite(np.asarray(ents)).all()

    qp4 = L.quantize_llm_params(params, weights="int4")
    assert "w4_pack" in qp4["layers"][0]["gate"]
    h4 = np.asarray(L.llm_forward(CFG, qp4, e))
    assert np.isfinite(h4).all()
    # Grouped int4 carries the documented GPTQ/AWQ-class fidelity trade
    # (~0.986 hidden-state corr at tiny scale vs int8's 0.9998) — pin a
    # floor so quantizer regressions surface.
    corr4 = np.corrcoef(h_ref.ravel(), h4.ravel())[0, 1]
    assert corr4 > 0.95, corr4
    # QLoRA-style: full-precision adapter on the quantized base still applies
    lora = L.init_lora(CFG, jax.random.PRNGKey(4), rank=2)
    for lp in lora["layers"]:
        for t in lp:
            lp[t]["B"] = jnp.asarray(
                rng.normal(size=lp[t]["B"].shape) * 0.1, jnp.float32)
    h_q_lora = np.asarray(L.llm_forward(CFG, qp8, e, lora=lora))
    assert np.abs(h_q_lora - h_q).max() > 1e-3


def test_fused_quantized_layers_exact(params, rng):
    """fuse_quantized_layers (qkv + gateup launch fusion for decode
    serving) is numerically EXACT: column-independent quantized layouts
    concatenate without changing any output, for int8 and w4, with and
    without runtime LoRA residuals."""
    e = jnp.asarray(rng.normal(size=(1, 5, CFG.hidden_size)), jnp.float32)
    lora = L.init_lora(CFG, jax.random.PRNGKey(4), rank=2)
    for lp in lora["layers"]:
        for t in lp:
            lp[t]["B"] = jnp.asarray(
                rng.normal(size=lp[t]["B"].shape) * 0.1, jnp.float32)
    for w in ("int8", "int4"):
        qp = L.quantize_llm_params(params, weights=w)
        fp = L.fuse_quantized_layers(qp)
        l0 = fp["layers"][0]
        assert "qkv" in l0 and "gateup" in l0
        assert "q" not in l0 and "gate" not in l0
        assert "bias" in l0["qkv"]            # Qwen qkv-bias concatenated
        h_u = np.asarray(L.llm_forward(CFG, qp, e))
        h_f = np.asarray(L.llm_forward(CFG, fp, e))
        np.testing.assert_allclose(h_f, h_u, rtol=1e-6, atol=1e-6)
        t_u, _, _ = L.greedy_generate(CFG, qp, e, max_new_tokens=4)
        t_f, _, _ = L.greedy_generate(CFG, fp, e, max_new_tokens=4)
        np.testing.assert_array_equal(np.asarray(t_u), np.asarray(t_f))
        a = np.asarray(L.llm_forward(CFG, qp, e, lora=lora))
        b = np.asarray(L.llm_forward(CFG, fp, e, lora=lora))
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_load_llm_from_hf_streaming(params, tmp_path, rng):
    """Streamed safetensors load (optionally quantizing per layer) rebuilds
    the tree: forward parity with the in-memory params."""
    from safetensors.numpy import save_file

    kmap = L.hf_key_map(CFG)

    def fetch(path):
        node = params
        for p in path:
            node = node[p]
        return np.asarray(node)

    tensors = {}
    for hf_key, (path, transpose) in kmap.items():
        a = fetch(path)
        tensors[hf_key] = np.ascontiguousarray(a.T) if transpose else a
    # two shards to exercise the multi-file index
    keys = sorted(tensors)
    save_file({k: tensors[k] for k in keys[::2]},
              str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file({k: tensors[k] for k in keys[1::2]},
              str(tmp_path / "model-00002-of-00002.safetensors"))

    loaded = L.load_llm_from_hf(CFG, str(tmp_path))
    e = jnp.asarray(rng.normal(size=(1, 5, CFG.hidden_size)), jnp.float32)
    h_ref = np.asarray(L.llm_forward(CFG, params, e))
    h_l = np.asarray(L.llm_forward(CFG, loaded, e))
    np.testing.assert_allclose(h_l, h_ref, rtol=2e-2, atol=2e-2)  # bf16 cast

    q = L.load_llm_from_hf(CFG, str(tmp_path), weights="int8")
    assert "w_i8" in q["layers"][0]["q"]
    assert "lm_head" not in q          # CFG ties embeddings
    h_q = np.asarray(L.llm_forward(CFG, q, e))
    corr = np.corrcoef(h_ref.ravel(), h_q.ravel())[0, 1]
    assert corr > 0.99, corr

    qf = L.load_llm_from_hf(CFG, str(tmp_path), weights="int8", fuse=True)
    assert "qkv" in qf["layers"][0] and "gateup" in qf["layers"][0]
    np.testing.assert_allclose(np.asarray(L.llm_forward(CFG, qf, e)), h_q,
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="fuse"):
        L.load_llm_from_hf(CFG, str(tmp_path), fuse=True)


def test_tp_sharded_greedy_decode(params, rng):
    """KV-cache greedy decode runs under a TP mesh (the serving layout for
    models that exceed one chip's HBM, e.g. bf16 7B on 16 GB v5e) and
    produces the same tokens/entropies as the unsharded decode."""
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("model",))
    sharded = L.shard_llm_params(mesh, params)
    prompt = jnp.asarray(rng.normal(size=(1, 4, CFG.hidden_size)),
                         jnp.float32)

    toks_ref, ents_ref, _ = L.greedy_generate(CFG, params, prompt,
                                              max_new_tokens=5, eos_id=-1)
    with mesh:
        toks, ents, _ = L.greedy_generate(CFG, sharded, prompt,
                                          max_new_tokens=5, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_ref))
    np.testing.assert_allclose(np.asarray(ents), np.asarray(ents_ref),
                               rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# Sampled generation (reasoning mode, reference run_llm.py:273)
# --------------------------------------------------------------------------


def test_sample_generate_low_temperature_matches_greedy(params, rng):
    """As temperature -> 0 the tempered categorical collapses to argmax."""
    prompt = jnp.asarray(rng.normal(size=(2, 4, CFG.hidden_size)),
                         jnp.float32)
    g_toks, g_ents, _ = L.greedy_generate(CFG, params, prompt,
                                          max_new_tokens=6, eos_id=-1)
    s_toks, s_ents, s_surp, _ = L.sample_generate(
        CFG, params, prompt, jax.random.PRNGKey(7), max_new_tokens=6,
        eos_id=-1, temperature=1e-4)
    np.testing.assert_array_equal(np.asarray(s_toks), np.asarray(g_toks))
    np.testing.assert_allclose(np.asarray(s_ents), np.asarray(g_ents),
                               rtol=1e-5, atol=1e-6)
    # at ~zero temperature the chosen token holds ~all tempered mass
    assert float(jnp.max(s_surp)) < 1e-3


def test_sample_generate_n_sequences(params, rng):
    """num_return_sequences tiles the prompt: shapes (B*N, T), batch-major
    grouping, and independent samples differ at high temperature."""
    B, N, T = 2, 3, 8
    prompt = jnp.asarray(rng.normal(size=(B, 4, CFG.hidden_size)),
                         jnp.float32)
    toks, ents, surps, lengths = L.sample_generate(
        CFG, params, prompt, jax.random.PRNGKey(3), max_new_tokens=T,
        eos_id=-1, temperature=5.0, num_return_sequences=N)
    assert toks.shape == (B * N, T)
    assert ents.shape == (B * N, T) and surps.shape == (B * N, T)
    assert lengths.shape == (B * N,)
    rows = np.asarray(toks)
    # the N samples of input 0 occupy rows 0..N-1; at temperature 5 over a
    # 384-vocab at least one pair must differ
    assert any(not np.array_equal(rows[i], rows[j])
               for i in range(N) for j in range(i + 1, N))
    # reproducible under the same key
    toks2, _, _, _ = L.sample_generate(
        CFG, params, prompt, jax.random.PRNGKey(3), max_new_tokens=T,
        eos_id=-1, temperature=5.0, num_return_sequences=N)
    np.testing.assert_array_equal(rows, np.asarray(toks2))


def test_sample_surprisal_matches_manual(params, rng):
    """surprisals[:, 0] == -log2 softmax(logits0 / T)[tok0] — the
    reference's get_sentence_entropy math (utils/llm.py:223-243)."""
    temp = 2.0
    prompt = jnp.asarray(rng.normal(size=(2, 4, CFG.hidden_size)),
                         jnp.float32)
    toks, _, surps, _ = L.sample_generate(
        CFG, params, prompt, jax.random.PRNGKey(11), max_new_tokens=3,
        eos_id=-1, temperature=temp)
    h = L.llm_forward(CFG, params, prompt)
    logits0 = L.lm_logits(CFG, params, h[:, -1]).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits0 / temp, axis=-1)
    want = -np.asarray(logp)[np.arange(2), np.asarray(toks[:, 0])] / np.log(2)
    np.testing.assert_allclose(np.asarray(surps[:, 0]), want,
                               rtol=1e-5, atol=1e-6)


def test_sequence_avg_surprisal_masks_past_eos():
    surps = jnp.asarray([[1.0, 2.0, 3.0, 4.0],
                         [2.0, 2.0, 2.0, 2.0]])
    lengths = jnp.asarray([2, 4])
    avg = np.asarray(L.sequence_avg_surprisal(surps, lengths))
    np.testing.assert_allclose(avg, [1.5, 2.0])


def test_megakernels_default_off():
    """Measured dispatch policy (tools/bench_llm7b.py, v5e, 7B w4 decode):
    per-matmul kernels 97.6 tok/s beat every fusion tier (concat 92.2,
    +swiglu 75.8, +postattn 52.8), so megakernel routing is opt-in."""
    assert L.MEGAKERNELS is False


def test_swiglu_megakernel_eligibility():
    """The decode MLP routes to the single-launch megakernel exactly when
    both leaves are fused w4 and no MLP LoRA residual is attached."""
    w4 = {"w4_pack": 0, "scale4": 0}
    i8 = {"w_i8": 0, "scale": 0}
    ok = L._swiglu_megakernel_ok
    assert ok({"gateup": w4, "down": w4}, {})
    assert not ok({"gateup": i8, "down": i8}, {})        # int8 path is XLA
    assert not ok({"gateup": w4, "down": i8}, {})
    assert not ok({"gate": w4, "up": w4, "down": w4}, {})  # unfused tree
    assert not ok({"gateup": w4, "down": w4}, {"down": {"A": 0, "B": 0}})
    assert ok({"gateup": w4, "down": w4}, {"q": {"A": 0, "B": 0}})


def test_postattn_megakernel_eligibility():
    w4 = {"w4_pack": 0, "scale4": 0}
    ok = L._postattn_megakernel_ok
    full = {"o": w4, "gateup": w4, "down": w4}
    assert ok(full, {})
    assert not ok({**full, "o": {"w_i8": 0, "scale": 0}}, {})
    assert not ok(full, {"o": {"A": 0, "B": 0}})
    assert not ok(full, {"gate": {"A": 0, "B": 0}})
    assert ok(full, {"q": {"A": 0, "B": 0}})    # attention LoRA is fine
