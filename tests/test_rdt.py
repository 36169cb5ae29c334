"""RDT transformer + runner: torch parity at tiny scale, scan-sampler
contract, and masking semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.torch_ref.rdt_torch import TorchAdapter, TorchRDT
from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
from vla_touch_tpu.models.rdt import runner as R
from vla_touch_tpu.models.rdt.model import RDT
from vla_touch_tpu.utils import torch_port as tp

torch.manual_seed(0)

TINY = rdt_tiny()
RCFG = R.RDTRunnerConfig(model=TINY, noise=NoiseSchedulerConfig(
    num_inference_timesteps=5))


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def test_rdt_forward_matches_torch(rng):
    m = TINY
    ref = TorchRDT(m.output_dim, m.horizon, m.hidden_size, m.depth,
                   m.num_heads, m.max_lang_cond_len, m.img_cond_len).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = tp.rdt_model(sd, depth=m.depth)

    B, Ll = 2, 9
    x = _rand(rng, B, m.horizon + 1, m.hidden_size)
    freq = np.array([10.0, 25.0], np.float32)
    t = np.array([999, 3], np.int64)
    lang = _rand(rng, B, Ll, m.hidden_size)
    img = _rand(rng, B, m.img_cond_len, m.hidden_size)
    lang_mask = np.ones((B, Ll), bool)
    lang_mask[0, 5:] = False

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(freq),
                   torch.from_numpy(t), torch.from_numpy(lang),
                   torch.from_numpy(img),
                   torch.from_numpy(lang_mask)).numpy()
    got = RDT(m).apply({"params": params}, jnp.asarray(x), jnp.asarray(freq),
                       jnp.asarray(t), jnp.asarray(lang), jnp.asarray(img),
                       lang_mask=jnp.asarray(lang_mask))
    assert got.shape == want.shape == (B, m.horizon, m.output_dim)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_pos_embed_init_matches_reference_tables():
    m = TINY
    params = RDT(m).init(
        jax.random.PRNGKey(0), jnp.zeros((1, m.horizon + 1, m.hidden_size)),
        jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4, m.hidden_size)),
        jnp.zeros((1, m.img_cond_len, m.hidden_size)))["params"]
    assert params["x_pos_embed"].shape == (1, m.horizon + 3, m.hidden_size)
    # ("lang", -max_len) means no per-position embedding: every row equals
    # the position-0 sincos vector (constant across tokens).
    lang = np.asarray(params["lang_cond_pos_embed"])[0]
    assert np.allclose(lang, lang[0:1])
    np.testing.assert_allclose(lang[0, : m.hidden_size // 2], 0.0, atol=1e-12)
    np.testing.assert_allclose(lang[0, m.hidden_size // 2:], 1.0, atol=1e-12)
    # x pos embed rows are distinct (modality + position coding).
    x = np.asarray(params["x_pos_embed"])[0]
    assert not np.allclose(x[0], x[1])


def test_adapters_match_torch(rng):
    for kind, din in [("linear", 32), ("mlp2x_gelu", 32), ("mlp3x_gelu", 16)]:
        ref = TorchAdapter(kind, din, 24).eval()
        sd = {k.replace("net.", ""): v.detach().numpy()
              for k, v in ref.state_dict().items()}
        depth = 1 if kind == "linear" else int(kind[3])
        params = tp.condition_adapter(sd, "", depth)
        x = _rand(rng, 3, 5, din)
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = R.ConditionAdapter(kind, 24).apply({"params": params},
                                                 jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_predict_action_shapes_determinism_and_mask(rng):
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    # Break the zero-init final layer so predictions depend on the inputs
    # and the sampling noise (untrained zero-init outputs exactly 0).
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    m = TINY
    B, Ll = 2, 7
    lang = jnp.asarray(_rand(rng, B, Ll, m.lang_token_dim))
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(_rand(rng, B, m.img_cond_len, m.img_token_dim))
    state = jnp.asarray(_rand(rng, B, 1, m.state_token_dim))
    amask = np.zeros((B, 1, m.output_dim), np.float32)
    amask[:, :, :10] = 1.0
    amask = jnp.asarray(amask)
    freqs = jnp.asarray([10.0, 10.0])

    out = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(1), lang,
                               lang_mask, img, state, amask, freqs)
    assert out.shape == (B, m.horizon, m.output_dim)
    # Masked action dims must be exactly zero (rdt_runner.py:162-163).
    assert float(jnp.abs(out[..., 10:]).max()) == 0.0
    assert float(jnp.abs(out[..., :10]).max()) > 0.0
    # Same key -> identical result; different key -> different.
    out2 = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(1), lang,
                                lang_mask, img, state, amask, freqs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(2), lang,
                                lang_mask, img, state, amask, freqs)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_reference_style_serving_matches_cached(rng):
    """The measured-baseline path (per-step full KV recomputation, exactly
    rdt_runner.py:122-165) must produce the same chunk as the cached
    production path — the cache is a pure latency optimization."""
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    params["model"]["final_ffn"]["fc2"] = {
        "kernel": jnp.asarray(rng.normal(
            size=params["model"]["final_ffn"]["fc2"]["kernel"].shape) * 0.05,
            jnp.float32),
        "bias": params["model"]["final_ffn"]["fc2"]["bias"],
    }
    m = TINY
    B, Ll = 2, 7
    lang = jnp.asarray(_rand(rng, B, Ll, m.lang_token_dim))
    lang_mask = jnp.ones((B, Ll), bool)
    img = jnp.asarray(_rand(rng, B, m.img_cond_len, m.img_token_dim))
    state = jnp.asarray(_rand(rng, B, 1, m.state_token_dim))
    amask = np.zeros((B, 1, m.output_dim), np.float32)
    amask[:, :, :10] = 1.0
    amask = jnp.asarray(amask)
    freqs = jnp.asarray([10.0, 10.0])
    noise = jnp.asarray(_rand(rng, B, m.horizon, m.output_dim))

    fast = R.rdt_predict_action(RCFG, params, jax.random.PRNGKey(1), lang,
                                lang_mask, img, state, amask, freqs,
                                init_noise=noise)
    ref = R.rdt_predict_action_reference_style(
        RCFG, params, jax.random.PRNGKey(1), lang, lang_mask, img, state,
        amask, freqs, init_noise=noise)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)


def test_forward_cached_matches_uncached(rng):
    """The KV-cached scan-body forward must equal the plain forward."""
    m = TINY
    model = RDT(m)
    B, Ll = 2, 9
    x = jnp.asarray(_rand(rng, B, m.horizon + 1, m.hidden_size))
    freq = jnp.asarray([10.0, 25.0])
    t = jnp.asarray([999, 3], jnp.int32)
    lang = jnp.asarray(_rand(rng, B, Ll, m.hidden_size))
    img = jnp.asarray(_rand(rng, B, m.img_cond_len, m.hidden_size))
    lang_mask = np.ones((B, Ll), bool)
    lang_mask[1, 4:] = False
    lang_mask = jnp.asarray(lang_mask)
    params = model.init(jax.random.PRNGKey(0), x, freq, t, lang, img)["params"]

    plain = model.apply({"params": params}, x, freq, t, lang, img,
                        lang_mask=lang_mask)
    kv = model.apply({"params": params}, lang, img,
                     method=RDT.compute_cond_kv)
    cached = model.apply({"params": params}, x, freq, t, kv,
                         lang_mask=lang_mask, method=RDT.forward_cached)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               atol=1e-5)


def test_compute_loss_finite_and_differentiable(rng):
    params = R.init_rdt(RCFG, jax.random.PRNGKey(0))
    m = TINY
    B, Ll = 2, 5
    batch = {
        "lang_tokens": jnp.asarray(_rand(rng, B, Ll, m.lang_token_dim)),
        "lang_mask": jnp.ones((B, Ll), bool),
        "img_tokens": jnp.asarray(_rand(rng, B, m.img_cond_len, m.img_token_dim)),
        "state_tokens": jnp.asarray(_rand(rng, B, 1, m.state_token_dim)),
        "action_gt": jnp.asarray(_rand(rng, B, m.horizon, m.output_dim)),
        "action_mask": jnp.ones((B, 1, m.output_dim)),
        "ctrl_freqs": jnp.asarray([10.0, 25.0]),
    }
    loss, g = jax.value_and_grad(
        lambda p: R.rdt_compute_loss(RCFG, p, jax.random.PRNGKey(1), batch)
    )(params)
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_param_count_1b_config():
    """The full-size config lands in the ~1.2B range the reference reports
    (rdt_runner.py:82-86 prints ~1.2e9 for RDT-1B)."""
    from vla_touch_tpu.config import rdt_1b

    m = rdt_1b()
    # Count analytically without materializing params.
    h = m.hidden_size

    def dense(i, o):
        return i * o + o

    block = (
        3 * h  # three RmsNorms
        + dense(h, 3 * h) + 2 * (h // m.num_heads) + dense(h, h)  # self-attn
        + dense(h, h) + dense(h, 2 * h) + 2 * (h // m.num_heads) + dense(h, h)
        + dense(h, h) + dense(h, h)  # ffn
    )
    total = m.depth * block
    total += 2 * (dense(256, h) + dense(h, h))  # t/freq embedders
    total += (m.horizon + 3) * h + m.max_lang_cond_len * h + m.img_cond_len * h
    total += h + dense(h, h) + dense(h, m.output_dim)  # final layer
    total += dense(m.lang_token_dim, h) + dense(h, h)  # lang mlp2x
    total += dense(m.img_token_dim, h) + dense(h, h)   # img mlp2x
    total += dense(m.state_token_dim * 2, h) + 2 * dense(h, h)  # state mlp3x
    assert 1.0e9 < total < 1.4e9, total


def test_remat_blocks_same_loss_and_grad(rng):
    """remat_blocks=True is numerically identical (forward AND gradients) —
    it only changes what's live between forward and backward."""
    import dataclasses

    from vla_touch_tpu.config import NoiseSchedulerConfig, rdt_tiny
    from vla_touch_tpu.models.rdt import runner as R

    m = rdt_tiny()
    cfg_plain = R.RDTRunnerConfig(model=m, noise=NoiseSchedulerConfig())
    cfg_remat = R.RDTRunnerConfig(
        model=dataclasses.replace(m, remat_blocks=True),
        noise=NoiseSchedulerConfig())
    params = R.init_rdt(cfg_plain, jax.random.PRNGKey(0))

    B, Ll = 2, 5
    batch = {
        "lang_tokens": jnp.asarray(
            rng.normal(size=(B, Ll, m.lang_token_dim)), jnp.float32),
        "lang_mask": jnp.ones((B, Ll), bool),
        "img_tokens": jnp.asarray(
            rng.normal(size=(B, m.img_cond_len, m.img_token_dim)),
            jnp.float32),
        "state_tokens": jnp.asarray(
            rng.normal(size=(B, 1, m.state_token_dim)), jnp.float32),
        "action_gt": jnp.asarray(
            rng.normal(size=(B, m.horizon, m.output_dim)), jnp.float32),
        "action_mask": jnp.ones((B, 1, m.output_dim), jnp.float32),
        "ctrl_freqs": jnp.full((B,), 10.0, jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    def loss_of(cfg):
        def f(p):
            return R.rdt_compute_loss(cfg, p, key, batch)
        return jax.value_and_grad(f)(params)

    l0, g0 = loss_of(cfg_plain)
    l1, g1 = loss_of(cfg_remat)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
