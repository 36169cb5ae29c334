"""TPU-native T5 encoder vs the HF ``T5EncoderModel`` oracle (random-init
config, no network), plus bucket-map exactness and the TP sharding spec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_touch_tpu.models.encoders import t5_native as T5


def _hf_pair(seed=0):
    transformers = pytest.importorskip("transformers")
    import torch

    torch.manual_seed(seed)
    hf_cfg = transformers.T5Config(
        vocab_size=96, d_model=48, d_kv=16, d_ff=80, num_layers=3,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False)
    ref = transformers.T5EncoderModel(hf_cfg).eval()
    cfg = T5.T5EncoderConfig(vocab_size=96, d_model=48, d_kv=16, d_ff=80,
                             num_layers=3, num_heads=4)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = T5.t5_from_hf(sd, num_layers=cfg.num_layers)
    return ref, cfg, params


def test_bucket_map_matches_hf():
    transformers = pytest.importorskip("transformers")
    import torch

    from transformers.models.t5.modeling_t5 import T5Attention

    q, k = 23, 23
    ctx = torch.arange(q)[:, None]
    mem = torch.arange(k)[None, :]
    want = T5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True, num_buckets=32,
        max_distance=128).numpy()
    got = np.asarray(T5.relative_position_buckets(q, k, 32, 128))
    np.testing.assert_array_equal(got, want)


def test_encoder_matches_hf_oracle(rng):
    import torch

    ref, cfg, params = _hf_pair()
    B, L = 2, 17
    ids = rng.integers(0, cfg.vocab_size, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, 11:] = 0
    with torch.no_grad():
        want = ref(torch.from_numpy(ids).long(),
                   attention_mask=torch.from_numpy(mask).long()
                   ).last_hidden_state.numpy()
    got = np.asarray(T5.t5_encode(cfg, params, jnp.asarray(ids),
                                  jnp.asarray(mask)))
    # padded positions attend differently in HF (they still produce
    # outputs); compare valid positions only
    np.testing.assert_allclose(got[0], want[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :11], want[1, :11], atol=2e-4,
                               rtol=1e-3)


def test_embedder_interface(rng):
    _, cfg, params = _hf_pair()

    class FakeTok:
        def __call__(self, text, truncation=True, max_length=1024):
            ids = [ord(c) % 90 + 3 for c in text][: max_length - 1] + [1]
            return {"input_ids": ids, "attention_mask": [1] * len(ids)}

    emb = T5.NativeT5Embedder(cfg, params, FakeTok(), dtype=jnp.float32)
    outs = emb.get_text_embeddings(["wipe the table", "pick up the mango"])
    assert len(outs) == 2
    assert outs[0].shape[1] == cfg.d_model
    assert outs[0].shape[0] == len("wipe the table") + 1
    assert np.isfinite(outs[0]).all()


def test_tp_spec_shapes():
    from jax.sharding import PartitionSpec as P

    _, cfg, params = _hf_pair()
    spec = T5.t5_tp_spec(params)
    assert spec["layers"][0]["q"] == P(None, "model")
    assert spec["layers"][0]["o"] == P("model", None)
    assert len(spec["layers"]) == cfg.num_layers
    # placing on an 8-device mesh works (heads=4 not divisible by 8 model
    # axis would fail; use 2x4 mesh with model=2)
    from vla_touch_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    from jax.sharding import NamedSharding

    placed = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, spec)
    assert placed["layers"][0]["q"].sharding.spec == P(None, "model")


def test_xxl_config_dims():
    cfg = T5.t5_v1_1_xxl()
    assert (cfg.d_model, cfg.num_heads, cfg.num_layers, cfg.d_ff) == \
        (4096, 64, 24, 10240)
