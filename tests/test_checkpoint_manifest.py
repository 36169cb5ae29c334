"""Checkpoint-manifest validator: exact diffs against the vendored key
spaces, safetensors header reading, CLI exit codes."""

import json

import numpy as np
import pytest

from vla_touch_tpu.utils import checkpoint_manifest as CM


def test_exact_manifest_passes():
    man = CM.load_manifest("dinov2_small")
    diff = CM.diff_keys(man, "dinov2_small")
    assert diff.ok and not diff.extra


def test_optional_keys_may_be_absent():
    man = CM.load_manifest("dinov2_small")
    man.pop("embeddings.mask_token")     # converters skip it anyway
    assert CM.diff_keys(man, "dinov2_small").ok
    t5 = CM.load_manifest("t5_v1_1_xxl")
    t5.pop("encoder.embed_tokens.weight")
    assert CM.diff_keys(t5, "t5_v1_1_xxl").ok


def test_missing_extra_and_shape_mismatch_reported():
    man = CM.load_manifest("clip_vit_b16_text")
    gone = "text_model.encoder.layers.0.mlp.fc1.weight"
    man.pop(gone)
    man["not.a.real.key"] = (1, 2)
    k2 = "text_model.final_layer_norm.weight"
    man[k2] = (7,)
    diff = CM.diff_keys(man, "clip_vit_b16_text")
    assert not diff.ok
    assert diff.missing == [gone]
    assert diff.extra == ["not.a.real.key"]
    assert diff.shape_mismatch[0][0] == k2
    s = diff.summary("clip_vit_b16_text")
    assert "MISMATCH" in s and gone in s


def test_sibling_tower_extras_pass_but_foreign_extras_fail():
    """A FULL-model download carries its other tower (text beside vision) —
    benign, reported informationally.  Any other key superset is a wrong
    variant and must NOT exit 0 (a validator that ignores extras would
    bless e.g. a differently-architected checkpoint whose keys superset
    ours)."""
    vis = CM.load_manifest("clip_vit_b16_vision")
    full = dict(vis)
    for k, v in CM.load_manifest("clip_vit_b16_text").items():
        full[k] = v                       # the text tower of the same file
    full["visual_projection.weight"] = (512, 768)
    diff = CM.diff_keys(full, "clip_vit_b16_vision")
    assert diff.ok
    assert len(diff.sibling) == 197 and not diff.extra
    assert "sibling" in diff.summary("clip_vit_b16_vision")

    foreign = dict(vis)
    foreign["transformer.h.0.attn.c_attn.weight"] = (768, 2304)
    diff = CM.diff_keys(foreign, "clip_vit_b16_vision")
    assert not diff.ok
    assert diff.extra == ["transformer.h.0.attn.c_attn.weight"]


def test_safetensors_header_reading(tmp_path):
    st = pytest.importorskip("safetensors.numpy")
    a = {"x.weight": np.zeros((3, 4), np.float32),
         "y.bias": np.zeros((5,), np.float32)}
    st.save_file(a, str(tmp_path / "model-00001.safetensors"))
    b = {"z.weight": np.zeros((2, 2), np.float32)}
    st.save_file(b, str(tmp_path / "model-00002.safetensors"))
    shapes = CM.read_checkpoint_shapes(str(tmp_path))
    assert shapes == {"x.weight": (3, 4), "y.bias": (5,),
                      "z.weight": (2, 2)}


def test_torch_pickle_reading(tmp_path):
    import torch

    sd = {"a.weight": torch.zeros(2, 3), "b.bias": torch.zeros(4)}
    torch.save(sd, str(tmp_path / "model.pt"))
    shapes = CM.read_checkpoint_shapes(str(tmp_path / "model.pt"))
    assert shapes == {"a.weight": (2, 3), "b.bias": (4,)}


def test_cli_roundtrip(tmp_path, capsys):
    """Build a fake-but-exact dinov2-small checkpoint from the manifest and
    validate it through the CLI (headers only — zero tensors)."""
    st = pytest.importorskip("safetensors.numpy")
    man = CM.load_manifest("dinov2_small")
    st.save_file({k: np.zeros(v, np.float16) for k, v in man.items()},
                 str(tmp_path / "model.safetensors"))
    rc = CM.main(["dinov2_small", str(tmp_path)])
    assert rc == 0
    assert "OK" in capsys.readouterr().out
    # --list mode
    assert CM.main(["--list"]) == 0
    assert "rdt_1b" in capsys.readouterr().out


def test_every_known_manifest_loads():
    for name in CM.KNOWN:
        man = CM.load_manifest(name)
        assert len(man) > 100, name
        assert json.dumps(sorted(man)[:1])  # keys are plain strings
