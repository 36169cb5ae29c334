"""Hub push (utils/hub.py) — network-gated end-of-training upload.

The reference pushes the output dir at the end of training
(`/root/reference/VLA/train/train.py:495-508`, repo creation `:122-124`).
No network exists here, so a fake ``huggingface_hub`` module is injected
and the call sequence + arguments are asserted.
"""

import os
import sys
import types

import pytest

from vla_touch_tpu.utils import hub


class _Repo:
    def __init__(self, repo_id):
        self.repo_id = repo_id


def _fake_hh(record):
    m = types.ModuleType("huggingface_hub")

    def create_repo(repo_id, exist_ok=False, token=None):
        record.append(("create_repo", repo_id, exist_ok, token))
        return _Repo("user/" + repo_id)

    def upload_folder(**kw):
        record.append(("upload_folder", kw))

    m.create_repo = create_repo
    m.upload_folder = upload_folder
    return m


def test_push_checkpoint_to_hub(tmp_path, monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "huggingface_hub", _fake_hh(record))
    out = tmp_path / "rdt-finetune"
    out.mkdir()
    (out / "checkpoint-100").mkdir()

    repo = hub.push_checkpoint_to_hub(str(out), token="tok",
                                      base_model="rdt-1b")

    # Repo id defaults to the output dir basename (reference :122-124)
    # and the resolved id from create_repo is what upload uses.
    assert record[0] == ("create_repo", "rdt-finetune", True, "tok")
    assert repo == "user/rdt-finetune"
    kind, kw = record[1]
    assert kind == "upload_folder"
    assert kw["repo_id"] == "user/rdt-finetune"
    assert kw["folder_path"] == str(out)
    assert kw["token"] == "tok"
    assert kw["commit_message"] == "End of training"
    assert "*.json" in kw["allow_patterns"]
    # The model card landed beside the checkpoint before upload.
    card = (out / "README.md").read_text()
    assert "user/rdt-finetune" in card and "rdt-1b" in card


def test_push_explicit_repo_id(tmp_path, monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "huggingface_hub", _fake_hh(record))
    repo = hub.push_checkpoint_to_hub(str(tmp_path), hub_model_id="org/x")
    assert record[0][1] == "org/x"
    assert repo == "user/org/x"


def test_missing_dependency_raises(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "huggingface_hub", None)
    with pytest.raises(RuntimeError, match="huggingface_hub"):
        hub.push_checkpoint_to_hub(str(tmp_path))


def test_model_card_from_scratch(tmp_path):
    path = hub.save_model_card("user/rdt", None, str(tmp_path))
    assert os.path.basename(path) == "README.md"
    assert "(from scratch)" in open(path).read()
