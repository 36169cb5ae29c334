"""HF-Hub upload of a finished training run (network-gated).

Mirrors the reference's end-of-training push (`VLA/train/train.py:495-508`
with repo creation at `:122-124` and the model card at `:47-70`): create
the repo if needed, write a model card beside the checkpoint, and upload
the output directory filtered to the checkpoint + metadata patterns.

`huggingface_hub` is imported lazily — this environment has no network
egress, so the dependency is optional and every entry raises a clear
error when it (or the network) is unavailable.  Tests inject a fake
module via ``sys.modules`` (tests/test_hub.py).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

# Upload only checkpoint + metadata artifacts, like the reference's
# allow_patterns (pytorch_model.bin, *.json, *.md) adapted to our orbax
# layout: the final `checkpoint-*` dirs hold msgpack/orbax files.
DEFAULT_ALLOW_PATTERNS = (
    "*.msgpack", "*.safetensors", "*.json", "*.md", "*.jsonl",
    "checkpoint-*/**",
)

_CARD_TEMPLATE = """---
license: mit
base_model: {base_model}
tags:
- robotics
- vla
- diffusion-policy
- jax
---

# RDT — {repo_id}

TPU-native RDT diffusion-policy checkpoint trained with vla_touch_tpu.

- base model: {base_model}
- framework: jax / flax (orbax checkpoints)

Load with `vla_touch_tpu.utils.checkpoint.load_checkpoint` or convert to
the reference torch layout with `vla_touch_tpu.utils.torch_port`.
"""


def save_model_card(repo_id: str, base_model: Optional[str],
                    repo_folder: str) -> str:
    """Write README.md model card into ``repo_folder`` (≙ reference
    ``save_model_card``, train/train.py:47-70). Returns the card path."""
    path = os.path.join(repo_folder, "README.md")
    with open(path, "w") as f:
        f.write(_CARD_TEMPLATE.format(
            repo_id=repo_id, base_model=base_model or "(from scratch)"))
    return path


def push_checkpoint_to_hub(output_dir: str,
                           hub_model_id: Optional[str] = None,
                           token: Optional[str] = None,
                           base_model: Optional[str] = None,
                           allow_patterns: Sequence[str] =
                           DEFAULT_ALLOW_PATTERNS,
                           commit_message: str = "End of training") -> str:
    """Create/ensure the hub repo and upload ``output_dir``.

    Repo id defaults to the output directory's basename, exactly like the
    reference (`train/train.py:122-124`).  Returns the resolved repo id.
    Raises ``RuntimeError`` if huggingface_hub is not installed.
    """
    try:
        import huggingface_hub as hh
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "--push_to_hub requires the huggingface_hub package and "
            "network access; neither is available in this environment"
        ) from e

    want = hub_model_id or os.path.basename(os.path.normpath(output_dir))
    repo_id = hh.create_repo(repo_id=want, exist_ok=True,
                             token=token).repo_id
    save_model_card(repo_id, base_model, output_dir)
    hh.upload_folder(repo_id=repo_id, folder_path=output_dir,
                     commit_message=commit_message, token=token,
                     allow_patterns=list(allow_patterns))
    return repo_id
