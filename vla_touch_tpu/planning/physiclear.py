"""PhysiCLeAR object->property tables and prompt data.

The reference ships these as a 711-line Python constants module
(``/root/reference/octopi/octopi_s/utils/physiclear_constants.py``); here
they are vendored as *data* (``planning/data/physiclear.json``) with a thin
loader, because they are a dataset contract (object names, human property
ratings, open-set texture vocabularies, train/val/test splits and the two
scenario prompt templates from ``generate_qa.py:173-199``), not code.

Exposes the same surface the reference constants module does:

- ``OBJECTS_WITH_PARTS``  display name -> [sample ids]
- ``TRAIN_OBJECTS`` / ``VAL_OBJECTS`` / ``TEST_OBJECTS`` split lists
- ``OBJECTS_PART_NAMES``  sample id -> display name
- ``OPEN_SET_TEXTURES``   sample id -> open-set texture adjective list
- ``HARDNESS_RANK_REGRESSION`` / ``ROUGHNESS_RANK_REGRESSION``
  sample id -> human 0..10 rating
- ``RATINGS``             {"hardness": ..., "roughness": ...}
- ``SCENARIOS``           scenario-QA prompt templates
- ``get_categorical_labels(label, bins)`` rating -> class bucket
  (``physiclear_constants.py:705-712`` semantics)
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data",
                          "physiclear.json")


@lru_cache(maxsize=1)
def _data() -> dict:
    with open(_DATA_PATH) as f:
        return json.load(f)


def __getattr__(name: str):
    keys = {
        "OBJECTS_WITH_PARTS": "objects_with_parts",
        "TRAIN_OBJECTS": "train_objects",
        "VAL_OBJECTS": "val_objects",
        "TEST_OBJECTS": "test_objects",
        "OBJECTS_PART_NAMES": "objects_part_names",
        "OPEN_SET_TEXTURES": "open_set_textures",
        "HARDNESS_RANK_REGRESSION": "hardness",
        "ROUGHNESS_RANK_REGRESSION": "roughness",
        "SCENARIOS": "scenarios",
    }
    if name == "RATINGS":
        return {"hardness": _data()["hardness"],
                "roughness": _data()["roughness"]}
    if name in keys:
        return _data()[keys[name]]
    raise AttributeError(name)


def get_categorical_labels(label: float, bins: int = 4) -> int:
    """Bucket a 0..10 human rating into ``bins`` classes; a rating exactly on
    a boundary belongs to the bucket below it (reference semantics)."""
    label = max(0, min(10, label))
    interval = 10 / bins
    category = label // interval
    if category > 0 and label % interval == 0:
        category -= 1
    return int(category)


def property_order(sample_ids, index_labels, prop: str,
                   decreasing: bool = True) -> str:
    """Render the reference's ranking-answer string: sample ids sorted by the
    human rating, joined with `` > `` (or `` >= `` between exact ties), each
    shown via its question-index label (``generate_qa.py:8-28``)."""
    ratings = _data()[prop]
    pairs = sorted(((i, ratings[s]) for i, s in enumerate(sample_ids)),
                   key=lambda x: x[1], reverse=decreasing)
    out = []
    for j, (idx, val) in enumerate(pairs):
        out.append(str(index_labels[idx]))
        if j != len(pairs) - 1:
            out.append(" >= " if val == pairs[j + 1][1] else " > ")
    return "".join(out)


def split_objects(split: str) -> list:
    return _data()[{"train": "train_objects", "val": "val_objects",
                    "test": "test_objects"}[split]]


def object_registry(split: str = "train", tactile_root: str = "") -> dict:
    """Full-vocabulary registry in the shape :mod:`vla_touch_tpu.planning.qa`
    consumes: name -> {tactile, hardness, roughness, textures, display}."""
    d = _data()
    out = {}
    for name in split_objects(split):
        out[name] = {
            "tactile": os.path.join(tactile_root, name, "tactile"),
            "hardness": float(d["hardness"][name]),
            "roughness": float(d["roughness"][name]),
            "textures": d["open_set_textures"].get(name, []),
            "display": d["objects_part_names"].get(name, name),
        }
    return out
