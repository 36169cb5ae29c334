"""QA generation from tactile property annotations.

Equivalent of ``/root/reference/octopi/octopi_s/generate_qa.py``
(``generate_description_ranking_qa`` :31, ``generate_scenario_qa`` :172):
builds description / ranking / scenario question-answer rows with ``<tact>``
placeholders for the tactile-LLM training set, from per-object
hardness/roughness annotations (the PhysiCLeAR-style lookup tables,
``physiclear_constants.py``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

# Property vocabulary (compact equivalent of the physiclear prompt tables):
HARDNESS_WORDS = [
    (2.0, "very soft"), (4.0, "soft"), (6.0, "moderately hard"),
    (8.0, "hard"), (10.1, "very hard"),
]
ROUGHNESS_WORDS = [
    (2.0, "very smooth"), (4.0, "smooth"), (6.0, "moderately rough"),
    (8.0, "rough"), (10.1, "very rough"),
]


def property_word(value: float, table) -> str:
    for cut, word in table:
        if value < cut:
            return word
    return table[-1][1]


def describe(hardness: float, roughness: float) -> str:
    return (f"This surface feels {property_word(hardness, HARDNESS_WORDS)} "
            f"and {property_word(roughness, ROUGHNESS_WORDS)}.")


def generate_description_qa(objects: dict, split: str = "train") -> list:
    """objects: {name: {"tactile": dir, "hardness": h, "roughness": r}}."""
    rows = []
    for name, o in objects.items():
        rows.append({
            "split": split,
            "question": ("Describe the tactile properties of the object in "
                         "this touch recording: <tact>"),
            "tactile": [o["tactile"]],
            "answer": describe(o["hardness"], o["roughness"]),
            "object": name,
        })
    return rows


def generate_ranking_qa(objects: dict, prop: str = "hardness",
                        group_size: int = 3, n_groups: int = 10,
                        split: str = "train", seed: int = 0) -> list:
    """Rank `group_size` objects by a property (ascending)."""
    rng = np.random.default_rng(seed)
    names = list(objects)
    rows = []
    for _ in range(n_groups):
        group = list(rng.choice(names, size=min(group_size, len(names)),
                                replace=False))
        ranked = sorted(group, key=lambda n: objects[n][prop])
        placeholders = ", ".join(f"object {chr(65 + i)}: <tact>"
                                 for i in range(len(group)))
        rows.append({
            "split": split,
            "question": (f"Rank these objects from least to most {prop}. "
                         f"{placeholders}"),
            "tactile": [objects[n]["tactile"] for n in group],
            "answer": " < ".join(
                f"object {chr(65 + group.index(n))}" for n in ranked),
            "objects": group,
            "ranking": ranked,
            "property": prop,
        })
    return rows


def generate_scenario_qa(objects: dict, scenarios: Optional[Sequence[dict]]
                         = None, split: str = "train") -> list:
    """Scenario reasoning: pick the right object for a requirement
    (generate_qa.py:172+)."""
    scenarios = scenarios or [
        {"need": "a soft object to cushion a fragile item",
         "prop": "hardness", "pick": "min"},
        {"need": "a rough object to scrub a dirty pan",
         "prop": "roughness", "pick": "max"},
        {"need": "a hard object to press a stuck button",
         "prop": "hardness", "pick": "max"},
    ]
    names = list(objects)
    rows = []
    for sc in scenarios:
        vals = [objects[n][sc["prop"]] for n in names]
        best = names[int(np.argmax(vals) if sc["pick"] == "max"
                         else np.argmin(vals))]
        placeholders = ", ".join(f"object {chr(65 + i)}: <tact>"
                                 for i in range(len(names)))
        rows.append({
            "split": split,
            "question": (f"You need {sc['need']}. Based on these touch "
                         f"recordings, which object should you use? "
                         f"{placeholders}"),
            "tactile": [objects[n]["tactile"] for n in names],
            "answer": f"object {chr(65 + names.index(best))}",
            "objects": names,
            "target": best,
        })
    return rows


def write_qa_file(rows: list, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(rows, f, indent=2)
    return path
