"""The example walkthroughs stay runnable (smoke, reduced epochs)."""

import json
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.slow
def test_planning_pipeline_example(tmp_path):
    sys.path.insert(0, EXAMPLES)
    try:
        import planning_pipeline
    finally:
        sys.path.pop(0)

    wd = str(tmp_path / "demo")
    planning_pipeline.main(wd, epochs=2)
    out = os.path.join(wd, "llm_out")
    preds = json.load(open(os.path.join(out, "predictions.json")))
    assert len(preds) == 1 and isinstance(preds[0]["prediction"], str)
    rec = json.load(open(os.path.join(out, "reason",
                                      "sorting_sponge.json")))[0]
    assert rec["final_true_answer"] == "A"
    assert rec["reasoning_sampling_num"] == 4
    assert os.path.exists(os.path.join(out, "llm_training.jsonl"))
