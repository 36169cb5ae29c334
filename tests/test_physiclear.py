"""PhysiCLeAR tables, full-vocabulary QA generation, and golden-transcript
replay (reference: ``physiclear_constants.py``, ``generate_qa.py``,
``results/*.jsonl``)."""

import glob
import json
import os

import numpy as np
import pytest

from vla_touch_tpu.planning import physiclear as PC
from vla_touch_tpu.planning import qa as QA
from vla_touch_tpu.planning import transcripts as TR

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "octopi_results")


# ---------------------------------------------------------------- tables --

def test_tables_full_vocabulary():
    assert len(PC.OBJECTS_PART_NAMES) == 90
    assert len(PC.OPEN_SET_TEXTURES) == 90
    assert len(PC.HARDNESS_RANK_REGRESSION) == 90
    assert len(PC.ROUGHNESS_RANK_REGRESSION) == 90
    assert set(PC.RATINGS) == {"hardness", "roughness"}
    # Every rated object has a display name and a texture list.
    for name in PC.HARDNESS_RANK_REGRESSION:
        assert name in PC.OBJECTS_PART_NAMES
        assert isinstance(PC.OPEN_SET_TEXTURES[name], list)
        assert 0 <= PC.HARDNESS_RANK_REGRESSION[name] <= 10
        assert 0 <= PC.ROUGHNESS_RANK_REGRESSION[name] <= 10


def test_splits_disjoint_and_rated():
    tr, va, te = (set(PC.TRAIN_OBJECTS), set(PC.VAL_OBJECTS),
                  set(PC.TEST_OBJECTS))
    assert len(tr) == 78 and len(va) == 6 and len(te) == 6
    assert not (tr & va) and not (tr & te) and not (va & te)
    for name in tr | va | te:
        assert name in PC.HARDNESS_RANK_REGRESSION, name


def test_objects_with_parts_ids_resolve():
    for display, ids in PC.OBJECTS_WITH_PARTS.items():
        for sid in ids:
            assert sid in PC.OBJECTS_PART_NAMES, (display, sid)


def test_categorical_labels_boundaries():
    # reference semantics: boundary values fall in the LOWER bucket
    assert PC.get_categorical_labels(0.0) == 0
    assert PC.get_categorical_labels(2.5) == 0
    assert PC.get_categorical_labels(2.6) == 1
    assert PC.get_categorical_labels(5.0) == 1
    assert PC.get_categorical_labels(7.5) == 2
    assert PC.get_categorical_labels(10.0) == 3
    assert PC.get_categorical_labels(11.0) == 3
    assert PC.get_categorical_labels(0.0, bins=2) == 0
    assert PC.get_categorical_labels(5.0, bins=2) == 0
    assert PC.get_categorical_labels(5.1, bins=2) == 1


def test_property_order_ties_use_geq():
    # potato and egg share hardness 7.67; blanket is 2
    s = PC.property_order(
        ["physiclear_potato", "physiclear_egg", "physiclear_blanket"],
        ["1", "2", "3"], "hardness", decreasing=True)
    assert s in ("1 >= 2 > 3", "2 >= 1 > 3")
    inc = PC.property_order(
        ["physiclear_potato", "physiclear_blanket"], ["A", "B"],
        "hardness", decreasing=False)
    assert inc == "B > A"


def test_object_registry():
    reg = PC.object_registry("train", tactile_root="/data")
    assert len(reg) == 78
    o = reg["physiclear_potato"]
    assert o["tactile"].startswith("/data/physiclear_potato")
    assert o["hardness"] == pytest.approx(7.67)
    assert "rough" in o["textures"] or "hard" in o["textures"]


# ------------------------------------------------------- full-vocab QA ----

def _samples(split="train"):
    return {n: [f"/rec/{n}/sample_0", f"/rec/{n}/sample_1"]
            for n in PC.split_objects(split)}


def test_description_ranking_qa_schema():
    rows = QA.generate_physiclear_description_ranking_qa(
        _samples(), 40, split="train", seed=0)
    assert len(rows) == 40
    descr = order = multi = 0
    for r in rows:
        assert set(r) == {"info", "chat"}
        assert [m["role"] for m in r["chat"]] == ["user", "assistant"]
        q, a = r["chat"][0]["content"], r["chat"][1]["content"]
        n_markers = q.count(QA.TACT_MARKER)
        assert n_markers == len(r["info"]["tactile"]) >= 1
        assert all(t.endswith("/tactile") for t in r["info"]["tactile"])
        if r["info"]["get_order"]:
            order += 1
            assert "decreasing hardness" in a and "decreasing roughness" in a
        if r["info"]["get_description"]:
            descr += 1
        if r["info"]["num_objects"] > 1:
            multi += 1
        assert r["info"]["get_description"] or r["info"]["get_order"]
    assert descr and order and multi  # the mix is exercised


def test_description_answer_uses_open_set_textures():
    rows = QA.generate_physiclear_description_ranking_qa(
        _samples(), 10, split="train", seed=1)
    for r in rows:
        if not r["info"]["get_description"]:
            continue
        for key, obj in r["info"]["objects"].items():
            if isinstance(obj, str):
                words = set(PC.OPEN_SET_TEXTURES[obj])
                ans = r["chat"][1]["content"]
                # at least one adjective of the object appears in the answer
                assert any(w in ans for w in words), (obj, ans)


def test_parts_qa():
    rows = QA.generate_physiclear_description_ranking_qa(
        _samples(), 30, split="train", use_parts=True, seed=2)
    assert any("Part" in r["chat"][0]["content"] for r in rows)


def test_scenario_qa_schema():
    samples = {n: [f"/rec/{n}/s0"] for n in PC.HARDNESS_RANK_REGRESSION}
    rows = QA.generate_physiclear_scenario_qa(samples, 12, seed=0)
    assert rows
    for r in rows:
        roles = [m["role"] for m in r["chat"]]
        assert roles == ["user", "assistant", "user", "assistant",
                         "user", "assistant"]
        target = r["info"]["target"]
        sc = PC.SCENARIOS[r["info"]["scenario"]]
        assert target in sc["target_sample"]
        final = r["chat"][3]["content"]
        idx = sc["target_sample"].index(target)
        assert sc["all_candidate"][idx] in final
        assert final.startswith(("A)", "B)", "C)", "D)"))
        assert "Task: Determine which option" in r["chat"][2]["content"]
        # follow-up turn repeats the reasoning answer
        assert r["chat"][5]["content"] == final


def test_chat_rows_to_llm_rows():
    rows = QA.generate_physiclear_description_ranking_qa(
        _samples(), 5, split="train", seed=3)
    flat = QA.chat_rows_to_llm_rows(rows)
    for fr, r in zip(flat, rows):
        assert fr["question"].count("<tact>") == len(fr["tactile"])
        assert QA.TACT_MARKER not in fr["question"]
        assert fr["answer"] == r["chat"][1]["content"]


def test_val_test_split_generation():
    rows = QA.generate_physiclear_description_ranking_qa(
        _samples("test"), 8, split="test", seed=4)
    used = set()
    for r in rows:
        for v in r["info"]["objects"].values():
            used.add(v if isinstance(v, str) else tuple(v.values()))
    flat = set()
    for u in used:
        flat.update([u] if isinstance(u, str) else u)
    assert flat <= set(PC.TEST_OBJECTS) | set(PC.TRAIN_OBJECTS)
    # single-part picks come only from the test split
    singles = {v for r in rows for v in r["info"]["objects"].values()
               if isinstance(v, str)}
    assert singles <= set(PC.TEST_OBJECTS)


# ------------------------------------------------- golden transcripts -----

def _all_fixture_files():
    return sorted(glob.glob(os.path.join(FIXTURES, "**", "*.jsonl"),
                            recursive=True))


def test_fixture_transcripts_present_and_parse():
    files = _all_fixture_files()
    assert len(files) == 13  # 10 top-level + 3 no_touch (reference set)
    total = 0
    for path in files:
        trials = TR.parse_results_jsonl(path)
        assert trials, path
        total += len(trials)
        for t in trials:
            assert t["steps"] and all("assistant" in s for s in t["steps"])
    assert total > 50


def test_replay_golden_transcripts(tmp_path):
    """Every recorded trial replays through the live PlannerSession and the
    exported trial reproduces the recorded step structure exactly."""
    for path in _all_fixture_files():
        for trial in TR.parse_results_jsonl(path):
            out = TR.replay_trial(trial, results_dir=str(tmp_path))
            assert out["initial_prompt"] == trial["initial_prompt"]
            assert len(out["steps"]) == len(trial["steps"]), path
            for got, want in zip(out["steps"], trial["steps"]):
                assert got["assistant"] == want["assistant"]
                assert got.get("user_feedback") == want.get("user_feedback")


def test_trial_row_roundtrip_schema(tmp_path):
    trials = TR.parse_results_jsonl(_all_fixture_files()[0])
    out = [TR.replay_trial(t, results_dir=str(tmp_path)) for t in trials[:2]]
    p = TR.write_results_jsonl(out, str(tmp_path / "replay.jsonl"))
    back = TR.parse_results_jsonl(p)
    assert [t["steps"] for t in back] == [t["steps"] for t in out]
    row = json.loads(open(p).readline())
    assert set(row) >= {"trial_number", "start_time", "image",
                        "initial_prompt", "steps"}


def test_ranking_qa_single_object_pool():
    """A split with ONE object must not crash the part-group sampler
    (rng.choice(replace=False) from an empty 'others' pool) — the group
    degrades to a single part."""
    name = PC.split_objects("train")[0]
    samples = {name: [f"/rec/{name}/sample_0", f"/rec/{name}/sample_1"]}
    rows = QA.generate_physiclear_description_ranking_qa(
        samples, 10, split="train", seed=0, use_parts=True)
    assert len(rows) == 10
    for r in rows:
        assert r["chat"][0]["role"] == "user"
