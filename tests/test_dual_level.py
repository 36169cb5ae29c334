"""Dual-level integration: the planning loop consumes tactile feedback from
the encoder service while the manipulation loop executes refined chunks —
the paper's headline architecture, end-to-end on tiny models."""

import json

import jax
import numpy as np
import pytest

from vla_touch_tpu.models.encoders.vit import ViTConfig
from vla_touch_tpu.planning import encoder as PE
from vla_touch_tpu.planning.planner import PlannerConfig, PlannerSession, TactileFeedback
from vla_touch_tpu.planning.serving import TactileDescriptionService

TINY_CLIP = ViTConfig(hidden_size=32, num_layers=1, num_heads=4, mlp_dim=64,
                      patch_size=16, image_size=32, use_layerscale=False,
                      quick_gelu=True, use_pre_norm=True, layernorm_eps=1e-5,
                      patch_bias=False)


def test_planner_with_tactile_service_feedback(tmp_path, rng):
    """Planner proposes actions; each action's feedback comes from the
    tactile description service over GelSight frames + the on-device force
    tracker (touch_vla.py feedback channels, end-to-end)."""
    from tests.test_marker_tracking import make_marker_frame
    from vla_touch_tpu.ops import marker_tracking as MT

    enc = PE.init_tactile_encoder(TINY_CLIP, jax.random.PRNGKey(0))
    service = TactileDescriptionService(enc, frame_size=32)

    tracker_cfg = MT.TrackerConfig()
    baseline = MT.calibrate(make_marker_frame(), tracker_cfg)

    # Scripted VLM: squeeze twice, then done.
    script = iter(["squeeze mango", "squeeze mango", "DONE"])
    cfg = PlannerConfig(experiment="mango", results_dir=str(tmp_path),
                        session_name="dual")
    fb = TactileFeedback()
    session = PlannerSession(cfg, lambda m: next(script), fb)

    shifts = iter([(0.5, 0.0), (3.0, 1.0)])

    def feedback_fn(action, turn):
        # "Execute" the squeeze: GelSight observes marker displacement.
        gel = make_marker_frame(next(shifts))
        force = MT.estimate_force(gel, baseline, tracker_cfg)
        video = np.stack([np.stack([gel] * 3, -1).astype(np.uint8)] * 4)
        desc = service.describe(video)
        return (fb.from_force(np.asarray(force["force"])) + " " +
                fb.from_properties(desc["hardness"], desc["roughness"]))

    out = session.run(feedback_fn)
    assert out["completed"]
    rows = [json.loads(l) for l in open(out["log_path"])]
    feedbacks = [r["content"] for r in rows if r["role"] == "user"]
    assert len(feedbacks) == 2
    assert all("Force measurement" in f and "Tactile properties" in f
               for f in feedbacks)
    # The second squeeze pressed harder -> larger measured force magnitude.
    import re

    mags = [float(re.search(r"magnitude=(\d+\.\d+)", f).group(1))
            for f in feedbacks]
    assert mags[1] > mags[0]


def test_service_guess_ask_reset(tmp_path, rng):
    """guess/ask endpoints (demo.py:181-231): the guess prompt carries the
    lettered candidates and the description; Answer-letter parsing and
    history reset work."""
    enc = PE.init_tactile_encoder(TINY_CLIP, jax.random.PRNGKey(0))
    prompts = []

    def llm_fn(prompt):
        prompts.append(prompt)
        if "Determine which option" in prompt:
            return "B is distinguishable. Answer: B) brick is the most " \
                   "likely option because it is hard."
        return "a generic reply"

    hist = str(tmp_path / "hist.jsonl")
    service = TactileDescriptionService(enc, llm_fn=llm_fn,
                                        history_path=hist, frame_size=32)
    video = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    out = service.guess(video, ["sponge", "brick"])
    assert out["option"] == "B"
    assert "A) sponge, B) brick" in prompts[-1]
    assert "Answer: <letter>" in prompts[-1]

    ans = service.ask("why?")
    assert ans["answer"] == "a generic reply"
    kinds = [json.loads(l)["kind"] for l in open(hist)]
    assert kinds == ["describe", "guess", "ask"]
    service.reset_history()
    assert open(hist).read() == ""

    # an invalid letter parses to None rather than a wrong option
    def bad_llm(prompt):
        return "no idea"

    service2 = TactileDescriptionService(enc, llm_fn=bad_llm, frame_size=32)
    assert service2.guess(video, ["sponge", "brick"])["option"] is None
