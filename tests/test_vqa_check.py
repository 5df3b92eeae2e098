"""VQA output-quality checker (utils/vqa_check.py) + the shipped specs.

Parity: the reference's tests/vqa_questions/*.yaml quality-check specs
(SURVEY §4) — here the schema AND an executable scorer are pinned.
"""

import os

import pytest

from cosmos_predict2_tpu.utils.vqa_check import (
    VQACheck,
    VQASpec,
    answer_hits,
    load_spec,
    run_spec,
)

SPEC_DIR = os.path.join(os.path.dirname(__file__), "vqa_questions")


@pytest.mark.level(0)
def test_answer_hits_containment():
    assert answer_hits("The video is Sharp and CLEAR throughout", ["clear"])
    assert answer_hits("clean,  stable footage", ["is stable", "stable"])
    assert not answer_hits("the clip is quite blurry", ["not blurry", "is clear"])
    # whitespace normalization on both sides
    assert answer_hits("a red   bus pulls away", ["red bus"])


@pytest.mark.level(0)
def test_load_shipped_specs():
    specs = []
    for sub in ("examples", "post_training"):
        d = os.path.join(SPEC_DIR, sub)
        for f in sorted(os.listdir(d)):
            specs.append(load_spec(os.path.join(d, f)))
    assert specs, "no shipped VQA specs found"
    for spec in specs:
        assert spec.must_pass_checks, spec.name
        assert spec.vqa_checks, spec.name
        for c in spec.must_pass_checks + spec.vqa_checks:
            assert c.question and c.contains, (spec.name, c)


@pytest.mark.level(0)
def test_run_spec_scoring_and_gates():
    spec = VQASpec(
        name="t",
        must_pass_checks=(VQACheck("blurry?", "no", ("not blurry",)),),
        vqa_checks=(
            VQACheck("what vehicle?", "bus", ("bus",)),
            VQACheck("what weather?", "snow", ("snow",)),
        ),
    )
    good = {"blurry?": "it is not blurry", "what vehicle?": "a red bus", "what weather?": "sunny"}
    rep = run_spec(spec, good.__getitem__, min_vqa_score=0.5)
    assert rep.passed and rep.vqa_hits == 1 and rep.vqa_total == 2

    # must-pass failure gates the whole clip regardless of vqa score
    bad = dict(good, **{"blurry?": "yes, very blurry"})
    rep = run_spec(spec, bad.__getitem__, min_vqa_score=0.0)
    assert not rep.passed and rep.must_pass_failures == ("blurry?",)

    # vqa score threshold
    rep = run_spec(spec, good.__getitem__, min_vqa_score=0.9)
    assert not rep.passed and rep.vqa_score == 0.5
