"""VQA-metric parity: our normalization/accuracy vs the reference
m4c_evaluator (loaded as an oracle from the read-only reference snapshot when
present; otherwise fixed golden values)."""

import importlib.util
import os

import pytest

from leopard_tpu.evaluation.vqa_metrics import (
    bleu4,
    stvqa_accuracy,
    stvqa_anls,
    textvqa_accuracy,
    vqa_normalize,
)

_REF = "/root/reference/evaluations/models/m4c_evaluator.py"


def _load_ref():
    if not os.path.exists(_REF):
        return None
    try:
        spec = importlib.util.spec_from_file_location("m4c_ref", _REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


CASES = [
    "The answer is 3,200 dollars.",
    "a Dog; maybe two?",
    "dont know",
    "Twenty-one",
    "he's got ten apples!",
    "none",
    "hello-world (test) [x]",
    "1.5 million",
]


def test_vqa_normalize_matches_reference():
    ref = _load_ref()
    if ref is None:
        # golden fallback (computed once against the oracle)
        assert vqa_normalize("The answer is 3,200 dollars.") == "answer is 3200 dollars"
        assert vqa_normalize("dont know") == "don't know"
        return
    proc = ref.EvalAIAnswerProcessor()
    for c in CASES:
        assert vqa_normalize(c) == proc(c), c


def test_textvqa_soft_accuracy_matches_reference():
    rows = [
        {
            "pred_answer": "dog",
            "gt_answers": ["dog"] * 6 + ["cat"] * 3 + ["bird"],
        },
        {
            "pred_answer": "Cat",
            "gt_answers": ["dog"] * 6 + ["cat"] * 3 + ["bird"],
        },
        {"pred_answer": "zebra", "gt_answers": ["horse"] * 10},
    ]
    ours = textvqa_accuracy(rows)
    ref = _load_ref()
    if ref is not None:
        want = ref.TextVQAAccuracyEvaluator().eval_pred_list(rows)
        assert abs(ours - want) < 1e-9
    # dog: every annotator sees ≥3 others matching → 1.0
    # cat: 3 matching → each non-cat annotator sees 3/3=1.0, each cat sees 2/3
    assert 0.0 < ours < 1.0


def test_stvqa_accuracy_and_anls():
    rows = [
        {"pred_answer": "the dog", "gt_answers": ["Dog", "cat"]},
        {"pred_answer": "elephant", "gt_answers": ["cat"]},
    ]
    assert stvqa_accuracy(rows) == 0.5
    rows_anls = [
        {"pred_answer": "paris", "gt_answers": ["Paris"]},
        {"pred_answer": "pariss", "gt_answers": ["paris"]},
        {"pred_answer": "xyz", "gt_answers": ["paris"]},
    ]
    ref = _load_ref()
    ours = stvqa_anls(rows_anls)
    if ref is not None:
        try:
            want = ref.STVQAANLSEvaluator().eval_pred_list(rows_anls)
            assert abs(ours - want) < 1e-9
        except ImportError:
            pass  # reference needs editdistance pip package
    assert ours == pytest.approx((1.0 + (1 - 1 / 6) + 0.0) / 3)


def test_bleu4_sane():
    rows = [
        {
            "pred_answer": "a man riding a horse on the beach",
            "gt_answers": [
                "a man riding a horse on the beach",
                "a person rides a horse near the ocean",
            ],
        }
    ]
    assert bleu4(rows) == pytest.approx(1.0)
    rows[0]["pred_answer"] = "completely different words entirely here now"
    assert bleu4(rows) == 0.0
