"""Metrics + harness tests with hand-computed goldens mirroring
eval_utils.py semantics."""

import json
import os

from leopard_tpu.evaluation import metrics as M
from leopard_tpu.evaluation.harness import (
    calculate_anls,
    get_instruction,
    group_acc,
    merge_all_bench_results,
    merge_shard_files,
    run_benchmark,
    score_sample,
)
from leopard_tpu.evaluation.loaders import load_benchmark, write_jsonl


def test_levenshtein():
    assert M.levenshtein("kitten", "sitting") == 3
    assert M.levenshtein("", "abc") == 3
    assert M.levenshtein("abc", "abc") == 0


def test_anls():
    assert M.anls("hello", "hello") == 1.0
    # 1 edit over 5 chars → 0.8 similarity
    assert abs(M.anls("hello", "hallo") - 0.8) < 1e-9
    # below threshold → 0
    assert M.anls("hello", "world") == 0.0


def test_anls_score_conventions():
    assert M.anls_score([], "") == 1.0
    assert M.anls_score([], "something") == 0.0
    assert M.anls_score(["Paris"], "") == 0.0
    assert M.anls_score(["Paris", "paris city"], "paris") == 1.0


def test_calculate_anls_threshold():
    assert calculate_anls(["hello"], "hallo") == 0.8
    assert calculate_anls(["hello"], "xyzzy") == 0.0
    assert calculate_anls([], "unanswerable") == 1.0


def test_parse_multi_choice():
    opts = {"A": "cat", "B": "dog", "C": "fish"}
    choices = ["A", "B", "C"]
    assert M.parse_multi_choice_response("The answer is (B)", choices, opts) == "B"
    assert M.parse_multi_choice_response("I think B ", choices, opts) == "B"
    # content match when >5 words and no letter
    assert (
        M.parse_multi_choice_response(
            "the animal shown in all images is a dog indeed", choices, opts
        )
        == "B"
    )
    # multiple letters → last mention wins
    assert M.parse_multi_choice_response("(A) no wait (C)", choices, opts) == "C"


def test_parse_open_response_numbers():
    preds = M.parse_open_response("The total is 1,234 dollars")
    assert 1234.0 in preds
    preds = M.parse_open_response("Answer: 3.14")
    assert 3.14 in preds


def test_eval_open():
    assert M.eval_open(["42"], M.parse_open_response("the answer is 42"))
    assert not M.eval_open(["42"], M.parse_open_response("no idea"))
    assert M.eval_open(["New York"], M.parse_open_response("It is New York City"))


def test_rouge_l():
    assert M.rouge_l_f("the cat sat", "the cat sat") == 1.0
    assert M.rouge_l_f("the cat sat", "dog") == 0.0
    # partial overlap
    f = M.rouge_l_f("the cat sat on the mat", "the cat on mat")
    assert 0.5 < f < 1.0


def test_score_sample_types():
    c, chosen, _ = score_sample("mmmu", "multiple-choice", "(A)", "A", ["x", "y"])
    assert c and chosen == "A"
    c, _, a = score_sample("docvqa", "open-ended", "Answer: hello", ["hello"])
    assert c and a == 1.0
    c, _, _ = score_sample("x", "captioning", "a cat", ["a cat"])
    assert c == 1.0


def test_get_instruction():
    assert "letter" in get_instruction("direct", "multiple-choice")
    assert "single word" in get_instruction("direct", "open-ended")
    assert get_instruction("none", "open-ended") == ""


def test_run_benchmark_and_group_acc(tmp_path):
    rows = [
        {"images_path": ["a.jpg"], "question": "<image> q1", "options": None,
         "answers": ["yes"], "ques_type": "open-ended"},
        {"images_path": ["a.jpg", "b.jpg"], "question": "<image><image> q2",
         "options": ["cat", "dog"], "answers": "B", "ques_type": "multiple-choice"},
    ]

    def fake_infer(row, instruction):
        return "yes" if row["ques_type"] == "open-ended" else "(B)"

    details = run_benchmark(rows, fake_infer, "docvqa", "direct")
    assert len(details) == 2
    assert all(d["correct"] == 1.0 for d in details)
    report = group_acc(details)
    assert report["Acc"] == 100.0
    assert report["Total"] == 2
    assert report["image type multi_img total"] == 1


def test_shard_merge_protocol(tmp_path):
    d1 = [{"correct": 1.0, "chosen": "x", "gold": "x", "raw": "x", "question": "q",
           "image_type": None, "multi_img": False, "correct_anls": 1.0}]
    d2 = [{"correct": 0.0, "chosen": "y", "gold": "x", "raw": "y", "question": "q",
           "image_type": None, "multi_img": True, "correct_anls": 0.0}]
    write_jsonl(os.path.join(tmp_path, "0_direct_docvqa_shard_details.jsonl"), d1)
    write_jsonl(os.path.join(tmp_path, "1_direct_docvqa_shard_details.jsonl"), d2)
    report = merge_shard_files(str(tmp_path), "docvqa", "direct")
    assert report["Acc"] == 50.0 and report["Acc_anls"] == 50.0
    merged = merge_all_bench_results(str(tmp_path))
    assert "docvqa_direct" in merged


def test_loader_prepared_file(tmp_path):
    rows = [{"images_path": ["x.jpg"], "question": "<image> hi", "options": None,
             "answers": ["a"], "ques_type": "open-ended"}]
    write_jsonl(os.path.join(tmp_path, "eval_textvqa.jsonl"), rows)
    got = load_benchmark("textvqa", str(tmp_path))
    assert got == rows


def test_loader_mpdocvqa_format(tmp_path):
    raw = {"data": [{"page_ids": ["p1", "p2"], "question": "what?", "answers": ["x"]}]}
    with open(os.path.join(tmp_path, "val.json"), "w") as f:
        json.dump(raw, f)
    rows = load_benchmark("mpdocvqa", str(tmp_path))
    assert len(rows) == 1
    assert rows[0]["question"].count("<image>") == 2
    assert len(rows[0]["images_path"]) == 2
    assert rows[0]["ques_type"] == "open-ended"
