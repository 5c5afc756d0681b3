"""Metric-function tests for the evaluation harness (reference scores these
via NVIDIA-RULER / THUDM-LongBench derived code, evaluate/*_metrics.py)."""

from compactor_vllm_tpu.evaluate.longbench_metrics import (
    classification_score,
    code_sim_score,
    count_score,
    qa_f1_score,
    qa_f1_zh_score,
    retrieval_score,
    rouge_score,
    score_prediction,
)
from compactor_vllm_tpu.evaluate.ruler_metrics import (
    string_match_all,
    string_match_part,
)


def test_string_match():
    assert string_match_part("the code is 1234.", ["1234"]) == 1.0
    assert string_match_part("nope", ["1234"]) == 0.0
    assert string_match_all("found 12 and 34", ["12", "34", "56"]) == 2 / 3


def test_qa_f1():
    assert qa_f1_score("The Eiffel Tower", "eiffel tower") == 1.0
    assert qa_f1_score("a cat", "the dog") == 0.0
    assert 0 < qa_f1_score("the red cat sat", "a red dog sat") < 1


def test_rouge_l():
    assert rouge_score("the cat sat on the mat", "the cat sat on the mat") == 1.0
    assert rouge_score("completely different words here", "nothing in common") == 0.0


def test_classification():
    assert classification_score("Label: sports", "sports", all_classes=["sports", "news"]) == 1.0
    # Two labels present, one is the reference -> half credit.
    assert classification_score("sports or news", "sports", all_classes=["sports", "news"]) == 0.5
    assert classification_score("none of these", "sports", all_classes=["sports", "news"]) == 0.0


def test_retrieval_and_count():
    assert retrieval_score("Paragraph 7", "Paragraph 7") == 1.0
    assert retrieval_score("I think 3", "Paragraph 7") == 0.0
    assert count_score("there are 12", "12") == 1.0
    assert count_score("maybe 11 or 12", "12") == 0.5


def test_zh_variants():
    assert qa_f1_zh_score("北京大学", "北京大学") == 1.0
    assert qa_f1_zh_score("上海", "北京") == 0.0


def test_code_sim():
    assert code_sim_score("    return x + 1", "return x + 1") > 0.9


def test_dispatch():
    assert score_prediction("hotpotqa", "Paris", ["paris", "lyon"]) == 1.0
