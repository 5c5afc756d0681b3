"""Eval-harness plumbing tests: RULER prompt construction protects the
question span from compression (reference: evaluate/eval_ruler.py:252-267)."""

import types

import pytest

transformers = pytest.importorskip("transformers")

from compactor_vllm_tpu.evaluate.eval_ruler import MATCH_ALL_TASKS, build_sequences
from tests.test_text_api import make_tokenizer


class FakeEngine:
    def __init__(self):
        self.tokenizer = make_tokenizer()


def test_build_sequences_protects_question_span():
    engine = FakeEngine()
    rows = [
        {
            "context": "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
            "question": "w3 w4",
            "answer_prefix": "w5",
            "answer": ["w3"],
            "max_new_tokens": 8,
        }
    ]
    seqs, metas = build_sequences(engine, rows, compression_ratio=0.5,
                                  protected_first=4)
    s = seqs[0]
    tail_len = len(engine.tokenizer("w5" + "w3 w4", add_special_tokens=False)["input_ids"])
    assert s.compression_params.protected_last_tokens == tail_len + 16
    assert s.compression_params.protected_first_tokens == 4
    assert s.compression_params.compression_ratio == 0.5
    assert s.sampling_params.max_new_tokens == 8
    assert s.sampling_params.temperature == 0.0
    # The prompt embeds the context and ends with the continued assistant
    # answer prefix (continue_final_message).
    text = engine.tokenizer.decode(s.prompt_token_ids)
    assert "w10" in text
    assert text.rstrip().endswith("w5")


def test_match_all_task_set_is_multi_needle_only():
    assert "niah_single_1" not in MATCH_ALL_TASKS
    assert "niah_multivalue" in MATCH_ALL_TASKS
