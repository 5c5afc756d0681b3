"""Text-level public API: generate() and generate_chat() with a real (tiny,
locally constructed) HF tokenizer — covers tokenization, chat templates,
continue_final_message, eos trimming, and detokenization
(reference: core/llm_engine.py:155-276)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
tokenizers = pytest.importorskip("tokenizers")

from compactor_vllm_tpu import LLMConfig, LLMEngine, SamplingParams
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params

CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "<|{{ message['role'] }}|> {{ message['content'] }} "
    "{% endfor %}"
    "{% if add_generation_prompt %}<|assistant|> {% endif %}"
)


def make_tokenizer(vocab_size=128):
    """Byte-ish word-level tokenizer over a tiny fixed vocab."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = [f"w{i}" for i in range(vocab_size - 8)]
    vocab = {w: i for i, w in enumerate(words)}
    for i, special in enumerate(
        ["<unk>", "<eos>", "<|user|>", "<|assistant|>", "<|system|>"]
    ):
        vocab[special] = len(words) + i
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="<eos>"
    )
    fast.chat_template = CHAT_TEMPLATE
    return fast


@pytest.fixture(scope="module")
def engine():
    spec = ModelSpec(
        model_type="llama", num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=16, hidden_size=64, intermediate_size=112, vocab_size=128,
    )
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    cfg = LLMConfig(
        max_num_seqs=4, max_model_len=128, kvcache_page_size=8,
        num_kv_pages=256, dtype="float32",
    )
    eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=make_tokenizer())
    # Engine resolves eos from the tokenizer when unset.
    assert eng.cfg.eos == eng.tokenizer.eos_token_id
    return eng


def test_generate_text_roundtrip(engine):
    outs = engine.generate(
        ["w1 w2 w3 w4 w5", "w9 w8 w7"],
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
    )
    for o in outs:
        assert isinstance(o.text, str)
        # decoded text must re-tokenize to the (eos-trimmed) completion ids
        ids = o.completion_token_ids
        if ids and ids[-1] == engine.cfg.eos:
            ids = ids[:-1]
        assert engine.tokenizer(o.text, add_special_tokens=False)[
            "input_ids"
        ] == ids


def test_generate_chat_template(engine):
    convs = [[
        {"role": "user", "content": "w1 w2 w3"},
    ]]
    outs = engine.generate_chat(
        convs, sampling_params=SamplingParams(temperature=0.0, max_new_tokens=4)
    )
    assert len(outs[0].completion_token_ids) == 4

    # continue_final_message: prompt must NOT append the generation prompt.
    tpl_cont = engine.tokenizer.apply_chat_template(
        convs[0] + [{"role": "assistant", "content": "w5"}],
        tokenize=False, continue_final_message=True,
    )
    assert not tpl_cont.rstrip().endswith("<|assistant|>") or "w5" in tpl_cont
    outs2 = engine.generate_chat(
        [convs[0] + [{"role": "assistant", "content": "w5"}]],
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=3),
        continue_final_message=True,
    )
    assert len(outs2[0].completion_token_ids) == 3


def test_generate_stops_at_eos(engine):
    # Force a vocab-sized model to emit eos by construction is fiddly; instead
    # check the engine trims a trailing eos from text output.
    outs = engine.generate(
        ["w1 w2"], sampling_params=SamplingParams(temperature=1.0, max_new_tokens=8)
    )
    ids = outs[0].completion_token_ids
    assert len(ids) <= 8
    if ids and ids[-1] == engine.cfg.eos:
        assert not outs[0].text.endswith("<eos>")
