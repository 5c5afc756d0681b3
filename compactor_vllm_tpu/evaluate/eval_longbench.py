"""LongBench evaluation CLI (reference: evaluate/eval_longbench.py:1-124 +
longbench_config/*.json).

Runs THUDM/LongBench tasks through the engine with KV compression and scores
with the task-specific metrics (longbench_metrics.py). Per-task prompt
formats and generation lengths follow the LongBench repo configs, embedded
below (the reference ships them as JSON files).

Usage:
  python -m compactor_vllm_tpu.evaluate.eval_longbench \
      --model /path/to/model --tasks hotpotqa qasper --ratio 0.25
"""

from __future__ import annotations

import argparse
import json
import logging
import os

logger = logging.getLogger(__name__)

# (prompt_format, max_gen) per task — from THUDM/LongBench config.
TASK_CONFIG = {
    "narrativeqa": ("You are given a story, which can be either a novel or a movie script, and a question. Answer the question as concisely as you can, using a single phrase if possible. Do not provide any explanation.\n\nStory: {context}\n\nNow, answer the question based on the story as concisely as you can, using a single phrase if possible. Do not provide any explanation.\n\nQuestion: {input}\n\nAnswer:", 128),
    "qasper": ("You are given a scientific article and a question. Answer the question as concisely as you can, using a single phrase or sentence if possible. If the question cannot be answered based on the information in the article, write \"unanswerable\". If the question is a yes/no question, answer \"yes\", \"no\", or \"unanswerable\". Do not provide any explanation.\n\nArticle: {context}\n\n Answer the question based on the above article as concisely as you can, using a single phrase or sentence if possible. If the question cannot be answered based on the information in the article, write \"unanswerable\". If the question is a yes/no question, answer \"yes\", \"no\", or \"unanswerable\". Do not provide any explanation.\n\nQuestion: {input}\n\nAnswer:", 128),
    "multifieldqa_en": ("Read the following text and answer briefly.\n\n{context}\n\nNow, answer the following question based on the above text, only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:", 64),
    "hotpotqa": ("Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:", 32),
    "2wikimqa": ("Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:", 32),
    "musique": ("Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:", 32),
    "gov_report": ("You are given a report by a government agency. Write a one-page summary of the report.\n\nReport:\n{context}\n\nNow, write a one-page summary of the report.\n\nSummary:", 512),
    "qmsum": ("You are given a meeting transcript and a query containing a question or instruction. Answer the query in one or more sentences.\n\nTranscript:\n{context}\n\nNow, answer the query based on the above meeting transcript in one or more sentences.\n\nQuery: {input}\nAnswer:", 512),
    "multi_news": ("You are given several news passages. Write a one-page summary of all news. \n\nNews:\n{context}\n\nNow, write a one-page summary of all the news.\n\nSummary:", 512),
    "trec": ("Please determine the type of the question below. Here are some examples of questions.\n\n{context}\n{input}", 64),
    "triviaqa": ("Answer the question based on the given passage. Only give me the answer and do not output any other words. The following are some examples.\n\n{context}\n\n{input}", 32),
    "samsum": ("Summarize the dialogue into a few short sentences. The following are some examples.\n\n{context}\n\n{input}", 128),
    "passage_count": ("There are some paragraphs below sourced from Wikipedia. Some of them may be duplicates. Please carefully read these paragraphs and determine how many unique paragraphs there are after removing duplicates. In other words, how many non-repeating paragraphs are there in total?\n\n{context}\n\nPlease enter the final count of unique paragraphs after removing duplicates. The output format should only contain the number, such as 1, 2, 3, and so on.\n\nThe final answer is: ", 32),
    "passage_retrieval_en": ("Here are 30 paragraphs from Wikipedia, along with an abstract. Please determine which paragraph the abstract is from.\n\n{context}\n\nThe following is an abstract.\n\n{input}\n\nPlease enter the number of the paragraph that the abstract is from. The answer format must be like \"Paragraph 1\", \"Paragraph 2\", etc.\n\nThe answer is: ", 32),
    "lcc": ("Please complete the code given below. \n{context}Next line of code:\n", 64),
    "repobench-p": ("Please complete the code given below. \n{context}{input}Next line of code:\n", 64),
}


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--dataset", default="THUDM/LongBench")
    ap.add_argument("--tasks", nargs="+", default=list(TASK_CONFIG))
    ap.add_argument("--ratio", type=float, default=0.25)
    ap.add_argument("--method", default="compactor",
                    choices=["none", "compactor", "snapkv"])
    ap.add_argument("--chunk-size", type=int, default=512)
    ap.add_argument("--max-length", type=int, default=131072)
    ap.add_argument("--num-samples", type=int, default=0)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--max-num-seqs", type=int, default=16)
    ap.add_argument("--output", default="longbench_results")
    return ap.parse_args(argv)


def run(args, engine=None, load_dataset=None):
    """Evaluation loop; `engine`/`load_dataset` injectable so the offline
    end-to-end test (tests/test_eval_cli_e2e.py) drives the REAL loop with a
    tiny model and a synthetic dataset."""
    from compactor_vllm_tpu import (
        BatchCompressionParams,
        CompressionMethod,
        LLM,
        LLMConfig,
        SamplingParams,
        Sequence,
        SequenceCompressionParams,
    )
    from compactor_vllm_tpu.evaluate.longbench_metrics import score_prediction

    method = CompressionMethod(args.method)
    if engine is None:
        cfg = LLMConfig(
            model=args.model,
            max_model_len=args.max_length,
            max_num_seqs=args.max_num_seqs,
            tensor_parallel_size=args.tp,
        )
        engine = LLM(cfg)
    if load_dataset is None:
        from datasets import load_dataset
    tok = engine.tokenizer
    bp = BatchCompressionParams(compression_method=method, chunk_size=args.chunk_size)

    os.makedirs(args.output, exist_ok=True)
    summary = {"model": args.model, "ratio": args.ratio, "method": method.value,
               "tasks": {}}
    with open(os.path.join(args.output, "details.jsonl"), "w") as detf:
        for task in args.tasks:
            fmt, max_gen = TASK_CONFIG[task]
            ds = load_dataset(args.dataset, task, split="test")
            rows = list(ds)[: args.num_samples or None]
            seqs = []
            for row in rows:
                prompt = fmt.format(context=row["context"], input=row.get("input", ""))
                ids = tok(prompt, add_special_tokens=True)["input_ids"]
                # Truncate in the middle (LongBench convention) if too long.
                budget = args.max_length - max_gen - 64
                if len(ids) > budget:
                    half = budget // 2
                    ids = ids[:half] + ids[-half:]
                seqs.append(
                    Sequence(
                        prompt_token_ids=ids,
                        sampling_params=SamplingParams(0.0, max_gen),
                        compression_params=SequenceCompressionParams(
                            compression_ratio=args.ratio,
                            protected_first_tokens=16,
                            protected_last_tokens=64,
                        ),
                    )
                )
            outs = engine.generate_from_sequences(seqs, batch_compression=bp)
            total = 0.0
            for row, out in zip(rows, outs):
                pred = tok.decode(out.completion_token_ids, skip_special_tokens=True)
                s = score_prediction(
                    task, pred, row["answers"], all_classes=row.get("all_classes")
                )
                total += s
                detf.write(json.dumps({"task": task, "pred": pred, "score": s}) + "\n")
            summary["tasks"][task] = total / max(len(rows), 1) * 100.0
            logger.info("%s: %.2f", task, summary["tasks"][task])
    if summary["tasks"]:
        summary["average"] = sum(summary["tasks"].values()) / len(summary["tasks"])
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


def main(argv=None, engine=None, load_dataset=None):
    return run(parse_args(argv), engine=engine, load_dataset=load_dataset)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
