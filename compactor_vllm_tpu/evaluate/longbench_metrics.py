"""LongBench scoring (reference: evaluate/longbench_metrics.py:1-176).

Self-contained reimplementations of the THUDM/LongBench metrics: token-F1 for
QA, LCS-based ROUGE-L for summarization, exact classification/retrieval/count
scores, edit-distance similarity for code, and character-level variants for
the Chinese tasks (no external tokenizer dependencies).
"""

from __future__ import annotations

import re
import string
from collections import Counter
from difflib import SequenceMatcher


def _normalize(s: str) -> str:
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def _normalize_zh(s: str) -> str:
    s = s.lower()
    cn_punct = "！？｡。＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣、〃》「」『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—''‛""„‟…‧﹏."
    s = "".join(ch for ch in s if ch not in set(string.punctuation + cn_punct))
    return "".join(s.split())


def _f1(pred_tokens, ref_tokens) -> float:
    common = Counter(pred_tokens) & Counter(ref_tokens)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred_tokens)
    recall = num_same / len(ref_tokens)
    return 2 * precision * recall / (precision + recall)


def qa_f1_score(pred: str, ref: str, **kw) -> float:
    p = _normalize(pred).split()
    r = _normalize(ref).split()
    if not p or not r:
        return 0.0
    return _f1(p, r)


def qa_f1_zh_score(pred: str, ref: str, **kw) -> float:
    p = list(_normalize_zh(pred))
    r = list(_normalize_zh(ref))
    if not p or not r:
        return 0.0
    return _f1(p, r)


def _lcs_len(a, b) -> int:
    # O(len(a)*len(b)) DP with rolling row.
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def rouge_score(pred: str, ref: str, **kw) -> float:
    """ROUGE-L F1 over whitespace tokens."""
    p = _normalize(pred).split()[:512]
    r = _normalize(ref).split()[:512]
    if not p or not r:
        return 0.0
    lcs = _lcs_len(p, r)
    if lcs == 0:
        return 0.0
    prec, rec = lcs / len(p), lcs / len(r)
    return 2 * prec * rec / (prec + rec)


def rouge_zh_score(pred: str, ref: str, **kw) -> float:
    p = list(_normalize_zh(pred))[:512]
    r = list(_normalize_zh(ref))[:512]
    if not p or not r:
        return 0.0
    lcs = _lcs_len(p, r)
    if lcs == 0:
        return 0.0
    prec, rec = lcs / len(p), lcs / len(r)
    return 2 * prec * rec / (prec + rec)


def classification_score(pred: str, ref: str, all_classes=None, **kw) -> float:
    """Match the reference label; penalize predictions containing several
    labels (LongBench rule)."""
    em_match_list = []
    for c in all_classes or []:
        if c in pred:
            em_match_list.append(c)
    for match in list(em_match_list):
        if match != ref and ref in match:
            em_match_list.remove(match)
    if ref in em_match_list:
        return 1.0 / len(em_match_list)
    return 0.0


def retrieval_score(pred: str, ref: str, **kw) -> float:
    m = re.search(r"Paragraph (\d+)", ref)
    if not m:
        return 0.0
    gt = m.group(1)
    nums = re.findall(r"\d+", pred)
    return float(sum(1 for n in nums if n == gt) / max(len(nums), 1)) if nums else 0.0


def retrieval_zh_score(pred: str, ref: str, **kw) -> float:
    m = re.search(r"段落(\d+)", ref)
    if not m:
        return 0.0
    gt = m.group(1)
    nums = re.findall(r"\d+", pred)
    return float(sum(1 for n in nums if n == gt) / max(len(nums), 1)) if nums else 0.0


def count_score(pred: str, ref: str, **kw) -> float:
    nums = re.findall(r"\d+", pred)
    return float(sum(1 for n in nums if n == str(ref)) / max(len(nums), 1)) if nums else 0.0


def code_sim_score(pred: str, ref: str, **kw) -> float:
    all_lines = pred.lstrip("\n").split("\n")
    line = ""
    for l in all_lines:
        if ("`" not in l) and ("#" not in l) and ("//" not in l):
            line = l
            break
    return SequenceMatcher(None, line.strip(), ref.strip()).ratio()


DATASET_METRICS = {
    "narrativeqa": qa_f1_score,
    "qasper": qa_f1_score,
    "multifieldqa_en": qa_f1_score,
    "multifieldqa_zh": qa_f1_zh_score,
    "hotpotqa": qa_f1_score,
    "2wikimqa": qa_f1_score,
    "musique": qa_f1_score,
    "dureader": rouge_zh_score,
    "gov_report": rouge_score,
    "qmsum": rouge_score,
    "multi_news": rouge_score,
    "vcsum": rouge_zh_score,
    "trec": classification_score,
    "triviaqa": qa_f1_score,
    "samsum": rouge_score,
    "lsht": classification_score,
    "passage_retrieval_en": retrieval_score,
    "passage_count": count_score,
    "passage_retrieval_zh": retrieval_zh_score,
    "lcc": code_sim_score,
    "repobench-p": code_sim_score,
}


def score_prediction(dataset: str, pred: str, refs: list[str], all_classes=None) -> float:
    metric = DATASET_METRICS[dataset]
    return max(
        metric(pred, str(ref), all_classes=all_classes) for ref in refs
    )
