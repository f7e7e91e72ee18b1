"""Recognition metrics: CER/WER (Latin), AR/CR (Chinese), SER/WA
(ciphers), plus the reference's string standardization.

Ported behavior from reference evaluation.py:
- CER: Levenshtein(pred, gt)/len(gt) per line; corpus ("DAN") CER =
  sum(dist)/sum(len) after standardization (:296-334, 519-533)
- WER over space-split words (:357-412)
- AR = 1 - CER; CR = (len - del - sub)/len via edit-op backtrace
  (:242-292, 560-571)
- SER = symbol error rate, WA = positional word accuracy (:214-241)
- standardization: collapse whitespace, strip (:430-450)

Pure python/numpy (editdistance is not available in this image; the
Levenshtein DP below is vectorized over the shorter axis).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance between two sequences (native C++ when built,
    numpy DP otherwise)."""
    from ..runtime import native

    if native.available():
        return native.levenshtein(a, b)
    return _levenshtein_py(a, b)


def _levenshtein_py(a: Sequence, b: Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    if len(b) == 0:
        return len(a)
    ids: dict = {}
    enc = lambda x: ids.setdefault(x, len(ids))
    b_arr = np.asarray([enc(x) for x in b], np.int64)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i, ca in enumerate(a, start=1):
        cur = np.empty_like(prev)
        cur[0] = i
        sub = prev[:-1] + (b_arr != enc(ca))
        # cur[j] = min(prev[j] + 1, sub[j-1], cur[j-1] + 1) — the last term
        # needs a sequential pass; do the first two vectorized then fix up
        cur[1:] = np.minimum(prev[1:] + 1, sub)
        for j in range(1, len(b) + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[-1])


def edit_operations(pred: Sequence, gt: Sequence) -> Tuple[int, int, int]:
    """(n_sub, n_del, n_ins) wrt gt via DP backtrace (reference
    evaluation.py:242-284). 'del' = gt chars missing from pred.
    Uses the C++ runtime when built; numpy DP fallback below."""
    from ..runtime import native

    if native.available():
        return native.edit_ops(pred, gt)
    m, n = len(pred), len(gt)
    dp = np.zeros((m + 1, n + 1), np.int32)
    dp[:, 0] = np.arange(m + 1)
    dp[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            c = 0 if pred[i - 1] == gt[j - 1] else 1
            dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1, dp[i - 1, j - 1] + c)
    i, j = m, n
    subs = dels = ins = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + (pred[i - 1] != gt[j - 1]):
            subs += int(pred[i - 1] != gt[j - 1])
            i, j = i - 1, j - 1
        elif j > 0 and dp[i, j] == dp[i, j - 1] + 1:
            dels += 1  # gt char not produced
            j -= 1
        else:
            ins += 1  # extra pred char
            i -= 1
    return subs, dels, ins


def process_gt_string(s: str) -> str:
    """Exact port of reference evaluation.py:414-427 (BBC/ITV merges,
    dash/punct space collapsing, digit-comma rule, € spacing)."""
    s = s.replace("B B C", "BBC")
    s = s.replace("I T V", "ITV")
    s = s.replace(" -", "-")
    s = s.replace("- ", "-")
    s = s.replace(" -", "-")
    s = s.replace("- ", "-")
    s = s.replace(" .", ".")
    s = s.replace(" ,", ",")
    s = s.replace(" '", "'")
    s = s.replace("' ", "'")
    s = re.sub(r"(\d), (\d)", r"\1,\2", s)
    s = re.sub(r"(?<=\S)€(?=\S)", " € ", s)
    return s


def process_pred_string(s: str) -> str:
    """Exact port of reference evaluation.py:430-450 (adds double-space
    collapse, '..'→'.' unless '...', ',,'→',')."""
    s = s.replace("B B C", "BBC")
    s = s.replace("I T V", "ITV")
    s = s.replace("  ", " ")
    s = s.replace(" -", "-")
    s = s.replace("- ", "-")
    s = s.replace(" .", ".")
    s = s.replace(" ,", ",")
    s = re.sub(r"(\d), (\d)", r"\1,\2", s)
    s = s.replace(" '", "'")
    s = s.replace("' ", "'")
    s = re.sub(r"(?<=\S)€(?=\S)", " € ", s)
    s = re.sub(r"(?<!\.)\.\.(?!\.)", ".", s)
    s = s.replace(",,", ",")
    return s


# the corpus ("DAN") CER standardizes BOTH sides with process_pred_string
# (reference evaluation.py:521-524 applies process_pred_string to the gt
# string as well)
standardize = process_pred_string


def cer(pred: str, gt: str) -> float:
    gt = gt if len(gt) else " "
    return levenshtein(list(pred), list(gt)) / max(len(gt), 1)


def wer(pred: str, gt: str) -> float:
    p = pred.split(" ")
    g = gt.split(" ")
    return levenshtein(p, g) / max(len(g), 1)


def corpus_cer(preds: List[str], gts: List[str]) -> float:
    """'DAN-style' corpus CER: sum(dist)/sum(len) after standardization
    (reference evaluation.py:519-533)."""
    num = den = 0
    for p, g in zip(preds, gts):
        p, g = standardize(p), standardize(g)
        num += levenshtein(list(p), list(g))
        den += len(g)
    return num / max(den, 1)


def corpus_wer(preds: List[str], gts: List[str]) -> float:
    num = den = 0
    for p, g in zip(preds, gts):
        p, g = standardize(p), standardize(g)
        num += levenshtein(p.split(" "), g.split(" "))
        den += len(g.split(" "))
    return num / max(den, 1)


def ar_cr(pred_labels: List[Sequence[int]], gt_labels: List[Sequence[int]]):
    """CASIA metrics, aggregated as the reference does — a mean of
    per-line values (reference evaluation.py:560-571: AR_it = 1 - cer_it,
    CR_it = compute_CR, then np.mean over lines)."""
    ars, crs = [], []
    for p, g in zip(pred_labels, gt_labels):
        p, g = list(p), list(g)
        line_cer = levenshtein(p, g) / max(len(g), 1)
        ars.append(1.0 - line_cer)
        _, d, s = _ops_gt_side(p, g)
        crs.append((len(g) - d - s) / max(len(g), 1))
    n = max(len(ars), 1)
    return sum(ars) / n, sum(crs) / n


def _ops_gt_side(pred, gt):
    """(ins, del, sub) with del/sub counted on the gt side (reference
    compute_edit_operations(gt, pred), evaluation.py:242-284)."""
    s, d, i = edit_operations(list(pred), list(gt))
    return i, d, s


def ser_wa(pred_labels: List[Sequence[int]], gt_labels: List[Sequence[int]]):
    """Cipher metrics, per-line means like the reference
    (evaluation.py:573-582): SER = mean per-line symbol error rate;
    WA = mean per-line positional accuracy (compute_WA :214-241)."""
    sers, was = [], []
    for p, g in zip(pred_labels, gt_labels):
        p, g = list(p), list(g)
        sers.append(levenshtein(p, g) / max(len(g), 1))
        correct = sum(
            1 for k in range(min(len(p), len(g))) if p[k] == g[k]
        )
        was.append(correct / max(len(g), 1))
    n = max(len(sers), 1)
    return sum(sers) / n, sum(was) / n


def mean_cer(preds: List[str], gts: List[str]) -> float:
    """Per-line mean CER (the reference's primary CER report,
    evaluation.py:543-551 np.mean(CER_list))."""
    vals = [cer(p, g) for p, g in zip(preds, gts)]
    return sum(vals) / max(len(vals), 1)


def mean_wer(preds: List[str], gts: List[str]) -> float:
    vals = [wer(p, g) for p, g in zip(preds, gts)]
    return sum(vals) / max(len(vals), 1)
