import numpy as np

from dtlr_tpu.eval.metrics import (
    ar_cr,
    cer,
    corpus_cer,
    edit_operations,
    levenshtein,
    ser_wa,
    standardize,
    wer,
)


def py_lev(a, b):
    # simple reference implementation
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        dp[i][0] = i
    for j in range(len(b) + 1):
        dp[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = min(
                dp[i - 1][j] + 1,
                dp[i][j - 1] + 1,
                dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return dp[-1][-1]


def test_levenshtein_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = "".join(rng.choice(list("abcde"), rng.integers(0, 15)))
        b = "".join(rng.choice(list("abcde"), rng.integers(0, 15)))
        assert levenshtein(list(a), list(b)) == py_lev(a, b)


def test_cer_wer_basic():
    assert cer("hello", "hello") == 0.0
    assert cer("hella", "hello") == 1 / 5
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the dog sat", "the cat sat") == 1 / 3


def test_standardize():
    # standardize is the reference's process_pred_string (the corpus CER
    # protocol applies it to both sides, evaluation.py:521-524)
    assert standardize("a  b") == "a b"
    assert standardize("B B C news") == "BBC news"
    assert standardize("end ..") == "end."
    assert standardize("1, 2") == "1,2"


def _reference_standardizers():
    """Extract process_gt_string / process_pred_string from the mounted
    reference source as golden oracles (evaluation.py:414-450). The
    module itself cannot be imported (CUDA/argparse at module scope), so
    pull just the two function defs out of the AST."""
    import ast
    import re as _re

    path = "/root/reference/evaluation.py"
    tree = ast.parse(open(path).read())
    ns = {"re": _re}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
            "process_gt_string", "process_pred_string",
        ):
            exec(compile(ast.Module([node], []), path, "exec"), ns)
    return ns["process_gt_string"], ns["process_pred_string"]


def test_standardization_matches_reference_oracle():
    import os

    if not os.path.exists("/root/reference/evaluation.py"):
        import pytest

        pytest.skip("reference tree not mounted")
    from dtlr_tpu.eval.metrics import process_gt_string, process_pred_string

    ref_gt, ref_pred = _reference_standardizers()
    cases = [
        "the B B C said - yes",
        "I T V  shows , often .",
        "wait .. no ... maybe ..",
        "5, 000 and 1, 2, 3",
        "don 't stop ' here",
        "price10€20 and 5 € 6",
        "a  b   c    d",
        "double ,, comma",
        "dash - ed and -start and end-",
    ]
    for s in cases:
        assert process_gt_string(s) == ref_gt(s), s
        assert process_pred_string(s) == ref_pred(s), s


def test_corpus_cer():
    preds = ["abc", "xyz"]
    gts = ["abc", "xyw"]
    # 1 error over 6 chars
    assert abs(corpus_cer(preds, gts) - 1 / 6) < 1e-9


def test_edit_operations():
    s, d, i = edit_operations(list("abc"), list("abc"))
    assert (s, d, i) == (0, 0, 0)
    s, d, i = edit_operations(list("axc"), list("abc"))
    assert (s, d, i) == (1, 0, 0)
    s, d, i = edit_operations(list("ac"), list("abc"))
    assert (s, d, i) == (0, 1, 0)  # one gt char missing
    s, d, i = edit_operations(list("abxc"), list("abc"))
    assert (s, d, i) == (0, 0, 1)  # one extra pred char


def test_ar_cr():
    ar, cr = ar_cr([[1, 2, 3]], [[1, 2, 3]])
    assert ar == 1.0 and cr == 1.0
    # one insertion: AR drops, CR unchanged
    ar, cr = ar_cr([[1, 2, 9, 3]], [[1, 2, 3]])
    assert abs(ar - 2 / 3) < 1e-9 and cr == 1.0


def test_ser_wa():
    ser, wa = ser_wa([[1, 2, 3]], [[1, 2, 4]])
    assert abs(ser - 1 / 3) < 1e-9
    assert abs(wa - 2 / 3) < 1e-9
