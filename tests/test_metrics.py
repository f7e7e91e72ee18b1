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
    assert standardize("  a   b\tc ") == "a b c"


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
