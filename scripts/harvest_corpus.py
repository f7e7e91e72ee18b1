"""Harvest natural-English text lines from installed-package docs.

The reference fits its char n-gram LM on wikitext (SURVEY §2.5;
reference ngram/clean_gen_ngram_preds.py) — no text assets ship with
this sandbox, so we substitute the English prose that IS in the image:
package METADATA long-descriptions, *.md/*.rst docs, and Python
docstrings under site-packages. Output: one cleaned line per row,
charset-filtered to the no-accent synthetic charset, split into
disjoint train (LM fit) / val (eval rendering) files.

Usage: python scripts/harvest_corpus.py out_prefix [max_lines]
  -> <out_prefix>_train.txt, <out_prefix>_val.txt
"""
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dtlr_tpu.data.charset import DEFAULT_CHARSET_NO_ACCENT, load_default_charset

ALLOWED = set(load_default_charset(DEFAULT_CHARSET_NO_ACCENT)) | {" "}


def site_packages_roots():
    import numpy

    roots = {os.path.dirname(os.path.dirname(numpy.__file__))}
    roots.add("/usr/lib/python3/dist-packages")
    return [r for r in roots if os.path.isdir(r)]


def iter_text_lines(roots):
    # 1. the stdlib help corpus: ~800 KB of reference-manual prose
    try:
        from pydoc_data import topics

        for doc in topics.topics.values():
            yield from doc.split("\n")
    except Exception:
        pass
    # 2. package docs / metadata long-descriptions
    pats = ("*.md", "*.rst", "METADATA", "*.txt")
    for root in roots:
        for pat in pats:
            for path in glob.iglob(os.path.join(root, "**", pat), recursive=True):
                try:
                    with open(path, errors="ignore") as fh:
                        yield from fh
                except OSError:
                    continue
    # 3. debian copyright prose (English legalese, lots of it)
    for path in glob.iglob("/usr/share/doc/*/copyright"):
        try:
            with open(path, errors="ignore") as fh:
                yield from fh
        except OSError:
            continue


def clean(line):
    line = re.sub(r"[`*_#>|\[\]{}<>]", " ", line)   # markdown/rst markup
    line = re.sub(r"https?://\S+", " ", line)
    line = re.sub(r"\s+", " ", line).strip()
    # keep spaces so word windows survive; the generator/label encoder
    # strips non-charset chars (incl. space) downstream
    return "".join(c for c in line if c in ALLOWED).strip()


def is_prose(line):
    words = [w for w in line.split(" ") if re.fullmatch(r"[A-Za-z]{2,}", w)]
    if len(words) < 5 or len(line) > 100:
        return False
    # mostly plain alphabetic words, not code/option/heading dumps
    return len(words) / max(len(line.split(" ")), 1) > 0.8


def main():
    out_prefix = sys.argv[1]
    max_lines = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    seen, lines = set(), []
    for raw in iter_text_lines(site_packages_roots()):
        ln = clean(raw)
        if ln and ln.lower() not in seen and is_prose(ln):
            seen.add(ln.lower())
            lines.append(ln)
            if len(lines) >= max_lines:
                break
    train, val = lines[::2], lines[1::2]
    for tag, part in (("train", train), ("val", val)):
        with open(f"{out_prefix}_{tag}.txt", "w") as fh:
            fh.write("\n".join(part) + "\n")
    print(f"harvested {len(lines)} lines -> {out_prefix}_{{train,val}}.txt "
          f"({len(train)}/{len(val)})")


if __name__ == "__main__":
    main()
