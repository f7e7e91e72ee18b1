"""Font category/ability sampling for the synthetic Latin generator.

The reference samples fonts from a 5-category (SANS_SERIF, MONOSPACE,
SERIF, HANDWRITING, DISPLAY) x ability-bucket dictionary
(reference datasets/dictionnary_category_ability_paths.json, consumed by
sample_d_fonts at datasets/synthetic_lines_general.py:305-310): 50% of
draws come from HANDWRITING, the rest uniformly from the other four
categories; the ability bucket (letters only / +numbers / +accents /
+symbols) is chosen by the text mode.

The actual font files under resources/fonts are not shipped with the
reference repo, so this module:
- parses the reference JSON format when given (paths are filtered for
  existence under ``font_root``),
- otherwise categorizes the system fonts discovered by
  ``synthetic.discover_fonts`` with filename heuristics, so the sampling
  *mechanism* (category mix, ability buckets) is always exercised.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

CATEGORIES = ("SANS_SERIF", "MONOSPACE", "SERIF", "HANDWRITING", "DISPLAY")
NON_HANDWRITING = ("SANS_SERIF", "MONOSPACE", "SERIF", "DISPLAY")

# ability buckets of the reference dictionary (synthetic_lines_general.py
# random_text: accented+symbols for the <=5-word mode, accent+numbers for
# the <=30-word mode)
ABILITY_SYMBOLS = "fonts_letters_with_accent_and_symbols"
ABILITY_NUMBERS = "fonts_letters_with_accent_and_numbers"

_CATEGORY_HINTS = {
    "MONOSPACE": ("mono", "courier", "consol", "typewriter"),
    "SERIF": ("serif", "roman", "georgia", "garamond", "times"),
    "HANDWRITING": ("hand", "script", "cursive", "comic", "brush"),
    "DISPLAY": ("display", "black", "impact", "poster"),
}


def categorize_system_fonts(paths: Sequence[str]) -> Dict[str, List[str]]:
    """Filename-heuristic categorization; every category is guaranteed
    non-empty (falls back to the full list) so sampling never fails."""
    cats: Dict[str, List[str]] = {c: [] for c in CATEGORIES}
    for p in paths:
        base = os.path.basename(p).lower()
        hit = None
        for cat, hints in _CATEGORY_HINTS.items():
            if any(h in base for h in hints):
                hit = cat
                break
        cats[hit or "SANS_SERIF"].append(p)
    full = list(paths)
    for c in CATEGORIES:
        if not cats[c]:
            cats[c] = full
    return cats


class FontSampler:
    """sample(ability) -> font path, with the reference's 50%%-handwriting
    category mix (reference synthetic_lines_general.py:305-310)."""

    def __init__(
        self,
        bank: Dict[str, Dict[str, List[str]]],
        rng: Optional[np.random.Generator] = None,
    ):
        self.bank = bank
        self.rng = rng or np.random.default_rng(0)

    @classmethod
    def from_reference_json(
        cls,
        json_path: str,
        font_root: str = "",
        fallback_fonts: Optional[Sequence[str]] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> "FontSampler":
        """Parse the reference dictionary format. Paths are joined onto
        ``font_root`` and dropped if missing; empty buckets fall back to
        categorized system fonts."""
        with open(json_path) as f:
            raw = json.load(f)
        fallback = categorize_system_fonts(
            list(fallback_fonts) if fallback_fonts else _system_fonts()
        )
        bank: Dict[str, Dict[str, List[str]]] = {}
        abilities = set()
        for cat in raw:
            abilities.update(raw[cat])
        for cat in CATEGORIES:
            bank[cat] = {}
            for ab in abilities:
                paths = [
                    os.path.join(font_root, p.lstrip("/"))
                    for p in raw.get(cat, {}).get(ab, [])
                ]
                paths = [p for p in paths if os.path.exists(p)]
                bank[cat][ab] = paths or list(fallback[cat])
        return cls(bank, rng)

    @classmethod
    def from_system_fonts(
        cls,
        fonts: Optional[Sequence[str]] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> "FontSampler":
        cats = categorize_system_fonts(list(fonts) if fonts else _system_fonts())
        bank = {
            c: {ABILITY_SYMBOLS: cats[c], ABILITY_NUMBERS: cats[c]}
            for c in CATEGORIES
        }
        return cls(bank, rng)

    def bucket(self, ability: str) -> List[str]:
        """The reference's sample_d_fonts: category first, then bucket."""
        if self.rng.integers(1, 3) == 1:
            cat = "HANDWRITING"
        else:
            cat = NON_HANDWRITING[self.rng.integers(0, len(NON_HANDWRITING))]
        d = self.bank[cat]
        if ability in d and d[ability]:
            return d[ability]
        # nearest non-empty bucket
        for v in d.values():
            if v:
                return v
        raise KeyError(f"no fonts for category {cat}")

    def sample(self, ability: str = ABILITY_SYMBOLS) -> str:
        b = self.bucket(ability)
        return b[self.rng.integers(0, len(b))]


def _system_fonts() -> List[str]:
    from .synthetic import discover_fonts

    return discover_fonts()
