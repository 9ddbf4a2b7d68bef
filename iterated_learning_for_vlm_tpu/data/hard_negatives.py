"""POS-tag-based hard-negative caption generation.

Parity target: reference ``swap_elements``
(``prototype/data/datasets/clip_dataset_wsd.py:307-351``): tag the caption
with NLTK, pick a POS family (noun/verb/adjective/adverb/preposition), and
swap two random words of that family to create a compositional hard negative.

NLTK is optional; without it (or without its tagger data) captions pass
through unchanged, mirroring the reference's throwless philosophy.
"""
from __future__ import annotations

import random
from typing import List, Optional

try:
    import nltk

    def _pos_tag(words: List[str]):
        return nltk.pos_tag(words)

    _HAVE_NLTK = True
except ImportError:  # pragma: no cover
    _HAVE_NLTK = False

# POS families eligible for swapping (reference element types NN/VB/JJ/...).
_FAMILIES = ("NN", "VB", "JJ", "RB", "IN")


def swap_elements(text: str, rng: Optional[random.Random] = None) -> str:
    """Swap two same-POS-family words; identity if impossible."""
    rng = rng or random
    words = text.split()
    if len(words) < 2 or not _HAVE_NLTK:
        return text
    try:
        tags = _pos_tag(words)
    except LookupError:  # tagger data unavailable
        return text

    families = [f for f in _FAMILIES]
    rng.shuffle(families)
    for fam in families:
        idxs = [i for i, (_, tag) in enumerate(tags) if tag.startswith(fam)]
        if len(idxs) >= 2:
            i, j = rng.sample(idxs, 2)
            words[i], words[j] = words[j], words[i]
            return " ".join(words)
    return text
