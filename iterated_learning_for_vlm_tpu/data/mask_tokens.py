"""BERT-style token masking for MLM-augmented variants.

Parity target: reference ``prototype/model/utils/text_utils/mask_tokens.py``
(``MaskTokens``): mask 15% of non-special tokens; of those 80% -> ``<|mask|>``,
10% -> random vocab token, 10% -> unchanged; labels are the original ids at
masked positions and -100 elsewhere.  Used by the DeCLIP/FILIP MLM branches
(SURVEY §2.1).  Pure numpy, host-side (runs in the data pipeline).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

IGNORE_INDEX = -100


def mask_tokens(
    tokens: np.ndarray,
    mask_token: int,
    special_tokens: Sequence[int],
    vocab_size: int,
    rng: np.random.Generator,
    mlm_probability: float = 0.15,
) -> Tuple[np.ndarray, np.ndarray]:
    """tokens: int array [..., L] (0 = padding). Returns (masked, labels)."""
    tokens = np.asarray(tokens)
    labels = tokens.copy()

    special = np.isin(tokens, list(special_tokens)) | (tokens == 0)
    prob = np.where(special, 0.0, mlm_probability)
    masked_idx = rng.random(tokens.shape) < prob
    labels[~masked_idx] = IGNORE_INDEX

    out = tokens.copy()
    roll = rng.random(tokens.shape)
    replace_mask = masked_idx & (roll < 0.8)
    replace_rand = masked_idx & (roll >= 0.8) & (roll < 0.9)
    out[replace_mask] = mask_token
    out[replace_rand] = rng.integers(0, vocab_size, size=int(replace_rand.sum()))
    return out, labels
