"""CLIP byte-pair-encoding tokenizer.

Token-for-token compatible with the reference tokenizer
(``prototype/model/utils/text_utils/simple_tokenizer.py``) and its vocab
construction (256 byte units, 256 ``</w>`` word-final units, 48894 merges,
then ``<|mask|>``, ``<|startoftext|>``, ``<|endoftext|>`` => vocab 49409).

Unlike the reference — which tokenizes *inside* ``TextTransformer.forward``
(``text_transformer.py:211-222``), making the forward untraceable — this
tokenizer lives in the host-side data pipeline and emits fixed-shape
``(tokens[B, ctx], pad_mask[B, ctx])`` int32/float32 arrays that feed the
jitted model directly.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Iterable, List, Sequence, Tuple

import numpy as np
import regex as re

try:  # ftfy is optional; captions that are already clean unicode are unaffected
    import ftfy

    def _fix_text(s: str) -> str:
        return ftfy.fix_text(s)

except ImportError:  # pragma: no cover

    def _fix_text(s: str) -> str:
        return s


DEFAULT_BPE_PATH = os.path.join(os.path.dirname(__file__), "bpe_simple_vocab_16e6.txt.gz")

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"
MASK = "<|mask|>"

# Additive pad-mask convention shared with the reference
# (``text_transformer.py:182-194``): 0.0 for real tokens, -inf for padding.
PAD_MASK_VALUE = float("-inf")

_WORD_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)
_WS_PATTERN = re.compile(r"\s+")


@functools.lru_cache()
def byte_unicode_table() -> dict:
    """GPT-2 style reversible byte -> printable-unicode mapping."""
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    chars = printable[:]
    offset = 0
    for b in range(256):
        if b not in printable:
            printable.append(b)
            chars.append(256 + offset)
            offset += 1
    return {b: chr(c) for b, c in zip(printable, chars)}


def _clean(text: str) -> str:
    text = _fix_text(text)
    text = html.unescape(html.unescape(text))
    text = _WS_PATTERN.sub(" ", text.strip())
    return text.strip()


class ClipTokenizer:
    """BPE tokenizer with the reference vocabulary and merge table."""

    def __init__(self, bpe_path: str = DEFAULT_BPE_PATH):
        self.byte_encoder = byte_unicode_table()
        self.byte_decoder = {c: b for b, c in self.byte_encoder.items()}

        with gzip.open(bpe_path) as f:
            lines = f.read().decode("utf-8").split("\n")
        # Same slice as the reference (`simple_tokenizer.py:68`): skip the
        # header line, keep 48894 merges.
        merge_lines = lines[1 : 49152 - 256 - 2 + 1]
        merges: List[Tuple[str, str]] = [tuple(l.split()) for l in merge_lines]

        units = list(self.byte_encoder.values())
        vocab = units + [u + "</w>" for u in units]
        vocab += ["".join(m) for m in merges]
        vocab += [MASK, SOT, EOT]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.merge_rank = {m: i for i, m in enumerate(merges)}
        self._cache = {SOT: SOT, EOT: EOT, MASK: MASK}

        self.vocab_size = len(self.encoder)
        self.sot_token = self.encoder[SOT]
        self.eot_token = self.encoder[EOT]
        self.mask_token = self.encoder[MASK]

    # -- BPE ---------------------------------------------------------------
    def _bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        if len(parts) == 1:
            return token + "</w>"
        while len(parts) > 1:
            best_rank = None
            best_idx = -1
            for i in range(len(parts) - 1):
                rank = self.merge_rank.get((parts[i], parts[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank, best_idx = rank, i
            if best_rank is None:
                break
            merged = parts[best_idx] + parts[best_idx + 1]
            # Merge *every* adjacent occurrence of this pair in one pass,
            # matching the reference's inner loop semantics.
            first, second = parts[best_idx], parts[best_idx + 1]
            out: List[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == first and parts[i + 1] == second:
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        result = " ".join(parts)
        self._cache[token] = result
        return result

    # -- public API --------------------------------------------------------
    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _clean(text).lower()
        for word in _WORD_PATTERN.findall(text):
            word_bytes = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[unit] for unit in self._bpe(word_bytes).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(
        self,
        texts: str | Sequence[str],
        context_length: int = 77,
        return_lengths: bool = False,
    ):
        """Batch-tokenize to fixed-shape arrays.

        Returns ``(tokens, pad_mask)`` where ``tokens`` is int32 ``[B, ctx]``
        and ``pad_mask`` is float32 ``[B, ctx]`` with 0.0 on real tokens and
        -inf on padding — the additive convention of the reference
        (``text_transformer.py:182-194``).  Truncation keeps SOT, the first
        ``ctx-2`` body tokens, and EOT (``text_transformer.py:166-167``).
        """
        if isinstance(texts, str):
            texts = [texts]
        batch = len(texts)
        tokens = np.zeros((batch, context_length), dtype=np.int32)
        pad_mask = np.full((batch, context_length), PAD_MASK_VALUE, dtype=np.float32)
        lengths = np.ones(batch, dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_token] + self.encode(text) + [self.eot_token]
            if len(ids) > context_length:
                ids = [ids[0]] + ids[1 : context_length - 1] + [ids[-1]]
            n = len(ids)
            tokens[i, :n] = ids
            pad_mask[i, :n] = 0.0
            lengths[i] = n
        if return_lengths:
            return tokens, pad_mask, lengths
        return tokens, pad_mask


@functools.lru_cache()
def get_tokenizer(bpe_path: str = DEFAULT_BPE_PATH) -> ClipTokenizer:
    return ClipTokenizer(bpe_path)
