"""Tokenization.

Reference: src/tokenization.py (VLT5Tokenizer = T5 sentencepiece + 100
<vis_extra_id_*> tokens) and src/multitask.py:59-67 (BART gets the same
tokens via add_special_tokens at runtime + resize_token_embeddings).

Offline-first: tokenizers load from a LOCAL HF directory (no hub). When no
vocab files exist (e.g. CI), WhitespaceTokenizer provides the same interface
so the full pipeline stays testable.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence

VIS_EXTRA_IDS = 100


def vis_extra_tokens(n: int = VIS_EXTRA_IDS) -> List[str]:
    return [f"<vis_extra_id_{i}>" for i in range(n)]


class WhitespaceTokenizer:
    """Minimal offline tokenizer with the HF call surface the pipeline uses:
    encode / __call__ / batch_decode / decode / pad_token_id / vocab_size.
    Deterministic hashing vocabulary — NOT for real training, only for
    plumbing tests and synthetic runs."""

    def __init__(self, vocab_size: int = 50265, pad_token_id: int = 1,
                 eos_token_id: int = 2, bos_token_id: int = 0):
        self.vocab_size = vocab_size
        self.pad_token_id = pad_token_id
        self.eos_token_id = eos_token_id
        self.bos_token_id = bos_token_id
        self._special = {pad_token_id, eos_token_id, bos_token_id}
        self._cache: dict[int, str] = {}

    def _tok2id(self, tok: str) -> int:
        h = 5 + (hash(tok) % (self.vocab_size - 10))
        while h in self._special:
            h += 1
        self._cache[h] = tok
        return h

    def encode(self, text: str, max_length: Optional[int] = None,
               truncation: bool = False, add_special_tokens: bool = True,
               **kw) -> List[int]:
        ids = [self._tok2id(t) for t in text.strip().split()]
        if add_special_tokens:
            ids = ids + [self.eos_token_id]
        if truncation and max_length is not None:
            ids = ids[:max_length]
        return ids

    def __call__(self, text: str, add_special_tokens: bool = True, **kw):
        class R:
            pass

        r = R()
        r.input_ids = self.encode(text, add_special_tokens=add_special_tokens)
        return r

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        toks = []
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in self._special:
                continue
            toks.append(self._cache.get(i, f"<{i}>"))
        return " ".join(toks)

    def batch_decode(self, batch, skip_special_tokens: bool = True) -> List[str]:
        return [self.decode(ids, skip_special_tokens) for ids in batch]

    def convert_tokens_to_ids(self, tokens: List[str]) -> List[int]:
        return [self._tok2id(t) for t in tokens]


def get_tokenizer(backbone: str, local_path: Optional[str] = None,
                  do_lower_case: bool = False, use_vis_order_embedding: bool = True):
    """Build the task tokenizer.

    * t5 backbones → T5 tokenizer extended with <vis_extra_id_*>
      (the VLT5Tokenizer semantics; reference: tokenization.py:8-97)
    * bart backbones → BART tokenizer + the same tokens added as special
      tokens (reference: multitask.py:59-67)
    * no local vocab available → WhitespaceTokenizer fallback.

    Returns (tokenizer, num_added_tokens).
    """
    if local_path is None:
        return WhitespaceTokenizer(), 0
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(local_path, local_files_only=True)
    added = 0
    if "t5" in backbone:
        added = tok.add_special_tokens(
            {"additional_special_tokens": vis_extra_tokens()})
    elif "bart" in backbone and use_vis_order_embedding:
        extra = [f"<extra_id_{i}>" for i in range(99, -1, -1)] + \
                [f"<vis_extra_id_{i}>" for i in range(99, -1, -1)]
        added = tok.add_special_tokens({"additional_special_tokens": extra})
    return tok, added
