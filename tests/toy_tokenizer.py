"""A deterministic llama-like toy tokenizer for host-side pipeline tests.

Mimics the LlamaTokenizer properties the label-masking code relies on:
- prepends BOS (id 1) to every encode,
- `</s>` is a single token (id 2),
- additive over word boundaries (tok(a+" "+b) = tok(a)+tok(b) minus BOS),
- a trailing space yields one extra token (so the reference's hardcoded
  ``-2`` instruction offset — BOS + trailing-space token — is exact).

No claim of vocabulary parity with sentencepiece; it reproduces the
*structural* quirks that `preprocess_sep1/sep2` depend on.
"""

from __future__ import annotations

import re
from typing import Dict, List

_SPECIAL_RE = re.compile(r"(</s>|<s>)")
# Words never swallow a following special-token opener ('<' or '[').
_WORD_RE = re.compile(r"\[[^\]\s]+\]|<[^>\s]+>|[^\s<\[]+|[<\[]")


class ToyLlamaTokenizer:
    def __init__(self, model_max_length: int = 2048):
        self.model_max_length = model_max_length
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.pad_token_id = 0
        self.unk_token_id = 3
        self._vocab: Dict[str, int] = {"[PAD]": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
        self._inv: Dict[int, str] = {v: k for k, v in self._vocab.items()}

    def _id(self, word: str) -> int:
        if word not in self._vocab:
            idx = len(self._vocab)
            self._vocab[word] = idx
            self._inv[idx] = word
        return self._vocab[word]

    def add_tokens(self, tokens) -> int:
        added = 0
        for t in tokens:
            if t not in self._vocab:
                self._id(t)
                added += 1
        return added

    def convert_tokens_to_ids(self, token: str) -> int:
        return self._vocab.get(token, self.unk_token_id)

    def __len__(self) -> int:
        return len(self._vocab)

    def tokenize_words(self, text: str) -> List[str]:
        words: List[str] = []
        for part in _SPECIAL_RE.split(text):
            if part in ("</s>", "<s>"):
                words.append(part)
            else:
                words.extend(_WORD_RE.findall(part))
        if text.endswith(" ") and text.strip():
            words.append("▁")  # trailing-space marker token
        return words

    def __call__(self, text: str, max_length=None, truncation=False, **_):
        ids = [self.bos_token_id] + [self._id(w) for w in self.tokenize_words(text)]
        limit = max_length if max_length is not None else self.model_max_length
        if truncation and limit is not None:
            ids = ids[: int(limit)]
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens: bool = False) -> str:
        words = []
        for i in ids:
            tok = self._inv.get(int(i), "<unk>")
            if skip_special_tokens and tok in ("<s>", "</s>", "[PAD]"):
                continue
            words.append(tok)
        return " ".join(words)
