"""Scripted FAKE transformers module for tests (real dependency absent):
just AutoTokenizer.from_pretrained -> a callable producing the padded
numpy encodings functions/onnx_classify.py consumes. Padding is
to-longest-in-batch, the exact behavior the plugin's batch-inference
design relies on."""

from __future__ import annotations

import numpy as np


class _Tokenizer:
    def __call__(self, texts, return_tensors="np", padding=True,
                 truncation=True, max_length=512):
        assert return_tensors == "np" and padding
        seqs = []
        for t in texts:
            s = [(7 + ord(c)) % 50000 for c in (t or "")][:max_length]
            seqs.append(s or [1])  # CLS-ish floor so empty text encodes
        longest = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), longest), dtype=np.int64)
        mask = np.zeros((len(seqs), longest), dtype=np.int64)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return {"input_ids": ids, "attention_mask": mask}


class AutoTokenizer:
    @staticmethod
    def from_pretrained(path):
        return _Tokenizer()
