"""Scripted FAKE onnxruntime for tests — a deterministic stand-in (the
real dependency is absent in this container), mirroring exactly the API
surface functions/onnx_classify.py touches: SessionOptions knobs,
InferenceSession(path, opts), get_inputs() names, run(None, feeds).

The "model" is a fixed arithmetic function of the (padded) input_ids, so
outputs are reproducible across workers and runs; it also asserts the
contract the plugin is supposed to uphold (rectangular padded batches,
int64 feeds, attention mask matching)."""

from __future__ import annotations

import numpy as np


class GraphOptimizationLevel:
    ORT_ENABLE_ALL = 99


class SessionOptions:
    def __init__(self) -> None:
        self.graph_optimization_level = None
        self.intra_op_num_threads = 0
        self.inter_op_num_threads = 0


class _Input:
    def __init__(self, name: str) -> None:
        self.name = name


class InferenceSession:
    def __init__(self, path, opts=None, **kw) -> None:
        self.path = str(path)
        self.opts = opts
        # label count by model name, like the reference pair: 3-class
        # sentiment model vs 19-label topic model
        self.n_out = 3 if "sentiment" in self.path else 19

    def get_inputs(self):
        return [_Input("input_ids"), _Input("attention_mask")]

    def run(self, outputs, feeds):
        ids = feeds["input_ids"]
        mask = feeds["attention_mask"]
        assert ids.dtype == np.int64 and mask.dtype == np.int64
        assert ids.shape == mask.shape and ids.ndim == 2, \
            "plugin must feed rectangular padded batches"
        # deterministic per-row logits from the masked token sum
        tok = (ids * mask).sum(axis=1, keepdims=True).astype(np.float64)
        ks = np.arange(1, self.n_out + 1, dtype=np.float64)
        logits = np.sin(tok / 97.0 * ks) * 3.0
        return [logits]
