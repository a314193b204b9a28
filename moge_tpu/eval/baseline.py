"""Baseline adapter interface (reference moge/test/baseline.py:7-43).

Wrappers uniformize loading + inference across models for the benchmark
harness. Arrays are numpy (HWC image in [0,1]); adapters may run any backend
internally (JAX models run on the TPU).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class MGEBaselineInterface:
    """Abstract model wrapper for the evaluation harness."""

    @staticmethod
    def load(*args, **kwargs) -> "MGEBaselineInterface":
        """click.command-decorated static constructor taking CLI passthrough
        args (reference baseline.py:13-18)."""
        raise NotImplementedError

    def infer(self, image: np.ndarray, intrinsics: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """``image``: (H, W, 3) RGB in [0, 1]. Returns a dict of
        `points_{metric|scale_invariant|affine_invariant}` /
        `depth_{metric|scale_invariant|affine_invariant}` /
        `disparity_affine_invariant` / `intrinsics` predictions."""
        raise NotImplementedError

    def infer_for_evaluation(self, image: np.ndarray, intrinsics: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        return self.infer(image, intrinsics)
