"""Batched multi-head decode (moge_tpu/models/multihead.py) vs sequential."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from moge_tpu.models.v2 import MoGeModel
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_model_v2 import TEST_CONFIG  # noqa: E402


pytestmark = pytest.mark.slow  # compile-heavy golden tests; deselect with -m 'not slow'

def test_batched_heads_match_sequential(monkeypatch):
    model = MoGeModel(dict(TEST_CONFIG), None, dtype=jnp.float32)
    model.init_random(seed=0, image_hw=(112, 112))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 112, 112, 3)) * 0.3 + 0.5, jnp.float32)

    monkeypatch.setenv("MOGE_BATCHED_HEADS", "0")
    seq = model.module.apply({"params": model.params}, img, 64)

    monkeypatch.setenv("MOGE_BATCHED_HEADS", "1")
    bat = model.module.apply({"params": model.params}, img, 64)

    assert set(seq.keys()) == set(bat.keys())
    for k in seq:
        np.testing.assert_allclose(
            np.asarray(bat[k], np.float32), np.asarray(seq[k], np.float32),
            rtol=2e-4, atol=2e-4, err_msg=k)
