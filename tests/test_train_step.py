"""Tests: optimizer builders, schedules, and the sharded train step on the
8-virtual-device CPU mesh (something the torch reference cannot test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moge_tpu.train.utils import build_lr_schedule, build_optimizer, parse_lr_lambda


def test_parse_lr_lambda_matches_reference_expr():
    # the exact warmup expression from configs/train/v2.json:298
    fn = parse_lr_lambda("max(0.0, min(1.0, (epoch - 1000) / 1000))")
    assert float(fn(0)) == 0.0
    assert float(fn(1500)) == pytest.approx(0.5)
    assert float(fn(3000)) == 1.0
    # traced evaluation works
    out = jax.jit(fn)(jnp.asarray(1500))
    assert float(out) == pytest.approx(0.5)


def test_sequential_schedule():
    cfg = {
        "type": "SequentialLR",
        "params": {
            "schedulers": [
                {"type": "LambdaLR", "params": {"lr_lambda": ["1.0", "max(0.0, min(1.0, (epoch - 10) / 10))"]}},
                {"type": "StepLR", "params": {"step_size": 100, "gamma": 0.5}},
            ],
            "milestones": [20],
        },
    }
    s0 = build_lr_schedule(cfg, 0)
    s1 = build_lr_schedule(cfg, 1)
    assert float(s0(5)) == 1.0
    assert float(s1(5)) == 0.0
    assert float(s1(15)) == pytest.approx(0.5)
    # after milestone: StepLR with local step
    assert float(s0(20)) == 1.0
    assert float(s0(20 + 100)) == 0.5
    assert float(s0(20 + 250)) == 0.25


def test_param_groups_freeze_and_lr():
    params = {
        "encoder": {"backbone": {"blocks_0": {"w": jnp.ones((4, 4))}}, "proj_0": {"w": jnp.ones((4,))}},
        "neck": {"w": jnp.ones((4,))},
    }
    cfg = {
        "type": "AdamW",
        "params": [
            {"params": {"include": ["*"], "exclude": ["*.backbone.*"]}, "lr": 1e-1},
            {"params": {"include": ["*.backbone.*"]}, "lr": 1e-3},
        ],
    }
    tx = build_optimizer(params, cfg, None, max_grad_norm=None)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # head lr 1e-1 >> backbone lr 1e-3
    head_step = float(jnp.abs(updates["neck"]["w"]).mean())
    backbone_step = float(jnp.abs(updates["encoder"]["backbone"]["blocks_0"]["w"]).mean())
    assert head_step > backbone_step * 50


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    import __graft_entry__

    assert len(jax.devices()) == 8
    __graft_entry__.dryrun_multichip(8)
