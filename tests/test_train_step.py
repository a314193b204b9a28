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


# ---------------------------------------------------------------------------
# Gradient accumulation & full-state checkpointing (on a tiny points model)
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402

from moge_tpu.train.step import (accumulate_grads, init_train_state,  # noqa: E402
                                 make_apply_step, make_grad_step,
                                 make_train_step, scale_grads)


class _TinyPointsModel(nn.Module):
    """Minimal stand-in exposing the module.apply(params, image, num_tokens)
    -> output-dict contract the train step expects."""

    @nn.compact
    def __call__(self, image, num_tokens):
        x = nn.Conv(8, (3, 3))(image)
        x = nn.gelu(x)
        points = nn.Conv(3, (3, 3))(x)
        mask = jax.nn.sigmoid(nn.Conv(1, (3, 3))(x)[..., 0])
        return {"points": points, "mask": mask}


_LOSS_CONFIG = {
    "invalid": {},
    "A": {
        "global": {"function": "affine_invariant_global_loss", "weight": 1.0,
                   "params": {"align_resolution": 8}},
        "mask": {"function": "mask_bce_loss", "weight": 0.1},
    },
    "B": {
        "global": {"function": "affine_invariant_global_loss", "weight": 0.5,
                   "params": {"align_resolution": 8}},
    },
}
_LABEL_TYPES = ["A", "B", "invalid"]


def _tiny_batch(rng, b=4, h=16, w=16):
    depth = rng.uniform(1, 5, (b, h, w)).astype(np.float32)
    return {
        "image": jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32),
        "depth": jnp.asarray(depth),
        "normal": jnp.zeros((b, h, w, 3), jnp.float32),
        "normal_mask": jnp.ones((b, h, w), bool),
        "depth_mask_fin": jnp.asarray(rng.uniform(0, 1, (b, h, w)) > 0.1),
        "depth_mask_inf": jnp.zeros((b, h, w), bool),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0.5], [0, 1.2, 0.5], [0, 0, 1.0]], jnp.float32), (b, 3, 3)),
        "label_type_idx": jnp.asarray(rng.integers(0, 2, (b,)), jnp.int32),
        "is_metric": jnp.zeros((b,), bool),
    }


def _tiny_setup(lr_scheduler=None, enable_ema=True, seed=0):
    module = _TinyPointsModel()
    rng = np.random.default_rng(seed)
    image = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    params = module.init(jax.random.PRNGKey(seed), image, 0)["params"]
    opt_cfg = {"type": "AdamW", "params": [{"params": {"include": ["*"]}, "lr": 1e-2}]}
    tx = build_optimizer(params, opt_cfg, lr_scheduler)
    state = init_train_state(params, tx, enable_ema=enable_ema)
    return module, tx, state


@pytest.mark.slow
def test_gradient_accumulation_equals_full_batch():
    """accum=2 over two half-batches must equal ONE full-batch optimizer step
    (mean-of-grads), with the LR schedule advancing once per outer step
    (reference accelerator.accumulate, train.py:272-351). The count-dependent
    schedule makes any double-ticking of the schedule visible in the params."""
    sched = {"type": "LambdaLR", "params": {"lr_lambda": "0.5 ** epoch"}}
    rng = np.random.default_rng(7)
    batches = [_tiny_batch(rng) for _ in range(2)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(2)]

    # Path 1: two full-batch fused steps.
    module, tx, state_a = _tiny_setup(sched)
    step_fn = jax.jit(make_train_step(module, tx, _LOSS_CONFIG, _LABEL_TYPES, 0))
    for b, k in zip(batches, keys):
        state_a, _ = step_fn(state_a, b, k)

    # Path 2: same data as 2 outer steps x accum=2 half-batches.
    module, tx, state_b = _tiny_setup(sched)
    grad_fn = jax.jit(make_grad_step(module, _LOSS_CONFIG, _LABEL_TYPES, 0))
    apply_fn = jax.jit(make_apply_step(tx))
    for b, k in zip(batches, keys):
        halves = [
            {kk: v[:2] for kk, v in b.items()},
            {kk: v[2:] for kk, v in b.items()},
        ]
        grad_sum = None
        for half in halves:
            grads, _ = grad_fn(state_b.params, half, k)
            grad_sum = grads if grad_sum is None else accumulate_grads(grad_sum, grads)
        state_b, grads_ok = apply_fn(state_b, scale_grads(grad_sum, 2.0))
        assert bool(grads_ok)

    assert int(state_a.step) == int(state_b.step) == 2
    for pa, pb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=2e-5, atol=1e-7)
    for ea, eb in zip(jax.tree.leaves(state_a.ema_params), jax.tree.leaves(state_b.ema_params)):
        np.testing.assert_allclose(np.asarray(ea), np.asarray(eb), rtol=2e-5, atol=1e-7)


def test_nan_microbatch_poisons_accumulated_step():
    """A NaN gradient in any micro-batch must skip the whole outer update
    (reference train.py:341-345)."""
    module, tx, state = _tiny_setup(None)
    grad_fn = jax.jit(make_grad_step(module, _LOSS_CONFIG, _LABEL_TYPES, 0))
    apply_fn = jax.jit(make_apply_step(tx))
    rng = np.random.default_rng(8)
    good = _tiny_batch(rng)
    bad = dict(good)
    bad["image"] = good["image"].at[0, 0, 0, 0].set(jnp.nan)
    g1, _ = grad_fn(state.params, good, jax.random.PRNGKey(0))
    g2, _ = grad_fn(state.params, bad, jax.random.PRNGKey(1))
    grads = scale_grads(accumulate_grads(g1, g2), 2.0)
    new_state, grads_ok = apply_fn(state, grads)
    assert not bool(grads_ok)
    for old, new in zip(jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


@pytest.mark.slow
def test_full_train_state_checkpoint_resume(tmp_path):
    """Train 4 steps / save at 2 / resume -> bit-identical params, EMA, and
    optimizer state vs the uninterrupted run (VERDICT item 4; reference
    train.py:143-207,373-423 restores step+optimizer+lr_scheduler+EMA)."""
    from moge_tpu.models.io import load_train_checkpoint, save_train_checkpoint

    sched = {"type": "LambdaLR", "params": {"lr_lambda": "0.9 ** epoch"}}
    rng = np.random.default_rng(9)
    batches = [_tiny_batch(rng) for _ in range(4)]

    module, tx, state = _tiny_setup(sched)
    step_fn = jax.jit(make_train_step(module, tx, _LOSS_CONFIG, _LABEL_TYPES, 0))

    # Uninterrupted run, saving at step 2.
    rng_key = jax.random.PRNGKey(42)
    for i, b in enumerate(batches):
        rng_key, sub = jax.random.split(rng_key)
        state, _ = step_fn(state, b, sub)
        if i == 1:
            save_train_checkpoint(tmp_path / "ckpt", {"tiny": True}, state, rng_key)
            saved_key = rng_key
    final_a = state

    # Resumed run: fresh template, restore, replay steps 3-4.
    module, tx, state_b = _tiny_setup(sched)
    step_fn_b = jax.jit(make_train_step(module, tx, _LOSS_CONFIG, _LABEL_TYPES, 0))
    cfg, state_b, rng_key_b = load_train_checkpoint(
        tmp_path / "ckpt", state_b, jax.random.PRNGKey(0))
    assert cfg == {"tiny": True}
    assert int(state_b.step) == 2
    np.testing.assert_array_equal(np.asarray(rng_key_b), np.asarray(saved_key))
    for b in batches[2:]:
        rng_key_b, sub = jax.random.split(rng_key_b)
        state_b, _ = step_fn_b(state_b, b, sub)

    assert int(final_a.step) == int(state_b.step) == 4
    for pa, pb in zip(jax.tree.leaves(final_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for ea, eb in zip(jax.tree.leaves(final_a.ema_params), jax.tree.leaves(state_b.ema_params)):
        np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))
    for oa, ob in zip(jax.tree.leaves(final_a.opt_state), jax.tree.leaves(state_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_params_only_checkpoint_fallback(tmp_path):
    """A params-only native checkpoint still resumes (fresh optimizer) with a
    warning rather than crashing."""
    from moge_tpu.models.io import load_train_checkpoint, save_native_checkpoint

    module, tx, state = _tiny_setup(None)
    save_native_checkpoint(tmp_path / "old", {"tiny": 1},
                           jax.tree.map(np.asarray, state.params), step=7)
    module, tx, state_b = _tiny_setup(None, seed=1)  # different init
    cfg, restored, rng_key = load_train_checkpoint(tmp_path / "old", state_b, jax.random.PRNGKey(3))
    assert int(restored.step) == 7
    for pa, pb in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_loss_spec_mismatch_rejected():
    """Differing per-label_type specs for the same loss name must raise (the
    vectorized dispatch cannot honor them; ADVICE round-1 low finding)."""
    from moge_tpu.train.step import _loss_weights_per_instance

    bad = {
        "A": {"global": {"function": "affine_invariant_global_loss", "weight": 1.0,
                         "params": {"align_resolution": 8}}},
        "B": {"global": {"function": "affine_invariant_global_loss", "weight": 0.5,
                         "params": {"align_resolution": 16}}},
    }
    with pytest.raises(ValueError, match="differing specs"):
        _loss_weights_per_instance(bad, ["A", "B"])
    ok = {
        "A": {"global": {"function": "affine_invariant_global_loss", "weight": 1.0,
                         "params": {"align_resolution": 8}}},
        "B": {"global": {"function": "affine_invariant_global_loss", "weight": 0.5,
                         "params": {"align_resolution": 8}}},
    }
    _loss_weights_per_instance(ok, ["A", "B"])  # weight-only variation is fine


@pytest.mark.slow
def test_split_grad_step_matches_fused():
    """make_split_grad_step (multi-program workaround for the single-chip
    TPU runtime fault with several patch-local losses in one program) must
    produce the same gradients and total as the fused make_grad_step,
    including the local losses' PRNG split chain."""
    from moge_tpu.train.step import make_split_grad_step

    loss_config = {
        "invalid": {},
        "A": {
            "global": {"function": "affine_invariant_global_loss", "weight": 1.0,
                       "params": {"align_resolution": 8}},
            "patch_4": {"function": "affine_invariant_local_loss", "weight": 1.0,
                        "params": {"level": 4, "align_resolution": 4, "num_patches": 4}},
            "patch_8": {"function": "affine_invariant_local_loss", "weight": 1.0,
                        "params": {"level": 8, "align_resolution": 4, "num_patches": 8}},
            "mask": {"function": "mask_bce_loss", "weight": 0.1},
        },
    }
    lts = sorted(loss_config.keys())
    module, tx, state = _tiny_setup()
    rng = np.random.default_rng(3)
    batch = _tiny_batch(rng)
    batch["label_type_idx"] = jnp.zeros((4,), jnp.int32)  # all "A"
    key = jax.random.PRNGKey(5)

    fused = jax.jit(make_grad_step(module, loss_config, lts, 0))

    g1, m1 = fused(state.params, batch, key)
    # both split variants: residual-reuse P3 (default; replays the stored
    # linearization) and recompute-forward P3
    for reuse in (True, False):
        split = make_split_grad_step(module, loss_config, lts, 0, reuse_residuals=reuse)
        g2, m2 = split(state.params, batch, key)
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_split_step_replay_auto_sizing(monkeypatch):
    """The replay-vs-recompute choice is auto-sized from the residual pytree's
    trace-time byte count vs free HBM (VERDICT r4 weak-#4: b=4 OOM'd the chip
    instead of falling back). Validates the accounting and both decision
    branches by faking memory_stats on the input array's device."""
    from moge_tpu.train.step import make_split_grad_step

    monkeypatch.delenv("MOGE_SPLIT_REUSE_RESIDUALS", raising=False)
    module, _, state = _tiny_setup()
    rng = np.random.default_rng(9)
    batch = _tiny_batch(rng, b=2)
    split = make_split_grad_step(module, _LOSS_CONFIG, _LABEL_TYPES, 0)

    # the trace-time residual accounting returns a real, positive byte count
    n_bytes = split.residual_bytes(state.params, batch["image"])
    assert n_bytes > batch["image"].size * 4  # at least the stashed activations

    class _FakeArr:
        """Minimal stand-in carrying shape/dtype + a fake device."""

        def __init__(self, arr, free_bytes):
            self.shape, self.dtype = arr.shape, arr.dtype
            self._free = free_bytes
            self._arr = arr

        def devices(self):
            outer = self

            class _Dev:
                def memory_stats(self):
                    return {"bytes_limit": outer._free, "bytes_in_use": 0}

            return {_Dev()}

    # plenty of headroom -> replay; residuals don't fit 2x -> recompute
    roomy = _FakeArr(batch["image"], free_bytes=n_bytes * 10)
    # eval_shape only needs shape/dtype, but _decide_replay caches per shape —
    # use two distinct fake dtypes via the cache key (shape, dtype) by
    # clearing between calls instead
    assert split.decide_replay(state.params, roomy) is True
    split.replay_decisions.clear()
    tight = _FakeArr(batch["image"], free_bytes=n_bytes)  # < 2x headroom
    assert split.decide_replay(state.params, tight) is False
    # and the decision is cached per input shape
    assert split.replay_decisions == {((2, 16, 16, 3), "float32"): False}

    # Tunneled TPU runtimes (axon) return memory_stats() = None: the decision
    # must then budget against MOGE_HBM_BYTES (minus the ~5x-params standing
    # state) instead of silently keeping replay — the silent default OOM'd
    # the real chip at the first large token bucket (round-5 proof run).
    class _NoStatsTpuArr(_FakeArr):
        def devices(self):
            class _Dev:
                platform = "tpu"

                def memory_stats(self):
                    return None

            return {_Dev()}

    split.replay_decisions.clear()
    monkeypatch.setenv("MOGE_HBM_BYTES", str(n_bytes))  # nothing fits
    assert split.decide_replay(state.params, _NoStatsTpuArr(batch["image"], 0)) is False
    split.replay_decisions.clear()
    monkeypatch.setenv("MOGE_HBM_BYTES", str(n_bytes * 100))  # plenty
    assert split.decide_replay(state.params, _NoStatsTpuArr(batch["image"], 0)) is True
    # CPU/no-device default (paged host buffers) stays replay
    split.replay_decisions.clear()
    monkeypatch.setenv("MOGE_HBM_BYTES", str(n_bytes))
    assert split.decide_replay(state.params, batch["image"]) is True

    # the gradients still match the fused step when auto selects recompute
    key = jax.random.PRNGKey(5)
    fused = jax.jit(make_grad_step(module, _LOSS_CONFIG, _LABEL_TYPES, 0))
    g1, m1 = fused(state.params, batch, key)
    g2, m2 = split(state.params, batch, key)
    np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
