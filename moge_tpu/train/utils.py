"""Optimizer / LR-schedule builders from the reference JSON config schema.

Reference moge/train/utils.py:13-57: fnmatch include/exclude param groups
(configs/train/v2.json:286-292) and nested scheduler configs with
expression-string lr lambdas (sympy-parsed there; a restricted safe-eval over
jnp-traceable primitives here, so schedules run inside jit). Mapped onto
optax: one AdamW chain per group selected by optax.multi_transform over
path-pattern labels.
"""

from __future__ import annotations

import fnmatch
import functools
import math
from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import optax


def param_path_names(params) -> List[str]:
    """Dotted path names for every leaf (torch-style, for fnmatch patterns)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = []
    for path, _ in flat:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        names.append(".".join(parts))
    return names


def _matches(name: str, include: Sequence[str], exclude: Sequence[str]) -> bool:
    # fnmatch semantics as in reference train/utils.py:13-34; names are given a
    # leading dot so patterns like "*.backbone.*" also match our path names.
    dotted = "." + name + "."
    inc = any(fnmatch.fnmatch(dotted, pat) or fnmatch.fnmatch(name, pat) for pat in include)
    exc = any(fnmatch.fnmatch(dotted, pat) or fnmatch.fnmatch(name, pat) for pat in exclude)
    return inc and not exc


def _vmin(*args):
    return functools.reduce(jnp.minimum, args)


def _vmax(*args):
    return functools.reduce(jnp.maximum, args)


_SAFE_FUNCS = {
    "min": _vmin, "max": _vmax, "abs": jnp.abs, "pow": jnp.power,
    "floor": jnp.floor, "ceil": jnp.ceil, "sqrt": jnp.sqrt, "exp": jnp.exp,
    "log": jnp.log, "sin": jnp.sin, "cos": jnp.cos, "pi": math.pi, "e": math.e,
}


def parse_lr_lambda(expr: str) -> Callable:
    """Parse an lr-lambda expression of `epoch` (reference utils.py:31-34) into
    a jnp-traceable function of the (possibly traced) step count."""
    code = compile(expr, "<lr_lambda>", "eval")
    for name in code.co_names:
        if name not in _SAFE_FUNCS and name != "epoch":
            raise ValueError(f"Disallowed name in lr_lambda: {name}")

    def fn(epoch):
        return eval(code, {"__builtins__": {}}, {**_SAFE_FUNCS, "epoch": epoch})

    return fn


def build_lr_schedule(config: Dict[str, Any], group_index: int = 0) -> Callable:
    """LR *multiplier* schedule (step -> multiplier), jnp-traceable.

    Supports SequentialLR / LambdaLR / StepLR / ConstantLR / ExponentialLR
    compositions (reference train/utils.py:37-57).
    """
    typ = config["type"]
    params = config.get("params", {})
    if typ == "LambdaLR":
        lams = params["lr_lambda"]
        lam = lams[group_index] if isinstance(lams, list) else lams
        fn = parse_lr_lambda(lam) if isinstance(lam, str) else lam
        return lambda step: fn(step)
    if typ == "StepLR":
        size, gamma = params["step_size"], params.get("gamma", 0.1)
        return lambda step: gamma ** (step // size)
    if typ == "ConstantLR":
        factor = params.get("factor", 1.0 / 3)
        total = params.get("total_iters", 5)
        return lambda step: jnp.where(step < total, factor, 1.0)
    if typ == "ExponentialLR":
        gamma = params["gamma"]
        return lambda step: gamma ** step
    if typ == "SequentialLR":
        subs = [build_lr_schedule(s, group_index) for s in params["schedulers"]]
        milestones = list(params["milestones"])
        starts = [0] + milestones

        def fn(step):
            # torch SequentialLR: active scheduler sees a local step counter.
            value = subs[0](step - starts[0])
            for i in range(1, len(subs)):
                value = jnp.where(step >= milestones[i - 1], subs[i](step - starts[i]), value)
            return value

        return fn
    raise ValueError(f"Unsupported lr_scheduler type: {typ}")


def build_optimizer(
    params,
    optimizer_config: Dict[str, Any],
    lr_scheduler_config: Dict[str, Any] = None,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW with fnmatch param groups + schedule; global-norm clip included.

    Config schema identical to the reference (configs/train/v2.json:286-307).
    First matching group wins; unmatched params are frozen.
    """
    assert optimizer_config.get("type", "AdamW") in ("AdamW", "Adam")
    groups = optimizer_config["params"]

    names = param_path_names(params)
    flat_params, treedef = jax.tree_util.tree_flatten(params)
    labels_flat = []
    for name in names:
        label = len(groups)  # unmatched -> frozen
        for gi, group in enumerate(groups):
            sel = group["params"]
            if _matches(name, sel.get("include", ["*"]), sel.get("exclude", [])):
                label = gi
                break
        labels_flat.append(label)
    labels = jax.tree_util.tree_unflatten(treedef, labels_flat)

    transforms = {}
    for gi, group in enumerate(groups):
        base_lr = group.get("lr", 1e-4)
        betas = group.get("betas", optimizer_config.get("betas", (0.9, 0.999)))
        weight_decay = group.get("weight_decay", optimizer_config.get("weight_decay", 0.01))
        eps = group.get("eps", optimizer_config.get("eps", 1e-8))
        if lr_scheduler_config is not None:
            mult = build_lr_schedule(lr_scheduler_config, gi)
            schedule = (lambda base, m: (lambda count: base * m(count)))(base_lr, mult)
        else:
            schedule = base_lr
        transforms[gi] = optax.adamw(
            learning_rate=schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
        )
    transforms[len(groups)] = optax.set_to_zero()  # frozen / unmatched

    tx = optax.multi_transform(transforms, labels)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
