"""Minimal repro for the single-chip TPU runtime fault behind
--split_loss_programs (see moge_tpu/train/step.py:make_split_grad_step).

Symptom: one XLA program that differentiates TWO (or more)
affine_invariant_local_loss evaluations over the same predicted point map
reliably crashes the TPU worker process (the runtime dies; it is not a
Python exception or a NaN). Each loss alone — or the two losses compiled as
separate programs — executes fine. No model is involved: the fault
reproduces on a loss-only program over synthetic tensors.

Usage (on the TPU host):
    python tools/repro_split_loss_fault.py --mode single4       # OK
    python tools/repro_split_loss_fault.py --mode single16      # OK
    python tools/repro_split_loss_fault.py --mode separate      # OK (two programs)
    python tools/repro_split_loss_fault.py --mode fused_batched # expected OK: ONE
        # batched solve for both losses — the mitigation structure compute_losses
        # emits (train/step.py); validates it on the real runtime WITHOUT the crash
    python tools/repro_split_loss_fault.py --mode fused         # expected: worker crash
        # WARNING: past crashes have wedged the chip for hours — run deliberately

Each mode prints "OK <mode> loss=<...> grad_norm=<...>" on success.
See docs/split_loss_tpu_fault.md for the investigation record.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["single4", "single16", "separate", "fused_batched",
                                       "fused", "fused_serialized"],
                    required=True)
    ap.add_argument("--hw", type=int, nargs=2, default=(592, 592),
                    help="point-map height width (default: 16*37 = the 1369-token decoder size)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dump_hlo", metavar="DIR", default=None,
                    help="lower + compile the mode's gradient program(s) with HLO dumps "
                         "into DIR and EXIT WITHOUT EXECUTING — safe for the fused mode "
                         "(the fault is execution-time; compile completes, "
                         "docs/split_loss_tpu_fault.md investigation record)")
    args = ap.parse_args()

    # NOTE: --xla_dump_to is useless on the tunneled TPU (compilation happens
    # in the server process; the local dump dir stays empty). The --dump_hlo
    # path below captures post-optimization HLO via compiled.as_text(), which
    # queries the executable itself and works through the tunnel.

    import jax
    import jax.numpy as jnp

    from moge_tpu.train.losses import affine_invariant_local_loss

    if jax.default_backend() != "tpu":
        print(f"NOTE: backend is {jax.default_backend()!r}; the fault only "
              "manifests on the TPU runtime (CPU/GPU run all modes fine).")

    h, w = args.hw
    b = args.batch
    rng = np.random.default_rng(0)
    # plausible scene: smooth positive depth, pred = gt + noise
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    z = 2.0 + yy / h + 0.3 * np.sin(xx / 17.0)
    gt = np.stack([(xx / w - 0.5) * z, (yy / h - 0.5) * z, z], axis=-1)
    gt = np.broadcast_to(gt, (b, h, w, 3)).copy()
    pred = gt + 0.01 * rng.standard_normal(gt.shape).astype(np.float32)
    gt_j = jnp.asarray(gt)
    pred_j = jnp.asarray(pred)
    focal = jnp.full((b,), 1.0, jnp.float32)
    scale = jnp.ones((b,), jnp.float32)
    key = jax.random.PRNGKey(0)

    def one_loss(level):
        def f(p, k):
            loss_b, _ = affine_invariant_local_loss(k, p, gt_j, focal, scale, level=level)
            return jnp.mean(loss_b)
        return f

    def fused(p, k):
        k1, k2 = jax.random.split(k)
        l4, _ = affine_invariant_local_loss(k1, p, gt_j, focal, scale, level=4)
        l16, _ = affine_invariant_local_loss(k2, p, gt_j, focal, scale, level=16)
        return jnp.mean(l4) + jnp.mean(l16)

    def fused_serialized(p, k):
        # The HLO-informed rescue experiment (round 5): the fused dump shows
        # two INDEPENDENT solver while-chains whose 16.8 MB chunk buffers are
        # all assigned to scoped VMEM (layout tag S(1)); the singles carry
        # one chain. Forcing a DATA dependency from loss-1's result into
        # loss-2's input serializes the chains, so memory-space assignment
        # can no longer overlay the two chains' VMEM intervals in parallel.
        # If this executes where `fused` faults, the crash is pinned on the
        # parallel-chain VMEM overlay; if it also faults, the overlay theory
        # is dead and two solver chains per program are unsafe outright.
        k1, k2 = jax.random.split(k)
        l4, _ = affine_invariant_local_loss(k1, p, gt_j, focal, scale, level=4)
        m4 = jnp.mean(l4)
        # 0-valued, data-dependent perturbation: forces chain-2 after chain-1
        p2 = p + jax.lax.stop_gradient(m4) * 0.0
        l16, _ = affine_invariant_local_loss(k2, p2, gt_j, focal, scale, level=16)
        return m4 + jnp.mean(l16)

    def report(name, loss, grad):
        gn = float(jnp.sqrt(jnp.sum(jnp.square(grad))))
        print(f"OK {name} loss={float(loss):.6f} grad_norm={gn:.6f}")

    if args.dump_hlo:
        # Compile-only: the fault is an execution-time kernel fault; lowering
        # and compilation complete even for the fused mode. This is how the
        # faulting pattern's HLO is captured without wedging the chip.
        fns = {"single4": [one_loss(4)], "single16": [one_loss(16)],
               "separate": [one_loss(4), one_loss(16)], "fused": [fused],
               "fused_serialized": [fused_serialized]}
        if args.mode == "fused_batched":
            raise SystemExit("--dump_hlo supports single4/single16/separate/fused[_serialized]")
        os.makedirs(args.dump_hlo, exist_ok=True)
        for i, f in enumerate(fns[args.mode]):
            compiled = jax.jit(jax.value_and_grad(f)).lower(pred_j, key).compile()
            path = os.path.join(args.dump_hlo, f"{args.mode}_{i}.hlo.txt")
            with open(path, "w") as fh:
                fh.write(compiled.as_text())
            print(f"compiled {args.mode}[{i}]: "
                  f"{compiled.cost_analysis().get('flops', 0.0):.3e} flops; "
                  f"post-optimization HLO -> {path}")
        return

    if args.mode == "single4":
        loss, grad = jax.jit(jax.value_and_grad(one_loss(4)))(pred_j, key)
        report("single4", loss, grad)
    elif args.mode == "single16":
        loss, grad = jax.jit(jax.value_and_grad(one_loss(16)))(pred_j, key)
        report("single16", loss, grad)
    elif args.mode == "separate":
        k1, k2 = jax.random.split(key)
        l1, g1 = jax.jit(jax.value_and_grad(one_loss(4)))(pred_j, k1)
        l2, g2 = jax.jit(jax.value_and_grad(one_loss(16)))(pred_j, k2)
        report("separate", l1 + l2, g1 + g2)
    elif args.mode == "fused_batched":
        # The mitigation structure (train/step.py compute_losses, round 3):
        # both entries' patch prepares, ONE concatenated alignment solve, per-
        # entry finish — a single solver scan in the fused gradient program.
        from moge_tpu.ops.alignment import align_points_scale_xyz_shift
        from moge_tpu.train.losses import local_loss_finish, local_loss_prepare

        def fused_batched(p, k):
            k1, k2 = jax.random.split(k)
            i1, c1 = local_loss_prepare(k1, p, gt_j, focal, 4)
            i2, c2 = local_loss_prepare(k2, p, gt_j, focal, 16)
            src = jnp.concatenate([i1[0], i2[0]])
            tgt = jnp.concatenate([i1[1], i2[1]])
            w_lr = jnp.concatenate([i1[2], i2[2]])
            sc, sh = align_points_scale_xyz_shift(src, tgt, w_lr)
            n1 = i1[0].shape[0]
            l4, _ = local_loss_finish(c1, sc[:n1], sh[:n1], scale)
            l16, _ = local_loss_finish(c2, sc[n1:], sh[n1:], scale)
            return jnp.mean(l4) + jnp.mean(l16)

        loss, grad = jax.jit(jax.value_and_grad(fused_batched))(pred_j, key)
        report("fused_batched", loss, grad)
    elif args.mode == "fused_serialized":
        print("running fused-SERIALIZED two-local-loss grad program (rescue experiment)...",
              flush=True)
        loss, grad = jax.jit(jax.value_and_grad(fused_serialized))(pred_j, key)
        report("fused_serialized", loss, grad)
    else:
        print("running fused two-local-loss grad program (expected: TPU worker crash)...",
              flush=True)
        loss, grad = jax.jit(jax.value_and_grad(fused))(pred_j, key)
        report("fused", loss, grad)


if __name__ == "__main__":
    sys.exit(main())
