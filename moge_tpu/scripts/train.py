"""Training CLI (reference moge/scripts/train.py:66-461), TPU-native.

Replaces HF Accelerate/DDP with a jitted, mesh-sharded train step: batch
sharded over a ('dp','fsdp') device mesh, ZeRO-style param sharding, XLA
gradient collectives. Per-step random num_tokens and image sizes are
quantized to buckets so XLA recompiles stay bounded (the torch reference
re-plans cuDNN freely per shape; see SURVEY "variable-shape economics").
Checkpoints via orbax; EMA as a pytree lerp; NaN-grad steps skipped.
"""

import json
import random
import time
from pathlib import Path

import click


@click.command(help="Training script")
@click.option("--config", "config_path", type=click.Path(exists=True), required=True, help="Training config JSON.")
@click.option("--workspace", type=click.Path(), default="workspace/train", help="Workspace directory for checkpoints/logs.")
@click.option("--batch_size_forward", type=int, default=4, help="Global batch size per forward pass.")
@click.option("--gradient_accumulation_steps", type=int, default=1)
@click.option("--num_iterations", type=int, default=100000)
@click.option("--save_every", type=int, default=5000)
@click.option("--log_every", type=int, default=100)
@click.option("--checkpoint", "checkpoint_arg", type=str, default=None, help='"latest", a step number, or a checkpoint path.')
@click.option("--backbone_checkpoint", type=click.Path(exists=True), default=None, help="DINOv2 hub-format .pth to initialize the encoder backbone for a FRESH run (the reference's init_weights downloads this from dl.fbaipublicfiles.com, train.py:188-192; no egress here, so pass the file).")
@click.option("--ema/--no-ema", "enable_ema", default=True)
@click.option("--fsdp", type=int, default=1, help="FSDP (param-sharding) mesh axis size.")
@click.option("--multihost", is_flag=True, help="Multi-host run: jax.distributed.initialize, mesh over ALL hosts' devices (dp across hosts/DCN, fsdp within host/ICI), per-host batch feeding. batch_size_forward is the GLOBAL batch.")
@click.option("--coordinator", "coordinator_address", type=str, default=None, help="Multihost coordinator host:port (auto-detected on TPU pods).")
@click.option("--num_processes", type=int, default=None, help="Multihost process count (auto-detected on TPU pods).")
@click.option("--process_id", type=int, default=None, help="This process's rank (auto-detected on TPU pods).")
@click.option("--seed", type=int, default=0)
@click.option("--num_tokens_quantum", type=int, default=100, help="Bucket size for random per-step num_tokens.")
@click.option("--image_size_quantum", type=int, default=32, help="Bucket (pixel multiple) for sampled image sizes.")
@click.option("--vis_every", type=int, default=0, help="Dump GT-vs-pred depth visualizations every N steps (0 = off).")
@click.option("--flash/--no_flash", "use_flash", default=True, show_default=True,
              help="Pallas flash-attention kernel (custom VJP) in training. Default ON: the flash "
                   "backward benches ~28% faster at 3600 tokens, grads are parity-tested vs the XLA "
                   "path (tests/test_attention.py), and non-TPU backends auto-fall back to XLA SDPA.")
@click.option("--scan_blocks/--no_scan_blocks", default=False, help="lax.scan over ViT blocks: much faster compiles. NOTE: with --fsdp>1 the per-iteration param all-gather can deadlock the *virtual CPU* collectives emulation; fine on real TPU meshes.")
@click.option("--split_loss_programs", type=click.Choice(["auto", "on", "off"]), default="auto",
              help="Compile the gradient step as several XLA programs split along loss boundaries "
                   "(model fwd / per-patch-loss grads / model vjp). Works around a single-chip TPU "
                   "runtime fault when multiple patch-local losses share one program; costs one "
                   "extra model forward per step. auto = on for the TPU backend when the config "
                   "has >1 patch-local loss.")
def main(config_path, workspace, batch_size_forward, gradient_accumulation_steps, num_iterations,
         save_every, log_every, checkpoint_arg, backbone_checkpoint, enable_ema, fsdp, multihost,
         coordinator_address, num_processes, process_id, seed, num_tokens_quantum, image_size_quantum,
         vis_every, use_flash, scan_blocks, split_loss_programs):
    if multihost:
        # Must run before any jax backend touch.
        from ..parallel.distributed import initialize_distributed

        initialize_distributed(coordinator_address, num_processes, process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import import_model_class_by_version
    from ..models.io import (load_native_checkpoint, load_train_checkpoint,
                             save_native_checkpoint, save_train_checkpoint)
    from ..parallel.mesh import make_mesh, shard_batch, shard_params
    from ..train.dataloader import TrainDataLoaderPipeline
    from ..train.step import (accumulate_grads, init_train_state, make_apply_step,
                              make_grad_step, make_split_grad_step, make_train_step, scale_grads)
    from ..train.utils import build_optimizer
    from ..utils.tools import key_average

    # Share the CLI-wide persistent compile cache (scripts/cli.py) rather than
    # a per-workspace one: deleting a workspace must not throw away ~15 min of
    # ViT-L XLA compiles (MOGE_CACHE_DIR overrides, same as the CLI).
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", str(Path(workspace) / ".jax_cache"))

    config = json.loads(Path(config_path).read_text())
    workspace = Path(workspace)
    workspace.mkdir(parents=True, exist_ok=True)
    random.seed(seed)

    # ---- model ----
    model_version = config.get("model_version", "v2")
    ModelCls = import_model_class_by_version(model_version)
    model = ModelCls(config["model"], None, dtype=jnp.bfloat16, use_flash=use_flash, scan_blocks=scan_blocks)
    num_tokens_range = config["model"].get("num_tokens_range", [1200, 3600])

    initial_step = 0
    ckpt_dir = workspace / "checkpoints"
    resume_path = None
    if checkpoint_arg is not None:
        if checkpoint_arg == "latest":
            steps = sorted(int(p.name) for p in ckpt_dir.glob("[0-9]*") if p.is_dir() and p.name.isdigit())
            resume_path = ckpt_dir / str(steps[-1]) if steps else None
        elif checkpoint_arg.isdigit():
            resume_path = ckpt_dir / checkpoint_arg
        else:
            resume_path = Path(checkpoint_arg)
        if resume_path is not None and not resume_path.exists():
            resume_path = None
    if resume_path is not None:
        # Load raw params first (gives build_optimizer its pytree structure
        # and handles block-layout adaptation); optimizer/EMA/step/rng are
        # restored onto the sharded template below.
        from ..models.convert import adapt_block_layout

        _, params = load_native_checkpoint(resume_path)
        params = adapt_block_layout(params, stacked=scan_blocks)
        model.params = jax.tree.map(jnp.asarray, params)
    if model.params is None:
        model.init_random(seed=seed)
        if backbone_checkpoint is not None:
            # Pretrained-backbone init (reference init_weights, train.py:188-192):
            # graft converted DINOv2 hub weights into the freshly-initialized tree.
            from ..models.convert import convert_dinov2_backbone
            from ..models.io import _read_torch_checkpoint

            sd = _read_torch_checkpoint(backbone_checkpoint)
            if isinstance(sd, dict) and "teacher" in sd:  # full SSL-training checkpoints
                sd = sd["teacher"]
            if isinstance(sd, dict) and "model" in sd and not any("blocks." in k for k in sd):
                sd = sd["model"]
            bb = convert_dinov2_backbone(sd, prefix="", stack_blocks=scan_blocks)

            def graft(tree):
                out = {}
                for k, v in tree.items():
                    if isinstance(v, dict) and "patch_kernel" in v:
                        assert jax.tree.structure(v) == jax.tree.structure(
                            jax.tree.map(np.asarray, bb)
                        ), "backbone checkpoint does not match the configured architecture"
                        out[k] = jax.tree.map(jnp.asarray, bb)
                    elif isinstance(v, dict):
                        out[k] = graft(v)
                    else:
                        out[k] = v
                return out

            model.params = graft(model.params)
            print(f"Initialized backbone from {backbone_checkpoint}; heads random")
        else:
            print("Initialized random weights (pass --backbone_checkpoint for pretrained "
                  "DINOv2 backbone initialization)")

    # ---- mesh / optimizer ----
    if multihost:
        from ..parallel.distributed import make_multihost_mesh, shard_host_batch

        mesh = make_multihost_mesh(fsdp=fsdp)
    else:
        mesh = make_mesh(fsdp=fsdp)
    is_main_process = jax.process_index() == 0
    print(f"mesh: dp={mesh.shape['dp']} x fsdp={mesh.shape['fsdp']} "
          f"(process {jax.process_index()}/{jax.process_count()})")
    if scan_blocks and mesh.shape["fsdp"] > 1 and mesh.devices.flat[0].platform == "cpu":
        # The per-scan-iteration fsdp param all-gather deadlocks XLA:CPU's
        # emulated collectives (rendezvous timeout — the CPU runtime executes
        # the scan body per device without the cross-device schedule alignment
        # real TPU ICI collectives get). Hard-stop instead of hanging; real
        # TPU meshes are unaffected.
        raise click.UsageError(
            "--scan_blocks with --fsdp>1 deadlocks on virtual CPU meshes "
            "(XLA:CPU collective emulation inside lax.scan); use --no_scan_blocks "
            "here, or run this configuration on a real TPU mesh.")
    tx = build_optimizer(model.params, config["optimizer"], config.get("lr_scheduler"))
    params = shard_params(model.params, mesh)
    state = init_train_state(params, tx, enable_ema=enable_ema)
    rng_key = jax.random.PRNGKey(seed)

    if resume_path is not None:
        # Full training-state resume (reference train.py:143-207 restores
        # {step, optimizer, lr_scheduler} + EMA so a resumed run IS the run).
        try:
            _, state, rng_key = load_train_checkpoint(resume_path, state, rng_key)
            initial_step = int(state.step)
        except Exception as e:  # e.g. block-layout change between runs
            meta = json.loads((resume_path / "model_config.json").read_text())
            initial_step = meta.get("step") or 0
            state = state._replace(step=jnp.asarray(initial_step, jnp.int32))
            print(f"WARNING: full-state restore failed ({e}); resumed params-only")
        print(f"Resumed from {resume_path} at step {initial_step}")
    # Re-seed host randomness so a resumed run does not replay the same data
    # order from step 0 (reference train.py:264-266).
    random.seed(seed + initial_step)

    label_types = sorted(config["loss"].keys())
    step_cache = {}
    grad_cache = {}
    apply_fn = jax.jit(make_apply_step(tx), donate_argnums=(0, 1))
    acc_fn = jax.jit(accumulate_grads, donate_argnums=(0, 1))
    scale_fn = jax.jit(scale_grads, donate_argnums=(0,))

    # The fused program evaluates the UNION of loss-entry names across label
    # types (train/step.py builds one program from all tables), so the
    # local-loss count that decides auto-splitting must be the number of
    # distinct local-loss names overall — not the per-table max.
    n_local_losses = len({
        name
        for spec in config["loss"].values()
        for name, s in spec.items()
        if s.get("function") == "affine_invariant_local_loss"
    })
    # Auto: the fused program is safe whenever the local losses consolidate
    # into one batched alignment solve (docs/split_loss_tpu_fault.md); only
    # configs whose local entries CANNOT share a solve still need the split.
    from ..train.step import local_solves_batchable

    use_split = split_loss_programs == "on" or (
        split_loss_programs == "auto"
        and jax.default_backend() == "tpu"
        and n_local_losses > 1
        and not local_solves_batchable(config["loss"], label_types)
    )
    if use_split and is_main_process:
        print("loss-program splitting: on (see --split_loss_programs)")

    def get_grad_fn(num_tokens: int):
        if num_tokens not in grad_cache:
            if use_split:
                grad_cache[num_tokens] = make_split_grad_step(
                    model.module, config["loss"], label_types, num_tokens)
            else:
                fn = make_grad_step(model.module, config["loss"], label_types, num_tokens)
                grad_cache[num_tokens] = jax.jit(fn)
        return grad_cache[num_tokens]

    def get_step_fn(num_tokens: int):
        if use_split:
            grad_fn = get_grad_fn(num_tokens)

            def split_step(state, batch, sub):
                grads, metrics = grad_fn(state.params, batch, sub)
                state, grads_ok = apply_fn(state, grads)
                metrics = dict(metrics)
                metrics["grads_ok"] = grads_ok.astype(jnp.float32)
                return state, metrics

            return split_step
        if num_tokens not in step_cache:
            fn = make_train_step(model.module, tx, config["loss"], label_types, num_tokens)
            step_cache[num_tokens] = jax.jit(fn, donate_argnums=(0,))
        return step_cache[num_tokens]

    # quantize sampled image sizes to bound recompiles
    data_config = dict(config["data"])

    # Each host feeds its share of the GLOBAL forward batch (reference: DDP
    # ranks each load their own batch; effective batch = fwd x accum x procs,
    # train.py:95). Identical seeding keeps per-step (num_tokens, image size)
    # choices in lockstep across hosts with no runtime collective.
    local_batch_size = batch_size_forward
    if multihost:
        assert batch_size_forward % jax.process_count() == 0, (
            f"global batch {batch_size_forward} not divisible by {jax.process_count()} hosts")
        local_batch_size = batch_size_forward // jax.process_count()

    pipe = TrainDataLoaderPipeline(data_config, local_batch_size)
    # monkey-patch size quantization into the sampler
    orig_sample = pipe._sample_batch

    def quantized_sample():
        for batch in orig_sample():
            for inst in batch:
                inst["width"] = max(image_size_quantum, inst["width"] // image_size_quantum * image_size_quantum)
                inst["height"] = max(image_size_quantum, inst["height"] // image_size_quantum * image_size_quantum)
            yield batch

    pipe.pipeline.stages[0].fn = quantized_sample

    low_res_steps = config.get("low_resolution_training_steps", 0)
    records = []

    def next_batch():
        """Pull batches until one has a non-invalid instance (reference
        train.py:278-279 skips all-invalid batches without counting them
        toward the accumulation)."""
        while True:
            batch_np = pipe.get()
            if not all(lt == "invalid" for lt in batch_np["label_type"]):
                return batch_np

    def to_device(batch_np):
        batch = {
            "image": np.asarray(batch_np["image"]),
            "depth": np.asarray(batch_np["depth"]),
            "normal": np.asarray(batch_np["normal"]),
            "normal_mask": np.asarray(batch_np["normal_mask"]),
            "depth_mask_fin": np.asarray(batch_np["depth_mask_fin"]),
            "depth_mask_inf": np.asarray(batch_np["depth_mask_inf"]),
            "intrinsics": np.asarray(batch_np["intrinsics"]),
            "label_type_idx": np.asarray(
                [label_types.index(lt) if lt in label_types else label_types.index("invalid")
                 for lt in batch_np["label_type"]], np.int32),
            "is_metric": np.asarray(batch_np["is_metric"]),
        }
        if multihost:
            # Stitch per-host local shards into global arrays (no cross-host
            # data movement through this process).
            return shard_host_batch(batch, mesh)
        return shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)

    with pipe:
        t_start = time.time()
        for i_step in range(initial_step, num_iterations):
            t_step0 = time.perf_counter()
            if i_step <= low_res_steps:
                num_tokens = num_tokens_range[0]
            else:
                nt = random.randint(*num_tokens_range)
                num_tokens = max(num_tokens_range[0], nt // num_tokens_quantum * num_tokens_quantum)

            if gradient_accumulation_steps == 1:
                batch = to_device(next_batch())
                rng_key, sub = jax.random.split(rng_key)
                with mesh:
                    state, metrics = get_step_fn(num_tokens)(state, batch, sub)
                record = {k: float(v) for k, v in metrics.items()}
            else:
                # True gradient accumulation: average grads over micro-batches,
                # ONE optimizer update (and one LR-schedule tick) per outer step
                # (reference accelerator.accumulate, train.py:272-351).
                grad_sum = None
                micro_records = []
                for _ in range(gradient_accumulation_steps):
                    batch = to_device(next_batch())
                    rng_key, sub = jax.random.split(rng_key)
                    with mesh:
                        grads, metrics = get_grad_fn(num_tokens)(state.params, batch, sub)
                        grad_sum = grads if grad_sum is None else acc_fn(grad_sum, grads)
                    micro_records.append({k: float(v) for k, v in metrics.items()})
                with mesh:
                    grads = scale_fn(grad_sum, float(gradient_accumulation_steps))
                    state, grads_ok = apply_fn(state, grads)
                record = key_average(micro_records)
                record["grads_ok"] = float(grads_ok)

            if not np.isfinite(record.get("total", 0.0)):
                # NaN-loss report (reference train.py:326-328); the NaN-grad
                # skip already prevented the update.
                print(f"NaN loss at step {i_step}: {record}")
            records.append(record)

            if is_main_process:
                # Per-step shape/time trace (metrics.jsonl only carries
                # log_every-window averages): records each step's token
                # bucket and wall time, so recompiles (first hit of a bucket)
                # and warm per-bucket step times are auditable from the log.
                (workspace / "steps.jsonl").open("a").write(json.dumps({
                    "step": i_step, "num_tokens": num_tokens,
                    "t": round(time.perf_counter() - t_step0, 4),
                    "total": round(record.get("total", float("nan")), 5),
                }) + "\n")

            if (i_step % log_every == 0 or i_step == initial_step) and is_main_process:
                avg = key_average(records)
                elapsed = time.time() - t_start
                print(f"step {i_step}: loss={avg.get('total', float('nan')):.4f} "
                      f"({elapsed / max(len(records), 1):.2f}s/step) {json.dumps({k: round(v, 4) for k, v in avg.items() if v is not None})}")
                (workspace / "metrics.jsonl").open("a").write(json.dumps({"step": i_step, **avg}) + "\n")
                records = []
                t_start = time.time()

            # Periodic GT-vs-pred visualization dumps (reference train.py:426-454)
            if vis_every and i_step % vis_every == 0 and is_main_process:
                import cv2

                from ..utils.vis import colorize_depth

                out_dir = workspace / "vis" / str(i_step)
                out_dir.mkdir(parents=True, exist_ok=True)
                fwd = model.module.apply({"params": state.params}, batch["image"], num_tokens)
                pred_z = np.asarray(fwd["points"][..., 2].astype(jnp.float32))
                gt_depth = np.asarray(batch["depth"])
                images = np.asarray(batch["image"])
                for bi in range(min(4, images.shape[0])):
                    cv2.imwrite(str(out_dir / f"{bi}_image.jpg"),
                                cv2.cvtColor((images[bi] * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
                    cv2.imwrite(str(out_dir / f"{bi}_pred.png"),
                                cv2.cvtColor(colorize_depth(pred_z[bi]), cv2.COLOR_RGB2BGR))
                    cv2.imwrite(str(out_dir / f"{bi}_gt.png"),
                                cv2.cvtColor(colorize_depth(gt_depth[bi]), cv2.COLOR_RGB2BGR))

            if i_step > 0 and (i_step % save_every == 0 or i_step == num_iterations - 1):
                out = ckpt_dir / str(i_step)
                # Full training state (params + optimizer + EMA + step + rng,
                # reference train.py:373-423); the params subtree doubles as a
                # plain inference checkpoint. Async: the device->host snapshot
                # happens now, the write commits in the background while
                # training continues (reference uses a ThreadPoolExecutor).
                save_train_checkpoint(out, config["model"], state, rng_key, block=False)
                if state.ema_params is not None:
                    # EMA weights additionally as a standalone inference
                    # checkpoint (reference saves a separate `_ema` file).
                    save_native_checkpoint(Path(str(out) + "_ema"), config["model"],
                                           jax.tree.map(np.asarray, state.ema_params), step=i_step)
                print(f"saved checkpoint at step {i_step} -> {out}")

    # Commit any in-flight async checkpoint writes before exiting.
    from ..models.io import wait_for_checkpoints

    wait_for_checkpoints()


if __name__ == "__main__":
    main()
