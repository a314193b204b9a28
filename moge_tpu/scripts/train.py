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
@click.option("--ema", "enable_ema", is_flag=True, default=True)
@click.option("--fsdp", type=int, default=1, help="FSDP (param-sharding) mesh axis size.")
@click.option("--seed", type=int, default=0)
@click.option("--num_tokens_quantum", type=int, default=100, help="Bucket size for random per-step num_tokens.")
@click.option("--image_size_quantum", type=int, default=32, help="Bucket (pixel multiple) for sampled image sizes.")
@click.option("--vis_every", type=int, default=0, help="Dump GT-vs-pred depth visualizations every N steps (0 = off).")
@click.option("--flash", "use_flash", is_flag=True, help="Use the pallas flash-attention kernel (custom VJP) in training.")
@click.option("--scan_blocks/--no_scan_blocks", default=False, help="lax.scan over ViT blocks: much faster compiles. NOTE: with --fsdp>1 the per-iteration param all-gather can deadlock the *virtual CPU* collectives emulation; fine on real TPU meshes.")
def main(config_path, workspace, batch_size_forward, gradient_accumulation_steps, num_iterations,
         save_every, log_every, checkpoint_arg, enable_ema, fsdp, seed, num_tokens_quantum, image_size_quantum,
         vis_every, use_flash, scan_blocks):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import import_model_class_by_version
    from ..models.io import load_native_checkpoint, save_native_checkpoint
    from ..parallel.mesh import make_mesh, shard_batch, shard_params
    from ..train.dataloader import TrainDataLoaderPipeline
    from ..train.step import TrainState, init_train_state, make_train_step
    from ..train.utils import build_optimizer
    from ..utils.tools import key_average

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
    if checkpoint_arg is not None:
        if checkpoint_arg == "latest":
            steps = sorted(int(p.name) for p in ckpt_dir.glob("[0-9]*") if p.is_dir() and p.name.isdigit())
            ckpt_path = ckpt_dir / str(steps[-1]) if steps else None
        elif checkpoint_arg.isdigit():
            ckpt_path = ckpt_dir / checkpoint_arg
        else:
            ckpt_path = Path(checkpoint_arg)
        if ckpt_path is not None and ckpt_path.exists():
            from ..models.convert import adapt_block_layout

            cfg_loaded, params = load_native_checkpoint(ckpt_path)
            meta = json.loads((ckpt_path / "model_config.json").read_text())
            initial_step = meta.get("step") or 0
            params = adapt_block_layout(params, stacked=scan_blocks)
            model.params = jax.tree.map(jnp.asarray, params)
            print(f"Resumed from {ckpt_path} at step {initial_step}")
    if model.params is None:
        model.init_random(seed=seed)
        print("Initialized random weights (use a converted DINOv2 checkpoint via "
              "moge_tpu.models.convert for pretrained backbone initialization)")

    # ---- mesh / optimizer ----
    mesh = make_mesh(fsdp=fsdp)
    print(f"mesh: dp={mesh.shape['dp']} x fsdp={mesh.shape['fsdp']}")
    tx = build_optimizer(model.params, config["optimizer"], config.get("lr_scheduler"))
    params = shard_params(model.params, mesh)
    state = init_train_state(params, tx, enable_ema=enable_ema)

    label_types = sorted(config["loss"].keys())
    step_cache = {}

    def get_step_fn(num_tokens: int):
        if num_tokens not in step_cache:
            fn = make_train_step(model.module, tx, config["loss"], label_types, num_tokens)
            step_cache[num_tokens] = jax.jit(fn, donate_argnums=(0,))
        return step_cache[num_tokens]

    # quantize sampled image sizes to bound recompiles
    data_config = dict(config["data"])

    pipe = TrainDataLoaderPipeline(data_config, batch_size_forward)
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
    rng_key = jax.random.PRNGKey(seed)

    with pipe:
        t_start = time.time()
        for i_step in range(initial_step, num_iterations):
            if i_step <= low_res_steps:
                num_tokens = num_tokens_range[0]
            else:
                nt = random.randint(*num_tokens_range)
                num_tokens = max(num_tokens_range[0], nt // num_tokens_quantum * num_tokens_quantum)

            for _ in range(gradient_accumulation_steps):
                batch_np = pipe.get()
                if all(lt == "invalid" for lt in batch_np["label_type"]):
                    continue
                batch = {
                    "image": jnp.asarray(batch_np["image"]),
                    "depth": jnp.asarray(batch_np["depth"]),
                    "normal": jnp.asarray(batch_np["normal"]),
                    "normal_mask": jnp.asarray(batch_np["normal_mask"]),
                    "depth_mask_fin": jnp.asarray(batch_np["depth_mask_fin"]),
                    "depth_mask_inf": jnp.asarray(batch_np["depth_mask_inf"]),
                    "intrinsics": jnp.asarray(batch_np["intrinsics"]),
                    "label_type_idx": jnp.asarray(
                        [label_types.index(lt) if lt in label_types else label_types.index("invalid")
                         for lt in batch_np["label_type"]], jnp.int32),
                    "is_metric": jnp.asarray(batch_np["is_metric"]),
                }
                batch = shard_batch(batch, mesh)
                rng_key, sub = jax.random.split(rng_key)
                with mesh:
                    state, metrics = get_step_fn(num_tokens)(state, batch, sub)

            record = {k: float(v) for k, v in metrics.items()}
            if not np.isfinite(record.get("total", 0.0)):
                # NaN-loss report (reference train.py:326-328); the NaN-grad
                # skip already prevented the update.
                print(f"NaN loss at step {i_step}: {record}")
            records.append(record)

            if i_step % log_every == 0 or i_step == initial_step:
                avg = key_average(records)
                elapsed = time.time() - t_start
                print(f"step {i_step}: loss={avg.get('total', float('nan')):.4f} "
                      f"({elapsed / max(len(records), 1):.2f}s/step) {json.dumps({k: round(v, 4) for k, v in avg.items() if v is not None})}")
                (workspace / "metrics.jsonl").open("a").write(json.dumps({"step": i_step, **avg}) + "\n")
                records = []
                t_start = time.time()

            # Periodic GT-vs-pred visualization dumps (reference train.py:426-454)
            if vis_every and i_step % vis_every == 0:
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
                save_native_checkpoint(out, config["model"],
                                       jax.tree.map(np.asarray, state.params), step=i_step)
                if state.ema_params is not None:
                    save_native_checkpoint(Path(str(out) + "_ema"), config["model"],
                                           jax.tree.map(np.asarray, state.ema_params), step=i_step)
                print(f"saved checkpoint at step {i_step} -> {out}")


if __name__ == "__main__":
    main()
