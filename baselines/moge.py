"""Baseline adapter wrapping moge_tpu's own models for the eval harness
(reference baselines/moge.py): v1 -> scale-invariant, v2 -> metric outputs."""

from typing import Optional

import click
import numpy as np

from moge_tpu.eval.baseline import MGEBaselineInterface
from moge_tpu.utils.geometry_numpy import intrinsics_to_fov_numpy


class Baseline(MGEBaselineInterface):
    def __init__(self, num_tokens, resolution_level, pretrained_model_name_or_path, use_fp16, version="v2"):
        import jax.numpy as jnp

        from moge_tpu.models import import_model_class_by_version

        MoGeModel = import_model_class_by_version(version)
        self.version = version
        dtype = jnp.bfloat16 if use_fp16 else jnp.float32
        self.model = MoGeModel.from_pretrained(pretrained_model_name_or_path, dtype=dtype)
        self.num_tokens = num_tokens
        self.resolution_level = resolution_level
        self.use_fp16 = use_fp16

    @click.command()
    @click.option("--num_tokens", type=int, default=None)
    @click.option("--resolution_level", type=int, default=9)
    @click.option("--pretrained", "pretrained_model_name_or_path", type=str, default="Ruicheng/moge-2-vitl-normal")
    @click.option("--fp16", "use_fp16", is_flag=True)
    @click.option("--version", type=str, default="v2")
    @staticmethod
    def load(num_tokens, resolution_level, pretrained_model_name_or_path, use_fp16, version="v2"):
        return Baseline(num_tokens, resolution_level, pretrained_model_name_or_path, use_fp16, version)

    def _run(self, image: np.ndarray, intrinsics: Optional[np.ndarray], apply_mask: bool):
        import jax.numpy as jnp

        fov_x = None
        if intrinsics is not None:
            fov_x = float(np.rad2deg(intrinsics_to_fov_numpy(np.asarray(intrinsics))[0]))
        output = self.model.infer(
            jnp.asarray(image, jnp.float32), fov_x=fov_x, apply_mask=apply_mask,
            num_tokens=self.num_tokens, resolution_level=self.resolution_level,
        )
        output = {k: np.asarray(v) for k, v in output.items()}
        if self.version == "v1":
            return {
                "points_scale_invariant": output["points"],
                "depth_scale_invariant": output["depth"],
                "intrinsics": output["intrinsics"],
            }
        return {
            "points_metric": output["points"],
            "depth_metric": output["depth"],
            "intrinsics": output["intrinsics"],
        }

    def infer(self, image, intrinsics=None):
        return self._run(image, intrinsics, apply_mask=True)

    def infer_for_evaluation(self, image, intrinsics=None):
        return self._run(image, intrinsics, apply_mask=False)
