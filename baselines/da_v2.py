"""Depth-Anything-V2 baseline adapter (reference baselines/da_v2.py).

Wraps the external torch repo (https://github.com/DepthAnything/Depth-Anything-V2)
into the moge_tpu evaluation interface; its output is affine-invariant
disparity. Requires torch + a local clone of the repo.
"""

import os
import sys
from pathlib import Path
from typing import Optional

import click
import numpy as np

from moge_tpu.eval.baseline import MGEBaselineInterface


class Baseline(MGEBaselineInterface):
    def __init__(self, repo_path: str, backbone: str, num_tokens: Optional[int], device: str):
        import torch

        repo_path = os.path.abspath(repo_path)
        if not Path(repo_path).exists():
            raise FileNotFoundError(
                f"Cannot find the Depth-Anything-V2 repository at {repo_path}. "
                "Clone it and pass --repo."
            )
        if repo_path not in sys.path:
            sys.path.append(repo_path)
        from depth_anything_v2.dpt import DepthAnythingV2

        model = DepthAnythingV2(encoder=backbone, features=256, out_channels=[256, 512, 1024, 1024])
        checkpoint_path = os.path.join(repo_path, f"checkpoints/depth_anything_v2_{backbone}.pth")
        if not os.path.exists(checkpoint_path):
            raise FileNotFoundError(f"Cannot find the checkpoint file at {checkpoint_path}.")
        model.load_state_dict(torch.load(checkpoint_path, map_location="cpu", weights_only=True))
        self.device = torch.device(device)
        self.model = model.to(self.device).eval()
        self.num_tokens = num_tokens

    @click.command()
    @click.option("--repo", "repo_path", type=click.Path(), default="../Depth-Anything-V2")
    @click.option("--backbone", type=click.Choice(["vits", "vitb", "vitl"]), default="vitl")
    @click.option("--num_tokens", type=int, default=None)
    @click.option("--device", type=str, default="cpu")
    @staticmethod
    def load(repo_path, backbone, num_tokens, device):
        return Baseline(repo_path, backbone, num_tokens, device)

    def infer(self, image: np.ndarray, intrinsics: Optional[np.ndarray] = None):
        import torch
        import torch.nn.functional as F

        assert intrinsics is None, "Depth-Anything-V2 does not support camera intrinsics input"
        original_height, original_width = image.shape[:2]
        if self.num_tokens is None:
            resize_factor = 518 / min(original_height, original_width)
        else:
            resize_factor = (self.num_tokens * 14 ** 2 / (original_height * original_width)) ** 0.5
        h14 = round(original_height * resize_factor / 14) * 14
        w14 = round(original_width * resize_factor / 14) * 14

        x = torch.from_numpy(image).permute(2, 0, 1)[None].to(self.device)
        x = F.interpolate(x, (h14, w14), mode="bicubic", align_corners=False, antialias=True)
        mean = torch.tensor([0.485, 0.456, 0.406], device=self.device).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225], device=self.device).view(1, 3, 1, 1)
        with torch.inference_mode():
            disparity = self.model((x - mean) / std)
            disparity = F.interpolate(disparity[:, None], (original_height, original_width),
                                      mode="bilinear", align_corners=False)[0, 0]
        return {"disparity_affine_invariant": disparity.cpu().numpy()}
