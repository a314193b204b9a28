"""Metric3D-v2 baseline adapter (reference baselines/metric3d_v2.py).

Wraps https://github.com/YvanYin/Metric3D via torch.hub; metric depth when GT
intrinsics are provided, scale-invariant otherwise. Requires torch + network
(or a local hub cache)."""

from typing import Optional

import click
import numpy as np

from moge_tpu.eval.baseline import MGEBaselineInterface


class Baseline(MGEBaselineInterface):
    def __init__(self, model_name: str, device: str):
        import torch

        self.model = torch.hub.load("yvanyin/metric3d", model_name, pretrain=True)
        self.device = torch.device(device)
        self.model = self.model.to(self.device).eval()

    @click.command()
    @click.option("--model", "model_name", type=str, default="metric3d_vit_large",
                  help="torch.hub model name (metric3d_vit_small/large/giant2).")
    @click.option("--device", type=str, default="cpu")
    @staticmethod
    def load(model_name, device):
        return Baseline(model_name, device)

    def infer(self, image: np.ndarray, intrinsics: Optional[np.ndarray] = None):
        import torch
        import torch.nn.functional as F

        original_height, original_width = image.shape[:2]
        # Metric3D canonical input size (from its README): 616 x 1064
        input_size = (616, 1064)
        scale = min(input_size[0] / original_height, input_size[1] / original_width)
        h, w = int(original_height * scale), int(original_width * scale)

        x = torch.from_numpy(image).permute(2, 0, 1)[None].to(self.device) * 255.0
        x = F.interpolate(x, (h, w), mode="bilinear", align_corners=False)
        pad_h, pad_w = input_size[0] - h, input_size[1] - w
        pad = [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2]
        mean = torch.tensor([123.675, 116.28, 103.53], device=self.device).view(1, 3, 1, 1)
        std = torch.tensor([58.395, 57.12, 57.375], device=self.device).view(1, 3, 1, 1)
        x = F.pad((x - mean) / std, pad, mode="constant", value=0)

        with torch.inference_mode():
            pred_depth, confidence, _ = self.model.inference({"input": x})
        pred_depth = pred_depth[:, :, pad[2]: input_size[0] - pad[3], pad[0]: input_size[1] - pad[1]]
        pred_depth = F.interpolate(pred_depth, (original_height, original_width), mode="bilinear")[0, 0]

        if intrinsics is not None:
            # canonical-camera rescaling with the known focal (Metric3D recipe)
            fx = float(intrinsics[0, 0]) * original_width
            canonical_to_real = (fx * scale) / 1000.0
            depth = (pred_depth * canonical_to_real).clamp(0, 300)
            return {"depth_metric": depth.cpu().numpy()}
        return {"depth_scale_invariant": pred_depth.cpu().numpy()}
