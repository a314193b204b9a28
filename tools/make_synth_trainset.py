"""Synthesize a tiny on-disk training dataset in the reference layout.

Layout per instance (reference moge/train/dataloader.py:110-117 expects
image.jpg + depth.png + meta.json under a per-instance directory, listed in
.index.txt): this is the same format tests/test_eval_e2e.py synthesizes for
the eval harness, scaled up to train-sized images and with image intensity
correlated to depth so a short random-init training run has real signal to
descend on (the loss curve is the point of the exercise).

Usage: python tools/make_synth_trainset.py /tmp/moge_synth_train [--n 16]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_scene(rng, h, w):
    """Piecewise-smooth depth (slanted planes + a frontal box + sky) and an
    image whose shading follows the geometry."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u, v = xx / w, yy / h
    depth = 3.0 + 2.5 * v + rng.uniform(-0.5, 0.5) + 0.6 * np.sin(u * rng.uniform(3, 9))
    # a frontal box at random position
    for _ in range(rng.integers(1, 4)):
        x0, y0 = rng.integers(0, w - w // 4), rng.integers(h // 4, h - h // 4)
        bw, bh = rng.integers(w // 8, w // 4), rng.integers(h // 8, h // 4)
        depth[y0:y0 + bh, x0:x0 + bw] = rng.uniform(1.2, 2.5)
    # sky strip at the top -> infinite depth (exercises the inf mask / mask loss)
    sky_rows = int(h * rng.uniform(0.05, 0.18))
    depth[:sky_rows] = np.inf

    shade = 1.0 / np.where(np.isfinite(depth), depth, 30.0)
    shade = (shade - shade.min()) / (np.ptp(shade) + 1e-6)
    image = np.stack([
        0.65 * shade + 0.25 * u,
        0.55 * shade + 0.25 * v,
        0.75 * shade + 0.1,
    ], -1)
    image = np.clip(image + rng.normal(0, 0.02, image.shape), 0, 1)
    return (image * 255).astype(np.uint8), depth.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path)
    ap.add_argument("--n", type=int, default=16, help="instances per sub-dataset")
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = ap.parse_args()

    from moge_tpu.utils.io import write_depth, write_image, write_json

    rng = np.random.default_rng(0)
    h, w = args.hw
    for sub in ("synthA", "synthB", "synthC"):
        names = []
        for i in range(args.n):
            d = args.root / sub / f"{i:04d}"
            d.mkdir(parents=True, exist_ok=True)
            image, depth = make_scene(rng, h, w)
            write_image(d / "image.jpg", image)
            write_depth(d / "depth.png", depth)
            write_json(d / "meta.json", {
                "intrinsics": [[0.9, 0.0, 0.5], [0.0, 0.9 * w / h, 0.5], [0.0, 0.0, 1.0]],
            })
            names.append(d.name)
        (args.root / sub / ".index.txt").write_text("\n".join(names))
        print(f"{sub}: {len(names)} instances at {args.root / sub}")


if __name__ == "__main__":
    main()
