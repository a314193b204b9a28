"""Gradio demo app (reference moge/scripts/app.py:24-297): upload an image,
get depth/normal visualizations + 3D mesh download, with a metric measure
tool (click two points -> distance; reference app.py:200-228). Requires
`gradio` (optional dependency); the measure logic itself is plain numpy and
unit-testable without it."""

import tempfile
import uuid
from pathlib import Path

import click

RESOLUTION_LEVELS = {"Low": 0, "Medium": 5, "High": 9, "Ultra": 30}


def measure_click(results, measure_points, point2d, metric=True):
    """One click of the measure tool (reference app.py:204-228).

    ``results`` holds the last inference: {'image' uint8 HxWx3, 'depth',
    'points'}. ``measure_points`` is the list of (x, y) clicks so far this
    round. Returns (annotated image, new measure_points, markdown text).
    After the second click the points list resets and the text reports the
    Euclidean distance between the two selected 3D points — meters when the
    model output is metric (v2 scale head), relative units otherwise.
    """
    import cv2
    import numpy as np

    if results is None:
        return None, [], "Run inference first."
    measure_points = list(measure_points) + [tuple(int(v) for v in point2d)]

    image = np.ascontiguousarray(results["image"].copy())
    for p in measure_points:
        cv2.circle(image, p, radius=5, color=(255, 0, 0), thickness=2)

    unit = "m" if metric else " (relative)"
    lines = []
    for i, p in enumerate(measure_points):
        d = float(results["depth"][p[1], p[0]])
        lines.append(f"- **P{i + 1} depth: {d:.2f}{unit}.**")

    if len(measure_points) == 2:
        p1, p2 = measure_points
        cv2.line(image, p1, p2, color=(255, 0, 0), thickness=2)
        a = results["points"][p1[1], p1[0]]
        b = results["points"][p2[1], p2[0]]
        distance = float(np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64)))
        lines.append(f"- **Distance: {distance:.2f}{unit}**")
        measure_points = []

    return image, measure_points, "\n".join(lines)


def reset_measure(results):
    """Fresh measure round after a new inference (reference app.py:200-201)."""
    if results is None:
        return None, [], ""
    return results["image"], [], ""


@click.command(help="Web demo")
@click.option("--share", is_flag=True, help="Create a public link")
@click.option("--pretrained", "pretrained_model_name_or_path", type=str, default="Ruicheng/moge-2-vitl-normal")
@click.option("--version", "model_version", type=click.Choice(["v1", "v2"]), default="v2")
@click.option("--port", type=int, default=7860)
def main(share, pretrained_model_name_or_path, model_version, port):
    try:
        import gradio as gr
    except ImportError as e:
        raise click.ClickException(
            "The web demo requires `gradio`, which is not installed in this "
            "environment. Use `moge infer` for CLI inference instead."
        ) from e

    import cv2
    import numpy as np
    import jax.numpy as jnp

    from ..models import import_model_class_by_version
    from ..utils.geometry_numpy import depth_map_edge_numpy, intrinsics_to_fov_numpy, uv_map_numpy
    from ..utils.mesh import image_mesh_from_map, save_glb
    from ..utils.vis import colorize_depth, colorize_normal

    model = import_model_class_by_version(model_version).from_pretrained(pretrained_model_name_or_path)
    is_metric = getattr(model, "scale_head", None) is not None or model_version == "v2"
    tmp_dir = Path(tempfile.mkdtemp(prefix="moge_tpu_app_"))

    def run(image, resolution: str, apply_mask: bool, remove_edges: bool):
        if image is None:
            return None, None, None, None, "Upload an image first."
        height, width = image.shape[:2]
        # resize to <= 800 px as the reference demo does (app.py:81-84)
        if max(height, width) > 800:
            scale = 800 / max(height, width)
            height, width = int(height * scale), int(width * scale)
            image = cv2.resize(image, (width, height), interpolation=cv2.INTER_AREA)

        output = model.infer(
            jnp.asarray(image, jnp.float32) / 255.0,
            resolution_level=RESOLUTION_LEVELS.get(resolution, 9),
            apply_mask=apply_mask,
        )
        depth = np.asarray(output["depth"])
        mask = np.asarray(output["mask"])
        points = np.asarray(output["points"])
        normal = np.asarray(output["normal"]) if "normal" in output else None
        intrinsics = np.asarray(output["intrinsics"])

        depth_vis = colorize_depth(depth)
        normal_vis = colorize_normal(normal) if normal is not None else None

        mesh_mask = mask
        if remove_edges:
            mesh_mask = mesh_mask & ~depth_map_edge_numpy(depth, rtol=0.04)
        out = image_mesh_from_map(points, image.astype(np.float32) / 255, uv_map_numpy(height, width),
                                  mask=mesh_mask, tri=True)
        faces, vertices, _, vertex_uvs = out[0], out[1], out[2], out[3]
        glb_path = tmp_dir / f"{uuid.uuid4().hex}.glb"
        save_glb(glb_path, vertices * [1, -1, -1], faces, vertex_uvs * [1, -1] + [0, 1], image)

        fov_x, fov_y = intrinsics_to_fov_numpy(intrinsics)
        info = f"FOV: {np.rad2deg(fov_x):.1f} x {np.rad2deg(fov_y):.1f} deg"
        results = {"image": np.asarray(image, np.uint8), "depth": depth, "points": points}
        return results, depth_vis, normal_vis, str(glb_path), info

    with gr.Blocks(title="MoGe TPU") as demo:
        gr.Markdown("# MoGe (TPU) — Monocular Geometry Estimation")
        results_state = gr.State(value=None)
        measure_state = gr.State(value=[])
        with gr.Row():
            with gr.Column():
                input_image = gr.Image(label="Input image")
                resolution = gr.Radio(list(RESOLUTION_LEVELS), value="High", label="Resolution level")
                apply_mask = gr.Checkbox(True, label="Apply mask (remove sky etc.)")
                remove_edges = gr.Checkbox(True, label="Remove mesh edges")
                submit = gr.Button("Run")
            with gr.Column():
                with gr.Tabs():
                    with gr.Tab("Depth"):
                        depth_out = gr.Image(label="Depth")
                    with gr.Tab("Normal"):
                        normal_out = gr.Image(label="Normal")
                    with gr.Tab("Mesh"):
                        mesh_out = gr.Model3D(label="Mesh (GLB)")
                    with gr.Tab("Measure"):
                        gr.Markdown(
                            "### Click two points to measure the distance between them."
                            + (" Distances are metric (meters)." if is_metric
                               else " The model is affine-invariant: distances are relative."))
                        measure_image = gr.Image(show_label=False, interactive=False, sources=[])
                        measure_text = gr.Markdown("")
                info_out = gr.Textbox(label="Camera info")

        def on_measure(results, pts, event: gr.SelectData):
            return measure_click(results, pts, (event.index[0], event.index[1]), metric=is_metric)

        submit.click(
            run, [input_image, resolution, apply_mask, remove_edges],
            [results_state, depth_out, normal_out, mesh_out, info_out],
        ).then(reset_measure, [results_state], [measure_image, measure_state, measure_text])
        measure_image.select(on_measure, [results_state, measure_state],
                             [measure_image, measure_state, measure_text])
    demo.launch(share=share, server_port=port)


if __name__ == "__main__":
    main()
