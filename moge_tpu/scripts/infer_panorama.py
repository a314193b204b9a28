"""Panorama inference (reference moge/scripts/infer_panorama.py:29-158):
icosahedral 20-view split at 512^2, batched per-view infer with known 90-deg
FoV, distance = |points|, gradient-domain merge, outputs + mesh export."""

import itertools
import warnings
from pathlib import Path

import click


@click.command(help="Inference script for panorama images")
@click.option("--input", "-i", "input_path", type=click.Path(exists=True), required=True, help="Input image or folder path.")
@click.option("--output", "-o", "output_path", type=click.Path(), default="./output", help="Output folder path")
@click.option("--pretrained", "pretrained_model_name_or_path", type=str, default="Ruicheng/moge-vitl", help="Pretrained model name or path.")
@click.option("--version", "model_version", type=click.Choice(["v1", "v2"]), default="v1", help="Model version.")
@click.option("--device", "device_name", type=str, default="tpu", help="Backend (informational).")
@click.option("--resize", "resize_to", type=int, default=None, help="Resize the panorama before processing.")
@click.option("--resolution_level", type=int, default=9, help="Resolution level [0-9].")
@click.option("--threshold", type=float, default=0.03, help="Edge threshold for mesh export.")
@click.option("--batch_size", type=int, default=12, help="Batch size for per-view inference (12 = the whole icosahedral rig in ONE device call / one compile).")
@click.option("--merge_solver", type=click.Choice(["lsmr", "cg"]), default="lsmr", help="Poisson merge solver: host scipy LSMR (reference parity) or on-device jit CG.")
@click.option("--splitted", "save_splitted", is_flag=True, help="Save the splitted views.")
@click.option("--maps", "save_maps_", is_flag=True, help="Save output maps.")
@click.option("--glb", "save_glb_", is_flag=True, help="Save textured .glb mesh.")
@click.option("--ply", "save_ply_", is_flag=True, help="Save .ply mesh.")
@click.option("--show", "show", is_flag=True, help="(Unsupported headless.)")
def main(input_path, output_path, pretrained_model_name_or_path, model_version, device_name, resize_to,
         resolution_level, threshold, batch_size, merge_solver, save_splitted, save_maps_, save_glb_, save_ply_, show):
    import cv2
    import numpy as np
    import jax.numpy as jnp

    from ..models import import_model_class_by_version
    from ..panorama import (
        get_panorama_cameras,
        merge_panorama_depth,
        split_panorama_image,
        spherical_uv_to_directions,
    )
    from ..utils.geometry_numpy import (
        depth_map_edge_numpy,
        intrinsics_to_fov_numpy,
        normal_map_edge_numpy,
        point_map_to_normal_map_numpy,
        uv_map_numpy,
    )
    from ..utils.io import write_exr
    from ..utils.mesh import image_mesh_from_map, save_glb, save_ply
    from ..utils.vis import colorize_depth

    include_suffices = ["jpg", "png", "jpeg", "JPG", "PNG", "JPEG"]
    if Path(input_path).is_dir():
        image_paths = sorted(itertools.chain(*(Path(input_path).rglob(f"*.{s}") for s in include_suffices)))
    else:
        image_paths = [Path(input_path)]
    if len(image_paths) == 0:
        raise FileNotFoundError(f"No image files found in {input_path}")

    if not any([save_maps_, save_glb_, save_ply_]):
        warnings.warn("No output format specified. Defaults to saving all.")
        save_maps_ = save_glb_ = save_ply_ = True

    model = import_model_class_by_version(model_version).from_pretrained(pretrained_model_name_or_path)

    for image_path in image_paths:
        image = cv2.cvtColor(cv2.imread(str(image_path)), cv2.COLOR_BGR2RGB)
        height, width = image.shape[:2]
        if resize_to is not None:
            height, width = min(resize_to, int(resize_to * height / width)), min(resize_to, int(resize_to * width / height))
            image = cv2.resize(image, (width, height), interpolation=cv2.INTER_AREA)

        extrinsics, intrinsics_list = get_panorama_cameras()
        splitted_resolution = 512
        splitted_images = split_panorama_image(image, extrinsics, intrinsics_list, splitted_resolution)

        splitted_distance_maps, splitted_masks = [], []
        for i in range(0, len(splitted_images), batch_size):
            batch = np.stack(splitted_images[i : i + batch_size]).astype(np.float32) / 255.0
            fov_x = float(np.rad2deg(intrinsics_to_fov_numpy(intrinsics_list[i])[0]))
            output = model.infer(jnp.asarray(batch), fov_x=fov_x, apply_mask=False,
                                 resolution_level=resolution_level)
            distance = np.linalg.norm(np.asarray(output["points"]), axis=-1)
            mask = np.asarray(output["mask"])
            splitted_distance_maps.extend(list(distance))
            splitted_masks.extend(list(mask))

        if save_splitted:
            sp = Path(output_path, image_path.stem, "splitted")
            sp.mkdir(exist_ok=True, parents=True)
            for i in range(len(splitted_images)):
                cv2.imwrite(str(sp / f"{i:02d}.jpg"), cv2.cvtColor(splitted_images[i], cv2.COLOR_RGB2BGR))
                cv2.imwrite(str(sp / f"{i:02d}_distance_vis.png"),
                            cv2.cvtColor(colorize_depth(splitted_distance_maps[i], splitted_masks[i]), cv2.COLOR_RGB2BGR))

        merging_width, merging_height = min(1920, width), min(960, height)
        panorama_depth, panorama_mask = merge_panorama_depth(
            merging_width, merging_height, splitted_distance_maps, splitted_masks, extrinsics, intrinsics_list,
            solver=merge_solver,
        )
        panorama_depth = cv2.resize(panorama_depth.astype(np.float32), (width, height), interpolation=cv2.INTER_LINEAR)
        panorama_mask = cv2.resize(panorama_mask.astype(np.uint8), (width, height), interpolation=cv2.INTER_NEAREST) > 0
        points = panorama_depth[:, :, None] * spherical_uv_to_directions(uv_map_numpy(height, width))

        if Path(input_path).is_dir():
            save_path = Path(output_path, image_path.relative_to(input_path).parent, image_path.stem)
        else:
            save_path = Path(output_path, image_path.stem)
        save_path.mkdir(exist_ok=True, parents=True)
        if save_maps_:
            cv2.imwrite(str(save_path / "image.jpg"), cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
            cv2.imwrite(str(save_path / "depth_vis.png"),
                        cv2.cvtColor(colorize_depth(panorama_depth, mask=panorama_mask), cv2.COLOR_RGB2BGR))
            write_exr(save_path / "depth.exr", panorama_depth)
            write_exr(save_path / "points.exr", points)
            cv2.imwrite(str(save_path / "mask.png"), (panorama_mask * 255).astype(np.uint8))

        if save_glb_ or save_ply_:
            normals, normals_mask = point_map_to_normal_map_numpy(points, panorama_mask)
            edge = depth_map_edge_numpy(panorama_depth, rtol=threshold) & normal_map_edge_numpy(normals, tol_deg=5, mask=normals_mask)
            faces, vertices, vertex_colors, vertex_uvs = image_mesh_from_map(
                points, image.astype(np.float32) / 255, uv_map_numpy(height, width),
                mask=panorama_mask & ~edge, tri=True,
            )
            if save_glb_:
                save_glb(save_path / "mesh.glb", vertices, faces, vertex_uvs, image)
            if save_ply_:
                save_ply(save_path / "mesh.ply", vertices, faces, vertex_colors)
        print(f"Saved panorama results for {image_path} -> {save_path}")


if __name__ == "__main__":
    main()
