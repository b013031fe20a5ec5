"""Render / mesh / video CLI — `python -m gaussmart_tpu.render_cli -m <model>`.

Flag + output-layout parity with reference render.py:28-107:
train|test/ours_N/{renders,gt,vis}, traj video, fuse.ply + fuse_post.ply
with the same TSDF defaults (depth_trunc = 2*radius, voxel = trunc/mesh_res,
sdf_trunc = 5*voxel), diffuse texture via active_sh_degree=0.
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np

from gaussmart_tpu.config import (ModelParams, PipelineParams, add_group_args,
                                  extract_group, get_combined_args)
from gaussmart_tpu.mesh.extract import GaussianExtractor
from gaussmart_tpu.mesh.meshing import post_process_mesh, save_mesh_ply
from gaussmart_tpu.scene import Scene
from gaussmart_tpu.trajectory import create_video, generate_path


def main(argv=None):
    from gaussmart_tpu.runtime import setup as _runtime_setup
    _runtime_setup()
    parser = ArgumentParser(description="gaussmart_tpu rendering")
    add_group_args(parser, ModelParams, sentinel=True)
    add_group_args(parser, PipelineParams)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--skip_mesh", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--render_path", action="store_true")
    parser.add_argument("--voxel_size", default=-1.0, type=float)
    parser.add_argument("--depth_trunc", default=-1.0, type=float)
    parser.add_argument("--sdf_trunc", default=-1.0, type=float)
    parser.add_argument("--num_cluster", default=50, type=int)
    parser.add_argument("--unbounded", action="store_true")
    parser.add_argument("--mesh_res", default=1024, type=int)
    parser.add_argument("--n_devices", default=1, type=int,
                        help="multi-device inference over a JAX mesh")
    parser.add_argument("--shard_mode", default="row",
                        choices=["row", "gaussian"],
                        help="row: image rows sharded (large frames); "
                             "gaussian: splat strata sharded (scenes "
                             "beyond one chip's HBM)")
    args = get_combined_args(parser, argv)
    print("Rendering " + args.model_path)
    if args.quiet:
        # reference parity (render.py prints the header, then
        # safe_state(quiet) silences stdout for the rest of the run)
        sys.stdout = open(os.devnull, "w")

    dataset = extract_group(args, ModelParams)
    pipe = extract_group(args, PipelineParams)
    scene = Scene(dataset, load_iteration=args.iteration, shuffle=False)
    state = scene.gaussians
    bg = [1, 1, 1] if dataset.white_background else [0, 0, 0]

    mesh = None
    backend = pipe.backend
    if args.n_devices > 1:
        import jax

        from gaussmart_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(args.n_devices)
        if args.shard_mode == "gaussian":
            # inference: per-stratum compositing rides the production
            # Pallas kernel on TPU (dense elsewhere — interpret mode is
            # correct but slow off-TPU)
            backend = ("gaussian_sharded_pallas"
                       if jax.default_backend() == "tpu"
                       else "gaussian_sharded")
        else:
            backend = "row_sharded"

    it = scene.loaded_iter
    train_dir = os.path.join(args.model_path, "train", f"ours_{it}")
    test_dir = os.path.join(args.model_path, "test", f"ours_{it}")
    extractor = GaussianExtractor(state, bg_color=bg,
                                  depth_ratio=pipe.depth_ratio,
                                  backend=backend, mesh=mesh)

    if not args.skip_train:
        print("export training images ...")
        extractor.reconstruction(scene.get_train_cameras())
        extractor.export_image(train_dir)

    if not args.skip_test and len(scene.get_test_cameras()) > 0:
        print("export rendered testing images ...")
        extractor.reconstruction(scene.get_test_cameras())
        extractor.export_image(test_dir)

    if args.render_path:
        print("render videos ...")
        traj_dir = os.path.join(args.model_path, "traj", f"ours_{it}")
        n_frames = 240
        cam_traj = generate_path(scene.get_train_cameras(), n_frames=n_frames)
        extractor.reconstruction(cam_traj)
        extractor.export_image(traj_dir)
        frames = [np.transpose(np.asarray(r), (1, 2, 0))
                  for r in extractor.rgbmaps]
        create_video(frames, os.path.join(traj_dir, "render_traj.mp4"))
        # depth + normal streams (reference utils/render_utils.py:203-268
        # create_videos; its normal stream is dead upstream — mesh_utils.py
        # comments out the normal cache so the tag is always "missing" —
        # we emit all three): depth uses the reference's log curve with
        # [3, 97] percentile limits from frame 0, turbo-colormapped;
        # normals map [-1,1] -> [0,1].
        import matplotlib.cm as _cm
        d0 = np.asarray(extractor.depthmaps[0][0])
        pos = d0[d0 > 0]
        lims = np.percentile(pos if pos.size else np.ones(1), [3, 97])
        lo, hi = np.log(np.maximum(lims, 1e-6))
        turbo = _cm.get_cmap("turbo")

        def depth_frame(d):
            d = np.asarray(d[0])
            x = np.log(np.maximum(d, 1e-6))
            x = np.clip((x - min(lo, hi)) / max(abs(hi - lo), 1e-9), 0, 1)
            return turbo(x)[..., :3]

        create_video([depth_frame(d) for d in extractor.depthmaps],
                     os.path.join(traj_dir, "depth_traj.mp4"))
        create_video([np.transpose(np.asarray(n), (1, 2, 0)) * 0.5 + 0.5
                      for n in extractor.normalmaps],
                     os.path.join(traj_dir, "normal_traj.mp4"))

    if not args.skip_mesh:
        print("export mesh ...")
        os.makedirs(train_dir, exist_ok=True)
        # diffuse-only texture (render.py:90)
        extractor.state = state.replace(active_sh_degree=0)
        extractor.reconstruction(scene.get_train_cameras())
        if args.unbounded:
            name = "fuse_unbounded.ply"
            mesh = extractor.extract_mesh_unbounded(resolution=args.mesh_res)
        else:
            name = "fuse.ply"
            depth_trunc = (extractor.radius * 2.0 if args.depth_trunc < 0
                           else args.depth_trunc)
            voxel_size = (depth_trunc / args.mesh_res if args.voxel_size < 0
                          else args.voxel_size)
            sdf_trunc = 5.0 * voxel_size if args.sdf_trunc < 0 else args.sdf_trunc
            mesh = extractor.extract_mesh_bounded(
                voxel_size=voxel_size, sdf_trunc=sdf_trunc,
                depth_trunc=depth_trunc)
        save_mesh_ply(os.path.join(train_dir, name), mesh)
        print(f"mesh saved at {os.path.join(train_dir, name)}")
        mesh_post = post_process_mesh(mesh, cluster_to_keep=args.num_cluster)
        post_path = os.path.join(train_dir, name.replace(".ply", "_post.ply"))
        save_mesh_ply(post_path, mesh_post)
        print(f"mesh post processed saved at {post_path}")


if __name__ == "__main__":
    main()
