"""COLMAP SfM convert CLI — `python -m gaussmart_tpu.convert -s <dir>`.

Pipeline parity with reference convert.py:31-123: feature extraction ->
exhaustive matching -> mapper -> image undistortion via the `colmap`
binary, with optional 2x/4x/8x downscaled image copies (PIL resize here;
the reference shells out to ImageMagick). Gated on `colmap` availability.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
from argparse import ArgumentParser


def run(cmd: str) -> int:
    print(cmd, flush=True)
    return subprocess.call(cmd, shell=True)


def main(argv=None):
    parser = ArgumentParser("COLMAP converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--camera", default="OPENCV")
    parser.add_argument("--colmap_executable", default="")
    parser.add_argument("--resize", action="store_true")
    args = parser.parse_args(argv)

    colmap = (f'"{args.colmap_executable}"' if args.colmap_executable
              else "colmap")
    if shutil.which(args.colmap_executable or "colmap") is None:
        print("error: colmap binary not found on PATH", file=sys.stderr)
        sys.exit(1)
    use_gpu = 0 if args.no_gpu else 1
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(f"{src}/distorted/sparse", exist_ok=True)
        rc = run(f"{colmap} feature_extractor "
                 f"--database_path {src}/distorted/database.db "
                 f"--image_path {src}/input "
                 f"--ImageReader.single_camera 1 "
                 f"--ImageReader.camera_model {args.camera} "
                 f"--SiftExtraction.use_gpu {use_gpu}")
        if rc:
            sys.exit(rc)
        rc = run(f"{colmap} exhaustive_matcher "
                 f"--database_path {src}/distorted/database.db "
                 f"--SiftMatching.use_gpu {use_gpu}")
        if rc:
            sys.exit(rc)
        rc = run(f"{colmap} mapper "
                 f"--database_path {src}/distorted/database.db "
                 f"--image_path {src}/input "
                 f"--output_path {src}/distorted/sparse "
                 f"--Mapper.ba_global_function_tolerance=0.000001")
        if rc:
            sys.exit(rc)

    rc = run(f"{colmap} image_undistorter --image_path {src}/input "
             f"--input_path {src}/distorted/sparse/0 --output_path {src} "
             f"--output_type COLMAP")
    if rc:
        sys.exit(rc)

    # move sparse files into sparse/0 (reference convert.py:92-101)
    os.makedirs(f"{src}/sparse/0", exist_ok=True)
    for f in os.listdir(f"{src}/sparse"):
        if f == "0":
            continue
        shutil.move(os.path.join(src, "sparse", f),
                    os.path.join(src, "sparse", "0", f))

    if args.resize:
        from PIL import Image

        print("Copying and resizing...")
        for factor in (2, 4, 8):
            outdir = f"{src}/images_{factor}"
            os.makedirs(outdir, exist_ok=True)
            for fname in os.listdir(f"{src}/images"):
                with Image.open(os.path.join(src, "images", fname)) as im:
                    im.resize((im.size[0] // factor,
                               im.size[1] // factor)).save(
                        os.path.join(outdir, fname))
    print("Done.")


if __name__ == "__main__":
    main()
