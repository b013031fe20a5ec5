"""Live-viewer CLI — `python -m gaussmart_tpu.viewer.serve -m <model>`.

Parity with reference view.py:9-51: load the trained model, loop serving
renders to a connected SIBR viewer over the network_gui protocol.
"""
from __future__ import annotations

import time
from argparse import ArgumentParser

import jax.numpy as jnp

from gaussmart_tpu.config import (ModelParams, PipelineParams, add_group_args,
                                  extract_group, get_combined_args)
from gaussmart_tpu.render.api import render
from gaussmart_tpu.scene import Scene
from gaussmart_tpu.viewer.protocol import (NetworkGUI, image_to_bytes,
                                           render_net_image)


def view(dataset: ModelParams, pipe: PipelineParams, iteration: int,
         gui: NetworkGUI, max_frames: int | None = None):
    import functools

    import jax

    scene = Scene(dataset, load_iteration=iteration, shuffle=False)
    state = scene.gaussians
    bg = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background
                     else [0.0, 0.0, 0.0])
    # jitted + cached render: eager per-op dispatch costs seconds per frame
    # (jit's own cache handles per-resolution retraces). Generous duplicate
    # budget: a finished model may have needed an escalated budget during
    # training; the kernel default (16, 3) would truncate its large splats.
    render_jit = jax.jit(functools.partial(
        render, depth_ratio=pipe.depth_ratio, backend=pipe.backend,
        raster_budget=(64, 12)))
    served = 0
    while max_frames is None or served < max_frames:
        if gui.conn is None:
            gui.try_connect(dataset.render_items)
            if gui.conn is None:
                time.sleep(0.05)   # don't busy-spin while nobody connects
        while gui.conn is not None:
            try:
                net_image_bytes = None
                cam, _, _, scaling_mod, render_mode = gui.receive()
                if cam is not None:
                    pkg = render_jit(cam.params(), state, bg,
                                     scaling_modifier=jnp.float32(scaling_mod))
                    net_image = render_net_image(pkg, dataset.render_items,
                                                 render_mode, cam)
                    net_image_bytes = image_to_bytes(net_image)
                metrics = {"#": int(state.n_active)}
                gui.send(net_image_bytes, dataset.source_path, metrics)
                served += 1
                if max_frames is not None and served >= max_frames:
                    return
            except Exception:
                gui.close()


def main(argv=None):
    from gaussmart_tpu.runtime import setup as _runtime_setup
    _runtime_setup()
    parser = ArgumentParser(description="gaussmart_tpu live viewer")
    # sentinel=True: unset flags parse as None so get_combined_args restores
    # them from the model's saved cfg_args.json (same as the render CLI)
    add_group_args(parser, ModelParams, sentinel=True)
    add_group_args(parser, PipelineParams, sentinel=True)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--iteration", type=int, default=-1)
    # merge the SAVED training config (sh_degree, white_background,
    # resolution, source_path...) exactly like the render CLI — serving a
    # model trained with non-default sh_degree under the defaults would
    # mis-parse its PLY channel layout
    args = get_combined_args(parser, argv)
    print("View: " + args.model_path)
    gui = NetworkGUI()
    gui.init(args.ip, args.port)
    view(extract_group(args, ModelParams), extract_group(args, PipelineParams),
         args.iteration, gui)
    print("\nViewing complete.")


if __name__ == "__main__":
    main()
