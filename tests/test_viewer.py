"""Viewer protocol: loopback client speaking the SIBR wire format."""
import json
import socket
import struct
import threading

import numpy as np

from gaussmart_tpu.viewer.protocol import NetworkGUI, image_to_bytes


def _client(port, results):
    # generous timeout: in a full-suite run the server's first frame waits
    # on a jit compile that can exceed several seconds on a loaded CPU
    s = socket.create_connection(("127.0.0.1", port), timeout=120)
    # 1) receive render items
    n = struct.unpack("I", s.recv(4))[0]
    items = json.loads(s.recv(n).decode())
    results["items"] = items
    # 2) send a camera request
    wv = np.eye(4)
    msg = dict(resolution_x=16, resolution_y=12, train=False, fov_y=0.8,
               fov_x=0.9, z_near=0.01, z_far=100.0, keep_alive=True,
               scaling_modifier=1.0, view_matrix=wv.reshape(-1).tolist(),
               view_projection_matrix=wv.reshape(-1).tolist(), render_mode=0)
    payload = json.dumps(msg).encode()
    s.sendall(len(payload).to_bytes(4, "little"))
    s.sendall(payload)
    # 3) receive image bytes + verify string + metrics
    img = b""
    while len(img) < 16 * 12 * 3:
        img += s.recv(16 * 12 * 3 - len(img))
    results["image"] = img
    n = int.from_bytes(s.recv(4), "little")
    results["verify"] = s.recv(n).decode("ascii")
    n = struct.unpack("I", s.recv(4))[0]
    results["metrics"] = json.loads(s.recv(n).decode())
    s.close()


def test_protocol_roundtrip():
    gui = NetworkGUI()
    gui.init("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    results = {}
    t = threading.Thread(target=_client, args=(port, results))
    t.start()

    # server side
    import time
    cam = None
    for _ in range(100):
        gui.try_connect(["RGB", "Alpha"])
        if gui.conn is not None:
            break
        time.sleep(0.02)
    assert gui.conn is not None
    cam, do_training, keep_alive, smod, mode = gui.receive()
    assert cam is not None
    assert cam.width == 16 and cam.height == 12
    assert keep_alive and smod == 1.0 and mode == 0
    # Y/Z flips applied
    assert cam.world_view[1, 1] == -1.0
    assert cam.world_view[2, 2] == -1.0

    img = np.random.default_rng(0).random((3, 12, 16)).astype(np.float32)
    gui.send(image_to_bytes(img), "/tmp/scene", {"#": 42})
    t.join(timeout=5)
    gui.close()

    assert results["items"] == ["RGB", "Alpha"]
    assert len(results["image"]) == 16 * 12 * 3
    assert results["verify"] == "/tmp/scene"
    assert results["metrics"]["#"] == 42


def test_serve_gui_in_training_path():
    """Drive train.py's _serve_gui end-to-end over loopback: camera request
    -> jitted render at the loop's adaptive raster budget -> frame bytes."""
    from gaussmart_tpu.config import ModelParams, PipelineParams
    from gaussmart_tpu.models.gaussians import init_from_pcd
    from gaussmart_tpu.train import _serve_gui

    rng = np.random.default_rng(1)
    state = init_from_pcd(rng.normal(size=(32, 3)).astype(np.float32),
                          rng.random((32, 3)).astype(np.float32), None,
                          max_sh_degree=1, spatial_lr_scale=1.0, capacity=64)

    gui = NetworkGUI()
    gui.init("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]
    results = {}
    t = threading.Thread(target=_client, args=(port, results))
    t.start()
    for _ in range(100):
        gui.try_connect(["RGB"])
        if gui.conn is not None:
            break

    dataset = ModelParams(source_path="/tmp/scene", white_background=False)
    pipe = PipelineParams(backend="dense")
    # keep_alive=True + iteration < max_iters: serve exactly one frame and
    # return to training when the client disconnects
    _serve_gui(gui, state, pipe, dataset, {"loss": 0.5}, iteration=10,
               max_iters=100, raster_budget=(32, 6))
    t.join(timeout=120)
    assert len(results["image"]) == 16 * 12 * 3
    assert results["metrics"]["#"] == 32
