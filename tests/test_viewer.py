"""Viewer protocol: loopback client speaking the SIBR wire format."""
import json
import socket
import struct
import threading

import numpy as np

from gaussmart_tpu.viewer.protocol import NetworkGUI, image_to_bytes


def _client(port, results):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
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
