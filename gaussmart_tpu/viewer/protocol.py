"""SIBR remote-viewer socket protocol.

Wire parity with reference gaussian_renderer/network_gui.py:27-98:
non-blocking TCP listener; on connect, send the render-items JSON; inbound
messages are 4-byte LE length + JSON with the custom camera (view matrix
with Y/Z column flips); outbound: raw RGB bytes, then 4-byte LE length +
source-path string, then length-prefixed metrics JSON.
"""
from __future__ import annotations

import json
import socket
import struct
from typing import Optional, Tuple

import numpy as np

from gaussmart_tpu.cameras import MiniCam


class NetworkGUI:
    def __init__(self):
        self.host = "127.0.0.1"
        self.port = 6009
        self.conn: Optional[socket.socket] = None
        self.addr = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)

    def init(self, host: str, port: int):
        self.host, self.port = host, port
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def send_json(self, data):
        payload = json.dumps(data).encode("utf-8")
        self.conn.sendall(struct.pack("I", len(payload)))
        self.conn.sendall(payload)

    def try_connect(self, render_items):
        try:
            self.conn, self.addr = self.listener.accept()
            self.conn.settimeout(None)
            self.send_json(render_items)
        except Exception:
            pass

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def read(self) -> dict:
        n = int.from_bytes(self._read_exact(4), "little")
        return json.loads(self._read_exact(n).decode("utf-8"))

    def send(self, image_bytes: Optional[bytes], verify: str, metrics: dict):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))
        self.send_json(metrics)

    def receive(self) -> Tuple[Optional[MiniCam], bool, bool, float, int]:
        msg = self.read()
        width = msg["resolution_x"]
        height = msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None, None
        do_training = bool(msg["train"])
        keep_alive = bool(msg["keep_alive"])
        scaling_modifier = msg["scaling_modifier"]
        wv = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        wv[:, 1] = -wv[:, 1]
        wv[:, 2] = -wv[:, 2]
        fp = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        fp[:, 1] = -fp[:, 1]
        cam = MiniCam(width, height, msg["fov_y"], msg["fov_x"],
                      msg["z_near"], msg["z_far"], wv, fp)
        return cam, do_training, keep_alive, scaling_modifier, msg["render_mode"]

    def close(self):
        if self.conn is not None:
            self.conn.close()
            self.conn = None


def render_net_image(render_pkg, render_items, render_mode, camera):
    """Mode-selected viewer image (utils/image_utils.py:41-61)."""
    import jax.numpy as jnp
    from gaussmart_tpu.ops.image import gradient_map

    output = render_items[render_mode].lower()
    if output == "alpha":
        net_image = render_pkg["rend_alpha"]
    elif output == "normal":
        net_image = (render_pkg["rend_normal"] + 1) / 2
    elif output == "depth":
        net_image = render_pkg["surf_depth"]
    elif output == "edge":
        net_image = gradient_map(render_pkg["render"])
    elif output == "curvature":
        net_image = gradient_map((render_pkg["rend_normal"] + 1) / 2)
    else:
        net_image = render_pkg["render"]
    if net_image.shape[0] == 1:
        # scalar channel -> simple grayscale RGB (turbo LUT omitted)
        lo, hi = net_image.min(), net_image.max()
        norm = (net_image - lo) / jnp.maximum(hi - lo, 1e-9)
        net_image = jnp.concatenate([norm] * 3, axis=0)
    return net_image


def image_to_bytes(net_image) -> bytes:
    arr = np.asarray(net_image)
    arr = np.clip(arr, 0, 1.0)
    return np.ascontiguousarray(
        (arr * 255).astype(np.uint8).transpose(1, 2, 0)).tobytes()
