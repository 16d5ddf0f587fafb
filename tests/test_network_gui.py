"""Wire-protocol test for the remote-training-viewer peer.

Plays the SIBR client side of the reference protocol
(/root/reference/gaussian_renderer/network_gui.py:43-86): length-prefixed
JSON request with torch-convention matrices in, raw RGB bytes + verify
string out.
"""
import json
import socket
import threading

import numpy as np

from h3dgs_tpu.model import state as S
from h3dgs_tpu.ops.rasterize import RasterizeConfig
from h3dgs_tpu.scene.camera import look_at_camera
from h3dgs_tpu.utils.sh import rgb_to_sh
from h3dgs_tpu.viewer.network_gui import NetworkGUI

import jax.numpy as jnp


def _tiny_state(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return S.from_arrays(
        xyz=rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        features_dc=rgb_to_sh(rng.uniform(0.2, 0.8, (n, 1, 3))).astype(
            np.float32),
        features_rest=np.zeros((n, 0, 3), np.float32),
        opacity=np.full((n, 1), 0.5, np.float32),
        scaling=np.full((n, 3), np.log(0.2), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=n, max_sh_degree=0, n_skybox=0, skybox_last=False)


def _client_request(width, height):
    """Build the viewer message from a reference-convention camera."""
    cam = look_at_camera(eye=(0.0, -0.5, -3.0), target=(0, 0, 0), fovx=1.1,
                         width=width, height=height)
    # Invert the transform network_gui applies: it receives torch-style
    # transposed matrices with Y/Z (view) and Y (proj) columns negated.
    view = np.asarray(cam.view).T.copy()
    view[:, 1] = -view[:, 1]
    view[:, 2] = -view[:, 2]
    proj = np.asarray(cam.full_proj).T.copy()
    proj[:, 1] = -proj[:, 1]
    fovy = 2.0 * np.arctan(float(cam.tanfovy))
    fovx = 2.0 * np.arctan(float(cam.tanfovx))
    return {
        "resolution_x": width, "resolution_y": height,
        "train": True, "fov_y": fovy, "fov_x": fovx,
        "z_near": 0.01, "z_far": 100.0, "shs_python": False,
        "rot_scale_python": False, "keep_alive": False,
        "scaling_modifier": 1.0,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": proj.reshape(-1).tolist(),
    }


def test_viewer_protocol_roundtrip():
    gui = NetworkGUI(host="127.0.0.1", port=0)
    port = gui.listener.getsockname()[1]
    gui.model_path = "/tmp/model"
    w, h = 48, 32
    state = _tiny_state()
    cfg = RasterizeConfig(max_entries=1 << 12, max_per_tile=128, chunk=16)
    bg = jnp.zeros(3, jnp.float32)

    result = {}

    def client():
        # Generous timeout: the first poll-triggered render jit-compiles.
        s = socket.create_connection(("127.0.0.1", port), timeout=120)
        msg = json.dumps(_client_request(w, h)).encode("utf-8")
        s.sendall(len(msg).to_bytes(4, "little"))
        s.sendall(msg)
        buf = b""
        want = h * w * 3
        while len(buf) < want:
            chunk = s.recv(want - len(buf))
            assert chunk, "server closed early"
            buf += chunk
        vlen = int.from_bytes(s.recv(4), "little")
        result["verify"] = s.recv(vlen).decode("ascii")
        result["img"] = np.frombuffer(buf, np.uint8).reshape(h, w, 3)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    # Poll until the request has been served (connection + message).
    import time
    deadline = time.time() + 120
    while "img" not in result and time.time() < deadline:
        gui.poll(state, 0, cfg, bg)
        time.sleep(0.01)
    t.join(timeout=30)
    assert result["verify"] == "/tmp/model"
    img = result["img"]
    assert img.shape == (h, w, 3)
    # The splats must actually show up (not an all-background frame).
    assert img.max() > 30
    assert img.std() > 1.0
