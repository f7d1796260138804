"""Wire-level tests for the SIBR remote-viewer protocol server.

Plays the SIBR_remoteGaussian client against NetworkGUI over a real local
socket: length-prefixed JSON request in (reference:
gaussian_renderer/network_gui.py:57-84), raw HxWx3 RGB bytes + a
length-prefixed source-path string out (reference: network_gui.py:50-55,
train.py:56-61), including the Y/Z column sign flips the reference applies
to the client's matrices (reference: network_gui.py:74-78).
"""

from __future__ import annotations

import json
import socket

import numpy as np
import pytest

from gsjax.viewer.network_gui import NetworkGUI, ViewerRequest

from tests.scene_utils import look_at_origin_camera


def _client_message(camera, width, height, **overrides):
    """Build the wire message a SIBR client would send for `camera`.

    The server negates view columns 1,2 and view-projection column 1, then
    transposes — so the client supplies the transposed matrices with those
    columns pre-negated (an involution).
    """
    view = np.asarray(camera.view, np.float64).T.copy()
    view[:, 1] = -view[:, 1]
    view[:, 2] = -view[:, 2]
    full = np.asarray(camera.full_proj, np.float64).T.copy()
    full[:, 1] = -full[:, 1]
    fovy = 2.0 * np.arctan(float(camera.tan_fovy))
    fovx = 2.0 * np.arctan(float(camera.tan_fovx))
    msg = {
        "resolution_x": width,
        "resolution_y": height,
        "train": True,
        "fov_y": fovy,
        "fov_x": fovx,
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": full.reshape(-1).tolist(),
    }
    msg.update(overrides)
    return msg


def _send_msg(sock, msg):
    payload = json.dumps(msg).encode("utf-8")
    sock.sendall(len(payload).to_bytes(4, "little"))
    sock.sendall(payload)


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "connection closed early"
        buf += chunk
    return buf


@pytest.fixture
def gui_and_client():
    gui = NetworkGUI(host="127.0.0.1", port=0)
    port = gui.listener.getsockname()[1]
    client = socket.create_connection(("127.0.0.1", port), timeout=5)
    gui.try_connect()
    assert gui.conn is not None
    yield gui, client
    client.close()
    gui.listener.close()


def test_request_roundtrip_reconstructs_camera(gui_and_client):
    gui, client = gui_and_client
    w, h = 48, 32
    cam = look_at_origin_camera(w, h)
    _send_msg(client, _client_message(cam, w, h))
    req = gui.receive()
    assert isinstance(req, ViewerRequest)
    assert req.do_training and req.keep_alive
    assert req.scaling_modifier == 1.0
    got = req.camera
    assert (got.width, got.height) == (w, h)
    np.testing.assert_allclose(
        np.asarray(got.view), np.asarray(cam.view), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.full_proj), np.asarray(cam.full_proj), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.cam_center), np.asarray(cam.cam_center), atol=1e-4
    )


def test_zero_resolution_is_keepalive(gui_and_client):
    gui, client = gui_and_client
    cam = look_at_origin_camera(8, 8)
    _send_msg(client, _client_message(cam, 0, 0))
    req = gui.receive()
    assert req.camera is None


def test_image_reply_wire_format(gui_and_client):
    gui, client = gui_and_client
    h, w = 6, 5
    img = np.linspace(0, 2, 3 * h * w, dtype=np.float32).reshape(3, h, w)
    gui.send(NetworkGUI.image_to_bytes(img), "source/path")
    raw = _recv_exact(client, h * w * 3)
    arr = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    expect = (np.clip(img, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
    np.testing.assert_array_equal(arr, expect)
    n = int.from_bytes(_recv_exact(client, 4), "little")
    assert _recv_exact(client, n) == b"source/path"


def test_render_through_protocol(gui_and_client):
    """Full loop: client request -> server renders the reconstructed camera
    -> reply bytes match a direct render of the original camera."""
    import jax.numpy as jnp

    from gsjax.config import RasterConfig
    from gsjax.render.api import render
    from tests.scene_utils import random_scene

    gui, client = gui_and_client
    w, h = 48, 32
    cam = look_at_origin_camera(w, h)
    params, aux = random_scene(50, seed=3)
    cfg = RasterConfig(max_instances=1 << 12, max_rows=1 << 12, interpret=True)
    bg = jnp.zeros(3)

    _send_msg(client, _client_message(cam, w, h))
    req = gui.receive()
    served = render(
        params, req.camera, active_sh_degree=3, bg_color=bg, cfg=cfg,
        alive=aux.alive, scaling_modifier=req.scaling_modifier,
    ).image
    gui.send(NetworkGUI.image_to_bytes(served), "m")
    raw = _recv_exact(client, h * w * 3)

    direct = render(
        params, cam, active_sh_degree=3, bg_color=bg, cfg=cfg, alive=aux.alive
    ).image
    expect = NetworkGUI.image_to_bytes(direct)
    got = np.frombuffer(raw, np.uint8).astype(np.int16)
    want = np.frombuffer(expect, np.uint8).astype(np.int16)
    assert np.abs(got - want).max() <= 1  # f32 roundtrip of the matrices
