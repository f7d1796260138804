"""Remote-viewer TCP server speaking the SIBR_remoteGaussian protocol.

Byte-compatible with the reference server embedded in the training loop
(reference: gaussian_renderer/network_gui.py:26-86, train.py:52-66):
length-prefixed (4-byte little-endian) JSON requests carrying camera
matrices / resolution / pipeline flags; responses are raw HxWx3 RGB bytes
followed by a length-prefixed source-path string. The client supplies
row-major (transposed) matrices with SIBR's Y/Z sign flips already noted in
the reference (columns 1,2 of view and column 1 of view-projection
negated); Camera.from_matrices consumes the flipped transposed forms.
"""

from __future__ import annotations

import json
import socket
import traceback
from dataclasses import dataclass

import numpy as np

from gsjax.core.cameras import Camera


@dataclass
class ViewerRequest:
    camera: Camera | None
    do_training: bool
    do_shs_python: bool
    do_rot_scale_python: bool
    keep_alive: bool
    scaling_modifier: float


class NetworkGUI:
    """Non-blocking listener polled from the training loop."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: socket.socket | None = None

    def try_connect(self) -> None:
        """(reference: network_gui.py:34-41)"""
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except Exception:
            pass

    def _read(self) -> dict:
        """(reference: network_gui.py:43-48)"""
        n = int.from_bytes(self.conn.recv(4), "little")
        message = self.conn.recv(n)
        return json.loads(message.decode("utf-8"))

    def send(self, image_bytes: bytes | None, verify: str) -> None:
        """(reference: network_gui.py:50-55)"""
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self) -> ViewerRequest:
        """(reference: network_gui.py:57-86)"""
        msg = self._read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return ViewerRequest(None, False, False, False, False, 1.0)
        try:
            view = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
            view[:, 1] = -view[:, 1]
            view[:, 2] = -view[:, 2]
            full = np.asarray(
                msg["view_projection_matrix"], np.float32
            ).reshape(4, 4)
            full[:, 1] = -full[:, 1]
            camera = Camera.from_matrices(
                view, full, msg["fov_x"], msg["fov_y"], width, height
            )
        except Exception as e:
            print("")
            traceback.print_exc()
            raise e
        return ViewerRequest(
            camera=camera,
            do_training=bool(msg["train"]),
            do_shs_python=bool(msg["shs_python"]),
            do_rot_scale_python=bool(msg["rot_scale_python"]),
            keep_alive=bool(msg["keep_alive"]),
            scaling_modifier=float(msg["scaling_modifier"]),
        )

    def drop(self) -> None:
        self.conn = None

    @staticmethod
    def image_to_bytes(image) -> bytes:
        """[3,H,W] float image -> raw HxWx3 uint8 bytes
        (reference: train.py:60)."""
        arr = np.asarray(image)
        arr = np.clip(arr, 0.0, 1.0)
        return (
            (arr * 255.0).astype(np.uint8).transpose(1, 2, 0).tobytes()
        )
