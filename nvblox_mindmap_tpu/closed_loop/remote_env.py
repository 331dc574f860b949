"""Remote environment bridge: run the policy on a TPU host against a
simulator on another machine.

Isaac Lab is CUDA/x86-bound while the policy runs on a TPU pod, so the sim
boundary becomes a network protocol (SURVEY.md section 7, stage 7). The
protocol is deliberately dumb and robust: length-prefixed pickled messages
over TCP, one request/response per call of the EnvironmentBase surface.

- Sim host:   ``serve_environment(env, port)`` wraps ANY EnvironmentBase
              (e.g. an Isaac Lab adapter) and serves it.
- TPU host:   ``RemoteEnvironment(host, port)`` implements EnvironmentBase
              against the server; the closed-loop runner and policies are
              unchanged.

Camera frames move as numpy arrays; at 2 cameras x 256^2 RGB-D per step this
is ~0.6 MB/step - far below closed-loop rates on any datacenter link.
"""
from __future__ import annotations

import pickle
import socket
import struct
import threading
from typing import Dict, Optional

import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import CameraFrame, EnvironmentBase

_HEADER = struct.Struct("!Q")


def _send_msg(sock: socket.socket, obj) -> None:
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_HEADER.pack(len(payload)) + payload)


def _recv_exactly(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n > 0:
        chunk = sock.recv(min(n, 1 << 20))
        if not chunk:
            raise ConnectionError("peer closed")
        chunks.append(chunk)
        n -= len(chunk)
    return b"".join(chunks)


def _recv_msg(sock: socket.socket):
    (size,) = _HEADER.unpack(_recv_exactly(sock, _HEADER.size))
    return pickle.loads(_recv_exactly(sock, size))


class RemoteEnvironment(EnvironmentBase):
    """EnvironmentBase client speaking to a served environment."""

    def __init__(self, host: str, port: int, timeout_s: float = 60.0):
        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        self._lock = threading.Lock()

    def _call(self, method: str, **kwargs):
        with self._lock:
            _send_msg(self._sock, {"method": method, "kwargs": kwargs})
            reply = _recv_msg(self._sock)
        if reply.get("error"):
            raise RuntimeError(f"remote environment error: {reply['error']}")
        return reply.get("result")

    def reset(self) -> None:
        self._call("reset")

    def step(self, goal_policy_state: Optional[np.ndarray]) -> None:
        goal = None if goal_policy_state is None else np.asarray(goal_policy_state)
        self._call("step", goal=goal)

    def get_robot_state(self) -> np.ndarray:
        return np.asarray(self._call("get_robot_state"))

    def get_policy_state(self) -> np.ndarray:
        return np.asarray(self._call("get_policy_state"))

    def get_cameras(self) -> Dict[str, CameraFrame]:
        raw = self._call("get_cameras")
        return {
            name: CameraFrame(f["rgb"], f["depth"], f["intrinsics"], f["pose7"])
            for name, f in raw.items()
        }

    def is_success(self) -> bool:
        return bool(self._call("is_success"))

    @property
    def done(self) -> bool:
        return bool(self._call("done"))

    def close(self):
        try:
            self._call("shutdown")
        except Exception:
            pass
        self._sock.close()


def _handle_client(conn: socket.socket, env: EnvironmentBase, stop_event):
    try:
        while not stop_event.is_set():
            try:
                request = _recv_msg(conn)
            except (ConnectionError, EOFError):
                return
            method = request["method"]
            kwargs = request.get("kwargs", {})
            try:
                if method == "shutdown":
                    _send_msg(conn, {"result": None})
                    stop_event.set()
                    return
                if method == "reset":
                    result = env.reset()
                elif method == "step":
                    result = env.step(kwargs.get("goal"))
                elif method == "get_robot_state":
                    result = np.asarray(env.get_robot_state())
                elif method == "get_policy_state":
                    result = np.asarray(env.get_policy_state())
                elif method == "get_cameras":
                    result = {
                        name: {
                            "rgb": np.asarray(f.rgb),
                            "depth": np.asarray(f.depth),
                            "intrinsics": np.asarray(f.intrinsics),
                            "pose7": np.asarray(f.pose7),
                        }
                        for name, f in env.get_cameras().items()
                    }
                elif method == "is_success":
                    result = env.is_success()
                elif method == "done":
                    result = env.done
                else:
                    raise ValueError(f"unknown method {method}")
                _send_msg(conn, {"result": result})
            except Exception as e:  # report errors to the client, keep serving
                _send_msg(conn, {"error": repr(e)})
    finally:
        conn.close()


class EnvironmentServer:
    """Serves one EnvironmentBase on a TCP port (one client at a time)."""

    def __init__(self, env: EnvironmentBase, host: str = "127.0.0.1",
                 port: int = 0):
        self.env = env
        self._stop = threading.Event()
        self._listener = socket.create_server((host, port))
        self.port = self._listener.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def start(self) -> "EnvironmentServer":
        self._thread.start()
        return self

    def _serve(self):
        self._listener.settimeout(0.5)
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except socket.timeout:
                continue
            _handle_client(conn, self.env, self._stop)
        self._listener.close()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)


def serve_environment(env: EnvironmentBase, host: str = "0.0.0.0",
                      port: int = 5555) -> EnvironmentServer:
    """Blocking-friendly helper for the sim host."""
    return EnvironmentServer(env, host, port).start()
