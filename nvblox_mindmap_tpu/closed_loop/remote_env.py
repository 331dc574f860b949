"""Remote environment bridge: run the policy on a TPU host against a
simulator on another machine.

Isaac Lab is CUDA/x86-bound while the policy runs on a TPU pod, so the sim
boundary becomes a network protocol (SURVEY.md section 7, stage 7). The
protocol is deliberately dumb and robust: length-prefixed messages in a
restricted tagged binary codec (NO pickle - only None/bool/int/float/str/
bytes/ndarray/list/dict are expressible, so neither peer can inject code)
over TCP, one request/response per call of the EnvironmentBase surface.

Security model: the link is assumed to be a trusted point-to-point channel
(both ends under the operator's control). The server binds 127.0.0.1 by
default - reach it across machines via an SSH tunnel or pass an explicit
``host=`` after confirming the network is private.

- Sim host:   ``serve_environment(env, port)`` wraps ANY EnvironmentBase
              (e.g. an Isaac Lab adapter) and serves it.
- TPU host:   ``RemoteEnvironment(host, port)`` implements EnvironmentBase
              against the server; the closed-loop runner and policies are
              unchanged.

Camera frames move as numpy arrays; at 2 cameras x 256^2 RGB-D per step this
is ~0.6 MB/step - far below closed-loop rates on any datacenter link.
"""
from __future__ import annotations

import socket
import struct
import threading
from typing import Dict, Optional

import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import CameraFrame, EnvironmentBase

_HEADER = struct.Struct("!Q")
_U32 = struct.Struct("!I")
_F64 = struct.Struct("!d")
_I64 = struct.Struct("!q")

# --- restricted codec -------------------------------------------------------
# Tagged, length-prefixed binary encoding for the closed set of types the
# protocol actually moves. Decoding never constructs arbitrary objects
# (unlike pickle), so a hostile peer is limited to malformed-data errors.

_MAX_MSG_BYTES = 1 << 30  # 1 GiB sanity bound on any single message


def _enc(obj, out: list) -> None:
    if obj is None:
        out.append(b"N")
    elif isinstance(obj, (bool, np.bool_)):
        # np.bool_ is neither a Python bool nor np.integer - is_success()
        # commonly returns one (e.g. `(dist < tol).all()`).
        out.append(b"T" if obj else b"F")
    elif isinstance(obj, (int, np.integer)):
        out.append(b"i" + _I64.pack(int(obj)))
    elif isinstance(obj, (float, np.floating)):
        out.append(b"f" + _F64.pack(float(obj)))
    elif isinstance(obj, str):
        raw = obj.encode("utf-8")
        out.append(b"s" + _U32.pack(len(raw)) + raw)
    elif isinstance(obj, bytes):
        out.append(b"b" + _U32.pack(len(obj)) + obj)
    elif isinstance(obj, np.ndarray):
        arr = np.ascontiguousarray(obj)
        dt = arr.dtype.str.encode("ascii")  # e.g. b'<f4'
        shape = arr.shape
        head = (
            b"a"
            + _U32.pack(len(dt))
            + dt
            + _U32.pack(len(shape))
            + b"".join(_U32.pack(int(s)) for s in shape)
        )
        raw = arr.tobytes()
        out.append(head + _HEADER.pack(len(raw)))
        out.append(raw)
    elif isinstance(obj, (list, tuple)):
        out.append(b"l" + _U32.pack(len(obj)))
        for item in obj:
            _enc(item, out)
    elif isinstance(obj, dict):
        out.append(b"d" + _U32.pack(len(obj)))
        for key, value in obj.items():
            if not isinstance(key, str):
                raise TypeError(f"codec only supports str dict keys, got {key!r}")
            _enc(key, out)
            _enc(value, out)
    else:
        raise TypeError(f"type not expressible in the remote-env codec: {type(obj)}")


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("truncated message")
        chunk = self.buf[self.pos : self.pos + n]
        self.pos += n
        return chunk

    def u32(self) -> int:
        return _U32.unpack(self.take(_U32.size))[0]


def _dec(r: _Reader):
    tag = r.take(1)
    if tag == b"N":
        return None
    if tag == b"T":
        return True
    if tag == b"F":
        return False
    if tag == b"i":
        return _I64.unpack(r.take(_I64.size))[0]
    if tag == b"f":
        return _F64.unpack(r.take(_F64.size))[0]
    if tag == b"s":
        return r.take(r.u32()).decode("utf-8")
    if tag == b"b":
        return r.take(r.u32())
    if tag == b"a":
        dt = np.dtype(r.take(r.u32()).decode("ascii"))
        if dt.hasobject:
            raise ValueError("object dtypes are not allowed")
        shape = tuple(r.u32() for _ in range(r.u32()))
        (nbytes,) = _HEADER.unpack(r.take(_HEADER.size))
        if nbytes > _MAX_MSG_BYTES:
            raise ValueError("array too large")
        return np.frombuffer(r.take(nbytes), dtype=dt).reshape(shape).copy()
    if tag == b"l":
        return [_dec(r) for _ in range(r.u32())]
    if tag == b"d":
        return {_dec(r): _dec(r) for _ in range(r.u32())}
    raise ValueError(f"unknown codec tag {tag!r}")


def encode_message(obj) -> bytes:
    out: list = []
    _enc(obj, out)
    return b"".join(out)


def decode_message(payload: bytes):
    r = _Reader(payload)
    obj = _dec(r)
    if r.pos != len(payload):
        raise ValueError("trailing bytes in message")
    return obj


def _send_msg(sock: socket.socket, obj) -> None:
    payload = encode_message(obj)
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
    if size > _MAX_MSG_BYTES:
        raise ValueError(f"message of {size} bytes exceeds protocol bound")
    return decode_message(_recv_exactly(sock, size))


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
            name: CameraFrame(f["rgb"], f["depth"], f["intrinsics"], f["pose7"],
                              f.get("segmentation"))
            for name, f in raw.items()
        }

    @property
    def semantic_id_to_class(self) -> Dict[int, str]:
        return {int(k): v for k, v in
                (self._call("semantic_id_to_class") or {}).items()}

    def get_object_poses(self) -> Dict[str, "np.ndarray"]:
        return {k: np.asarray(v)
                for k, v in (self._call("get_object_poses") or {}).items()}

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
            # Poll for readability so stop() can interrupt an idle connected
            # client (a blocking recv would park this thread past stop's
            # join). Once a message starts arriving, _recv_msg reads it
            # whole - polling only between messages keeps framing intact.
            import select

            readable, _, _ = select.select([conn], [], [], 0.5)
            if not readable:
                continue
            try:
                request = _recv_msg(conn)
            except (ConnectionError, EOFError, ValueError, OSError):
                # Disconnect or malformed message: drop this client, keep
                # the server alive for the next one.
                return
            try:
                method = request["method"]
                kwargs = request.get("kwargs", {})
            except (KeyError, TypeError):
                _try_send_error(conn, "malformed request")
                continue
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
                            "segmentation": (
                                None if getattr(f, "segmentation", None) is None
                                else np.asarray(f.segmentation)
                            ),
                        }
                        for name, f in env.get_cameras().items()
                    }
                elif method == "semantic_id_to_class":
                    result = {
                        str(int(k)): str(v)
                        for k, v in env.semantic_id_to_class.items()
                    }
                elif method == "get_object_poses":
                    result = {
                        str(k): np.asarray(v)
                        for k, v in env.get_object_poses().items()
                    }
                elif method == "is_success":
                    result = env.is_success()
                elif method == "done":
                    result = env.done
                else:
                    raise ValueError(f"unknown method {method}")
                _send_msg(conn, {"result": result})
            except Exception as e:  # report errors to the client, keep serving
                if not _try_send_error(conn, repr(e)):
                    return  # client gone mid-reply; drop it, keep the server
    finally:
        conn.close()


def _try_send_error(conn, message: str) -> bool:
    """Best-effort error reply; False if the client connection is dead.

    A send failure inside the error path must not propagate - it would kill
    the server's accept loop while the listener socket stays open, leaving
    every future client hanging against a dead server.
    """
    try:
        _send_msg(conn, {"error": message})
        return True
    except Exception:
        return False


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
        try:
            while not self._stop.is_set():
                try:
                    conn, _ = self._listener.accept()
                except socket.timeout:
                    continue
                except OSError:
                    return  # listener closed by stop()
                # A crashing handler must never kill the accept loop: the
                # port would stay bound against a dead server.
                try:
                    _handle_client(conn, self.env, self._stop)
                except Exception:
                    try:
                        conn.close()
                    except OSError:
                        pass
        finally:
            self._listener.close()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=5)
        # Close the listener even if the serve thread is wedged, so the
        # port is released and a rebind cannot EADDRINUSE.
        try:
            self._listener.close()
        except OSError:
            pass


def serve_environment(env: EnvironmentBase, host: str = "127.0.0.1",
                      port: int = 5555) -> EnvironmentServer:
    """Blocking-friendly helper for the sim host.

    Binds loopback by default; to serve across machines, tunnel the port
    (e.g. ``ssh -L``) or pass an explicit ``host`` on a trusted private
    network. The wire format is the restricted codec above - no pickle.
    """
    return EnvironmentServer(env, host, port).start()
