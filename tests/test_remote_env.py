"""Remote environment bridge over localhost: full closed-loop episode."""
import numpy as np

from nvblox_mindmap_tpu.closed_loop.environment import KinematicEnvironment
from nvblox_mindmap_tpu.closed_loop.evaluators import BasicEvaluator
from nvblox_mindmap_tpu.closed_loop.policies import GroundTruthPolicy
from nvblox_mindmap_tpu.closed_loop.remote_env import (
    EnvironmentServer,
    RemoteEnvironment,
)
from nvblox_mindmap_tpu.closed_loop.runner import ClosedLoopConfig, run_one_episode
from nvblox_mindmap_tpu.embodiments.arm import ArmEmbodiment
from tests.test_closed_loop import arm_state


def test_remote_environment_roundtrip():
    emb = ArmEmbodiment()
    local = KinematicEnvironment(
        emb, arm_state([0, 0, 0.3]), [np.asarray([0.3, 0, 0.3])], max_step_m=0.05
    )
    server = EnvironmentServer(local, port=0).start()
    try:
        remote = RemoteEnvironment("127.0.0.1", server.port)
        remote.reset()
        state = remote.get_policy_state()
        np.testing.assert_allclose(state, arm_state([0, 0, 0.3]))
        frames = remote.get_cameras()
        assert "wrist" in frames
        assert frames["wrist"].rgb.shape == (32, 32, 3)
        remote.step(arm_state([0.3, 0, 0.3]))
        moved = remote.get_policy_state()
        assert moved[0] > state[0]
        assert not remote.is_success()
        remote.close()
    finally:
        server.stop()


def test_full_episode_through_the_bridge():
    emb = ArmEmbodiment()
    waypoints = [np.asarray([0.25, 0.0, 0.3])]
    local = KinematicEnvironment(emb, arm_state([0, 0, 0.3]), waypoints,
                                 max_step_m=0.05)
    server = EnvironmentServer(local, port=0).start()
    try:
        remote = RemoteEnvironment("127.0.0.1", server.port)
        policy = GroundTruthPolicy(np.stack([arm_state(w) for w in waypoints]))
        evaluator = BasicEvaluator()
        evaluator.start_demo("demo_0")
        success = run_one_episode(
            remote, policy, emb, evaluator, ClosedLoopConfig(max_num_steps=100)
        )
        assert success
        remote.close()
    finally:
        server.stop()


def test_codec_roundtrip_and_rejects_unknown():
    from nvblox_mindmap_tpu.closed_loop.remote_env import (
        decode_message,
        encode_message,
    )

    msg = {
        "method": "step",
        "kwargs": {"goal": np.arange(8, dtype=np.float32)},
        "flags": [True, False, None, 3, 2.5, "text", b"raw"],
        "nested": {"img": np.zeros((4, 5, 3), dtype=np.uint8)},
    }
    out = decode_message(encode_message(msg))
    assert out["method"] == "step"
    np.testing.assert_array_equal(out["kwargs"]["goal"],
                                  np.arange(8, dtype=np.float32))
    assert out["flags"] == [True, False, None, 3, 2.5, "text", b"raw"]
    assert out["nested"]["img"].shape == (4, 5, 3)

    import pickle

    import pytest

    # A pickle payload (the classic RCE vector) is NOT decodable.
    with pytest.raises(ValueError):
        decode_message(pickle.dumps({"method": "reset"}))
    # Arbitrary objects are NOT encodable.
    with pytest.raises(TypeError):
        encode_message({"cb": lambda: None})


def test_server_binds_loopback_by_default():
    import inspect

    from nvblox_mindmap_tpu.closed_loop.remote_env import serve_environment

    sig = inspect.signature(serve_environment)
    assert sig.parameters["host"].default == "127.0.0.1"


def test_server_survives_bad_requests_and_np_bool(tmp_path):
    """np.bool_ results serialize; malformed requests and client crashes do
    not kill the accept loop; stop() releases the port with an idle client."""
    import socket
    import struct
    import time

    from nvblox_mindmap_tpu.closed_loop.environment import EnvironmentBase
    from nvblox_mindmap_tpu.closed_loop.remote_env import (
        EnvironmentServer,
        RemoteEnvironment,
    )

    class BoolEnv(EnvironmentBase):
        def reset(self):
            pass

        def step(self, goal):
            pass

        def get_robot_state(self):
            return np.zeros(8, np.float32)

        def get_policy_state(self):
            return np.zeros(8, np.float32)

        def get_cameras(self):
            return {}

        def is_success(self):
            return np.bool_(True)  # numpy bool, not Python bool

    server = EnvironmentServer(BoolEnv(), port=0).start()
    try:
        # 1. A garbage client must not kill the server.
        raw = socket.create_connection(("127.0.0.1", server.port))
        raw.sendall(struct.pack("<q", 12) + b"notamessage!")
        raw.close()
        time.sleep(0.3)

        # 2. A real client still works afterwards; np.bool_ round-trips.
        env = RemoteEnvironment("127.0.0.1", server.port)
        assert env.is_success() is True
        # Keep this client CONNECTED and idle while stopping.
        server.stop()
    finally:
        server.stop()
    # 3. The port is released (rebind succeeds).
    probe = socket.socket()
    probe.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    probe.bind(("127.0.0.1", server.port))
    probe.close()
