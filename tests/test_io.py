"""IO layer tests: native pub/sub transport + YAML config round-trips.

Mirrors the reference's comms test strategy (SURVEY.md §4: LCM tests use the
in-memory memq:// transport instead of UDP; message-level round-trips) and
the yaml_io test idioms.
"""

import numpy as np
import pytest

from drake_tpu.io import config as cfg
from drake_tpu.io.pubsub import (
    ArrayPublisher,
    ArraySubscriber,
    PubSub,
    deserialize_arrays,
    serialize_arrays,
)


class TestPubSub:
    def test_memq_round_trip(self):
        node = PubSub("memq://t1")
        got = []
        node.subscribe("CH", lambda ch, data: got.append((ch, data)))
        node.publish("CH", b"payload")
        node.handle(0)
        assert got == [("CH", b"payload")]

    def test_memq_cross_node(self):
        """Two nodes on the same memq URL see each other (drake_lcm.h:19)."""
        a = PubSub("memq://t2")
        b = PubSub("memq://t2")
        sub = b.subscribe("X")
        a.publish("X", b"123")
        assert b.receive(sub) == ("X", b"123")
        assert b.receive(sub) is None

    def test_memq_isolation(self):
        a = PubSub("memq://bus_a")
        b = PubSub("memq://bus_b")
        sub = b.subscribe("X")
        a.publish("X", b"123")
        assert b.receive(sub) is None

    def test_wildcard(self):
        node = PubSub("memq://t3")
        sub = node.subscribe("IIWA_*")
        node.publish("IIWA_STATUS", b"s")
        node.publish("WSG_STATUS", b"w")
        msg = node.receive(sub)
        assert msg == ("IIWA_STATUS", b"s")
        assert node.receive(sub) is None

    def test_udpm_loopback(self):
        a = PubSub("udpm://239.255.76.67:7670")
        b = PubSub("udpm://239.255.76.67:7670")
        sub = b.subscribe("PING")
        a.publish("PING", b"over-udp")
        b.handle(500)
        assert b.receive(sub) == ("PING", b"over-udp")

    def test_typed_arrays(self):
        node = PubSub("memq://t4")
        pub = ArrayPublisher(node, "STATE")
        rec = ArraySubscriber(node, "STATE")
        q = np.arange(7.0)
        pub.publish(q=q, t=np.float64(1.5))
        msg = rec.poll()
        np.testing.assert_array_equal(msg["q"], q)
        assert float(msg["t"]) == 1.5
        assert rec.count == 1

    def test_serializer_round_trip(self):
        data = serialize_arrays(a=np.eye(3), b=np.arange(5, dtype=np.int32))
        out = deserialize_arrays(data)
        np.testing.assert_array_equal(out["a"], np.eye(3))
        assert out["b"].dtype == np.int32


class TestYamlConfig:
    def test_scenario_round_trip(self, tmp_path):
        s = cfg.Scenario(
            simulation_duration=2.5,
            random_seed=42,
            plant=cfg.PlantConfig(time_step=2e-3, discrete_contact_approximation="sap"),
            simulator=cfg.SimulatorYamlConfig(integration_scheme="rk3"),
            model_files=["iiwa.urdf"],
        )
        path = str(tmp_path / "scenario.yaml")
        cfg.save_scenario(s, path)
        s2 = cfg.load_scenario(path)
        assert s2 == s

    def test_yaml_text_round_trip(self):
        c = cfg.MpmYamlConfig(substep_dt=5e-5, contact_friction_mu=0.7)
        text = cfg.save_yaml(c)
        c2 = cfg.load_yaml(cfg.MpmYamlConfig, text)
        assert c2 == c

    def test_partial_yaml_uses_defaults(self):
        c = cfg.load_yaml(cfg.PlantConfig, "time_step: 0.01\n")
        assert c.time_step == 0.01
        assert c.discrete_contact_approximation == "sap"


class TestCheckpoint:
    """save/load of simulation-state pytrees (io/checkpoint.py — the
    Context-cloning + orbax role, reference context.h:463)."""

    def test_roundtrip_nested_pytree(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from drake_tpu.io.checkpoint import load_checkpoint, save_checkpoint
        from drake_tpu.mpm import solver as mpm

        cfg = mpm.MpmConfig(grid_size=(8, 8, 8), dx=1.0 / 8)
        state = mpm.make_particle_block(cfg, (0.2, 0.2, 0.2), (0.4, 0.4, 0.4))
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, state, step=42, metadata={"note": "hi"})
        restored, step, meta = load_checkpoint(p, like=state)
        assert step == 42 and meta["note"] == "hi"
        for a, b in zip(
            jax.tree_util.tree_leaves(state),
            jax.tree_util.tree_leaves(restored),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert a.dtype == b.dtype

    def test_structure_mismatch_raises(self, tmp_path):
        import jax.numpy as jnp
        import pytest as _pytest

        from drake_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        state = {"a": jnp.ones(3), "b": jnp.zeros(2)}
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, state)
        with _pytest.raises(ValueError):
            load_checkpoint(p, like={"a": jnp.ones(3)})
        with _pytest.raises(ValueError):
            load_checkpoint(p, like={"a": jnp.ones(3), "c": jnp.zeros(2)})


class TestMessageLog:
    """Record/playback (the DrakeLcmLog + LcmLogPlaybackSystem roles)."""

    def test_log_round_trip(self, tmp_path):
        from drake_tpu.io.log import MessageLog

        p = str(tmp_path / "traffic.log")
        with MessageLog(p, "w") as log:
            log.write(0.0, "STATE", b"\x01\x02")
            log.write(0.5, "CMD", b"hello")
            log.write(1.0, "STATE", b"\x03")
        with MessageLog(p, "r") as log:
            recs = list(log.records())
        assert recs == [
            (0.0, "STATE", b"\x01\x02"),
            (0.5, "CMD", b"hello"),
            (1.0, "STATE", b"\x03"),
        ]

    def test_attach_tees_publishes(self, tmp_path):
        from drake_tpu.io.log import MessageLog
        from drake_tpu.io.pubsub import PubSub

        p = str(tmp_path / "tee.log")
        node = PubSub("memq://logtest")
        sub = node.subscribe("CH")
        t = [0.0]
        with MessageLog(p, "w") as log:
            log.attach(node, clock=lambda: t[0])
            node.publish("CH", b"a")
            t[0] = 0.25
            node.publish("CH", b"b")
        node.handle()
        assert node.receive(sub) == ("CH", b"a")
        with MessageLog(p, "r") as log:
            recs = list(log.records())
        assert recs == [(0.0, "CH", b"a"), (0.25, "CH", b"b")]
        node.close()

    def test_playback_window(self, tmp_path):
        from drake_tpu.io.log import MessageLog, playback
        from drake_tpu.io.pubsub import PubSub

        p = str(tmp_path / "replay.log")
        with MessageLog(p, "w") as log:
            for k in range(10):
                log.write(0.1 * k, "X", bytes([k]))
        node = PubSub("memq://replay")
        sub = node.subscribe("X")
        with MessageLog(p, "r") as log:
            n = playback(log, node, t_start=0.25, t_end=0.65)
        assert n == 4  # t = 0.3, 0.4, 0.5, 0.6
        node.handle()
        got = []
        while True:
            m = node.receive(sub)
            if m is None:
                break
            got.append(m[1][0])
        assert got == [3, 4, 5, 6]
        node.close()
