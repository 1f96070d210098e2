"""Crash recovery + replay-divergence fixtures (scene/session.py).

Mirrors the reference's restore-session + in-app replay self-test semantics
(/root/reference/src/action/Log.h:70-78, main.cpp:409-423): a SIGKILLed process's
session replays byte-exact, retention prunes old dirs, and a divergent replay writes a
reproducing fixture instead of silently passing.
"""

import os
import signal
import subprocess
import sys
import textwrap

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.scene import actions as A
from mesheditor_tpu.scene.registry import Registry
from mesheditor_tpu.scene.session import Session, SessionStore, verify_replay
from mesheditor_tpu.scene.snapshot import snapshot_scene


def _make_session(tmp_path, n_actions=3):
    s = Session(root=tmp_path / "sessions")
    for i in range(n_actions):
        s.apply(A.AddObject(name=f"obj{i}"))
        s.process()
    return s


class TestSessionRoundtrip:
    def test_restore_matches_live(self, tmp_path):
        s = _make_session(tmp_path)
        from mesheditor_tpu.scene.components import Name

        obj1 = next(e for e in s.registry.entities()
                    if s.registry.has(e, Name) and s.registry.get(e, Name).value == "obj1")
        s.apply(A.SetTransform(entity=obj1, translation=(1.0, 2.0, 3.0)))
        s.process()
        live = snapshot_scene(s.registry)
        s.close()
        store = SessionStore(tmp_path / "sessions")
        restored = store.restore(store.list()[-1])
        assert snapshot_scene(restored) == live

    def test_verify_replay_clean(self, tmp_path):
        s = _make_session(tmp_path)
        s.log.close()  # flush
        assert verify_replay(s.registry, s.dir) is None

    def test_divergence_writes_fixture(self, tmp_path):
        s = _make_session(tmp_path)
        s.log.close()
        # Mutate the scene OUTSIDE the action system — the exact invariant violation
        # the self-test exists to catch.
        s.apply_unrecorded = A.AddObject(name="rogue")
        from mesheditor_tpu.scene.actions import apply_action

        apply_action(s.registry, s.apply_unrecorded)
        s.registry.process()
        fixture = verify_replay(s.registry, s.dir, fixture_root=tmp_path / "fix")
        assert fixture is not None
        assert (fixture / "actions.log").exists()
        assert (fixture / "live_snapshot.bin").exists()
        assert (fixture / "replayed_snapshot.bin").exists()
        assert "divergence" in (fixture / "report.txt").read_text()

    def test_retention_prunes_old_sessions(self, tmp_path):
        root = tmp_path / "sessions"
        for _ in range(4):
            s = Session(root=root, retain=2)
            s.close()
        store = SessionStore(root)
        assert len(store.list()) <= 3  # 2 retained + the newest


class TestCrashRecovery:
    def test_sigkill_mid_session_restores(self, tmp_path):
        """kill -9 the process mid-session; the restore dir must replay to the state
        of every action it managed to flush — and flushing is per-record."""
        root = tmp_path / "sessions"
        script = textwrap.dedent(f"""
            import os, sys, time
            sys.path.insert(0, {str(os.getcwd())!r})
            from mesheditor_tpu.scene import actions as A
            from mesheditor_tpu.scene.session import Session
            s = Session(root={str(root)!r})
            for i in range(5):
                s.apply(A.AddObject(name=f"obj{{i}}"))
                s.process()
            s.log.drain()
            print("READY", flush=True)
            time.sleep(30)  # killed here
        """)
        env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
        proc = subprocess.Popen([sys.executable, "-u", "-c", script],
                                stdout=subprocess.PIPE, env=env)
        try:
            line = proc.stdout.readline().decode()
            assert "READY" in line
        finally:
            proc.kill()
        proc.wait()
        store = SessionStore(root)
        sessions = store.list()
        assert sessions, "restore dir must survive the kill"
        r = store.restore(sessions[-1])
        from mesheditor_tpu.scene.components import Name

        names = {r.get(e, Name).value for e in r.entities() if r.has(e, Name)}
        assert {f"obj{i}" for i in range(5)} <= names
