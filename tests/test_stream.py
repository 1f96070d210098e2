"""Audio stream: mix semantics, sample playback, recording, sink thread."""

import numpy as np

import mesheditor_tpu  # noqa: F401
from mesheditor_tpu.synth import ModalSynth, ModalEvent
from mesheditor_tpu.synth.stream import AudioStream
from mesheditor_tpu.types import ModalSoundControls, ModalModes


def make_synth():
    m = ModalModes(
        freqs=np.linspace(100, 2000, 16),
        t60s=np.full(16, 0.3),
        shapes=np.full((2, 16, 3), 0.01, np.float32),
    )
    s = ModalSynth([m], gains=[1.0], max_impacts=8, max_voices=2)
    return s


class TestAudioStream:
    def test_modal_level_scales(self):
        s = make_synth()
        s.enqueue(ModalEvent("impact", obj=0, j=(1, 0, 0), pulse_step=1 / 100,
                             pulse_gamma=1.0))
        st = AudioStream(s, controls=ModalSoundControls(modal_level=0.5))
        out = st.process_block()
        assert np.isfinite(out).all()
        assert np.abs(out).max() > 0

    def test_sample_playback_mixes_and_retires(self):
        s = make_synth()
        st = AudioStream(s, controls=ModalSoundControls(sample_gain=2.0))
        tap = np.ones(700, np.float32) * 0.1
        st.play_sample(tap)
        b1 = st.process_block()
        assert abs(b1[0] - 0.2) < 1e-6  # 0.1 * sample_gain 2.0
        b2 = st.process_block()
        assert abs(b2[700 - 512 - 1] - 0.2) < 1e-6
        assert abs(b2[-1]) < 1e-6  # tail past the sample is silent
        assert not st._playbacks  # retired

    def test_mute_and_volume(self):
        s = make_synth()
        st = AudioStream(s)
        st.play_sample(np.ones(512, np.float32))
        st.muted = True
        assert np.abs(st.process_block()).max() == 0.0

    def test_recording_roundtrip(self, tmp_path):
        s = make_synth()
        st = AudioStream(s)
        st.play_sample(0.25 * np.ones(1024, np.float32))
        st.start_recording()
        st.process_block()
        st.process_block()
        rec = st.stop_recording()
        assert rec.size == 1024
        assert abs(rec[0] - 0.25) < 1e-6

    def test_sink_thread_receives_blocks(self):
        s = make_synth()
        got = []
        st = AudioStream(s, sink=lambda b: got.append(b))
        st.start()
        st.pump(4)
        st.stop()
        assert len(got) == 4
        assert all(b.shape == (512,) for b in got)
