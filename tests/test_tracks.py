"""Surface roughness tracks: determinism, normalization, spectral shape, windowed reads."""

import numpy as np

from mesheditor_tpu.synth.tracks import (
    RoughnessTrack,
    hash_params,
    make_profile_track,
    read_track,
    synthesize_roughness,
    track_integral,
)


class TestSynthesizeRoughness:
    def test_deterministic_in_arguments(self):
        a = synthesize_roughness(1e-3, -2.0, 1e-6, 4096)
        b = synthesize_roughness(1e-3, -2.0, 1e-6, 4096)
        assert np.array_equal(a.heights, b.heights)

    def test_different_params_different_tracks(self):
        a = synthesize_roughness(1e-3, -2.0, 1e-6, 4096)
        b = synthesize_roughness(2e-3, -2.0, 1e-6, 4096)
        assert not np.array_equal(a.heights, b.heights)

    def test_zero_mean_unit_rms(self):
        t = synthesize_roughness(1e-3, -2.0, 1e-6, 8192)
        assert abs(t.heights.mean()) < 1e-6
        assert abs(np.sqrt((t.heights.astype(np.float64) ** 2).mean()) - 1.0) < 1e-5

    def test_spectral_rolloff(self):
        # Flat below q0 = 1/correlation_length, falling as q^(slope/2) in amplitude above:
        # with slope -2, power at 4*q0 should be ~16x below power at q0.
        corr, spacing, n = 1e-4, 1e-6, 32768
        t = synthesize_roughness(corr, -2.0, spacing, n)
        spec = np.abs(np.fft.rfft(t.heights.astype(np.float64))) ** 2
        q = np.fft.rfftfreq(n, spacing)
        q0 = 1.0 / corr
        lo = spec[(q > 0.5 * q0) & (q < q0)].mean()
        hi = spec[(q > 3.5 * q0) & (q < 4.5 * q0)].mean()
        ratio = lo / hi
        assert 8 < ratio < 32  # ~16 with sampling noise

    def test_running_integral(self):
        t = synthesize_roughness(1e-3, -2.0, 1e-6, 1024)
        assert t.sums.shape[0] == 1025
        assert np.allclose(t.sums[1:], np.cumsum(t.heights), atol=1e-3)

    def test_degenerate_inputs(self):
        t = synthesize_roughness(1e-3, -2.0, 0.0, 1024)  # zero spacing -> flat track
        assert np.all(t.heights == 0)


class TestReadTrack:
    def _ramp(self):
        h = np.arange(16, dtype=np.float32)
        sums = np.zeros(17, np.float32)
        np.cumsum(h, out=sums[1:])
        return RoughnessTrack(h, sums, spacing=1.0)

    def test_interpolated_read(self):
        t = self._ramp()
        assert read_track(t, 3.0, 0.0) == 3.0
        assert read_track(t, 3.5, 0.0) == 3.5

    def test_wraparound(self):
        t = self._ramp()
        # Position 16 wraps to 0; interpolation at 15.5 blends last and first samples.
        assert read_track(t, 16.0, 0.0) == 0.0
        assert read_track(t, 15.5, 0.0) == 0.5 * (15 + 0)

    def test_windowed_read_is_box_mean(self):
        t = self._ramp()
        # Mean over window 4 centered at 8: samples ~[6..10) -> integral difference / 4.
        expected = (track_integral(t, 10.0) - track_integral(t, 6.0)) / 4.0
        assert abs(read_track(t, 8.0, 4.0) - expected) < 1e-6
        direct = np.mean(np.arange(6, 10))
        assert abs(read_track(t, 8.0, 4.0) - direct) < 1e-6

    def test_integral_wraps_linearly(self):
        t = self._ramp()
        total = float(t.sums[-1])
        assert abs(track_integral(t, 16.0 + 3.0) - (total + track_integral(t, 3.0))) < 1e-4


class TestProfileTrack:
    def test_profile_keeps_rms(self):
        rng = np.random.default_rng(0)
        heights = rng.normal(0, 2.5e-6, 2048)
        t = make_profile_track(heights, 1e-6)
        assert abs(t.rms - np.sqrt(((heights - heights.mean()) ** 2).mean())) < 1e-9
        # Stored heights are normalized.
        assert abs(np.sqrt((t.heights.astype(np.float64) ** 2).mean()) - 1.0) < 1e-5


class TestHashParams:
    def test_stable_and_distinct(self):
        a = hash_params(1, 0.5, 2.0)
        assert a == hash_params(1, 0.5, 2.0)
        assert a != hash_params(1, 0.5, 2.1)
        assert a != hash_params(2, 0.5, 2.0)
