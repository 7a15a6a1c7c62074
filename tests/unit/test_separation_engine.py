import numpy as np
import pytest

from audio_cut_tpu.separation.engine import SeparationEngine, chunk_schedule


def test_chunk_schedule_covers_everything():
    sr = 44100
    total = int(sr * 137.3)
    plans, window = chunk_schedule(total, sr)
    assert window % 4096 == 0
    # effective windows tile [0, total] without gaps or overlaps
    assert plans[0].effective_start == 0
    assert plans[-1].effective_end == total
    for a, b in zip(plans, plans[1:]):
        assert a.effective_end == b.effective_start
    for p in plans:
        assert p.effective_start >= p.start
        assert p.end - p.start == window or p.end == total


def test_chunk_schedule_short_track():
    plans, window = chunk_schedule(1000, 44100)
    assert len(plans) == 1
    assert plans[0].effective_end == 1000


def test_sum_invariant_full(song_audio):
    audio, sr = song_audio
    eng = SeparationEngine(sample_rate=sr, backend="spectral")
    vocal, inst = eng.separate_full(audio)
    np.testing.assert_allclose(vocal + inst, audio, atol=2e-5)


@pytest.mark.slow
def test_chunk_vs_full_equivalence():
    """Gate from the reference: chunked output within L_inf < 5e-3 of full."""
    from tests.conftest import make_song

    audio, sr = make_song(duration_s=35.0, seed=11)
    eng = SeparationEngine(sample_rate=sr, backend="spectral")
    v_full, i_full = eng.separate_full(audio)
    v_chunk, i_chunk, meta = eng.separate_chunked(audio)
    assert meta["gpu_pipeline_chunks"] >= 2
    err = np.abs(v_chunk - v_full).max()
    assert err < 5e-3, f"chunk-vs-full L_inf {err}"
    # SNR > 60 dB
    noise = v_chunk - v_full
    snr = 10 * np.log10((np.mean(v_full ** 2) + 1e-20) / (np.mean(noise ** 2) + 1e-20))
    assert snr > 60.0, f"SNR {snr:.1f} dB"


def test_device_ola_matches_full(song_audio):
    """The on-device OLA program must match the whole-track transform."""
    audio, sr = song_audio
    eng = SeparationEngine(sample_rate=sr, backend="spectral")
    v_full, _ = eng.separate_full(audio)
    v_dev, i_dev, _mix_dev, meta = eng.separate_on_device(audio)
    v_dev = np.asarray(v_dev)
    assert meta["gpu_pipeline_mode"] == "device_ola"
    err = np.abs(v_dev - v_full).max()
    assert err < 5e-3, f"device-OLA vs full L_inf {err}"
    np.testing.assert_allclose(v_dev + np.asarray(i_dev), audio, atol=2e-5)


def test_separation_result_fields(song_audio):
    audio, sr = song_audio
    eng = SeparationEngine(sample_rate=sr, backend="spectral")
    res = eng.separate_for_detection(audio)
    assert res.vocal_track is not None
    assert res.instrumental_track is not None
    assert res.backend_used == "spectral"
    assert 0.0 <= res.separation_confidence <= 1.0
    np.testing.assert_allclose(res.vocal_track + res.instrumental_track, audio, atol=2e-5)
