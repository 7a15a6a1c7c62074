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
    assert meta["gpu_pipeline_mode"].startswith(("device_ola", "device_ola_pipelined"))
    err = np.abs(v_dev - v_full).max()
    assert err < 5e-3, f"device-OLA vs full L_inf {err}"
    np.testing.assert_allclose(v_dev + np.asarray(i_dev), audio, atol=2e-5)


def test_pipelined_matches_monolithic(song_audio):
    """The pipelined piece path must reproduce the monolithic OLA program:
    stems to float tolerance, the reassembled dequantized mix bit-exactly."""
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config

    audio, sr = song_audio
    eng = SeparationEngine(sample_rate=sr, backend="spectral")
    v_p, i_p, mix_p, meta_p = eng.separate_on_device(audio)
    assert meta_p["gpu_pipeline_mode"].startswith("device_ola_pipelined_p")
    set_runtime_config({"device_pipeline.pipelined_upload": False})
    try:
        eng2 = SeparationEngine(sample_rate=sr, backend="spectral")
        v_m, i_m, mix_m, meta_m = eng2.separate_on_device(audio)
        assert meta_m["gpu_pipeline_mode"] == "device_ola"
    finally:
        reset_runtime_config()
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_p), np.asarray(i_m), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mix_p), np.asarray(mix_m))


def test_pipelined_geometry_change_uses_fresh_combine(song_audio):
    """A runtime OLA-geometry change must rebuild the piece COMBINE program:
    its cache key once omitted geometry, so the stale combine (baked
    groups/spans/inv_wsum) silently corrupted stems (0.62 L_inf measured)."""
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config

    audio, sr = song_audio
    eng0 = SeparationEngine(sample_rate=sr, backend="spectral")
    eng0.separate_on_device(audio)  # populate piece caches at default geometry
    backend = eng0.backend  # same instance -> same cache token, as via make_backend
    set_runtime_config({"device_pipeline.overlap_seconds": 3.5})
    try:
        eng_p = SeparationEngine(sample_rate=sr, backend=backend)
        v_p, i_p, mix_p, meta_p = eng_p.separate_on_device(audio)
        set_runtime_config({
            "device_pipeline.overlap_seconds": 3.5,
            "device_pipeline.pipelined_upload": False,
        })
        eng_m = SeparationEngine(sample_rate=sr, backend=backend)
        v_m, i_m, mix_m, meta_m = eng_m.separate_on_device(audio)
        assert meta_m["gpu_pipeline_mode"] == "device_ola"
    finally:
        reset_runtime_config()
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(i_p), np.asarray(i_m), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mix_p), np.asarray(mix_m))


def test_separation_result_fields(song_audio):
    audio, sr = song_audio
    eng = SeparationEngine(sample_rate=sr, backend="spectral")
    res = eng.separate_for_detection(audio)
    assert res.vocal_track is not None
    assert res.instrumental_track is not None
    assert res.backend_used == "spectral"
    assert 0.0 <= res.separation_confidence <= 1.0
    np.testing.assert_allclose(res.vocal_track + res.instrumental_track, audio, atol=2e-5)


def test_default_path_never_materializes_host_stems(tmp_path):
    """The wave-free detection path must not download the vocal stem: the
    host copy is the single largest tunnel transfer and the default
    mix-segments pipeline runs entirely from device envelopes."""
    import audio_cut_tpu.pipeline.modes.pure_vocal as pv
    from audio_cut_tpu import separate_and_segment
    from audio_cut_tpu.io import write_wav
    from audio_cut_tpu.separation.engine import SeparationResult

    captured = {}
    orig = SeparationResult.vocal_track.fget

    def spying_get(self):
        captured["accessed"] = True
        return orig(self)

    sr = 44100
    t = np.arange(sr * 12) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    for s, d in ((3, 0.6), (8, 0.7)):
        audio[int(s * sr):int((s + d) * sr)] = 0
    song = tmp_path / "song.wav"
    write_wav(song, audio, sr)

    try:
        SeparationResult.vocal_track = property(spying_get, SeparationResult.vocal_track.fset)
        m = separate_and_segment(
            input_uri=str(song), export_dir=str(tmp_path / "out"), mode="v2.2_mdd"
        )
    finally:
        SeparationResult.vocal_track = property(orig, SeparationResult.vocal_track.fset)
    assert m["success"]
    assert "accessed" not in captured, (
        "default mix-segments v2.2_mdd path downloaded the vocal stem"
    )


def test_upload_int16_toggle_equivalence():
    """float32 uploads (upload_int16=false) must agree with the default
    int16-quantized path to the quantization bound (~peak/32767)."""
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.separation.engine import SeparationEngine

    sr = 44100
    rng = np.random.default_rng(5)
    audio = (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr * 5) / sr)
             + 0.05 * rng.standard_normal(sr * 5)).astype(np.float32)

    eng = SeparationEngine(sr)
    v16, i16, _, _ = eng.separate_on_device(audio)
    v16 = np.asarray(v16)
    try:
        set_runtime_config({"device_pipeline.upload_int16": False})
        eng2 = SeparationEngine(sr)
        v32, i32, _, _ = eng2.separate_on_device(audio)
        v32 = np.asarray(v32)
    finally:
        reset_runtime_config()
    assert v16.shape == v32.shape
    assert float(np.abs(v16 - v32).max()) < 5e-4


def test_fused_single_program_matches_staged(tmp_path):
    """The fused OLA+bundle program must produce the same stems and the same
    envelope bundle as the staged two-program path."""
    import jax.numpy as jnp

    from audio_cut_tpu.analysis.bundle import build_detection_bundle
    from audio_cut_tpu.models.vad import build_vad, ConvVAD
    from audio_cut_tpu.separation.engine import SeparationEngine
    from audio_cut_tpu.separation.fused import separate_and_detect_fused

    sr = 44100
    rng = np.random.default_rng(9)
    t = np.arange(sr * 8) / sr
    audio = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    audio[sr * 3:int(sr * 3.6)] *= 0.02

    vad = build_vad(sr)
    vad_model = vad if isinstance(vad, ConvVAD) else None
    eng = SeparationEngine(sr)
    sep_f, bundle_f = separate_and_detect_fused(eng, vad_model, audio)

    eng2 = SeparationEngine(sr)
    v_dev, i_dev, mix_dev, _ = eng2.separate_on_device(audio)
    n_pad = int(mix_dev.shape[-1])
    vd = jnp.pad(v_dev, (0, n_pad - v_dev.shape[-1]))
    bundle_s = build_detection_bundle(mix_dev, vd, sr, len(audio), vad_model=vad_model)

    assert np.allclose(np.asarray(sep_f.vocal_device), np.asarray(v_dev), atol=1e-6)
    assert np.allclose(bundle_f.vocal_rms_fine, bundle_s.vocal_rms_fine, atol=1e-6)
    assert np.allclose(bundle_f.mix_db_guard, bundle_s.mix_db_guard, atol=1e-4)
    assert abs(bundle_f.features.bpm - bundle_s.features.bpm) < 1e-6
    if vad_model is not None:
        assert np.allclose(bundle_f.vad_probs, bundle_s.vad_probs, atol=1e-5)
    assert sep_f.device_meta["gpu_pipeline_mode"] == "fused_single_program"


def test_padded_track_len_buckets():
    """Single source of truth for whole-track program lengths: 15 s buckets
    up to 75 s, then long_bucket_seconds (default 60 s) buckets, then align."""
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.separation.engine import padded_track_len

    sr = 44100
    s = lambda x: int(round(x * sr))
    # short tracks: unchanged 15 s buckets
    assert padded_track_len(s(1.0), sr) == s(15.0)
    assert padded_track_len(s(15.0), sr) == s(15.0)
    assert padded_track_len(s(16.0), sr) == s(30.0)
    assert padded_track_len(s(74.0), sr) == s(75.0)
    # long tracks: 60 s buckets (a 3:05 song shares the 240 s program)
    assert padded_track_len(s(76.0), sr) == s(120.0)
    assert padded_track_len(s(180.0), sr) == s(180.0)
    assert padded_track_len(s(185.0), sr) == s(240.0)
    assert padded_track_len(s(239.0), sr) == s(240.0)
    # align rounding still applies
    v = padded_track_len(s(185.0), sr, align=4096)
    assert v % 4096 == 0 and v >= s(240.0)
    # opt-out restores fine buckets everywhere
    set_runtime_config({"device_pipeline.long_bucket_seconds": 0})
    try:
        assert padded_track_len(s(185.0), sr) == s(195.0)
    finally:
        reset_runtime_config()
