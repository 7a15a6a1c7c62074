"""Neural backends on the fast path (VERDICT r2 task 1).

The trained separator must ride the SAME device programs as the spectral
backend: the device-OLA whole-track program, the fused OLA+bundle single
program, and sp-sharded serving. These tests run the ConvTDF backend (small
geometry, real msgpack checkpoint round-trip) and the ONNX fixture backend
through all three paths. Parity target: the reference's neural model IS its
hot path (reference src/audio_cut/separation/backends.py:299-330).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_cut_tpu.config import reset_runtime_config, set_runtime_config

SR = 44100


@pytest.fixture(scope="module")
def convtdf_overrides(tmp_path_factory):
    """Small-geometry ConvTDF checkpoint + the runtime config selecting it."""
    from flax import serialization

    from audio_cut_tpu.models.convtdf import ConvTDFSeparator

    sep = ConvTDFSeparator(SR, n_fft=2048, hop=512, dim_f=256, dim_t=32,
                           channels=8, depth=2, tdf_bottleneck=16)
    params = sep.init_params(jax.random.PRNGKey(42))
    path = tmp_path_factory.mktemp("ckpt") / "small_convtdf.msgpack"
    path.write_bytes(serialization.to_bytes(params))
    return {
        "enhanced_separation.backend": "convtdf",
        "enhanced_separation.convtdf.checkpoint": str(path),
        "enhanced_separation.convtdf.n_fft": 2048,
        "enhanced_separation.convtdf.hop": 512,
        "enhanced_separation.convtdf.dim_f": 256,
        "enhanced_separation.convtdf.dim_t": 32,
        "enhanced_separation.convtdf.num_blocks": 6,
        "enhanced_separation.convtdf.channels": 8,
        "enhanced_separation.convtdf.tdf_bottleneck": 16,
    }


def _onnx_overrides(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_onnx import _identity_mask_model

    p = _identity_mask_model(tmp_path)
    return {
        "enhanced_separation.backend": "onnx",
        "enhanced_separation.onnx.model_path": str(p),
        "enhanced_separation.onnx.n_fft": 1024,
        "enhanced_separation.onnx.hop": 256,
        "enhanced_separation.onnx.dim_f": 513,
        "enhanced_separation.onnx.dim_t": 64,
    }


def _noisy_song(seconds=12.0, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    audio = (0.4 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    audio[int(SR * 3):int(SR * 3.6)] *= 0.02
    return audio


def test_convtdf_engine_adopts_native_geometry(convtdf_overrides):
    from audio_cut_tpu.separation.engine import SeparationEngine

    set_runtime_config(convtdf_overrides)
    try:
        eng = SeparationEngine(SR)
        eng._ensure_geometry()
        assert eng._backend_name == "convtdf"
        # engine windows == model windows ((dim_t-1)*hop samples)
        assert int(round(eng.chunk_s * SR)) == 31 * 512
        assert eng.align == 512
    finally:
        reset_runtime_config()


def test_convtdf_device_ola_reconstruction_and_meta(convtdf_overrides):
    """vocal + instrumental must reconstruct the (dequantized) mix through
    the whole-track device-OLA program — the OLA weights normalise exactly."""
    from audio_cut_tpu.separation.engine import SeparationEngine

    set_runtime_config(convtdf_overrides)
    try:
        audio = _noisy_song()
        eng = SeparationEngine(SR)
        v_dev, i_dev, _mix, meta = eng.separate_on_device(audio)
        v = np.asarray(v_dev)
        i = np.asarray(i_dev)
        assert meta["gpu_pipeline_mode"].startswith("device_ola")
        assert meta["gpu_pipeline_backend"] == "convtdf"
        assert v.shape == audio.shape
        # int16 upload quantization bounds the reconstruction error
        np.testing.assert_allclose(v + i, audio, atol=3e-4)
        # the mask net must actually separate (not pass-through): vocal != mix
        assert float(np.abs(v - audio).max()) > 1e-3
    finally:
        reset_runtime_config()


def test_convtdf_device_ola_matches_host_ola(convtdf_overrides):
    """The in-graph OLA accumulation must equal a host-side overlap-add of
    the same per-window outputs with the same plan weights."""
    from audio_cut_tpu.separation.engine import (
        PAD_BUCKET_S,
        SeparationEngine,
        ola_plan,
        quantize_upload,
    )

    set_runtime_config(convtdf_overrides)
    try:
        audio = _noisy_song(seconds=9.0, seed=5)
        eng = SeparationEngine(SR)
        v_dev, _i, _m, _meta = eng.separate_on_device(audio)
        v = np.asarray(v_dev)

        eng._ensure_geometry()
        n = audio.size
        bucket = int(round(PAD_BUCKET_S * SR))
        padded_len = max(bucket, ((n + bucket - 1) // bucket) * bucket)
        padded_len = ((padded_len + eng.align - 1) // eng.align) * eng.align
        plans, window, weights, inv_wsum = ola_plan(
            padded_len, SR, eng.chunk_s, eng.overlap_s, eng.halo_s, eng.align
        )
        padded = np.pad(audio, (0, padded_len - n))
        raw, scale = quantize_upload(padded)
        dequant = raw.astype(np.float32) * scale
        wins = np.stack([dequant[p.start:p.start + window] for p in plans])
        v_wins, _ = eng.backend.separate_windows_fn(jnp.asarray(wins))
        v_wins = np.asarray(v_wins)
        acc = np.zeros(padded_len, np.float32)
        for k, p in enumerate(plans):
            acc[p.start:p.start + window] += v_wins[k] * weights[k]
        ref = (acc * inv_wsum)[:n]
        np.testing.assert_allclose(v, ref, atol=1e-5)
    finally:
        reset_runtime_config()


def test_convtdf_fused_single_program_matches_staged(convtdf_overrides):
    from audio_cut_tpu.analysis.bundle import build_detection_bundle
    from audio_cut_tpu.models.vad import ConvVAD, build_vad
    from audio_cut_tpu.separation.engine import SeparationEngine
    from audio_cut_tpu.separation.fused import separate_and_detect_fused

    set_runtime_config(convtdf_overrides)
    try:
        audio = _noisy_song(seconds=8.0, seed=9)
        vad = build_vad(SR)
        vad_model = vad if isinstance(vad, ConvVAD) else None
        eng = SeparationEngine(SR)
        sep_f, bundle_f = separate_and_detect_fused(eng, vad_model, audio)
        assert sep_f.device_meta["gpu_pipeline_mode"].startswith(("fused_single_program", "fused_pipelined"))
        assert sep_f.backend_used == "convtdf"

        eng2 = SeparationEngine(SR)
        v_dev, i_dev, mix_dev, _ = eng2.separate_on_device(audio)
        n_pad = int(mix_dev.shape[-1])
        vd = jnp.pad(v_dev, (0, n_pad - v_dev.shape[-1]))
        bundle_s = build_detection_bundle(mix_dev, vd, SR, len(audio), vad_model=vad_model)

        assert np.allclose(np.asarray(sep_f.vocal_device), np.asarray(v_dev), atol=1e-5)
        assert np.allclose(bundle_f.vocal_rms_fine, bundle_s.vocal_rms_fine, atol=1e-5)
        assert np.allclose(bundle_f.mix_db_guard, bundle_s.mix_db_guard, atol=1e-3)
        if vad_model is not None:
            assert np.allclose(bundle_f.vad_probs, bundle_s.vad_probs, atol=1e-4)
    finally:
        reset_runtime_config()


def test_convtdf_sp_sharded_matches_engine(convtdf_overrides):
    from audio_cut_tpu.parallel.batch import separate_track_sp_sharded
    from audio_cut_tpu.parallel.mesh import make_mesh
    from audio_cut_tpu.separation.engine import SeparationEngine

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    set_runtime_config(convtdf_overrides)
    try:
        audio = _noisy_song(seconds=16.0, seed=13)
        eng = SeparationEngine(SR)
        v_ref, i_ref, _m, _ = eng.separate_on_device(audio)
        mesh = make_mesh(jax.devices()[:8], dp=8, sp=1, tp=1)
        v_sp, i_sp = separate_track_sp_sharded(audio, SR, mesh=mesh, backend="convtdf")
        err = float(np.abs(v_sp - np.asarray(v_ref)).max())
        assert err < 1e-5, f"sp-sharded convtdf serving L_inf {err}"
    finally:
        reset_runtime_config()


def test_convtdf_windows_fn_tiling_fallback(convtdf_overrides):
    """Generic (non-native) window sizes must still work via in-graph tiling."""
    from audio_cut_tpu.separation.backends import make_backend

    set_runtime_config(convtdf_overrides)
    try:
        bk = make_backend("convtdf", SR)
        rng = np.random.default_rng(0)
        wins = (rng.standard_normal((3, 20000)) * 0.1).astype(np.float32)
        v, i = jax.jit(bk.separate_windows_fn)(jnp.asarray(wins))
        assert v.shape == wins.shape
        np.testing.assert_allclose(np.asarray(v) + np.asarray(i), wins, atol=2e-5)
    finally:
        reset_runtime_config()


def test_onnx_backend_device_ola_and_fused(tmp_path):
    """The ONNX-executor backend rides the device-OLA and fused programs."""
    from audio_cut_tpu.models.vad import ConvVAD, build_vad
    from audio_cut_tpu.separation.engine import SeparationEngine
    from audio_cut_tpu.separation.fused import separate_and_detect_fused

    set_runtime_config(_onnx_overrides(tmp_path))
    try:
        audio = _noisy_song(seconds=6.0, seed=21)
        eng = SeparationEngine(SR)
        v_dev, i_dev, _m, meta = eng.separate_on_device(audio)
        assert meta["gpu_pipeline_mode"].startswith("device_ola")
        assert meta["gpu_pipeline_backend"] == "onnx"
        # identity mask at full bins: OLA-merged vocal == (dequantized) mix
        np.testing.assert_allclose(np.asarray(v_dev), audio, atol=3e-4)

        vad = build_vad(SR)
        vad_model = vad if isinstance(vad, ConvVAD) else None
        sep_f, bundle_f = separate_and_detect_fused(SeparationEngine(SR), vad_model, audio)
        assert sep_f.device_meta["gpu_pipeline_mode"].startswith(("fused_single_program", "fused_pipelined"))
        np.testing.assert_allclose(np.asarray(sep_f.vocal_device), np.asarray(v_dev), atol=1e-5)
    finally:
        reset_runtime_config()


def test_local_valley_refine_respects_asr_words():
    """A strictly-quieter valley inside a recognised word must be rejected
    (reference protected_intervals_s, seamless_splitter.py:619-629; ADVICE r2)."""
    from audio_cut_tpu.pipeline.modes.pure_vocal import _local_valley_refine

    sr = 1000
    audio = np.full(5 * sr, 0.5, np.float32)
    audio[int(2.3 * sr):int(2.4 * sr)] = 0.001   # deep valley at ~2.35 s
    # no protection: the cut at 2.0 s moves into the valley
    moved = _local_valley_refine(
        [2.0], audio, sr, radius_ms=500, window_ms=5, min_drop_db=5.0
    )
    assert abs(moved[0] - 2.35) < 0.1
    # valley lies inside the word [2.25, 2.5]: boundary must stay put
    kept = _local_valley_refine(
        [2.0], audio, sr, radius_ms=500, window_ms=5, min_drop_db=5.0,
        word_intervals=[(2.25, 2.5)],
    )
    assert kept[0] == 2.0


def test_energy_gate_waveform_free():
    """EnergyGateDetector must run from an envelope alone (ADVICE r2)."""
    from audio_cut_tpu.detection.vad import EnergyGateDetector

    det = EnergyGateDetector(SR)
    fps = SR / det.hop
    n = int(6 * fps)
    env = np.full(n, 1e-5, np.float32)
    env[int(1 * fps):int(2 * fps)] = 0.3
    res = det.detect(None, rms_env=env)
    assert len(res.segments) == 1
    a, b = res.segments[0]
    assert abs(a - 1.0) < 0.1 and abs(b - 2.0) < 0.1


def test_chunked_telemetry_reports_real_platform(convtdf_overrides):
    """CPU runs must not claim gpu_pipeline_device=tpu (VERDICT r2 weak #5)."""
    from audio_cut_tpu.separation.engine import SeparationEngine

    set_runtime_config(convtdf_overrides)
    try:
        eng = SeparationEngine(SR)
        audio = _noisy_song(seconds=2.0)
        _v, _i, meta = eng.separate_chunked(audio)
        assert meta["gpu_pipeline_device"] == jax.default_backend()
    finally:
        reset_runtime_config()
