import numpy as np
import pytest

from audio_cut_tpu.config import reset_runtime_config, set_runtime_config


@pytest.fixture(autouse=True)
def _clean():
    yield
    reset_runtime_config()


def test_convtdf_checkpoint_roundtrip(tmp_path):
    import jax

    from audio_cut_tpu.models.convtdf import ConvTDFSeparator, load_checkpoint
    from audio_cut_tpu.training.trainer import TrainConfig, Trainer

    sep = ConvTDFSeparator(44100, n_fft=2048, hop=512, dim_f=256, dim_t=32,
                           channels=8, depth=2, tdf_bottleneck=16)
    trainer = Trainer(sep, TrainConfig())
    ckpt = tmp_path / "ckpt"
    trainer.save_checkpoint(str(ckpt))
    restored = load_checkpoint(str(ckpt))
    orig_leaves = jax.tree_util.tree_leaves(trainer.params)
    rest_leaves = jax.tree_util.tree_leaves(restored)
    assert len(orig_leaves) == len(rest_leaves)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_multi_feature_mode(sine_audio):
    from audio_cut_tpu.analysis.features import build_track_features
    from audio_cut_tpu.detection.pause_detector import PureVocalPauseDetector

    audio, sr = sine_audio
    set_runtime_config({"v2_mdd.pure_vocal_detection.enable_relative_energy_mode": False})
    feats = build_track_features(audio, sr)
    pauses = PureVocalPauseDetector(sr).detect_pure_vocal_pauses(audio, features=feats)
    assert pauses, "legacy mode must still find the sine gaps"
    assert all(p.pause_type.startswith("multi_feature") for p in pauses)
    # silent gaps are unvoiced + long -> decent confidence
    assert max(p.confidence for p in pauses) > 0.4
    for p in pauses:
        assert set(p.features) >= {"f0_score", "flatness_score", "duration_score"}


def test_train_separator_script_smoke(tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "train_separator.py"),
         "--synthetic", "--small", "--steps", "3", "--batch", "2",
         "--checkpoint", str(tmp_path / "ck")],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "checkpoint saved" in out.stdout
