import jax
import numpy as np
import pytest

from audio_cut_tpu.models.vad import FRAME, VAD_SR, ConvVAD, build_vad
from audio_cut_tpu.training.vad_train import VadTrainConfig, VadTrainer, synth_batch


class TestConvVAD:
    def test_shapes_and_wrapper(self):
        vad = ConvVAD(sample_rate=44100)
        audio = np.random.default_rng(0).standard_normal(44100 * 2).astype(np.float32) * 0.1
        probs, fps = vad.speech_probs(audio)
        assert probs.shape[0] == (2 * VAD_SR) // FRAME
        assert (0.0 <= probs).all() and (probs <= 1.0).all()
        assert abs(fps - VAD_SR / FRAME) < 1e-9

    def test_training_learns_discrimination(self):
        cfg = VadTrainConfig(batch_size=8, clip_s=1.0)
        trainer = VadTrainer(cfg, seed=1)
        rng = np.random.default_rng(2)
        first = trainer.train(1, rng)
        metrics = trainer.train(40, rng)
        assert metrics["loss"] < first["loss"]
        assert metrics["accuracy"] > 0.8, metrics

    def test_build_vad_defaults_to_energy_gate(self):
        from audio_cut_tpu.detection.vad import EnergyGateDetector

        assert isinstance(build_vad(44100), EnergyGateDetector)

    def test_synth_batch_labels_align(self):
        audio, labels = synth_batch(np.random.default_rng(3), VadTrainConfig(batch_size=4, clip_s=1.0))
        assert audio.shape == (4, VAD_SR)
        assert labels.shape == (4, VAD_SR // FRAME)


class TestBatchSharding:
    def test_separate_batch_sharded_8dev(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from audio_cut_tpu.parallel.batch import separate_batch_sharded
        from audio_cut_tpu.parallel.mesh import make_mesh

        sr = 44100
        rng = np.random.default_rng(0)
        tracks = [rng.standard_normal(sr * d).astype(np.float32) * 0.1 for d in (2, 3, 2, 4, 2, 3)]
        mesh = make_mesh(jax.devices()[:8], dp=8, sp=1, tp=1)
        out = separate_batch_sharded(tracks, sr, mesh=mesh)
        assert len(out) == 6
        for (v, i), t in zip(out, tracks):
            assert v.shape == t.shape
            np.testing.assert_allclose(v + i, t, atol=2e-5)
