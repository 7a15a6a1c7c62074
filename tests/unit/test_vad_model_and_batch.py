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

    def test_build_vad_default(self):
        """conv + packaged bootstrap checkpoint when present, else energy gate."""
        from audio_cut_tpu.detection.vad import EnergyGateDetector
        from audio_cut_tpu.models.vad import default_checkpoint_path

        vad = build_vad(44100)
        if default_checkpoint_path():
            assert isinstance(vad, ConvVAD) and vad.trained
        else:
            assert isinstance(vad, EnergyGateDetector)

    def test_build_vad_energy_gate_override(self):
        from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
        from audio_cut_tpu.detection.vad import EnergyGateDetector

        set_runtime_config({"vad.backend": "energy_gate"})
        try:
            assert isinstance(build_vad(44100), EnergyGateDetector)
        finally:
            reset_runtime_config()

    def test_build_vad_bad_checkpoint_falls_back(self, tmp_path):
        from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
        from audio_cut_tpu.detection.vad import EnergyGateDetector
        from audio_cut_tpu.models.vad import default_checkpoint_path

        bad = tmp_path / "broken.msgpack"
        bad.write_bytes(b"not a checkpoint")
        set_runtime_config({"vad.backend": "conv", "vad.checkpoint": str(bad)})
        try:
            vad = build_vad(44100)
        finally:
            reset_runtime_config()
        assert isinstance(vad, EnergyGateDetector)

    def test_msgpack_checkpoint_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from audio_cut_tpu.training.vad_train import VadTrainConfig, VadTrainer

        trainer = VadTrainer(VadTrainConfig(batch_size=4, clip_s=1.0), seed=3)
        p = tmp_path / "vad.msgpack"
        trainer.save(str(p))
        vad = ConvVAD(44100, checkpoint=str(p))
        assert vad.trained
        leaves_a = jax.tree_util.tree_leaves(trainer.params)
        leaves_b = jax.tree_util.tree_leaves(vad.params)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_windowed_long_track_matches_short_path(self):
        """Windowed batched inference == whole-clip inference (halo-trimmed)."""
        vad = ConvVAD(sample_rate=16000)
        rng = np.random.default_rng(9)
        short = (rng.standard_normal(16000 * 4) * 0.2).astype(np.float32)
        p_short, _ = vad.speech_probs(short)
        # long track: force the windowed path, then compare its first 4 s
        long = np.concatenate([short, (rng.standard_normal(16000 * 10) * 0.2).astype(np.float32)])
        p_long, _ = vad.speech_probs(long)
        n = p_short.shape[0]
        # interior frames must agree closely (halo covers the receptive field)
        np.testing.assert_allclose(p_long[8:n - 8], p_short[8:n - 8], atol=5e-2)

    def test_trained_checkpoint_beats_energy_gate(self):
        """VERDICT done-criterion: conv VAD > energy gate on frame F1."""
        from audio_cut_tpu.models.vad import default_checkpoint_path

        ckpt = default_checkpoint_path()
        if ckpt is None:
            pytest.skip("packaged checkpoint not built yet")
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent.parent / "scripts"))
        from train_vad import evaluate

        vad = ConvVAD(16000, checkpoint=ckpt)
        conv_f1, gate_f1 = evaluate(vad.params, vad.net, np.random.default_rng(123))
        assert conv_f1 > gate_f1, (conv_f1, gate_f1)
        assert conv_f1 > 0.8, conv_f1

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


def test_device_path_matches_host_path():
    """speech_probs_from_device (fused device resample+forward) must agree
    with the host scipy-resample path on the derived speech mask."""
    import jax.numpy as jnp

    from audio_cut_tpu.models.vad import ConvVAD, default_checkpoint_path

    ckpt = default_checkpoint_path()
    if ckpt is None:
        import pytest

        pytest.skip("no packaged ConvVAD checkpoint")
    sr = 44100
    vad = ConvVAD(sr, checkpoint=ckpt)
    rng = np.random.default_rng(11)
    t = np.arange(sr * 12) / sr
    audio = (0.02 * rng.standard_normal(t.size)).astype(np.float32)
    for s, d in ((1.0, 2.0), (5.0, 2.5), (9.0, 1.5)):
        seg = (t >= s) & (t < s + d)
        audio[seg] += 0.4 * np.sin(2 * np.pi * 220 * t[seg]).astype(np.float32) * (
            0.3 + 0.7 * np.clip(np.sin(2 * np.pi * 4.0 * t[seg]), 0, None)
        )

    p_host, fps_h = vad.speech_probs(audio)
    p_dev, fps_d = vad.speech_probs_from_device(jnp.asarray(audio), audio.size)
    assert fps_h == fps_d
    n = min(p_host.size, p_dev.size)
    assert n > 0
    mask_h = p_host[:n] > vad.threshold
    mask_d = p_dev[:n] > vad.threshold
    agreement = float(np.mean(mask_h == mask_d))
    assert agreement > 0.9, f"mask agreement {agreement:.3f}"
    assert float(np.mean(np.abs(p_host[:n] - p_dev[:n]))) < 0.1


def test_vad_sidecar_architecture_and_threshold(tmp_path):
    """Checkpoint sidecar drives architecture (context layers) and the
    calibrated threshold; an explicit threshold always wins; sidecar-less
    checkpoints keep the v1 default architecture."""
    import json

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from audio_cut_tpu.models.vad import (
        FRAME,
        LENGTH_BUCKET,
        ConvVAD,
        ConvVADNet,
        context_halo_s,
    )

    net = ConvVADNet(context=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, LENGTH_BUCKET)))["params"]
    ck = str(tmp_path / "vad.msgpack")
    with open(ck, "wb") as f:
        f.write(serialization.to_bytes(params))
    json.dump({"channels": 32, "depth": 4, "context": 2, "threshold": 0.35},
              open(ck + ".json", "w"))

    vad = ConvVAD(44100, checkpoint=ck, threshold=None)
    assert vad.net.context == 2
    assert vad.threshold == 0.35
    assert ConvVAD(44100, checkpoint=ck, threshold=0.7).threshold == 0.7

    # halo covers the dilated receptive field: kernel 5 at dilations 1,2
    # spreads 6 frames per side
    assert context_halo_s(2) * 16000 >= 6 * FRAME + 0.25 * 16000 - 1e-6

    # host and device paths agree under the context architecture
    rng = np.random.default_rng(3)
    audio = (0.05 * rng.standard_normal(44100 * 3)).astype(np.float32)
    p_host, _ = vad.speech_probs(audio)
    p_dev, _ = vad.speech_probs_from_device(jnp.asarray(audio), audio.size)
    n = min(p_host.size, p_dev.size)
    assert n > 0
    assert float(np.mean(np.abs(p_host[:n] - p_dev[:n]))) < 0.1
