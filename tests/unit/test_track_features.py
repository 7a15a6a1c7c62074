import numpy as np

from audio_cut_tpu.analysis.features import build_track_features


def test_build_track_features_shapes(song_audio):
    audio, sr = song_audio
    tf = build_track_features(audio, sr)
    n = int(len(audio) / sr / tf.hop_s) + 1
    assert tf.n_frames == n
    for name in ("rms", "flatness", "onset", "mdd"):
        assert getattr(tf, name).shape == (n,)
    assert 0 < tf.bpm < 300
    assert tf.duration_s == len(audio) / sr


def test_window_stats_and_grid(song_audio):
    audio, sr = song_audio
    tf = build_track_features(audio, sr)
    stats = tf.window_stats("rms", 1.0, 2.0)
    assert stats["min"] <= stats["mean"] <= stats["max"]
    assert tf.frame_index(0.0) == 0
    assert tf.frame_index(1e9) == tf.n_frames - 1
    sl = tf.frame_slice(1.0, 2.0)
    assert sl.stop - sl.start == round(1.0 / tf.hop_s)


def test_padding_does_not_change_true_frames(song_audio):
    audio, sr = song_audio
    tf_full = build_track_features(audio, sr)
    # same audio with extra zeros appended should give identical leading frames
    tf_padded_src = build_track_features(np.concatenate([audio, np.zeros(sr, np.float32)]), sr)
    n = tf_full.n_frames - 30  # away from the tail boundary
    np.testing.assert_allclose(tf_full.rms[:n], tf_padded_src.rms[:n], rtol=1e-4, atol=1e-5)
