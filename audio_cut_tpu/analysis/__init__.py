from audio_cut_tpu.analysis.features import TrackFeatures, build_track_features

__all__ = ["TrackFeatures", "build_track_features"]
