from audio_cut_tpu.separation.engine import SeparationEngine, SeparationResult

__all__ = ["SeparationEngine", "SeparationResult"]
