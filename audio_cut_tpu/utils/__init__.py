from audio_cut_tpu.utils.device import configure_jax, device_info, device_memory_stats

__all__ = ["configure_jax", "device_info", "device_memory_stats"]
