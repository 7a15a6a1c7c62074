"""Engine seam for the full-pipeline batch mode: serve mesh-computed stems.

``separate_and_segment_batch`` (api.py) separates every track across the
device mesh in one pass (parallel/batch.py::separate_tracks_mesh — stems
bit-identical to a single-device engine run), then drives the ordinary
per-track pipeline on host workers. The pipeline's only separation seam is
``splitter.separator.separate_for_detection`` (pipeline/modes/*,
pipeline/splitter.py); this engine-shaped object plugs into it and returns
the precomputed stems, so detection/cutting — and therefore the manifests —
match single-device runs exactly.

Reference analog: the reference had no batch product story at all (its
multi-GPU plan was one-pipeline-per-card, SURVEY §2.11); this is the TPU
mesh replacement.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from audio_cut_tpu.separation.engine import SeparationResult, _estimate_confidence


class PrecomputedStemEngine:
    """SeparationEngine-compatible wrapper over already-computed stems.

    Host-resident by design: the batch path downloads each track's stems
    once from the mesh pass; ``separate_for_detection`` re-uploads them as
    device handles padded to the engine's ``padded_track_len`` (same
    ``align`` the mesh pass used), so the detection bundle compiles and
    runs at exactly the lengths a single-device engine run would — the
    cut-parity contract requires bit-equal bundle inputs, and the 15 s
    ``pad_to_bucket`` rule diverges from the engine's long-track buckets
    beyond LONG_TRACK_S.
    """

    def __init__(
        self,
        sample_rate: int,
        vocal: np.ndarray,
        instrumental: Optional[np.ndarray],
        backend_name: str,
        meta: Optional[Dict] = None,
        align: int = 1,
    ) -> None:
        self.sample_rate = int(sample_rate)
        self.align = int(align)
        self._vocal = np.asarray(vocal, dtype=np.float32)
        self._inst = (
            np.asarray(instrumental, dtype=np.float32)
            if instrumental is not None else None
        )
        self._backend_name = str(backend_name)
        self._meta = dict(meta or {})
        self._meta.setdefault("gpu_pipeline_backend", self._backend_name)
        self._meta.setdefault("gpu_pipeline_mode", "mesh_batch_precomputed")

    def separate_for_detection(
        self, audio: np.ndarray, need_instrumental: bool = True
    ) -> SeparationResult:
        audio = np.asarray(audio, dtype=np.float32)
        n = audio.shape[-1]
        vocal = self._vocal[:n]
        inst = self._inst[:n] if (need_instrumental and self._inst is not None) else None
        result = SeparationResult(
            vocal_track=vocal,
            instrumental_track=inst,
            backend_used=self._backend_name,
            separation_confidence=_estimate_confidence(audio, vocal),
            device_meta=dict(self._meta),
        )
        result.mix_device = self._mix_device(audio)
        result.vocal_device = self._vocal_device(n)
        return result

    def _padded(self, x: np.ndarray, n: int) -> np.ndarray:
        from audio_cut_tpu.separation.engine import padded_track_len

        target = padded_track_len(n, self.sample_rate, self.align)
        if x.shape[-1] >= target:
            return x[..., :target]
        return np.pad(x, (0, target - x.shape[-1]))

    def _mix_device(self, audio: np.ndarray):
        """Bucket-padded mix exactly as the engine's OLA program would see it.

        The engine uploads the mix through int16 quantization
        (engine.quantize_upload) and every downstream envelope — guard
        windows, zero-cross refine — reads THAT dequantized mix. The
        detection bundle must consume the same values here, or cut
        refinement can snap to a different sample (observed: a 1-sample
        zero-cross flip on a ±1-quant mix difference). Returns None when
        int16 upload is disabled — the bundle then pads the raw host mix,
        which is what the engine would have uploaded too.
        """
        from audio_cut_tpu.config import get_config

        if not bool(get_config("device_pipeline.upload_int16", True)):
            return None
        import jax.numpy as jnp

        from audio_cut_tpu.separation.engine import quantize_upload

        raw, scale = quantize_upload(self._padded(audio, audio.shape[-1]))
        return jnp.asarray(raw.astype(np.float32) * scale)

    def _vocal_device(self, n: int):
        """Vocal stem padded to the engine length, as the OLA output handle.

        The mesh pass already produced these exact values (float OLA
        output, never quantized — engine.py leaves the separated stem in
        HBM as-is); re-uploading the trimmed host copy padded back to
        ``padded_track_len`` reproduces that handle bit-for-bit.
        """
        import jax.numpy as jnp

        return jnp.asarray(self._padded(self._vocal[:n], n))
