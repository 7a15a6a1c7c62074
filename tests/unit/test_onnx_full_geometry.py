"""Full-geometry ONNX executor validation (VERDICT r2 task 5).

A Kim_Vocal_1-shaped graph — the SAME op families and attributes as the
production MDX Conv-TDF ONNX nets at the production spectrogram geometry
(dim_f 2048, dim_t 256, 4 re/im stereo channels; reference
src/audio_cut/separation/backends.py:216-255) — is generated with seeded
random weights (scripts/make_onnx_fixture.py make_full_fixture), parity-
checked against the live torch forward, and run through the separation
engine as the `onnx` backend. This makes loading the real Kim_Vocal_1.onnx
zero-risk without network egress.
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent.parent / "scripts"))

pytestmark = [pytest.mark.model, pytest.mark.slow]


@pytest.fixture(scope="module")
def full_fixture(tmp_path_factory):
    torch = pytest.importorskip("torch")  # noqa: F841 — ground-truth reference
    import make_onnx_fixture as mk

    path = str(tmp_path_factory.mktemp("onnx_full") / "full_kimshape.onnx")
    model = mk.make_full_fixture(path)
    return path, model


def test_executor_parity_full_geometry(full_fixture):
    """L_inf vs live torch at the full [1, 4, 2048, 256] geometry."""
    import torch

    import make_onnx_fixture as mk
    from audio_cut_tpu.onnx import build_jax_fn, load_model, validate_graph

    path, model = full_fixture
    g = load_model(path)
    assert validate_graph(g) == []
    # the op families of the production MDX graphs are all present
    ops = {n.op_type for n in g.nodes}
    assert {"Conv", "ConvTranspose", "BatchNormalization", "Relu", "MatMul",
            "Add", "Transpose", "Concat"} <= ops

    fn, params = build_jax_fn(g)
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((1, 4, mk.FULL_F, mk.FULL_T)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    import jax

    (got,) = jax.jit(fn)(params, x)
    err = float(np.abs(np.asarray(got) - want).max())
    assert err < 1e-4, f"full-geometry parity L_inf {err}"


def test_engine_runs_full_geometry_graph(full_fixture):
    """The graph serves as the `onnx` backend through the device-OLA engine
    at production n_fft/hop (dim_t shortened — the net is fully conv over T)."""
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.separation.engine import SeparationEngine

    path, _model = full_fixture
    set_runtime_config({
        "enhanced_separation.backend": "onnx",
        "enhanced_separation.onnx.model_path": path,
        "enhanced_separation.onnx.n_fft": 6144,
        "enhanced_separation.onnx.hop": 1024,
        "enhanced_separation.onnx.dim_f": 2048,
        "enhanced_separation.onnx.dim_t": 64,
    })
    try:
        sr = 44100
        rng = np.random.default_rng(11)
        t = np.arange(4 * sr) / sr
        audio = (0.3 * np.sin(2 * np.pi * 220 * t)
                 + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
        eng = SeparationEngine(sr)
        res = eng.separate_for_detection(audio)
        assert res.backend_used == "onnx"
        meta = res.device_meta
        assert meta["gpu_pipeline_mode"] == "device_ola"
        v = res.vocal_track
        i = res.instrumental_track
        assert v is not None and np.all(np.isfinite(v))
        # subtraction convention: stems always sum to the (dequantized) mix
        np.testing.assert_allclose(v + i, audio, atol=3e-4)
    finally:
        reset_runtime_config()
