"""Real-architecture MDX-Net import gate (VERDICT r4 task #2).

The committed fixture `mdxnet_trim_mini.onnx` reproduces the kuielab
Conv_TDF_net_trim export — the Kim_Vocal_1 architecture family the reference
serves in production (reference src/audio_cut/separation/backends.py:257-266:
L=11, n_fft=6144; vendored MVSEP inference.py: dim_f=3072, dim_t=256) — with
the exact torch->ONNX lowering patterns of the published exports: GroupNorm
as Reshape/InstanceNormalization/Reshape/Mul/Add, multiplicative U-skips,
global layout transposes, growth-g channel ladder (see
scripts/make_mdxnet_fixture.py). These tests prove:

1. every op of that export family is executable by the JAX executor
   (op-coverage gate, including the FULL L=11 real-geometry op inventory);
2. numerics match the live-torch-pinned forward;
3. the onnx backend infers serving geometry (dim_f/dim_t) from the MODEL's
   input signature — the real Kim_Vocal_1 declares dim_f=3072, not this
   framework's trained-model default of 2048.
"""

import json
from pathlib import Path

import numpy as np
import pytest

FIXTURE_DIR = Path(__file__).parent.parent / "fixtures" / "onnx"
ONNX_PATH = FIXTURE_DIR / "mdxnet_trim_mini.onnx"
IO_PATH = FIXTURE_DIR / "mdxnet_trim_mini_io.npz"
OPS_PATH = FIXTURE_DIR / "mdxnet_trim_ops.json"

# op kinds the published Conv_TDF_net_trim exports contain (union over the
# BatchNorm-everywhere and GroupNorm-in-blocks public variants)
REAL_EXPORT_OPS = {
    "Conv", "ConvTranspose", "BatchNormalization", "InstanceNormalization",
    "MatMul", "Add", "Mul", "Relu", "Reshape", "Transpose",
}


def test_fixture_covers_real_export_ops():
    from audio_cut_tpu.onnx import load_model, validate_graph

    g = load_model(str(ONNX_PATH))
    assert validate_graph(g) == []
    assert {n.op_type for n in g.nodes} == REAL_EXPORT_OPS
    # depth matches L=11 (n=5 scale stages): 5 strided down-convs, 5 ups
    downs = [n for n in g.nodes
             if n.op_type == "Conv" and n.attrs.get("strides") == [2, 2]]
    ups = [n for n in g.nodes if n.op_type == "ConvTranspose"]
    assert len(downs) == 5 and len(ups) == 5


def test_full_real_geometry_op_inventory_is_supported():
    """The op inventory of the FULL L=11 graph at the real Kim_Vocal_1
    geometry ([B, 4, 3072, 256]) is entirely inside the executor's op set."""
    from audio_cut_tpu.onnx.executor import UnsupportedOnnxOp, _exec_node
    from audio_cut_tpu.onnx.proto import Node

    inventory = json.loads(OPS_PATH.read_text())
    assert inventory["input_shape"] == [None, 4, 3072, 256]
    assert inventory["geometry"]["L"] == 11
    assert set(inventory["ops"]) == REAL_EXPORT_OPS
    for op in inventory["ops"]:
        try:
            _exec_node(Node(op_type=op, inputs=[], outputs=[]), [])
        except UnsupportedOnnxOp as exc:
            assert "not supported" not in str(exc), f"op {op} unsupported"
        except Exception:
            pass  # supported op choking on empty args is fine


def test_executor_matches_pinned_torch_forward():
    import jax

    from audio_cut_tpu.onnx import build_jax_fn, load_model

    g = load_model(str(ONNX_PATH))
    fn, params = build_jax_fn(g)
    io = np.load(str(IO_PATH))
    (got,) = jax.jit(fn)(params, io["input"])
    err = float(np.abs(np.asarray(got) - io["expected"]).max())
    assert err < 1e-4, f"executor vs torch L_inf {err}"


def test_backend_infers_geometry_from_model_signature():
    """Config says dim_f=2048/dim_t=256 (the defaults); the model declares
    [None, 4, 128, 32] — the backend must serve the MODEL's geometry."""
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.separation.onnx_backend import OnnxSeparatorBackend

    set_runtime_config({
        "enhanced_separation.onnx.model_path": str(ONNX_PATH),
        "enhanced_separation.onnx.n_fft": 6144,
        "enhanced_separation.onnx.hop": 1024,
    })
    try:
        backend = OnnxSeparatorBackend(44100)
        assert backend.dim_f == 128 and backend.dim_t == 32
        assert backend.window_samples == 31 * 1024
        # stems from a short mono window: finite, mix-complement convention
        rng = np.random.default_rng(3)
        x = (0.1 * rng.standard_normal(backend.window_samples)).astype(np.float32)
        v, i = backend.separate(x)
        assert np.all(np.isfinite(v)) and np.all(np.isfinite(i))
        np.testing.assert_allclose(v + i, x, atol=3e-4)
    finally:
        reset_runtime_config()


def test_backend_rejects_dim_f_beyond_nfft():
    from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
    from audio_cut_tpu.separation.onnx_backend import OnnxSeparatorBackend

    set_runtime_config({
        "enhanced_separation.onnx.model_path": str(ONNX_PATH),
        "enhanced_separation.onnx.n_fft": 128,  # dim_f 128 > 128/2+1
        "enhanced_separation.onnx.hop": 32,
    })
    try:
        with pytest.raises(ValueError, match="dim_f"):
            OnnxSeparatorBackend(44100)
    finally:
        reset_runtime_config()


def test_fetcher_validates_fixture():
    """download_mdx23 --validate-only proves a local .onnx servable."""
    import subprocess
    import sys

    repo = Path(__file__).parent.parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "download_mdx23.py"),
         "--validate-only", str(ONNX_PATH)],
        capture_output=True, text=True, timeout=120,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "every op is executable" in proc.stdout
    assert "dim_f=128, dim_t=32" in proc.stdout
