"""ONNX weight import: protobuf reader/writer + JAX graph executor.

Replaces the reference's onnxruntime dependency (reference
src/audio_cut/separation/backends.py:216-255) with a TPU-native path:
`.onnx` -> parsed graph -> one jitted XLA program with weights as a params
pytree. No `onnx`/`onnxruntime` packages required.
"""

from audio_cut_tpu.onnx.executor import UnsupportedOnnxOp, build_jax_fn, validate_graph
from audio_cut_tpu.onnx.proto import Graph, Node, load_model, save_model

__all__ = [
    "Graph",
    "Node",
    "UnsupportedOnnxOp",
    "build_jax_fn",
    "load_model",
    "save_model",
    "validate_graph",
]
