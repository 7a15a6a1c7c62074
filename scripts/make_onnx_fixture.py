#!/usr/bin/env python3
"""Generate the ONNX parity fixture: a mini Conv-TDF-family mask net.

The fixture proves the ONNX weight-import path end-to-end WITHOUT network
egress (the real MDX23 weights can't be fetched here — reference
download_mdx23.py:1-40): a seeded torch model covering the exact op set of
the MDX Conv-TDF architecture (Conv/BN/ReLU, TDF Linear over F as
MatMul+Add, strided down-conv, ConvTranspose up, skip Concat, sigmoid mask,
mask-multiply) is serialized to `.onnx` via audio_cut_tpu.onnx.proto and its
torch forward outputs are pinned to an `.npz`. The parity test then runs the
graph through the JAX executor and asserts L_inf < 1e-4 (VERDICT round-1,
Missing #2).

Run: python scripts/make_onnx_fixture.py   (regenerates tests/fixtures/onnx/)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audio_cut_tpu.onnx.proto import Graph, Node, save_model  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "onnx")

B, C_IN, T, F = 1, 4, 16, 32  # [batch, re/im x stereo, frames, bins]
BOTTLENECK = 8


class MiniTDF(nn.Module):
    """TDF block: dense bottleneck over the last (frequency) axis."""

    def __init__(self, f: int, bottleneck: int):
        super().__init__()
        self.lin1 = nn.Linear(f, bottleneck)
        self.lin2 = nn.Linear(bottleneck, f)

    def forward(self, x):
        return x + self.lin2(torch.relu(self.lin1(x)))


class MiniConvTDF(nn.Module):
    """Small net exercising every op family of the MDX Conv-TDF ONNX graphs."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(C_IN, 8, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(8)
        self.tdf = MiniTDF(F, BOTTLENECK)
        self.down = nn.Conv2d(8, 16, 3, stride=2, padding=1)
        self.mid = nn.Conv2d(16, 16, 3, padding=1)
        self.up = nn.ConvTranspose2d(16, 8, 2, stride=2)
        self.final = nn.Conv2d(16, C_IN, 1)

    def forward(self, x):
        r1 = torch.relu(self.bn1(self.conv1(x)))
        t1 = self.tdf(r1)
        rd = torch.relu(self.down(t1))
        rm = torch.relu(self.mid(rd))
        ru = torch.relu(self.up(rm))
        cc = torch.cat([ru, t1], dim=1)
        mask = torch.sigmoid(self.final(cc))
        return x * mask


def build_graph(model: MiniConvTDF) -> Graph:
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    init = {
        "conv1.weight": sd["conv1.weight"], "conv1.bias": sd["conv1.bias"],
        "bn1.scale": sd["bn1.weight"], "bn1.bias": sd["bn1.bias"],
        "bn1.mean": sd["bn1.running_mean"], "bn1.var": sd["bn1.running_var"],
        # Linear exports as MatMul with the transposed weight
        "tdf.lin1.wT": sd["tdf.lin1.weight"].T.copy(), "tdf.lin1.bias": sd["tdf.lin1.bias"],
        "tdf.lin2.wT": sd["tdf.lin2.weight"].T.copy(), "tdf.lin2.bias": sd["tdf.lin2.bias"],
        "down.weight": sd["down.weight"], "down.bias": sd["down.bias"],
        "mid.weight": sd["mid.weight"], "mid.bias": sd["mid.bias"],
        "up.weight": sd["up.weight"], "up.bias": sd["up.bias"],
        "final.weight": sd["final.weight"], "final.bias": sd["final.bias"],
    }
    conv_pad = {"pads": [1, 1, 1, 1], "strides": [1, 1], "kernel_shape": [3, 3]}
    nodes = [
        Node("Conv", ["input", "conv1.weight", "conv1.bias"], ["c1"], "conv1", dict(conv_pad)),
        Node("BatchNormalization",
             ["c1", "bn1.scale", "bn1.bias", "bn1.mean", "bn1.var"], ["b1"], "bn1",
             {"epsilon": 1e-5}),
        Node("Relu", ["b1"], ["r1"], "relu1", {}),
        Node("MatMul", ["r1", "tdf.lin1.wT"], ["m1"], "tdf_mm1", {}),
        Node("Add", ["m1", "tdf.lin1.bias"], ["a1"], "tdf_add1", {}),
        Node("Relu", ["a1"], ["r2"], "tdf_relu", {}),
        Node("MatMul", ["r2", "tdf.lin2.wT"], ["m2"], "tdf_mm2", {}),
        Node("Add", ["m2", "tdf.lin2.bias"], ["a2"], "tdf_add2", {}),
        Node("Add", ["r1", "a2"], ["t1"], "tdf_skip", {}),
        Node("Conv", ["t1", "down.weight", "down.bias"], ["d1"], "down",
             {"pads": [1, 1, 1, 1], "strides": [2, 2], "kernel_shape": [3, 3]}),
        Node("Relu", ["d1"], ["rd"], "relu_d", {}),
        Node("Conv", ["rd", "mid.weight", "mid.bias"], ["mmid"], "mid", dict(conv_pad)),
        Node("Relu", ["mmid"], ["rm"], "relu_m", {}),
        Node("ConvTranspose", ["rm", "up.weight", "up.bias"], ["u1"], "up",
             {"strides": [2, 2], "kernel_shape": [2, 2]}),
        Node("Relu", ["u1"], ["ru"], "relu_u", {}),
        Node("Concat", ["ru", "t1"], ["cc"], "skip_cat", {"axis": 1}),
        Node("Conv", ["cc", "final.weight", "final.bias"], ["f1"], "final",
             {"strides": [1, 1], "kernel_shape": [1, 1]}),
        Node("Sigmoid", ["f1"], ["s1"], "mask", {}),
        Node("Mul", ["input", "s1"], ["output"], "apply_mask", {}),
    ]
    return Graph(
        nodes=nodes,
        initializers=init,
        inputs=["input"],
        outputs=["output"],
        input_shapes={"input": [None, C_IN, T, F]},
        name="mini_convtdf",
        opset=17,
        producer="audio_cut_tpu_fixture",
    )


def main() -> None:
    torch.manual_seed(1234)
    model = MiniConvTDF()
    # non-trivial BN running stats (fresh BN has mean=0/var=1)
    with torch.no_grad():
        model.bn1.running_mean.copy_(torch.randn(8) * 0.1)
        model.bn1.running_var.copy_(torch.rand(8) * 0.5 + 0.75)
    model.eval()

    rng = np.random.default_rng(99)
    x = rng.standard_normal((B, C_IN, T, F)).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(x)).numpy()

    os.makedirs(OUT_DIR, exist_ok=True)
    graph = build_graph(model)
    onnx_path = os.path.join(OUT_DIR, "mini_convtdf.onnx")
    save_model(graph, onnx_path)
    np.savez(os.path.join(OUT_DIR, "mini_convtdf_io.npz"), input=x, expected=expected)
    print(f"wrote {onnx_path} ({os.path.getsize(onnx_path)} bytes) "
          f"+ io fixture, |expected|_max={np.abs(expected).max():.4f}")


if __name__ == "__main__":
    main()
