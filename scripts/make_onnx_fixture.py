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


# ---------------------------------------------------------------------------
# Full-geometry Kim_Vocal_1-shaped fixture (VERDICT r2 task 5): the SAME op
# families as the production MDX Conv-TDF graphs at the production
# spectrogram geometry (n_fft 6144 -> dim_f 2048, dim_t 256, 4 re/im stereo
# channels, reference backends.py:216-255), with seeded random weights.
# Channel width is scaled down (g=16 vs ~48) so the CPU parity run stays
# tractable; every op, attribute and the full [B,4,2048,T] geometry match.
# ---------------------------------------------------------------------------

FULL_F, FULL_T, FULL_G, FULL_SCALES, FULL_BF = 2048, 256, 16, 3, 64


class TFCTDF(nn.Module):
    """TFC (2x conv-BN-ReLU) + TDF (freq-axis dense bottleneck) block."""

    def __init__(self, c: int, f: int, bf: int):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, padding=1)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(c)
        hidden = max(4, f // bf)
        self.lin1 = nn.Linear(f, hidden)
        self.lin2 = nn.Linear(hidden, f)

    def forward(self, x):  # [B, C, F, T]
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        t = y.transpose(2, 3)                     # [B, C, T, F]
        t = self.lin2(torch.relu(self.lin1(t)))
        return y + t.transpose(2, 3)


class FullConvTDF(nn.Module):
    """U-Net of TFC_TDF blocks over [B, 4, dim_f, dim_t]; emits the stem
    spectrogram directly (Kim_Vocal_1 convention — no mask/sigmoid)."""

    def __init__(self, f: int = FULL_F, g: int = FULL_G,
                 scales: int = FULL_SCALES, bf: int = FULL_BF):
        super().__init__()
        self.scales = scales
        self.first = nn.Conv2d(4, g, 1)
        self.down_blocks = nn.ModuleList(
            [TFCTDF(g * 2 ** i, f >> i, bf) for i in range(scales)])
        self.downs = nn.ModuleList(
            [nn.Conv2d(g * 2 ** i, g * 2 ** (i + 1), 3, stride=2, padding=1)
             for i in range(scales)])
        self.mid = TFCTDF(g * 2 ** scales, f >> scales, bf)
        self.ups = nn.ModuleList(
            [nn.ConvTranspose2d(g * 2 ** (i + 1), g * 2 ** i, 2, stride=2)
             for i in reversed(range(scales))])
        self.merges = nn.ModuleList(
            [nn.Conv2d(g * 2 ** (i + 1), g * 2 ** i, 1)
             for i in reversed(range(scales))])
        self.up_blocks = nn.ModuleList(
            [TFCTDF(g * 2 ** i, f >> i, bf) for i in reversed(range(scales))])
        self.final = nn.Conv2d(g, 4, 1)

    def forward(self, x):
        y = self.first(x)
        skips = []
        for blk, down in zip(self.down_blocks, self.downs):
            y = blk(y)
            skips.append(y)
            y = down(y)
        y = self.mid(y)
        for up, merge, blk in zip(self.ups, self.merges, self.up_blocks):
            y = up(y)
            y = merge(torch.cat([y, skips.pop()], dim=1))
            y = blk(y)
        return self.final(y)


class _GraphBuilder:
    def __init__(self):
        self.nodes = []
        self.init = {}
        self._n = 0

    def t(self, hint="v"):
        self._n += 1
        return f"{hint}_{self._n}"

    def add(self, op, inputs, attrs=None, hint=None):
        out = self.t(hint or op.lower())
        self.nodes.append(Node(op, list(inputs), [out], out, attrs or {}))
        return out

    def conv(self, x, prefix, sd, strides=(1, 1), pads=(1, 1, 1, 1), kshape=None):
        w = sd[f"{prefix}.weight"]
        self.init[f"{prefix}.weight"] = w
        self.init[f"{prefix}.bias"] = sd[f"{prefix}.bias"]
        return self.add("Conv", [x, f"{prefix}.weight", f"{prefix}.bias"],
                        {"strides": list(strides), "pads": list(pads),
                         "kernel_shape": list(kshape or w.shape[2:])}, "conv")

    def bn(self, x, prefix, sd):
        for k_onnx, k_sd in (("scale", "weight"), ("bias", "bias"),
                             ("mean", "running_mean"), ("var", "running_var")):
            self.init[f"{prefix}.{k_onnx}"] = sd[f"{prefix}.{k_sd}"]
        return self.add("BatchNormalization",
                        [x] + [f"{prefix}.{k}" for k in ("scale", "bias", "mean", "var")],
                        {"epsilon": 1e-5}, "bn")

    def linear(self, x, prefix, sd):
        self.init[f"{prefix}.wT"] = sd[f"{prefix}.weight"].T.copy()
        self.init[f"{prefix}.bias"] = sd[f"{prefix}.bias"]
        mm = self.add("MatMul", [x, f"{prefix}.wT"], hint="mm")
        return self.add("Add", [mm, f"{prefix}.bias"], hint="add")

    def tfc_tdf(self, x, prefix, sd):
        y = self.add("Relu", [self.bn(self.conv(x, f"{prefix}.conv1", sd),
                                      f"{prefix}.bn1", sd)])
        y = self.add("Relu", [self.bn(self.conv(y, f"{prefix}.conv2", sd),
                                      f"{prefix}.bn2", sd)])
        t = self.add("Transpose", [y], {"perm": [0, 1, 3, 2]}, "tr")
        t = self.add("Relu", [self.linear(t, f"{prefix}.lin1", sd)])
        t = self.linear(t, f"{prefix}.lin2", sd)
        t = self.add("Transpose", [t], {"perm": [0, 1, 3, 2]}, "tr")
        return self.add("Add", [y, t], hint="skip")


def build_full_graph(model: FullConvTDF) -> Graph:
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    b = _GraphBuilder()
    y = b.conv("input", "first", sd, pads=(0, 0, 0, 0))
    skips = []
    for i in range(model.scales):
        y = b.tfc_tdf(y, f"down_blocks.{i}", sd)
        skips.append(y)
        y = b.conv(y, f"downs.{i}", sd, strides=(2, 2))
    y = b.tfc_tdf(y, "mid", sd)
    for j in range(model.scales):
        w = sd[f"ups.{j}.weight"]
        b.init[f"ups.{j}.weight"] = w
        b.init[f"ups.{j}.bias"] = sd[f"ups.{j}.bias"]
        y = b.add("ConvTranspose", [y, f"ups.{j}.weight", f"ups.{j}.bias"],
                  {"strides": [2, 2], "kernel_shape": [2, 2]}, "up")
        y = b.add("Concat", [y, skips.pop()], {"axis": 1}, "cat")
        y = b.conv(y, f"merges.{j}", sd, pads=(0, 0, 0, 0))
        y = b.tfc_tdf(y, f"up_blocks.{j}", sd)
    w = sd["final.weight"]
    b.init["final.weight"] = w
    b.init["final.bias"] = sd["final.bias"]
    b.nodes.append(Node("Conv", [y, "final.weight", "final.bias"], ["output"],
                        "final", {"strides": [1, 1], "pads": [0, 0, 0, 0],
                                  "kernel_shape": [1, 1]}))
    return Graph(
        nodes=b.nodes, initializers=b.init,
        inputs=["input"], outputs=["output"],
        input_shapes={"input": [None, 4, FULL_F, None]},
        name="full_convtdf_kimshape", opset=17,
        producer="audio_cut_tpu_fixture",
    )


def make_full_fixture(path: str, seed: int = 2024) -> FullConvTDF:
    """Write the full-geometry random-weight model to ``path``; returns the
    torch module (the live ground-truth reference)."""
    torch.manual_seed(seed)
    model = FullConvTDF()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
    model.eval()
    save_model(build_full_graph(model), path)
    return model


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
