#!/usr/bin/env python3
"""Generate the REAL-architecture MDX-Net fixture (VERDICT r4 task #2).

The production model the reference serves is `Kim_Vocal_1.onnx` — a kuielab
MDX-Net v1 `Conv_TDF_net_trim` (L=11) driven at n_fft=6144/hop=1024 with
dim_f=3072, dim_t=256 (reference src/audio_cut/separation/backends.py:257-266
hardcodes L=11/n_fft=6144; the vendored MVSEP inference.py fixes
dim_f=3072/dim_t=256). The weights cannot be fetched here (zero egress), so
this script reconstructs the ARCHITECTURE from the public kuielab sources and
exports it with seeded random weights through audio_cut_tpu.onnx.proto using
the exact torch->ONNX lowering patterns of the published exports:

* growth-g channel ladder: first 1x1 conv 4->g, down i: Conv2d(c, c+g, 2,
  stride 2), up: ConvTranspose2d(c, c-g, 2, stride 2), final 1x1 conv c->4;
* global layout transposes [B,C,F,T] -> [B,C,T,F] after the first conv and
  back before the final conv (TDF Linear acts over the frequency axis);
* TFC blocks: l x (Conv2d k3 pad1 + channel GroupNorm(2,c) + ReLU), plus a
  TDF dense bottleneck (Linear f->f/bn + GN + ReLU + Linear f/bn->f + GN +
  ReLU) joined by an ADDITIVE skip;
* U-skips are MULTIPLICATIVE (`x = x * skip`, ONNX Mul) — unlike the usual
  Concat U-Net;
* nn.GroupNorm lowers (opset < 18, as the published exports were made) to
  Reshape([0,G,-1]) -> InstanceNormalization -> Reshape(back) -> Mul(weight)
  -> Add(bias);
* nn.BatchNorm2d (used in the first/down/up scale convs in the original
  kuielab variant) lowers to BatchNormalization.

The public family has two norm variants (BatchNorm2d everywhere vs GroupNorm
inside blocks); this fixture contains BOTH lowerings along the real op
sequence, so the executor op-coverage gate proves the union — whichever the
real file uses, every op is covered.

Outputs (committed):
    tests/fixtures/onnx/mdxnet_trim_mini.onnx      seeded mini geometry
    tests/fixtures/onnx/mdxnet_trim_mini_io.npz    pinned torch forward
    tests/fixtures/onnx/mdxnet_trim_ops.json       op inventory + counts of
                                                   the full L=11 real-geometry
                                                   graph (structure gate)

The full real-geometry graph (dim_f 3072, dim_t 256, n=5) is generated
on the fly by the slow test tier (tests/model/test_onnx_real_geometry.py)
— its weights are seeded, never committed.

Run: python scripts/make_mdxnet_fixture.py
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from audio_cut_tpu.onnx.proto import Graph, Node, save_model  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "onnx")

# real Kim_Vocal_1 serving geometry (reference backends.py:257-266 + vendored
# MVSEP inference.py constants)
REAL = dict(dim_f=3072, dim_t=256, L=11, k=3)
# mini geometry for the committed fixture: same DEPTH (n=5 scale stages from
# L=11) and op sequence, scaled-down widths so the .onnx stays ~100 KB
MINI = dict(dim_f=128, dim_t=32, L=11, k=3, g=4, l=2, bn=4)


class TFCTDF(nn.Module):
    """kuielab Conv_TDF block: l conv layers + dense bottleneck, additive skip."""

    def __init__(self, c: int, l: int, f: int, k: int, bn: int):
        super().__init__()
        self.H = nn.ModuleList([
            nn.Sequential(nn.Conv2d(c, c, k, 1, k // 2), nn.GroupNorm(2, c), nn.ReLU())
            for _ in range(l)
        ])
        hidden = max(1, f // bn)
        self.tdf = nn.Sequential(
            nn.Linear(f, hidden), nn.GroupNorm(2, c), nn.ReLU(),
            nn.Linear(hidden, f), nn.GroupNorm(2, c), nn.ReLU(),
        )

    def forward(self, x):  # [B, C, T, F]
        for h in self.H:
            x = h(x)
        return x + self.tdf(x)


class ConvTDFNetTrim(nn.Module):
    """kuielab Conv_TDF_net_trim: the Kim_Vocal_1 architecture family."""

    def __init__(self, dim_f: int, dim_t: int, L: int, k: int, g: int,
                 l: int, bn: int):
        super().__init__()
        self.n = L // 2
        self.dim_f, self.dim_t = dim_f, dim_t
        self.first_conv = nn.Sequential(
            nn.Conv2d(4, g, 1, 1), nn.BatchNorm2d(g), nn.ReLU())
        f, c = dim_f, g
        self.ds_dense, self.ds = nn.ModuleList(), nn.ModuleList()
        for _ in range(self.n):
            self.ds_dense.append(TFCTDF(c, l, f, k, bn))
            self.ds.append(nn.Sequential(
                nn.Conv2d(c, c + g, (2, 2), (2, 2)), nn.BatchNorm2d(c + g), nn.ReLU()))
            f //= 2
            c += g
        self.mid_dense = TFCTDF(c, l, f, k, bn)
        self.us_dense, self.us = nn.ModuleList(), nn.ModuleList()
        for _ in range(self.n):
            self.us.append(nn.Sequential(
                nn.ConvTranspose2d(c, c - g, (2, 2), (2, 2)),
                nn.BatchNorm2d(c - g), nn.ReLU()))
            f *= 2
            c -= g
            self.us_dense.append(TFCTDF(c, l, f, k, bn))
        self.final_conv = nn.Sequential(nn.Conv2d(c, 4, 1, 1))

    def forward(self, x):  # [B, 4, F, T]
        x = self.first_conv(x)
        x = x.transpose(-1, -2)          # [B, g, T, F]
        skips = []
        for i in range(self.n):
            x = self.ds_dense[i](x)
            skips.append(x)
            x = self.ds[i](x)
        x = self.mid_dense(x)
        for i in range(self.n):
            x = self.us[i](x)
            x = x * skips[-i - 1]        # multiplicative U-skip
            x = self.us_dense[i](x)
        x = x.transpose(-1, -2)          # back to [B, c, F, T]
        return self.final_conv(x)        # stem spectrogram (no mask)


# -- ONNX graph authoring with the real export lowerings -----------------------


class _B:
    def __init__(self):
        self.nodes, self.init, self._n = [], {}, 0

    def add(self, op, inputs, attrs=None, hint=None, n_out=1):
        self._n += 1
        outs = [f"{hint or op.lower()}_{self._n}" + (f"_{j}" if j else "")
                for j in range(n_out)]
        self.nodes.append(Node(op, list(inputs), outs, outs[0], attrs or {}))
        return outs[0]

    def const(self, name, arr):
        self.init[name] = np.asarray(arr)
        return name

    def conv(self, x, prefix, sd, strides, pads, kshape):
        self.init[f"{prefix}.weight"] = sd[f"{prefix}.weight"]
        self.init[f"{prefix}.bias"] = sd[f"{prefix}.bias"]
        return self.add("Conv", [x, f"{prefix}.weight", f"{prefix}.bias"],
                        {"strides": strides, "pads": pads, "kernel_shape": kshape},
                        "conv")

    def bn(self, x, prefix, sd):
        for a, b in (("scale", "weight"), ("bias", "bias"),
                     ("mean", "running_mean"), ("var", "running_var")):
            self.init[f"{prefix}.{a}"] = sd[f"{prefix}.{b}"]
        return self.add(
            "BatchNormalization",
            [x] + [f"{prefix}.{a}" for a in ("scale", "bias", "mean", "var")],
            {"epsilon": 1e-5}, "bn")

    def gn(self, x, prefix, sd, c, t, f):
        """nn.GroupNorm(2, c) on [B, c, t, f] exactly as opset<18 torch
        exports it: Reshape -> InstanceNormalization(unit affine) ->
        Reshape -> Mul(weight) -> Add(bias)."""
        g = 2
        shp_in = self.const(f"{prefix}.shape_in", np.asarray([0, g, -1], np.int64))
        shp_out = self.const(f"{prefix}.shape_out",
                             np.asarray([0, c, t, f], np.int64))
        unit_s = self.const(f"{prefix}.unit_scale", np.ones(g, np.float32))
        unit_b = self.const(f"{prefix}.unit_bias", np.zeros(g, np.float32))
        self.init[f"{prefix}.weight"] = (
            sd[f"{prefix}.weight"].reshape(1, c, 1, 1).copy())
        self.init[f"{prefix}.bias"] = (
            sd[f"{prefix}.bias"].reshape(1, c, 1, 1).copy())
        y = self.add("Reshape", [x, shp_in], hint="gn_rs")
        y = self.add("InstanceNormalization", [y, unit_s, unit_b],
                     {"epsilon": 1e-5}, "gn_in")
        y = self.add("Reshape", [y, shp_out], hint="gn_rs")
        y = self.add("Mul", [y, f"{prefix}.weight"], hint="gn_mul")
        return self.add("Add", [y, f"{prefix}.bias"], hint="gn_add")

    def linear(self, x, prefix, sd):
        self.init[f"{prefix}.wT"] = sd[f"{prefix}.weight"].T.copy()
        self.init[f"{prefix}.bias"] = sd[f"{prefix}.bias"]
        y = self.add("MatMul", [x, f"{prefix}.wT"], hint="mm")
        return self.add("Add", [y, f"{prefix}.bias"], hint="lin_add")


def _tfctdf(b: _B, x: str, prefix: str, sd, c: int, l: int, t: int, f: int,
            k: int, bn: int):
    y = x
    for i in range(l):
        y = b.conv(y, f"{prefix}.H.{i}.0", sd, [1, 1],
                   [k // 2] * 4, [k, k])
        y = b.gn(y, f"{prefix}.H.{i}.1", sd, c, t, f)
        y = b.add("Relu", [y])
    h = max(1, f // bn)
    z = b.linear(y, f"{prefix}.tdf.0", sd)
    z = b.gn(z, f"{prefix}.tdf.1", sd, c, t, h)
    z = b.add("Relu", [z])
    z = b.linear(z, f"{prefix}.tdf.3", sd)
    z = b.gn(z, f"{prefix}.tdf.4", sd, c, t, f)
    z = b.add("Relu", [z])
    return b.add("Add", [y, z], hint="tdf_skip")


def build_graph(model: ConvTDFNetTrim, g: int, l: int, k: int, bn: int) -> Graph:
    sd = {kk: v.detach().numpy() for kk, v in model.state_dict().items()}
    b = _B()
    n = model.n
    dim_f, dim_t = model.dim_f, model.dim_t

    y = b.conv("input", "first_conv.0", sd, [1, 1], [0, 0, 0, 0], [1, 1])
    y = b.bn(y, "first_conv.1", sd)
    y = b.add("Relu", [y])
    y = b.add("Transpose", [y], {"perm": [0, 1, 3, 2]}, "tr_in")

    f, c, t = dim_f, g, dim_t
    skips = []
    for i in range(n):
        y = _tfctdf(b, y, f"ds_dense.{i}", sd, c, l, t, f, k, bn)
        skips.append(y)
        y = b.conv(y, f"ds.{i}.0", sd, [2, 2], [0, 0, 0, 0], [2, 2])
        y = b.bn(y, f"ds.{i}.1", sd)
        y = b.add("Relu", [y])
        f //= 2
        t //= 2
        c += g
    y = _tfctdf(b, y, "mid_dense", sd, c, l, t, f, k, bn)
    for i in range(n):
        b.init[f"us.{i}.0.weight"] = sd[f"us.{i}.0.weight"]
        b.init[f"us.{i}.0.bias"] = sd[f"us.{i}.0.bias"]
        y = b.add("ConvTranspose", [y, f"us.{i}.0.weight", f"us.{i}.0.bias"],
                  {"strides": [2, 2], "kernel_shape": [2, 2]}, "up")
        y = b.bn(y, f"us.{i}.1", sd)
        y = b.add("Relu", [y])
        f *= 2
        t *= 2
        c -= g
        y = b.add("Mul", [y, skips[-i - 1]], hint="uskip_mul")
        y = _tfctdf(b, y, f"us_dense.{i}", sd, c, l, t, f, k, bn)
    y = b.add("Transpose", [y], {"perm": [0, 1, 3, 2]}, "tr_out")
    b.init["final_conv.0.weight"] = sd["final_conv.0.weight"]
    b.init["final_conv.0.bias"] = sd["final_conv.0.bias"]
    b.nodes.append(Node("Conv", [y, "final_conv.0.weight", "final_conv.0.bias"],
                        ["output"], "final",
                        {"strides": [1, 1], "pads": [0, 0, 0, 0],
                         "kernel_shape": [1, 1]}))
    return Graph(
        nodes=b.nodes, initializers=b.init,
        inputs=["input"], outputs=["output"],
        input_shapes={"input": [None, 4, dim_f, dim_t]},
        name="conv_tdf_net_trim", opset=17,
        producer="audio_cut_tpu_fixture",
    )


def make_net(dim_f, dim_t, L, k, g, l, bn, seed=7) -> ConvTDFNetTrim:
    torch.manual_seed(seed)
    net = ConvTDFNetTrim(dim_f, dim_t, L, k, g, l, bn)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) * 0.5 + 0.75)
            elif isinstance(m, nn.GroupNorm):
                m.weight.copy_(torch.rand_like(m.weight) * 0.5 + 0.75)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
    net.eval()
    return net


def real_geometry_graph(g: int = 8, l: int = 2, bn: int = 8, seed: int = 11):
    """Full Kim_Vocal_1 GEOMETRY (dim_f 3072, dim_t 256, L=11) at reduced
    width; used by the slow test tier (never committed — ~MBs of weights)."""
    net = make_net(REAL["dim_f"], REAL["dim_t"], REAL["L"], REAL["k"],
                   g, l, bn, seed=seed)
    return net, build_graph(net, g, l, REAL["k"], bn)


def main() -> None:
    net = make_net(**MINI)
    graph = build_graph(net, MINI["g"], MINI["l"], MINI["k"], MINI["bn"])

    rng = np.random.default_rng(55)
    x = rng.standard_normal((1, 4, MINI["dim_f"], MINI["dim_t"])).astype(np.float32)
    with torch.no_grad():
        expected = net(torch.from_numpy(x)).numpy()

    os.makedirs(OUT_DIR, exist_ok=True)
    onnx_path = os.path.join(OUT_DIR, "mdxnet_trim_mini.onnx")
    save_model(graph, onnx_path)
    np.savez(os.path.join(OUT_DIR, "mdxnet_trim_mini_io.npz"),
             input=x, expected=expected)

    # structure gate: op inventory of the FULL L=11 real-geometry graph
    _, full_graph = real_geometry_graph()
    ops = Counter(node.op_type for node in full_graph.nodes)
    inventory = {
        "model_family": "kuielab Conv_TDF_net_trim (Kim_Vocal_1 class)",
        "geometry": REAL,
        "input_shape": [None, 4, REAL["dim_f"], REAL["dim_t"]],
        "node_count": len(full_graph.nodes),
        "ops": dict(sorted(ops.items())),
    }
    with open(os.path.join(OUT_DIR, "mdxnet_trim_ops.json"), "w") as fh:
        json.dump(inventory, fh, indent=1)
    print(f"wrote {onnx_path} ({os.path.getsize(onnx_path)} bytes), io npz, "
          f"op inventory ({len(full_graph.nodes)} nodes, "
          f"{sorted(ops)} op kinds)")


if __name__ == "__main__":
    main()
