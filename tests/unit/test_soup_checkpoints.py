"""scripts/soup_checkpoints.py — weight-space interpolation tool.

The round-5 promotion is an alpha-soup (docs/EVAL_PROTOCOL.md §3); this keeps
the tool that reproduces it honest: renormalized mix weights, template-free
restore, structure/shape guards, sidecar provenance propagation.
"""
import json
import subprocess
import sys

import numpy as np
import pytest
from flax import serialization

SCRIPT = "scripts/soup_checkpoints.py"


def _write_ckpt(path, scale, extra_leaf_shape=None):
    tree = {
        "conv": {"kernel": np.full((3, 4), scale, np.float32),
                 "bias": np.full((4,), 10 * scale, np.float32)},
        "dense": {"w": np.full((2, 2), -scale, np.float32)},
    }
    if extra_leaf_shape is not None:
        tree["dense"]["w"] = np.zeros(extra_leaf_shape, np.float32)
    path.write_bytes(serialization.msgpack_serialize(tree))
    return tree


def _run(*argv):
    return subprocess.run([sys.executable, SCRIPT, *map(str, argv)],
                          capture_output=True, text=True, cwd="/root/repo")


def test_soup_interpolates_and_renormalizes(tmp_path):
    a, b = tmp_path / "a.msgpack", tmp_path / "b.msgpack"
    _write_ckpt(a, 1.0)
    _write_ckpt(b, 3.0)
    out = tmp_path / "soup.msgpack"
    # weights 3:1 renormalize to 0.75/0.25 -> leaf value 1*0.75 + 3*0.25 = 1.5
    r = _run("--out", out, f"{a}=3", f"{b}=1")
    assert r.returncode == 0, r.stderr
    tree = serialization.msgpack_restore(out.read_bytes())
    np.testing.assert_allclose(tree["conv"]["kernel"], 1.5)
    np.testing.assert_allclose(tree["conv"]["bias"], 15.0)
    np.testing.assert_allclose(tree["dense"]["w"], -1.5)
    assert tree["conv"]["kernel"].dtype == np.float32


def test_soup_rejects_shape_mismatch(tmp_path):
    a, b = tmp_path / "a.msgpack", tmp_path / "b.msgpack"
    _write_ckpt(a, 1.0)
    _write_ckpt(b, 2.0, extra_leaf_shape=(5, 5))
    r = _run("--out", tmp_path / "soup.msgpack", str(a), str(b))
    assert r.returncode == 2
    assert "shape mismatch" in r.stderr


def test_soup_copies_sidecar_with_provenance(tmp_path):
    a, b = tmp_path / "a.msgpack", tmp_path / "b.msgpack"
    _write_ckpt(a, 1.0)
    _write_ckpt(b, 2.0)
    (tmp_path / "a.msgpack.json").write_text(
        json.dumps({"n_fft": 6144, "provenance": "leg a"}))
    out = tmp_path / "soup.msgpack"
    assert _run("--out", out, f"{a}=0.6", f"{b}=0.4").returncode == 0
    meta = json.loads((tmp_path / "soup.msgpack.json").read_text())
    assert meta["n_fft"] == 6144
    assert "a.msgpack*0.600" in meta["provenance"]
    assert "leg a" in meta["provenance"]


def test_soup_needs_two_inputs(tmp_path):
    a = tmp_path / "a.msgpack"
    _write_ckpt(a, 1.0)
    r = _run("--out", tmp_path / "s.msgpack", str(a))
    assert r.returncode != 0
