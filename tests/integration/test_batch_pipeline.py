"""Full-pipeline multi-chip batch mode (VERDICT r4 task #3).

`separate_and_segment_batch` separates N tracks in ONE dp-sharded mesh pass
(parallel/batch.py::separate_tracks_mesh) and runs detection/cutting per
track on host workers. The product contract: every manifest's cuts match a
single-device `separate_and_segment` run of the same track exactly.
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from audio_cut_tpu.config import reset_runtime_config, set_runtime_config
from audio_cut_tpu.io import write_wav
from audio_cut_tpu.parallel.mesh import make_mesh

SR = 44100

SMALL_SCHEDULE = {
    "device_pipeline.chunk_seconds": 2.0,
    "device_pipeline.overlap_seconds": 0.5,
    "device_pipeline.halo_seconds": 0.1,
}


@pytest.fixture(autouse=True)
def _small_schedule():
    set_runtime_config(dict(SMALL_SCHEDULE))
    yield
    reset_runtime_config()


def _song(duration_s: float, seed: int, pauses) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(duration_s * SR)) / SR
    x = 0.4 * np.sin(2 * np.pi * (196 + 30 * seed) * t)
    x += 0.1 * np.sin(2 * np.pi * 2.5 * t) * np.sin(2 * np.pi * 392 * t)
    x += 0.02 * rng.standard_normal(t.size)
    x = x.astype(np.float32)
    for s, d in pauses:
        x[int(s * SR):int((s + d) * SR)] = 0.0
    return x


def _write_songs(tmp_path: Path):
    # two lengths -> two padded-length groups through the mesh stage
    songs = {
        "alpha": _song(12.0, 1, [(4.0, 0.7), (8.5, 0.8)]),
        "beta": _song(12.0, 2, [(3.0, 0.9), (7.5, 0.6)]),
        "gamma": _song(20.0, 3, [(5.0, 0.8), (11.0, 0.7), (16.0, 0.6)]),
    }
    paths = []
    for name, audio in songs.items():
        p = tmp_path / f"{name}.wav"
        write_wav(str(p), audio, SR)
        paths.append(p)
    return paths, songs


def _cuts(manifest) -> list:
    out = []
    for c in manifest.get("cuts", {}).get("final", []):
        out.append(float(c["t"]) if isinstance(c, dict) else float(c))
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_batch_mesh_stems_match_engine(tmp_path):
    from audio_cut_tpu.parallel.batch import separate_tracks_mesh
    from audio_cut_tpu.separation.engine import SeparationEngine

    tracks = [_song(9.0, 5, [(4.0, 0.5)]), _song(17.0, 6, [(8.0, 0.5)])]
    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1, tp=1)
    got = separate_tracks_mesh(tracks, SR, mesh=mesh, backend="spectral")

    eng = SeparationEngine(SR, backend="spectral")
    for audio, (v, i) in zip(tracks, got):
        v_ref, i_ref, _mix, _ = eng.separate_on_device(audio)
        assert v.shape == audio.shape
        assert np.max(np.abs(v - np.asarray(v_ref))) < 1e-5
        assert np.max(np.abs(i - np.asarray(i_ref))) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_batch_manifests_match_single_device(tmp_path):
    from audio_cut_tpu.api import separate_and_segment, separate_and_segment_batch

    paths, _songs = _write_songs(tmp_path)
    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1, tp=1)

    batch_manifests = separate_and_segment_batch(
        input_uris=[str(p) for p in paths],
        export_dir=str(tmp_path / "batch_out"),
        mode="v2.2_mdd",
        mesh=mesh,
    )
    assert len(batch_manifests) == len(paths)

    for p, mb in zip(paths, batch_manifests):
        assert mb["success"], mb.get("error")
        ms = separate_and_segment(
            input_uri=str(p),
            export_dir=str(tmp_path / "single_out" / p.stem),
            mode="v2.2_mdd",
        )
        assert ms["success"]
        # THE batch contract: identical cut decisions
        assert _cuts(mb) == _cuts(ms), f"{p.name}: batch cuts diverge"
        seg_b = [(s["start"], s["end"], s["duration"]) for s in mb["segments"]]
        seg_s = [(s["start"], s["end"], s["duration"]) for s in ms["segments"]]
        assert seg_b == seg_s
        # one manifest file per track in its own subdir
        mpath = Path(mb["manifest_path"])
        assert mpath.parent.name == p.stem
        assert json.loads(mpath.read_text())["success"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_batch_cli_verb(tmp_path, capsys):
    from audio_cut_tpu.cli import main

    paths, _ = _write_songs(tmp_path)
    rc = main(["batch", str(paths[0]), str(paths[1]),
               "-o", str(tmp_path / "cli_out"), "--json"])
    assert rc == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 2
    for entry in lines:
        assert entry["success"] is True
        assert Path(entry["manifest"]).exists()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_batch_long_track_parity(tmp_path):
    """Cut parity past LONG_TRACK_S, where the engine's 60 s long buckets
    diverge from the 15 s pad_to_bucket rule: the batch host stage must pad
    the detection-bundle inputs with the engine's padded_track_len (it once
    used pad_to_bucket, so an 80 s track ran its bundle over 90 s in batch
    mode vs 120 s single-device — different tempo grid, different cuts)."""
    from audio_cut_tpu.api import separate_and_segment, separate_and_segment_batch

    song = _song(80.0, 11, [(20.0, 0.8), (41.0, 0.7), (62.0, 0.9)])
    p = tmp_path / "long.wav"
    write_wav(str(p), song, SR)
    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1, tp=1)

    mb = separate_and_segment_batch(
        input_uris=[str(p)], export_dir=str(tmp_path / "b"), mesh=mesh)[0]
    ms = separate_and_segment(
        input_uri=str(p), export_dir=str(tmp_path / "s"))
    assert mb["success"] and ms["success"]
    assert _cuts(mb) == _cuts(ms), "long-track batch cuts diverge"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_batch_bad_file_fills_slot_without_aborting(tmp_path):
    """A corrupt input reports {'success': False} in its own slot; every
    other track still gets its manifest (the documented batch contract)."""
    from audio_cut_tpu.api import separate_and_segment_batch

    good = tmp_path / "good.wav"
    write_wav(str(good), _song(10.0, 12, [(4.0, 0.6)]), SR)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFnot-actually-a-wav")
    mesh = make_mesh(jax.devices()[:8], dp=8, sp=1, tp=1)

    manifests = separate_and_segment_batch(
        input_uris=[str(good), str(bad)],
        export_dir=str(tmp_path / "out"), mesh=mesh)
    assert manifests[0]["success"] is True
    assert manifests[1]["success"] is False
    assert "bad.wav" in manifests[1]["input_file"]
    assert manifests[1]["error"]


def test_batch_name_collisions(tmp_path):
    """Same-stem inputs in different dirs get deduplicated subdirs."""
    from audio_cut_tpu.api import separate_and_segment_batch

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    pa = tmp_path / "a" / "song.wav"
    pb = tmp_path / "b" / "song.wav"
    write_wav(str(pa), _song(10.0, 7, [(4.0, 0.6)]), SR)
    write_wav(str(pb), _song(10.0, 8, [(5.0, 0.6)]), SR)
    out = tmp_path / "out"
    manifests = separate_and_segment_batch(
        input_uris=[str(pa), str(pb)], export_dir=str(out))
    assert all(m["success"] for m in manifests)
    dirs = {Path(m["manifest_path"]).parent.name for m in manifests}
    assert dirs == {"song", "song_1"}
