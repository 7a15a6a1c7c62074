"""`audio-cut warmup` — cold-start cache population (VERDICT r3 task #7)."""

import json


def test_warmup_runs_and_reports(capsys):
    from audio_cut_tpu.cli import main

    rc = main(["warmup", "--durations", "8", "--skip-extra-modes", "--json"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["steps"] and all(s["ok"] for s in report["steps"])
    assert report["steps"][0]["name"] == "v2.2_mdd_8s"
    assert report["total_s"] > 0


def test_warmup_help_does_not_require_input_file(capsys):
    import pytest

    from audio_cut_tpu.cli import main

    with pytest.raises(SystemExit) as exc:
        main(["warmup", "--help"])
    assert exc.value.code == 0
    assert "persistent cache" in capsys.readouterr().out
