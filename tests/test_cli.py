"""run_pipeline CLI: JSON config layering (CLI > config > defaults)."""

import json

import pytest

import run_pipeline


def test_config_file_layering(tmp_path):
    cfg = tmp_path / "run.json"
    cfg.write_text(json.dumps({
        "input": "/data/pages",
        "output": "/data/out",
        "num_beams": 4,
        "lang": "de",
        "as_documents": True,
    }))
    # config supplies required values and defaults
    args = run_pipeline.parse_args(["--config", str(cfg)])
    assert args.input == "/data/pages" and args.output == "/data/out"
    assert args.num_beams == 4 and args.lang == "de" and args.as_documents

    # CLI overrides config
    args = run_pipeline.parse_args(
        ["--config", str(cfg), "--num-beams", "2", "--output", "/other"]
    )
    assert args.num_beams == 2 and args.output == "/other"
    assert args.input == "/data/pages"  # still from config


def test_config_rejects_unknown_keys(tmp_path):
    cfg = tmp_path / "bad.json"
    cfg.write_text(json.dumps({"input": "x", "output": "y", "typo_key": 1}))
    with pytest.raises(SystemExit):
        run_pipeline.parse_args(["--config", str(cfg)])


def test_missing_required_still_errors():
    with pytest.raises(SystemExit):
        run_pipeline.parse_args(["--input", "only-input"])
