"""CLI argparse -> config wiring: every flag lands on the right config
field with the right type, without running the underlying pipeline (the
implementations are tested elsewhere; this pins the plumbing, where a
rename or forgotten pass-through would otherwise only surface in a
full manual run)."""

import pytest


def test_train_cli_wiring(monkeypatch):
    from tpuseg.cli import train as cli

    captured = {}
    monkeypatch.setattr(cli, "train_model", lambda cfg: captured.setdefault("cfg", cfg))
    cli.main([
        "--train_database", "tdb", "--test_database", "vdb", "--output_dir", "out",
        "--batch_size", "3", "--number_classes", "5", "--learning_rate", "0.001",
        "--test_every_n_steps", "7", "--balance_classes", "1",
        "--use_augmentation", "0", "--early_stopping", "4", "--reader_count", "2",
        "--label_smoothing", "0.1", "--seed", "9", "--max_epochs", "6",
        "--dtype", "float32", "--device_augmentation", "0",
        "--resume_checkpoint", "ck", "--shard_optimizer", "1",
        "--profile_steps", "11", "--jitter_severity", "0.2",
        "--log_every_n_steps", "5", "--batch_echo", "2",
        "--spatial", "2",
    ])
    cfg = captured["cfg"]
    assert cfg.train_database == "tdb" and cfg.test_database == "vdb"
    assert cfg.output_folder == "out"
    assert cfg.batch_size == 3 and cfg.number_classes == 5
    assert cfg.learning_rate == pytest.approx(1e-3)
    assert cfg.test_every_n_steps == 7
    assert cfg.balance_classes is True and cfg.use_augmentation is False
    assert cfg.early_stopping_count == 4 and cfg.reader_count == 2
    assert cfg.label_smoothing == pytest.approx(0.1)
    assert cfg.seed == 9 and cfg.max_epochs == 6
    assert cfg.dtype == "float32" and cfg.device_augment is False
    assert cfg.resume_checkpoint == "ck" and cfg.shard_optimizer is True
    assert cfg.profile_steps == 11
    assert cfg.log_every_n_steps == 5 and cfg.batch_echo == 2
    assert cfg.spatial_partitions == 2
    assert cfg.augment_params.jitter_augmentation_severity == pytest.approx(0.2)


def test_train_cli_reference_defaults(monkeypatch):
    """Defaults mirror the reference CLI (train.py:220-233)."""
    from tpuseg.cli import train as cli

    captured = {}
    monkeypatch.setattr(cli, "train_model", lambda cfg: captured.setdefault("cfg", cfg))
    cli.main(["--train_database", "a", "--test_database", "b", "--output_dir", "c"])
    cfg = captured["cfg"]
    assert cfg.batch_size == 4            # train.py:220
    assert cfg.number_classes == 2        # train.py:221
    assert cfg.learning_rate == pytest.approx(3e-4)  # train.py:222
    assert cfg.test_every_n_steps == 1000
    assert cfg.balance_classes is False and cfg.use_augmentation is True
    assert cfg.early_stopping_count == 10 and cfg.reader_count == 1


def test_inference_cli_wiring(monkeypatch):
    from tpuseg.cli import inference as cli

    captured = {}
    monkeypatch.setattr(cli, "inference", lambda cfg: captured.setdefault("cfg", cfg))
    cli.main([
        "--checkpoint_filepath", "ck", "--image_folder", "in",
        "--output_folder", "out", "--number_classes", "3",
        "--number_channels", "2", "--image_format", "png",
        "--tile_size", "512", "--batch_size", "4", "--radius", "96",
        "--dtype", "float32", "--no_data_parallel", "--streaming",
        "--no_read_ahead", "--auto_tile",
        "--quantize", "int8", "--calibration_images", "2",
        "--calibration_percentile", "99.5",
    ])
    cfg = captured["cfg"]
    assert cfg.checkpoint_filepath == "ck"
    assert cfg.image_folder == "in" and cfg.output_folder == "out"
    assert cfg.number_classes == 3 and cfg.number_channels == 2
    assert cfg.image_format == "png"
    assert cfg.tile_size == 512 and cfg.batch_size == 4 and cfg.radius == 96
    assert cfg.dtype == "float32"
    assert cfg.data_parallel is False and cfg.streaming is True
    assert cfg.read_ahead is False
    assert cfg.auto_tile is True
    assert cfg.quantize == "int8" and cfg.calibration_images == 2
    assert cfg.calibration_percentile == 99.5


def test_inference_cli_defaults(monkeypatch):
    from tpuseg.cli import inference as cli

    captured = {}
    monkeypatch.setattr(cli, "inference", lambda cfg: captured.setdefault("cfg", cfg))
    cli.main(["--checkpoint_filepath", "c", "--image_folder", "i",
              "--output_folder", "o", "--number_classes", "2",
              "--number_channels", "1"])
    cfg = captured["cfg"]
    assert cfg.image_format == "tif"      # inference.py:241
    assert cfg.tile_size == 1024 and cfg.batch_size == 8
    assert cfg.radius is None             # -> ERF probe
    assert cfg.data_parallel is True and cfg.streaming is False
    assert cfg.read_ahead is True
    assert cfg.auto_tile is False  # reference-geometry default
    assert cfg.quantize == "none" and cfg.calibration_images == 4


def test_build_lmdb_cli_wiring(monkeypatch):
    from tpuseg.cli import build_lmdb as cli

    captured = {}
    monkeypatch.setattr(cli, "build_databases",
                        lambda **kw: captured.setdefault("kw", kw))
    cli.main(["--image_folder", "im", "--mask_folder", "mk",
              "--output_folder", "ou", "--dataset_name", "ds",
              "--train_fraction", "0.7", "--use_tiling", "1",
              "--tile_size", "256", "--seed", "3"])
    kw = captured["kw"]
    assert kw["image_folder"] == "im" and kw["mask_folder"] == "mk"
    assert kw["output_folder"] == "ou" and kw["dataset_name"] == "ds"
    assert kw["train_fraction"] == pytest.approx(0.7)
    assert kw["use_tiling"] is True and kw["tile_size"] == 256
    assert kw["seed"] == 3


def test_evaluate_cli_wiring(monkeypatch):
    from tpuseg.cli import evaluate as cli

    captured = {}
    monkeypatch.setattr(cli, "evaluate_folder",
                        lambda p, t, n: captured.setdefault("args", (p, t, n)) or {})
    cli.main(["--pred_folder", "p", "--truth_folder", "t", "--number_classes", "4"])
    assert captured["args"] == ("p", "t", 4)

def test_platform_env_honored_via_config_api():
    # JAX_PLATFORMS must work for every CLI even where a site hook pins the
    # platform after the env is read (this deployment's tunneled backend):
    # enable() routes the env var through the config API, which wins. Run in
    # a subprocess so the site hook is active and jax is uninitialized.
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c",
         "from tpuseg.utils.compile_cache import enable; enable(); "
         "import jax; print(jax.devices()[0].platform)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("cpu"), out.stdout


def test_evaluate_cli_exits_zero(tmp_path, monkeypatch, capsys):
    """Console scripts sys.exit(main()): returning the metrics dict made
    every successful evaluation exit 1 (review r3)."""
    from tpuseg.cli import evaluate as ev

    monkeypatch.setattr("tpuseg.ops.metrics.evaluate_folder",
                        lambda *a, **k: {"mean_iou": 0.9})
    monkeypatch.setattr(ev, "evaluate_folder",
                        lambda *a, **k: {"mean_iou": 0.9}, raising=False)
    rc = ev.main(["--pred_folder", str(tmp_path), "--truth_folder",
                  str(tmp_path), "--number_classes", "2"])
    assert rc == 0
    assert "mean_iou" in capsys.readouterr().out


def test_inference_cli_base_features(monkeypatch):
    """--base_features reaches InferenceConfig (non-64 reference imports
    could not be served without it — review r3)."""
    from tpuseg.cli import inference as inf

    captured = {}
    monkeypatch.setattr(inf, "inference",
                        lambda cfg: (captured.setdefault("cfg", cfg), [])[1])
    inf.main(["--checkpoint_filepath", "c", "--image_folder", "i",
              "--output_folder", "o", "--number_classes", "2",
              "--number_channels", "1", "--base_features", "32"])
    assert captured["cfg"].base_features == 32
