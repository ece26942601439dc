"""L6 shell-launcher plumbing: run the batch scripts with a stub `python`
on PATH and assert the CLI invocation they assemble (flags, env staging,
log-file conventions) — the launcher analog of test_cli_wiring (reference
counterparts: UNet/sbatch_train.sh, and the tpuseg multi-host extension)."""

import os
import stat
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _stub_python(bin_dir: Path, capture: Path) -> None:
    stub = bin_dir / "python"
    stub.write_text(
        "#!/bin/bash\n"
        f"printf '%s\\n' \"$@\" > {capture}\n"
        "echo stub-train-ran\n"
    )
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)


def _run(script: str, tmp_path: Path, extra_env=None, args=()):
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    capture = tmp_path / "argv.txt"
    _stub_python(bin_dir, capture)
    out_dir = tmp_path / "results"
    env = dict(os.environ)
    env.update({
        "PATH": f"{bin_dir}:{env['PATH']}",
        "TRAIN_DATABASE": str(tmp_path / "train-x.lmdb"),
        "TEST_DATABASE": str(tmp_path / "test-x.lmdb"),
        "OUTPUT_DIR": str(out_dir),
    })
    env.pop("SLURM_JOB_ID", None)  # keep the /scratch staging branch off
    # host-identity vars would change HOST_ID resolution if the suite itself
    # runs under srun or on a TPU-VM worker
    env.pop("SLURM_PROCID", None)
    env.pop("TPU_WORKER_ID", None)
    env.update(extra_env or {})
    proc = subprocess.run(
        [str(REPO / "scripts" / script), *args],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    return capture.read_text().splitlines(), out_dir, proc


def test_batch_train_invocation(tmp_path):
    argv, out_dir, _ = _run("batch_train.sh", tmp_path)
    assert argv[:2] == ["-m", "tpuseg.cli.train"]
    flags = dict(zip(argv[2::2], argv[3::2]))
    assert flags["--train_database"].endswith("train-x.lmdb")
    assert flags["--test_database"].endswith("test-x.lmdb")
    assert flags["--output_dir"] == str(out_dir)
    assert flags["--batch_size"] == "8" and flags["--reader_count"] == "2"
    # tee convention (sbatch_train.sh:78-80) and source snapshot (72-73)
    assert "stub-train-ran" in (out_dir / "log.txt").read_text()
    assert (out_dir / "git_commit.txt").exists()


def test_batch_train_forwards_extra_flags(tmp_path):
    argv, _, _ = _run("batch_train.sh", tmp_path,
                      args=("--number_classes", "4"))
    assert argv[-2:] == ["--number_classes", "4"]


def test_batch_train_multihost_invocation(tmp_path):
    argv, out_dir, _ = _run("batch_train_multihost.sh", tmp_path,
                            extra_env={"SLURM_PROCID": "3"})
    flags = dict(zip(argv[2::2], argv[3::2]))
    assert flags["--multihost"] == "1"
    # per-host log naming; host 3 is not host 0, so no snapshot race
    assert "stub-train-ran" in (out_dir / "log_host3.txt").read_text()
    assert not (out_dir / "git_commit.txt").exists()


def test_batch_train_multihost_host0_snapshots(tmp_path):
    _, out_dir, _ = _run("batch_train_multihost.sh", tmp_path,
                         extra_env={"TPU_WORKER_ID": "0"})
    assert (out_dir / "log_host0.txt").exists()
    assert (out_dir / "git_commit.txt").exists()
    assert (out_dir / "source_snapshot.tar.gz").exists()


def test_batch_train_multihost_unknown_host_identity(tmp_path):
    """Without SLURM/TPU env (e.g. bare `gcloud ssh --worker=all`), HOST_ID
    falls back to the hostname: logs stay unique per host and nobody claims
    the host-0 snapshot role."""
    import socket

    _, out_dir, _ = _run("batch_train_multihost.sh", tmp_path)
    host = socket.gethostname().split(".")[0]
    assert (out_dir / f"log_host{host}.txt").exists()
    assert not (out_dir / "git_commit.txt").exists()


def test_batch_train_requires_databases(tmp_path):
    env = dict(os.environ)
    env.pop("TRAIN_DATABASE", None)
    proc = subprocess.run(
        [str(REPO / "scripts" / "batch_train.sh")],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode != 0
    assert "TRAIN_DATABASE" in proc.stderr
