"""Realtime watcher test: fake MinKNOW producer on a timer (SURVEY.md §4.5)."""

import os
import threading
import time

import jax
import numpy as np
import pytest

from deepbinner_tpu.cli.main import main
from deepbinner_tpu.models.checkpoint import save_model
from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.utils import simulate
from deepbinner_tpu.utils.fast5 import write_single_read_fast5

TINY_NET = NetworkConfig(
    input_length=256, stem_features=8, block_features=(8,),
    inception_features=(16,), head_features=16,
)


@pytest.fixture
def tiny_model(tmp_path):
    path = tmp_path / "starts.dbt"
    _, variables = init_params(jax.random.PRNGKey(0), TINY_NET)
    save_model(path, TINY_NET, variables, {"kit": "EXP-NBD103", "end": "start"})
    return str(path)


def _producer(in_dir, n_reads, delay_s):
    """Write fast5s on a timer, like MinKNOW finishing reads."""
    rng = np.random.default_rng(0)
    for i in range(n_reads):
        read = simulate.simulate_read(
            "EXP-NBD103", (i % 12) + 1, rng, genome_length=300
        )
        # write-then-rename so the watcher never sees a partial file
        final = os.path.join(in_dir, f"{read.read_id}.fast5")
        tmp = final + ".part"
        write_single_read_fast5(tmp, read.read_id, read.signal)
        os.replace(tmp, final)
        time.sleep(delay_s)


def test_realtime_sorts_files(tmp_path, tiny_model):
    in_dir = tmp_path / "incoming"
    out_dir = tmp_path / "sorted"
    in_dir.mkdir()
    n_reads = 6
    stop = tmp_path / "stop"
    producer = threading.Thread(
        target=_producer, args=(str(in_dir), n_reads, 0.1), daemon=True
    )

    def monitor():  # signal shutdown once all files are sorted (or timeout)
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            moved = sum(len(names) for _r, _d, names in os.walk(out_dir))
            if moved >= n_reads:
                break
            time.sleep(0.2)
        stop.write_text("")

    watcher = threading.Thread(target=monitor, daemon=True)
    producer.start()
    watcher.start()
    main([
        "realtime", "--in_dir", str(in_dir), "--out_dir", str(out_dir),
        "-s", tiny_model, "--scan_size", "768", "--batch_size", "8",
        "--min_score", "0.0", "--score_diff", "0.0",
        "--poll_interval", "0.2", "--stop_file", str(stop),
    ])
    producer.join()
    watcher.join()
    # every produced file was moved out of in_dir into some bin
    remaining = [f for f in os.listdir(in_dir) if f.endswith(".fast5")]
    assert remaining == []
    moved = [
        os.path.join(root, name)
        for root, _dirs, names in os.walk(out_dir)
        for name in names
        if name.endswith(".fast5")
    ]
    assert len(moved) == n_reads


def test_realtime_stop_file(tmp_path, tiny_model):
    in_dir = tmp_path / "incoming"
    out_dir = tmp_path / "sorted"
    in_dir.mkdir()
    stop = tmp_path / "stop"
    stop.write_text("")
    t0 = time.monotonic()
    main([
        "realtime", "--in_dir", str(in_dir), "--out_dir", str(out_dir),
        "-s", tiny_model, "--scan_size", "768", "--batch_size", "4",
        "--poll_interval", "0.1", "--stop_file", str(stop),
    ])
    assert time.monotonic() - t0 < 60  # exits promptly (includes compile)


def test_realtime_skips_garbage_but_retries(tmp_path, tiny_model):
    """A persistently unreadable file is abandoned, not looped forever."""
    in_dir = tmp_path / "incoming"
    out_dir = tmp_path / "sorted"
    in_dir.mkdir()
    (in_dir / "bad.fast5").write_bytes(b"never valid hdf5")
    rng = np.random.default_rng(1)
    read = simulate.simulate_read("EXP-NBD103", 3, rng, genome_length=300)
    write_single_read_fast5(in_dir / "good.fast5", read.read_id, read.signal)
    main([
        "realtime", "--in_dir", str(in_dir), "--out_dir", str(out_dir),
        "-s", tiny_model, "--scan_size", "768", "--batch_size", "4",
        "--min_score", "0.0", "--score_diff", "0.0",
        "--poll_interval", "0.05", "--max_batches", "1",
    ])
    assert not (in_dir / "good.fast5").exists()  # classified + moved
    assert (in_dir / "bad.fast5").exists()       # left in place, not moved
