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


def test_watch_state_bounded():
    """Seen/attempt bookkeeping is pruned to the current directory listing.

    Over a multi-day run with millions of files moving through in_dir, the
    watcher must hold state only for files still present (round-3 VERDICT
    weak #8), while abandoned (still-present) files stay remembered.
    """
    from deepbinner_tpu.cli.realtime import _MAX_ATTEMPTS, _WatchState

    state = _WatchState()
    # 1000 files were sorted (moved out); one bad file stays in in_dir.
    for i in range(1000):
        state.done.add(f"/in/read_{i}.fast5")
    for _ in range(_MAX_ATTEMPTS):
        state.record_attempt("/in/bad.fast5", unreadable=True)
    assert "/in/bad.fast5" in state.done  # abandoned after max attempts

    # Next scan: only the bad file and one new file remain in in_dir.
    state.prune({"/in/bad.fast5", "/in/new.fast5"})
    assert state.done == {"/in/bad.fast5"}
    assert state.attempts == {"/in/bad.fast5": _MAX_ATTEMPTS}

    # A readable-but-unclassifiable file is given up on immediately.
    state.record_attempt("/in/new.fast5", unreadable=False)
    assert "/in/new.fast5" in state.done
    # Both files left the directory → state empties completely.
    state.prune(set())
    assert not state.done and not state.attempts


def test_realtime_soak_reader_pool(tmp_path, tiny_model, monkeypatch):
    """Sustained producer through the ReaderPool path (round-4 item 5).

    Files arrive continuously across ≥20 poll cycles; every file must be
    sorted, and the TPU-client process must never decode a signal file
    itself — in-parent decode entry points are poisoned to prove decode
    happens only in the worker processes.
    """
    from deepbinner_tpu.cli import realtime as rt

    def poison(*_a, **_k):
        raise AssertionError(
            "realtime decoded a file in the client process"
        )

    # _classify_new_files (the in-process variant) must not run at all when
    # the pool path is forced; poison both it and the module's read fn.
    monkeypatch.setattr(rt, "read_signal_file", poison)
    monkeypatch.setattr(rt, "_classify_new_files", poison)

    in_dir = tmp_path / "incoming"
    out_dir = tmp_path / "sorted"
    in_dir.mkdir()
    n_reads = 24
    stop = tmp_path / "stop"
    producer = threading.Thread(
        target=_producer, args=(str(in_dir), n_reads, 0.1), daemon=True
    )

    def monitor():
        deadline = time.monotonic() + 180
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
        "--poll_interval", "0.05", "--stop_file", str(stop),
        "--reader_processes", "1", "--no_native_reader",
    ])
    producer.join()
    watcher.join()
    remaining = [f for f in os.listdir(in_dir) if f.endswith(".fast5")]
    assert remaining == []
    moved = [
        name
        for _root, _dirs, names in os.walk(out_dir)
        for name in names
        if name.endswith(".fast5")
    ]
    assert len(moved) == n_reads


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


def test_realtime_survives_reader_pool_death(tmp_path, tiny_model, monkeypatch):
    """A dead/stalled pool (e.g. a worker segfault on a half-written file)
    must not abort the days-long watch mode: the loop respawns the workers
    and the files are sorted on a later scan."""
    from deepbinner_tpu.cli import realtime as rt

    real = rt._classify_new_files_pool
    fail_once = {"armed": True}

    def flaky(program, pool, new_files, args, counts):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("reader pool stalled (simulated worker death)")
        return real(program, pool, new_files, args, counts)

    monkeypatch.setattr(rt, "_classify_new_files_pool", flaky)

    in_dir = tmp_path / "incoming"
    out_dir = tmp_path / "sorted"
    in_dir.mkdir()
    n_reads = 4
    _producer(str(in_dir), n_reads, 0.0)  # all files present up front
    stop = tmp_path / "stop"

    def monitor():
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            moved = sum(len(names) for _r, _d, names in os.walk(out_dir))
            if moved >= n_reads:
                break
            time.sleep(0.2)
        stop.write_text("")

    watcher = threading.Thread(target=monitor, daemon=True)
    watcher.start()
    main([
        "realtime", "--in_dir", str(in_dir), "--out_dir", str(out_dir),
        "-s", tiny_model, "--scan_size", "768", "--batch_size", "8",
        "--min_score", "0.0", "--score_diff", "0.0",
        "--poll_interval", "0.05", "--stop_file", str(stop),
        "--reader_processes", "1", "--no_native_reader",
    ])
    watcher.join()
    assert not fail_once["armed"], "the simulated failure never fired"
    moved = [
        name
        for _root, _dirs, names in os.walk(out_dir)
        for name in names
        if name.endswith(".fast5")
    ]
    assert len(moved) == n_reads, "files lost after pool respawn"


def test_realtime_poison_file_isolated(tmp_path, tiny_model, monkeypatch):
    """A file that crashes the pool on EVERY scan must not take the healthy
    files in its scan down with it: after a respawn the loop retries the
    scan one file at a time, so only the culprit is charged attempts while
    its neighbours are classified immediately (round-4 ADVICE, medium —
    the old handler abandoned every file present during 5 poisoned scans).
    """
    from deepbinner_tpu.cli import realtime as rt

    real = rt._classify_new_files_pool
    crashes = {"n": 0}

    def flaky(program, pool, new_files, args, counts):
        if any(os.path.basename(p) == "poison.fast5" for p in new_files):
            crashes["n"] += 1
            raise RuntimeError("simulated native crash in a worker")
        return real(program, pool, new_files, args, counts)

    monkeypatch.setattr(rt, "_classify_new_files_pool", flaky)

    in_dir = tmp_path / "incoming"
    out_dir = tmp_path / "sorted"
    in_dir.mkdir()
    n_reads = 3
    _producer(str(in_dir), n_reads, 0.0)  # healthy files, present up front
    (in_dir / "poison.fast5").write_bytes(b"crashes the pool, per flaky()")
    stop = tmp_path / "stop"

    def monitor():  # stop once every healthy file is sorted (or timeout)
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            moved = sum(len(names) for _r, _d, names in os.walk(out_dir))
            if moved >= n_reads:
                break
            time.sleep(0.2)
        stop.write_text("")

    watcher = threading.Thread(target=monitor, daemon=True)
    watcher.start()
    main([
        "realtime", "--in_dir", str(in_dir), "--out_dir", str(out_dir),
        "-s", tiny_model, "--scan_size", "768", "--batch_size", "8",
        "--min_score", "0.0", "--score_diff", "0.0",
        "--poll_interval", "0.05", "--stop_file", str(stop),
        "--reader_processes", "1", "--no_native_reader",
    ])
    watcher.join()
    assert crashes["n"] >= 2, "the poison file never exercised the handler"
    moved = [
        name
        for _root, _dirs, names in os.walk(out_dir)
        for name in names
        if name.endswith(".fast5")
    ]
    assert len(moved) == n_reads, "healthy files were abandoned with the culprit"
    assert (in_dir / "poison.fast5").exists()  # never moved, only abandoned
