"""End-to-end CLI tests: simulate → classify → bin (SURVEY.md §4 item 2)."""

import gzip
import os

import jax
import numpy as np
import pytest

from deepbinner_tpu.cli.main import main
from deepbinner_tpu.models.checkpoint import save_model
from deepbinner_tpu.models.network import NetworkConfig, init_params
from deepbinner_tpu.utils import simulate, table

TINY_NET = NetworkConfig(
    input_length=256, stem_features=8, block_features=(8,),
    inception_features=(16,), head_features=16,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    truth = simulate.make_dataset(
        root, kit="EXP-NBD103", reads_per_barcode=1, none_reads=2,
        genome_length=600, seed=11,
    )
    return root, truth


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("model") / "starts.dbt"
    _, variables = init_params(jax.random.PRNGKey(0), TINY_NET)
    save_model(path, TINY_NET, variables, {"kit": "EXP-NBD103", "end": "start"})
    return str(path)


def _classify(dataset_dir, model, capsys, extra=()):
    main([
        "classify", str(dataset_dir / "fast5s"), "-s", model,
        "--scan_size", "768", "--batch_size", "8", *extra,
    ])
    return capsys.readouterr().out


def test_classify_to_tsv(dataset, tiny_model, capsys):
    root, truth = dataset
    out = _classify(root, tiny_model, capsys)
    lines = [l for l in out.splitlines() if l]
    assert lines[0].startswith(table.HEADER_PREFIX)
    calls = dict(l.split("\t")[:2] for l in lines[1:])
    assert set(calls) == set(truth)
    assert all(c == "none" or c.startswith("barcode") for c in calls.values())


def test_classify_deterministic(dataset, tiny_model, capsys):
    root, _ = dataset
    out1 = _classify(root, tiny_model, capsys)
    out2 = _classify(root, tiny_model, capsys)
    assert out1 == out2


@pytest.mark.parametrize("wire", ["int16", "int8", "int4"])
def test_classify_wire_flag_e2e(dataset, tiny_model, capsys, wire):
    """Every --wire format runs the CLI end-to-end and emits a complete,
    deterministic table (the wires' call-level agreement on real scales
    is pinned on-chip in BENCH_WIRE_r05.jsonl; here: plumbing + shapes)."""
    root, truth = dataset
    out = _classify(root, tiny_model, capsys, extra=("--wire", wire))
    lines = [l for l in out.splitlines() if l]
    calls = dict(l.split("\t")[:2] for l in lines[1:])
    assert set(calls) == set(truth)
    out2 = _classify(root, tiny_model, capsys, extra=("--wire", wire))
    assert out == out2


@pytest.mark.parametrize("container", ["multifast5", "pod5"])
def test_classify_container_layout_identical_table(tiny_model, capsys,
                                                   tmp_path, container):
    """The same simulated reads packed as multi-read fast5 or pod5
    containers classify to a byte-identical table through the unmodified
    CLI (same generation parameters ⇒ same reads; only the decode path
    differs).  Both datasets are generated here with identical settings —
    `write_fastq` also draws from the RNG, so layouts must share ALL
    generation parameters for read-identity."""
    kwargs = dict(kit="EXP-NBD103", reads_per_barcode=1, none_reads=2,
                  genome_length=600, seed=11, write_fastq=False)
    single_root = tmp_path / "single"
    truth_single = simulate.make_dataset(single_root, **kwargs)
    packed_root = tmp_path / container
    truth_packed = simulate.make_dataset(packed_root, container=container,
                                         reads_per_container=5, **kwargs)
    assert truth_packed == truth_single  # identical reads generated
    want = _classify(single_root, tiny_model, capsys)
    got = _classify(packed_root, tiny_model, capsys)
    assert got == want


def test_classify_wire_int4_rejects_device_trim(dataset, tiny_model, capsys):
    root, _ = dataset
    with pytest.raises(SystemExit):
        _classify(root, tiny_model, capsys,
                  extra=("--wire", "int4", "--device_trim"))


def test_classify_shard_resume(dataset, tiny_model, capsys, tmp_path):
    """Kill-and-rerun with --shard_dir: byte-identical output, finished
    shards are NOT reclassified (round-1 VERDICT item 6)."""
    root, _ = dataset
    plain = _classify(root, tiny_model, capsys)
    shard_dir = tmp_path / "shards"
    extra = ("--shard_dir", str(shard_dir), "--shard_files", "2")
    out1 = _classify(root, tiny_model, capsys, extra=extra)
    assert out1 == plain  # sharded output == unsharded output
    shards = sorted(p for p in shard_dir.iterdir() if p.name.startswith("shard_"))
    assert len(shards) > 2
    # Simulate a killed run: drop the last shard, keep the rest.
    victim = shards[-1]
    victim.unlink()
    before = {p.name: p.stat().st_mtime_ns for p in shards[:-1]}
    out2 = _classify(root, tiny_model, capsys, extra=extra)
    assert out2 == plain  # resumed output byte-identical
    assert victim.exists()  # the missing shard was re-made...
    for p in shards[:-1]:   # ...and the finished ones untouched
        assert p.stat().st_mtime_ns == before[p.name]
    # A different sharding of the same dir must be refused (stale-shard
    # protection via the manifest).
    with pytest.raises(SystemExit):
        _classify(root, tiny_model, capsys,
                  extra=("--shard_dir", str(shard_dir), "--shard_files", "3"))
    # ...and so must a different model: the manifest fingerprints the
    # weights + config, or stale shards would silently mix models.
    other_model = str(shards[0].parent.parent / "other.dbt")
    _, other_vars = init_params(jax.random.PRNGKey(9), TINY_NET)
    save_model(other_model, TINY_NET, other_vars,
               {"kit": "EXP-NBD103", "end": "start"})
    with pytest.raises(SystemExit):
        _classify(root, other_model, capsys, extra=extra)


def test_classify_shard_retries_failed_files(dataset, tiny_model, capsys, tmp_path):
    """A transiently-unreadable file is recorded in a shard sidecar and
    RETRIED on rerun, instead of being permanently lost (ADVICE r2 item 4)."""
    root, truth = dataset
    plain = _classify(root, tiny_model, capsys)
    victim = sorted((root / "fast5s").iterdir())[0]
    original = victim.read_bytes()
    victim.write_bytes(b"not an hdf5 file")
    shard_dir = tmp_path / "shards"
    extra = ("--shard_dir", str(shard_dir), "--shard_files", "4")
    out1 = _classify(root, tiny_model, capsys, extra=extra)
    assert len(out1.splitlines()) < len(plain.splitlines())  # reads missing
    sidecars = list(shard_dir.glob("*.failed"))
    assert len(sidecars) == 1
    assert sidecars[0].read_text().strip() == str(victim)
    # Restore the file; the rerun must retry it and converge to the full table.
    victim.write_bytes(original)
    out2 = _classify(root, tiny_model, capsys, extra=extra)
    assert out2 == plain
    assert not list(shard_dir.glob("*.failed"))  # sidecar cleared


def test_classify_all_unreadable_fails_loud(tiny_model, capsys, tmp_path):
    """100% unreadable inputs must error, not emit an empty table
    (ADVICE r2 item 2 — the silent-empty pod5 hazard)."""
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    (bad_dir / "a.fast5").write_bytes(b"garbage")
    (bad_dir / "b.pod5").write_bytes(b"garbage")
    with pytest.raises(SystemExit):
        main(["classify", str(bad_dir), "-s", tiny_model,
              "--scan_size", "768", "--batch_size", "8"])
    capsys.readouterr()


def test_classify_verbose_scores(dataset, tiny_model, capsys):
    root, truth = dataset
    out = _classify(root, tiny_model, capsys, extra=("--verbose",))
    lines = [l for l in out.splitlines() if l]
    # header + one row per read, each with 13 probability columns
    assert len(lines) == len(truth) + 1
    assert len(lines[1].split("\t")) == 2 + 13


def test_sharded_classify_matches_single_host(dataset, tiny_model, capsys, monkeypatch):
    """Env-simulated 2-process run: union of shard outputs == single-host."""
    root, truth = dataset
    single = _classify(root, tiny_model, capsys)
    single_calls = dict(
        l.split("\t")[:2] for l in single.splitlines()[1:] if l
    )
    sharded_calls = {}
    seen = []
    for rank in range(2):
        monkeypatch.setenv("DEEPBINNER_TPU_PROCESS_INDEX", str(rank))
        monkeypatch.setenv("DEEPBINNER_TPU_PROCESS_COUNT", "2")
        out = _classify(root, tiny_model, capsys)
        rows = [l.split("\t")[:2] for l in out.splitlines()[1:] if l]
        seen.append(len(rows))
        sharded_calls.update(dict(rows))
    monkeypatch.delenv("DEEPBINNER_TPU_PROCESS_INDEX")
    monkeypatch.delenv("DEEPBINNER_TPU_PROCESS_COUNT")
    assert sum(seen) == len(truth)          # disjoint cover
    assert sharded_calls == single_calls    # identical calls


def test_bin_roundtrip(dataset, tiny_model, capsys, tmp_path):
    root, truth = dataset
    tsv = tmp_path / "calls.tsv"
    tsv.write_text(_classify(root, tiny_model, capsys))
    out_dir = tmp_path / "bins"
    main(["bin", "--classes", str(tsv), "--reads", str(root / "reads.fastq"),
          "--out_dir", str(out_dir)])
    capsys.readouterr()
    written = sorted(os.listdir(out_dir))
    assert written  # at least one bin
    total = 0
    for name in written:
        with gzip.open(out_dir / name, "rt") as handle:
            reads = [l for l in handle if l.startswith("@")]
        total += len(reads)
    assert total == len(truth)


def test_bin_byte_identical(dataset, tiny_model, capsys, tmp_path):
    root, _ = dataset
    tsv = tmp_path / "calls.tsv"
    tsv.write_text(_classify(root, tiny_model, capsys))
    outs = []
    for run in range(2):
        out_dir = tmp_path / f"bins{run}"
        main(["bin", "--classes", str(tsv), "--reads", str(root / "reads.fastq"),
              "--out_dir", str(out_dir)])
        capsys.readouterr()
        outs.append({
            name: (out_dir / name).read_bytes()
            for name in sorted(os.listdir(out_dir))
        })
    assert outs[0] == outs[1]


def test_missing_classification_goes_to_none(dataset, capsys, tmp_path):
    root, truth = dataset
    tsv = tmp_path / "calls.tsv"
    some_read = sorted(truth)[0]
    tsv.write_text(f"{some_read}\tbarcode05\n")  # only one read classified
    out_dir = tmp_path / "bins"
    main(["bin", "--classes", str(tsv), "--reads", str(root / "reads.fastq"),
          "--out_dir", str(out_dir)])
    capsys.readouterr()
    with gzip.open(out_dir / "none.fastq.gz", "rt") as handle:
        none_reads = [l for l in handle if l.startswith("@")]
    assert len(none_reads) == len(truth) - 1


def test_version(capsys):
    with pytest.raises(SystemExit) as exc:
        main(["--version"])
    assert exc.value.code == 0
    assert "deepbinner-tpu" in capsys.readouterr().out


def test_no_command_shows_help(capsys):
    with pytest.raises(SystemExit) as exc:
        main([])
    assert exc.value.code == 1


def test_simulate_command(tmp_path, capsys):
    main(["simulate", str(tmp_path / "sim"), "--reads_per_barcode", "0",
          "--none_reads", "3", "--genome_length", "200"])
    assert (tmp_path / "sim" / "truth.tsv").exists()


def test_bin_rejects_corrupt_call_strings(tmp_path, capsys):
    """Call strings become output filenames — garbage must fail loudly."""
    reads = tmp_path / "r.fastq"
    reads.write_text("@read1\nACGT\n+\n!!!!\n")
    classes = tmp_path / "calls.tsv"
    classes.write_text("read1\t../escape\n")
    with pytest.raises(SystemExit):
        main(["bin", "--classes", str(classes), "--reads", str(reads),
              "--out_dir", str(tmp_path / "bins")])
    capsys.readouterr()
    assert not (tmp_path / "bins" / "..").exists()
