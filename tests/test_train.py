"""Tests for prep/balance/train (SURVEY.md §3.4 pipeline)."""

import json
import types

import numpy as np
import pytest

from deepbinner_tpu.train import balance as balance_mod
from deepbinner_tpu.train import data as data_io
from deepbinner_tpu.train import prep as prep_mod
from deepbinner_tpu.train.trainer import (
    TINY_PRESET,
    TrainConfig,
    Trainer,
    iter_epoch_batches,
    train_loop,
)


def test_epoch_batches_cover_every_sample():
    """No dropped partial batch: every index appears with weight 1 exactly once."""
    for n, batch_size in [(10, 4), (8, 8), (3, 8), (17, 5)]:
        order = np.random.default_rng(n).permutation(n)
        seen = []
        for idx, weights in iter_epoch_batches(order, batch_size):
            assert idx.shape == (batch_size,)
            assert weights.shape == (batch_size,)
            seen.extend(idx[weights > 0].tolist())
        assert sorted(seen) == sorted(order.tolist())
from deepbinner_tpu.utils import simulate


def test_edit_distance_find_exact_and_indels():
    # Exact hit.
    assert prep_mod.edit_distance_find("AAACGTACGTAAA", "CGTACGT", 0) == (3, 10, 0)
    # One substitution.
    start, end, edits = prep_mod.edit_distance_find("AAACGTACGTAAA", "CGTTCGT", 1)
    assert (start, end, edits) == (3, 10, 1)
    # One deletion in the haystack copy (needle base missing).
    start, end, edits = prep_mod.edit_distance_find("AAACGTCGTAAA", "CGTACGT", 1)
    assert edits == 1 and start == 3 and end == 9
    # One insertion in the haystack copy.
    start, end, edits = prep_mod.edit_distance_find("AAACGTAACGTAAA", "CGTACGT", 1)
    assert edits == 1 and start == 3 and end == 11
    # No match within budget.
    assert prep_mod.edit_distance_find("AAACGTACGTAAA", "GGGGGGG", 1) is None
    assert prep_mod.edit_distance_find("", "AAAA", 0) is None


def _corrupt_with_indels(sequence, rng, rate=0.10):
    """Apply insertions/deletions at `rate` per base (half each)."""
    out = []
    for base in sequence:
        roll = rng.random()
        if roll < rate / 2:
            continue  # deletion
        if roll < rate:
            out.append("ACGT"[rng.integers(4)])  # insertion before the base
        out.append(base)
    return "".join(out)


def test_indel_tolerant_localisation_beats_hamming():
    """At 10% indel error the edit search recovers ≥90%; Hamming ~0%.

    This is the round-1 VERDICT item 4 acceptance test: real nanopore
    basecalls carry indels, which a fixed-width Hamming scan cannot absorb.
    """
    rng = np.random.default_rng(7)
    barcodes = simulate.barcode_sequences("EXP-NBD103")
    trials = 40
    edit_hits = 0
    hamming_hits = 0
    for t in range(trials):
        true_idx = int(rng.integers(len(barcodes)))
        barcode = barcodes[true_idx]
        flank_l = "".join(rng.choice(list("ACGT"), 60))
        flank_r = "".join(rng.choice(list("ACGT"), 200))
        read = _corrupt_with_indels(flank_l + barcode + flank_r, rng, 0.10)
        # Edit-distance search: pick the barcode with the fewest edits.
        best = None
        for i, candidate in enumerate(barcodes):
            hit = prep_mod.edit_distance_find(read[:150], candidate, 5)
            if hit and (best is None or hit[2] < best[0]):
                best = (hit[2], i, hit[0])
        if best is not None and best[1] == true_idx and abs(best[2] - 60) <= 12:
            edit_hits += 1
        # Hamming scan at the old default budget.
        for i, candidate in enumerate(barcodes):
            if prep_mod.approximate_find(read[:150], candidate, 3) >= 0:
                hamming_hits += i == true_idx
                break
    assert edit_hits >= 0.9 * trials, f"edit search recovered {edit_hits}/{trials}"
    # A 24-mer escapes indel corruption entirely ~e^-2.4 ≈ 9% of the time, so
    # Hamming isn't literally 0% — but it must be far below the edit search.
    assert hamming_hits <= 0.25 * trials, f"hamming recovered {hamming_hits}/{trials}"


def test_approximate_find():
    assert prep_mod.approximate_find("AAACGTACGTAAA", "CGTACGT", 0) == 3
    # one mismatch tolerated
    assert prep_mod.approximate_find("AAACGTACGTAAA", "CGTTCGT", 1) == 3
    assert prep_mod.approximate_find("AAACGTACGTAAA", "GGGGGGG", 1) == -1
    assert prep_mod.approximate_find("AA", "AAAA", 0) == -1


def test_base_range_to_signal_range():
    dwells = np.asarray([3, 2, 4, 1])
    start, end = prep_mod.base_range_to_signal_range(100, dwells, 1, 3)
    assert (start, end) == (103, 109)
    # clamped at sequence end
    start, end = prep_mod.base_range_to_signal_range(100, dwells, 2, 99)
    assert (start, end) == (105, 110)


def test_extract_training_samples_start():
    rng = np.random.default_rng(0)
    read = simulate.simulate_read("EXP-NBD103", 4, rng, genome_length=600)
    move = (read.signal_start_of_bases, read.dwells)
    samples = prep_mod.extract_training_samples(
        read.signal, read.sequence, move, "EXP-NBD103", "start",
        signal_size=512, margin=64,
    )
    labels = [s[0] for s in samples]
    assert 4 in labels          # the true barcode row
    assert 0 in labels          # plus a mid-read none row
    assert all(s[1].size == 512 for s in samples)


def test_extract_training_samples_end_reversed():
    rng = np.random.default_rng(1)
    read = simulate.simulate_read("EXP-NBD103", 7, rng, genome_length=600)
    move = (read.signal_start_of_bases, read.dwells)
    samples = prep_mod.extract_training_samples(
        read.signal, read.sequence, move, "EXP-NBD103", "end",
        signal_size=512, margin=64,
    )
    assert 7 in [s[0] for s in samples]


def test_prep_multi_read_fast5_move_tables(tmp_path):
    """prep consumes per-read move tables in multi-read fast5s (VERDICT #5)."""
    from deepbinner_tpu.cli.main import main
    from deepbinner_tpu.utils import fast5 as fast5_io

    rng = np.random.default_rng(2)
    reads, moves, fastq = [], {}, []
    for barcode in [1, 2, 3]:
        read = simulate.simulate_read("EXP-NBD103", barcode, rng,
                                      genome_length=300, open_pore_length=50)
        reads.append((read.read_id, read.signal))
        moves[read.read_id] = (read.signal_start_of_bases, read.dwells)
        fastq.append(f"@{read.read_id}\n{read.sequence}\n+\n"
                     f"{'I' * len(read.sequence)}\n")
    f5_dir = tmp_path / "fast5s"
    f5_dir.mkdir()
    fast5_io.write_multi_read_fast5(f5_dir / "batch0.fast5", reads, moves)
    (tmp_path / "reads.fastq").write_text("".join(fastq))

    # Sanity: per-read tables resolve by read id.
    tables = fast5_io.get_move_tables(f5_dir / "batch0.fast5")
    assert set(tables) == {r for r, _ in reads}

    out = tmp_path / "train.tsv"
    main(["prep", str(f5_dir), "--kit", "EXP-NBD103", "--end", "start",
          "--reads", str(tmp_path / "reads.fastq"), "--out", str(out),
          "--signal_size", "512", "--margin", "64"])
    labels = [int(line.split("\t")[0]) for line in out.read_text().splitlines()]
    assert {1, 2, 3}.issubset(labels)  # every barcoded read yielded a sample


def test_prep_external_assignments(tmp_path):
    """--assignments (Porechop-output mode): localisation is restricted to
    each read's externally-assigned barcode; unassigned reads are skipped."""
    from deepbinner_tpu.cli.main import main
    from deepbinner_tpu.utils import fast5 as fast5_io

    rng = np.random.default_rng(12)
    reads, moves, fastq, assign = [], {}, [], []
    for barcode in [1, 2, 3, 4]:
        read = simulate.simulate_read("EXP-NBD103", barcode, rng,
                                      genome_length=300, open_pore_length=50)
        reads.append((read.read_id, read.signal))
        moves[read.read_id] = (read.signal_start_of_bases, read.dwells)
        fastq.append(f"@{read.read_id}\n{read.sequence}\n+\n"
                     f"{'I' * len(read.sequence)}\n")
        if barcode <= 3:  # read 4 gets no assignment → skipped
            # deliberately assign read 3 as "none": it must yield only class-0
            call = "none" if barcode == 3 else f"barcode{barcode:02d}"
            assign.append(f"{read.read_id}\t{call}")
    f5_dir = tmp_path / "fast5s"
    f5_dir.mkdir()
    fast5_io.write_multi_read_fast5(f5_dir / "b.fast5", reads, moves)
    (tmp_path / "reads.fastq").write_text("".join(fastq))
    (tmp_path / "assign.tsv").write_text("\n".join(assign) + "\n")

    out = tmp_path / "train.tsv"
    main(["prep", str(f5_dir), "--kit", "EXP-NBD103", "--end", "start",
          "--reads", str(tmp_path / "reads.fastq"), "--out", str(out),
          "--signal_size", "512", "--margin", "64",
          "--assignments", str(tmp_path / "assign.tsv")])
    labels = [int(line.split("\t")[0]) for line in out.read_text().splitlines()]
    assert 1 in labels and 2 in labels      # assigned barcodes localised
    assert 4 not in labels                  # unassigned read skipped
    assert 3 not in labels and 0 in labels  # "none" assignment → class 0 only


def test_real_kit_sequences_localised_in_simulated_basecalls():
    """Round-2 VERDICT item 4 acceptance: prep localises the REAL ONT kit
    barcode sequences injected into simulated basecalled reads — for both
    kits at the read start, and at the read end for EXP-NBD103."""
    from deepbinner_tpu.utils import kits

    rng = np.random.default_rng(3)
    for kit in ("EXP-NBD103", "SQK-RBK004"):
        forms = kits.barcode_start_forms(kit)
        assert len(forms) == 12 and all(len(f) == 24 for f in forms)
        for barcode in (1, 5, 12):
            read = simulate.simulate_read(kit, barcode, rng, genome_length=400)
            # the real start-form is literally present in the basecall
            assert forms[barcode - 1] in read.sequence[:120]
            move = (read.signal_start_of_bases, read.dwells)
            samples = prep_mod.extract_training_samples(
                read.signal, read.sequence, move, kit, "start",
                signal_size=512, margin=64,
            )
            assert barcode in [s[0] for s in samples]
        if kit == "EXP-NBD103":
            read = simulate.simulate_read(kit, 9, rng, genome_length=400)
            assert kits.BARCODES[9] in read.sequence[-140:]
            move = (read.signal_start_of_bases, read.dwells)
            samples = prep_mod.extract_training_samples(
                read.signal, read.sequence, move, kit, "end",
                signal_size=512, margin=64,
            )
            assert 9 in [s[0] for s in samples]


def test_native_barcodes_are_revcomp_of_canonical():
    """EXP-NBD103 start forms are the reverse complement of the canonical
    BC01-12 sequences (the kits' documented strand relationship)."""
    from deepbinner_tpu.utils import kits

    native = kits.barcode_start_forms("EXP-NBD103")
    rapid = kits.barcode_start_forms("SQK-RBK004")
    for i in range(12):
        assert native[i] == kits.reverse_complement(rapid[i])
        assert rapid[i] == kits.BARCODES[i + 1]


def test_synthetic_barcode_mode_still_available():
    synth = simulate.barcode_sequences("EXP-NBD103", synthetic=True)
    real = simulate.barcode_sequences("EXP-NBD103")
    assert synth != real
    assert synth == simulate.barcode_sequences("EXP-NBD103", synthetic=True)


def test_prep_porechop_bins(tmp_path):
    """--porechop: Porechop's -b bin directory parses into assignments and
    drives prep end-to-end (round-2 VERDICT item 6)."""
    import gzip

    from deepbinner_tpu.cli.main import main
    from deepbinner_tpu.utils import fast5 as fast5_io

    rng = np.random.default_rng(21)
    reads, moves, fastq = [], {}, []
    bins = {"BC01.fastq.gz": [], "BC02.fastq": [], "none.fastq": []}
    for barcode, bin_name in [(1, "BC01.fastq.gz"), (2, "BC02.fastq"),
                              (0, "none.fastq")]:
        read = simulate.simulate_read("EXP-NBD103", barcode, rng,
                                      genome_length=300, open_pore_length=50)
        reads.append((read.read_id, read.signal))
        moves[read.read_id] = (read.signal_start_of_bases, read.dwells)
        record = f"@{read.read_id}\n{read.sequence}\n+\n{'I' * len(read.sequence)}\n"
        fastq.append(record)
        bins[bin_name].append(record)
    f5_dir = tmp_path / "fast5s"
    f5_dir.mkdir()
    fast5_io.write_multi_read_fast5(f5_dir / "b.fast5", reads, moves)
    (tmp_path / "reads.fastq").write_text("".join(fastq))
    porechop_dir = tmp_path / "porechop"
    porechop_dir.mkdir()
    for name, records in bins.items():
        payload = "".join(records)
        if name.endswith(".gz"):
            with gzip.open(porechop_dir / name, "wt") as handle:
                handle.write(payload)
        else:
            (porechop_dir / name).write_text(payload)

    parsed = prep_mod.parse_porechop_bins(str(porechop_dir))
    assert sorted(parsed.values()) == [0, 1, 2]

    out = tmp_path / "train.tsv"
    main(["prep", str(f5_dir), "--kit", "EXP-NBD103", "--end", "start",
          "--reads", str(tmp_path / "reads.fastq"), "--out", str(out),
          "--signal_size", "512", "--margin", "64",
          "--porechop", str(porechop_dir)])
    labels = [int(line.split("\t")[0]) for line in out.read_text().splitlines()]
    assert 1 in labels and 2 in labels and 0 in labels


def test_porechop_dir_without_bins_errors(tmp_path):
    (tmp_path / "notes.txt").write_text("hello")
    with pytest.raises(SystemExit):
        prep_mod.parse_porechop_bins(str(tmp_path))


def test_known_barcode_localisation_failure_skips_read():
    """ADVICE round-2 (medium): when the external assignment says a read HAS
    a barcode but localisation fails, the read yields NO rows — its start
    region likely contains barcode signal and must not become class 0."""
    rng = np.random.default_rng(30)
    read = simulate.simulate_read("EXP-NBD103", 0, rng, genome_length=400)
    move = (read.signal_start_of_bases, read.dwells)
    samples = prep_mod.extract_training_samples(
        read.signal, read.sequence, move, "EXP-NBD103", "start",
        signal_size=512, margin=64, known_barcode=7,
    )
    assert samples == []  # no barcode-7 signal present → skip entirely
    # whereas known_barcode=0 still yields the none rows
    samples = prep_mod.extract_training_samples(
        read.signal, read.sequence, move, "EXP-NBD103", "start",
        signal_size=512, margin=64, known_barcode=0,
    )
    assert samples and all(label == 0 for label, _ in samples)


def test_balance_equalises(tmp_path):
    rows = []
    rng = np.random.default_rng(0)
    for label, count in [(1, 10), (2, 4), (3, 7), (0, 30)]:
        for _ in range(count):
            rows.append((label, rng.integers(0, 100, 64).astype(np.int16)))
    out = balance_mod.balance_samples(rows, none_fraction=0.2, seed=0)
    counts = {}
    for label, _ in out:
        counts[label] = counts.get(label, 0) + 1
    assert counts[1] == counts[2] == counts[3] == 4
    assert counts[0] == 3  # 0.2/0.8 * 12 = 3


def test_data_roundtrip(tmp_path):
    rows = [(3, np.arange(16, dtype=np.int16)), (0, np.ones(16, np.int16))]
    path = tmp_path / "train.tsv"
    data_io.write_samples(path, rows)
    signals, labels = data_io.load_training_set(str(path))
    assert signals.shape == (2, 16)
    np.testing.assert_array_equal(labels, [3, 0])


def test_inconsistent_sizes_raise(tmp_path):
    path = tmp_path / "bad.tsv"
    path.write_text("1\t1,2,3\n2\t1,2\n")
    with pytest.raises(ValueError):
        data_io.load_training_set(str(path))


@pytest.fixture(scope="module")
def tiny_training_set():
    """Small simulated training set: 12 barcodes + none, tiny windows."""
    rng = np.random.default_rng(5)
    rows = []
    for barcode in range(0, 13):
        for _ in range(16 if barcode else 32):
            read = simulate.simulate_read(
                "EXP-NBD103", barcode, rng, genome_length=200,
                open_pore_length=50,
            )
            move = (read.signal_start_of_bases, read.dwells)
            samples = prep_mod.extract_training_samples(
                read.signal, read.sequence, move, "EXP-NBD103", "start",
                signal_size=512, margin=64,
            )
            for label, signal in samples:
                if (label == 0) == (barcode == 0):
                    rows.append((label, signal))
    signals = np.stack([r[1] for r in rows]).astype(np.float32)
    labels = np.asarray([r[0] for r in rows], np.int32)
    return signals, labels


def test_train_step_learns(tiny_training_set):
    """A few epochs on the tiny net must beat chance by a wide margin."""
    signals, labels = tiny_training_set
    cfg = TrainConfig(
        network=TINY_PRESET,
        learning_rate=3e-3, batch_size=32, epochs=20,
        test_fraction=0.15, aug_factor=4, seed=0,
    )
    trainer = Trainer(cfg)
    best, _best_vars = train_loop(
        trainer, signals, labels, epochs=cfg.epochs,
        batch_size=cfg.batch_size, test_fraction=cfg.test_fraction,
        aug_factor=cfg.aug_factor, seed=cfg.seed, log_every=100,
    )
    assert best["accuracy"] > 0.4  # chance is ~1/13 ≈ 0.077


def test_checkpoint_resume(tiny_training_set, tmp_path):
    signals, labels = tiny_training_set
    cfg = TrainConfig(network=TINY_PRESET, learning_rate=1e-3,
                      batch_size=32, epochs=2, test_fraction=0.2, seed=1)
    ckpt = str(tmp_path / "ckpt")
    trainer = Trainer(cfg)
    train_loop(trainer, signals, labels, epochs=2, batch_size=32,
               test_fraction=0.2, aug_factor=1, seed=1,
               checkpoint_dir=ckpt, log_every=100)
    step_before = int(np.asarray(trainer.state.step))
    meta = json.loads((tmp_path / "ckpt" / "meta.json").read_text())
    assert meta["epoch"] == 1

    trainer2 = Trainer(cfg)
    epoch = trainer2.restore_checkpoint(ckpt)
    assert epoch == 1
    assert int(np.asarray(trainer2.state.step)) == step_before
    # resumed params identical
    p1 = np.asarray(trainer.export_variables()["params"]["classifier"]["kernel"])
    p2 = np.asarray(trainer2.export_variables()["params"]["classifier"]["kernel"])
    np.testing.assert_array_equal(p1, p2)
