"""Tests for the synthetic squiggle simulator."""

import numpy as np

from deepbinner_tpu.utils import fast5, simulate


def test_barcodes_deterministic_and_distinct():
    seqs1 = simulate.barcode_sequences("EXP-NBD103")
    seqs2 = simulate.barcode_sequences("EXP-NBD103")
    assert seqs1 == seqs2
    assert len(set(seqs1)) == 12  # all distinct
    assert all(len(s) == 24 for s in seqs1)
    assert simulate.barcode_sequences("SQK-RBK004") != seqs1


def test_squiggle_tracks_sequence():
    rng = np.random.default_rng(0)
    sig, dwells = simulate.sequence_to_squiggle("ACGTACGTACGTACGT", rng)
    assert sig.size == dwells.sum()
    # same sequence gives same levels (different noise)
    sig2, _ = simulate.sequence_to_squiggle("ACGTACGTACGTACGT", np.random.default_rng(1))
    assert abs(sig.mean() - sig2.mean()) < 30


def test_simulated_read_structure():
    rng = np.random.default_rng(3)
    read = simulate.simulate_read("EXP-NBD103", 5, rng, genome_length=500)
    assert read.signal.dtype == np.int16
    # open-pore prefix is near OPEN_PORE_LEVEL, strand signal is not
    prefix = read.signal[: read.signal_start_of_bases]
    assert abs(prefix.mean() - simulate.OPEN_PORE_LEVEL) < 20
    body = read.signal[read.signal_start_of_bases:]
    assert body.std() > prefix.std() * 2
    # NBD103 read carries barcode at both ends
    barcode = simulate.barcode_sequences("EXP-NBD103")[4]
    assert barcode in read.sequence
    assert simulate.reverse_complement(barcode) in read.sequence


def test_rapid_kit_has_no_end_barcode():
    rng = np.random.default_rng(4)
    read = simulate.simulate_read("SQK-RBK004", 2, rng, genome_length=300)
    barcode = simulate.barcode_sequences("SQK-RBK004")[1]
    assert read.sequence.count(barcode) == 1
    assert simulate.reverse_complement(barcode) not in read.sequence


def test_make_dataset(tmp_path):
    truth = simulate.make_dataset(
        tmp_path, kit="EXP-NBD103", reads_per_barcode=1, none_reads=2,
        genome_length=200, seed=1,
    )
    assert len(truth) == 14  # 12 barcodes + 2 none
    files = fast5.find_all_fast5s(tmp_path)
    assert len(files) == 14
    # signals readable and move table present
    read_id, signal = fast5.get_read_id_and_signal(files[0])
    assert read_id in truth and signal.size > 1000
    assert (tmp_path / "reads.fastq").exists()
    assert (tmp_path / "truth.tsv").exists()


def test_make_dataset_container_layouts_same_reads(tmp_path):
    """multifast5 and pod5 layouts carry byte-identical reads + truth to
    the single-read layout, and the classify CLI reads all three to the
    same calls (one program; containers only change the decode path)."""
    import numpy as np

    from deepbinner_tpu.utils import fast5 as fast5_io
    from deepbinner_tpu.utils.simulate import make_dataset

    truths, reads = {}, {}
    for container in ("fast5", "multifast5", "pod5"):
        root = tmp_path / container
        truths[container] = make_dataset(
            root, reads_per_barcode=1, none_reads=2, genome_length=300,
            seed=77, write_fastq=False, container=container,
            reads_per_container=5,
        )
        got = {}
        for path in fast5_io.find_signal_files(root):
            for read_id, signal in fast5_io.read_signal_file(path):
                got[read_id] = signal
        reads[container] = got

    assert truths["multifast5"] == truths["fast5"]
    assert truths["pod5"] == truths["fast5"]
    assert set(reads["fast5"]) == set(reads["multifast5"]) == set(reads["pod5"])
    for read_id, signal in reads["fast5"].items():
        np.testing.assert_array_equal(reads["multifast5"][read_id], signal)
        np.testing.assert_array_equal(reads["pod5"][read_id], signal)
    # multifast5 carries per-read move tables (prep needs them)
    multi = [p for p in fast5_io.find_signal_files(tmp_path / "multifast5")]
    moves = fast5_io.get_move_tables(multi[0])
    assert moves and all(len(m) == 2 for m in moves.values())
