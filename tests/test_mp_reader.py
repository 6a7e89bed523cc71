"""Multi-process reader: parity with in-process reading + fault tolerance."""

import numpy as np

from deepbinner_tpu.runner.executor import ExecutorStats
from deepbinner_tpu.runner.mp_reader import iter_signals_mp
from deepbinner_tpu.utils import fast5 as fast5_io
from deepbinner_tpu.utils import simulate


def test_mp_reader_reads_everything(tmp_path):
    simulate.make_dataset(tmp_path, reads_per_barcode=1, none_reads=2,
                          genome_length=300, seed=3, write_fastq=False)
    (tmp_path / "fast5s" / "zz_garbage.fast5").write_bytes(b"junk")
    files = fast5_io.find_all_fast5s(tmp_path)

    expected = {}
    for path in files:
        try:
            for read_id, signal in fast5_io.iterate_reads_in_fast5(path):
                expected[read_id] = signal
        except OSError:
            pass

    stats = ExecutorStats()
    got = dict(iter_signals_mp(files, num_workers=2, stats=stats))
    assert set(got) == set(expected)
    for read_id in got:
        np.testing.assert_array_equal(got[read_id], expected[read_id])
    assert stats.failed_files == 1


def test_mp_reader_empty_input():
    assert list(iter_signals_mp([], num_workers=2)) == []
