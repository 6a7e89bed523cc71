"""Unit tests for fast5 reading/writing (h5py backend)."""

import numpy as np

from deepbinner_tpu.utils import fast5


def test_single_read_roundtrip(tmp_path):
    sig = np.arange(1000, dtype=np.int16)
    path = tmp_path / "read.fast5"
    fast5.write_single_read_fast5(path, "readX", sig, read_number=3)
    read_id, out = fast5.get_read_id_and_signal(path)
    assert read_id == "readX"
    np.testing.assert_array_equal(out, sig)
    assert out.dtype == np.int16


def test_multi_read_roundtrip(tmp_path):
    reads = [("r1", np.ones(10, np.int16)), ("r2", np.full(20, 7, np.int16))]
    path = tmp_path / "multi.fast5"
    fast5.write_multi_read_fast5(path, reads)
    got = dict(fast5.iterate_reads_in_fast5(path))
    assert set(got) == {"r1", "r2"}
    np.testing.assert_array_equal(got["r2"], reads[1][1])


def test_find_all_fast5s_sorted(tmp_path):
    (tmp_path / "sub").mkdir()
    for name in ["b.fast5", "a.fast5", "sub/c.fast5", "notme.txt"]:
        fast5.write_single_read_fast5(tmp_path / name, name, np.zeros(4, np.int16)) \
            if name.endswith(".fast5") else (tmp_path / name).write_text("x")
    found = fast5.find_all_fast5s(tmp_path)
    assert [f.split("/")[-1] for f in found] == ["a.fast5", "b.fast5", "c.fast5"]


def test_unreadable_file_skipped(tmp_path):
    path = tmp_path / "garbage.fast5"
    path.write_bytes(b"this is not hdf5 at all")
    read_id, signal = fast5.get_read_id_and_signal(path)
    assert read_id is None and signal is None
