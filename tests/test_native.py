"""Native C++ fast5 reader: parity with the h5py backend + performance sanity.

Builds the shared library on first run if the toolchain is present (skips
cleanly otherwise) — the library is a build artifact, not checked in.
"""

import subprocess
import sys
import time

import numpy as np
import pytest

from deepbinner_tpu.utils import fast5 as fast5_io
from deepbinner_tpu.utils import simulate


@pytest.fixture(scope="module")
def native():
    from deepbinner_tpu.native import fast5_reader

    if not fast5_reader.available():
        try:
            from deepbinner_tpu.native.build import build

            build(verbose=False)
        except (subprocess.CalledProcessError, FileNotFoundError) as error:
            pytest.skip(f"native toolchain unavailable: {error}")
        # reset the load-failure latch after building
        fast5_reader._load_failed = False
        fast5_reader._lib = None
    if not fast5_reader.available():
        pytest.skip("native library failed to load")
    return fast5_reader


def test_single_read_parity(native, tmp_path):
    sig = (np.arange(5000) % 700).astype(np.int16)
    path = str(tmp_path / "one.fast5")
    fast5_io.write_single_read_fast5(path, "read_abc123", sig, read_number=7)
    h5py_reads = list(fast5_io.iterate_reads_in_fast5(path))
    native_reads = native.read_file(path)
    assert len(native_reads) == len(h5py_reads) == 1
    assert native_reads[0][0] == h5py_reads[0][0] == "read_abc123"
    np.testing.assert_array_equal(native_reads[0][1], h5py_reads[0][1])
    assert native_reads[0][1].dtype == np.int16


def test_multi_read_parity(native, tmp_path):
    reads = [
        ("aaaa-bbbb", np.full(100, -5, np.int16)),
        ("cccc-dddd", np.arange(-300, 300, dtype=np.int16)),
    ]
    path = str(tmp_path / "multi.fast5")
    fast5_io.write_multi_read_fast5(path, reads)
    got = dict(native.read_file(path))
    expected = dict(fast5_io.iterate_reads_in_fast5(path))
    assert set(got) == set(expected)
    for read_id in got:
        np.testing.assert_array_equal(got[read_id], expected[read_id])


def test_garbage_file_raises(native, tmp_path):
    path = tmp_path / "bad.fast5"
    path.write_bytes(b"nope, not hdf5")
    with pytest.raises(OSError):
        native.read_file(str(path))


def test_dataset_parity_and_speed(native, tmp_path):
    """Whole simulated dataset: identical output, and not slower than h5py."""
    simulate.make_dataset(tmp_path, reads_per_barcode=2, none_reads=2,
                          genome_length=500, seed=9, write_fastq=False)
    files = fast5_io.find_all_fast5s(tmp_path)

    t0 = time.monotonic()
    h5py_all = {rid: s for f in files for rid, s in fast5_io.iterate_reads_in_fast5(f)}
    t_h5py = time.monotonic() - t0

    t0 = time.monotonic()
    native_all = {rid: s for f in files for rid, s in native.read_file(f)}
    t_native = time.monotonic() - t0

    assert set(native_all) == set(h5py_all)
    for read_id in native_all:
        np.testing.assert_array_equal(native_all[read_id], h5py_all[read_id])
    print(f"h5py {t_h5py*1e3:.1f}ms vs native {t_native*1e3:.1f}ms "
          f"for {len(files)} files", file=sys.stderr)


def test_sliced_read_parity(native, tmp_path):
    """head/tail hyperslab reads == the same slices of a full read, on both
    backends, across the threshold where slicing degenerates to full."""
    sig = (np.arange(30000) * 3 % 1900).astype(np.int16)
    path = str(tmp_path / "long.fast5")
    fast5_io.write_single_read_fast5(path, "read_long", sig, read_number=1)
    short_path = str(tmp_path / "short.fast5")
    fast5_io.write_single_read_fast5(short_path, "read_short",
                                     sig[:3000], read_number=2)

    def expect(full: np.ndarray, head: int, tail: int) -> np.ndarray:
        if head + tail >= full.size:
            return full  # shorter than the slices → full signal, untouched
        if tail == 0:
            return full[:head]
        return np.concatenate([full[:head], full[-tail:]])

    for head, tail in [(8192, 0), (8192, 8192), (100, 50)]:
        for backend in (native.read_file, fast5_io.read_signal_file):
            [(rid, got)] = backend(path, head, tail)
            assert rid == "read_long"
            np.testing.assert_array_equal(got, expect(sig, head, tail),
                                          err_msg=str(backend))
            [(rid, got)] = backend(short_path, head, tail)
            np.testing.assert_array_equal(got, expect(sig[:3000], head, tail),
                                          err_msg=str(backend))


def test_sliced_batches_bit_identical(native, tmp_path):
    """Batches assembled from slice-read signals == batches from full reads
    (the worker decode bound must be invisible downstream)."""
    from deepbinner_tpu.runner.executor import batch_spec_for
    from deepbinner_tpu.runner.hostbatch import build_batch_arrays
    from deepbinner_tpu.ops.preprocess import PreprocessConfig

    rng = np.random.default_rng(3)
    paths = []
    for i in range(4):
        sig = rng.integers(200, 800, 25000 + 1000 * i).astype(np.int16)
        path = str(tmp_path / f"r{i}.fast5")
        fast5_io.write_single_read_fast5(path, f"read_{i}", sig, read_number=i)
        paths.append(path)

    pre = PreprocessConfig(host_trim=True)
    for dual in (False, True):
        spec = batch_spec_for(pre, 4, dual)
        head = spec.trim.raw_size
        tail = head if dual else 0
        full, sliced = [], []
        for path in paths:
            full.extend(native.read_file(path))
            sliced.extend(native.read_file(path, head, tail))
        b_full = build_batch_arrays(full, spec)
        b_slice = build_batch_arrays(sliced, spec)
        assert b_full[0] == b_slice[0]
        for a, b in zip(b_full[1:], b_slice[1:]):
            if a is None:
                assert b is None
                continue
            np.testing.assert_array_equal(a, b, err_msg=f"dual={dual}")


def test_native_vbz_unpack_parity(native):
    """The fused C svb16+zigzag+prefix-sum pass is bit-identical to the
    numpy oracle across value ranges, sizes, and the narrow-final-byte
    tail case (the branchless main loop hands the last elements to a
    bounds-checked tail)."""
    import zstandard

    from deepbinner_tpu.native import vbz as native_vbz
    from deepbinner_tpu.utils import pod5

    if not native_vbz.available():
        native_vbz._load_failed = False
        native_vbz._lib = None
    if not native_vbz.available():
        pytest.skip("native vbz library not built")

    rng = np.random.default_rng(12)
    cases = [
        np.zeros(0, np.int16),
        np.asarray([5], np.int16),
        np.asarray([-1, 1, -32768, 32767, 0], np.int16),  # wrap + wide mix
        rng.integers(300, 700, 4097).astype(np.int16),     # mostly narrow
        rng.integers(-32768, 32767, 2048).astype(np.int16),  # mostly wide
    ]
    for sig in cases:
        comp = pod5.vbz_compress(sig)
        n = sig.size
        raw = zstandard.ZstdDecompressor().decompress(
            comp, max_output_size=max((n + 7) // 8 + 2 * n, 1))
        ref = np.cumsum(
            pod5._zigzag_decode(pod5.svb16_decode(raw, n)).astype(np.int64)
        ).astype(np.int16)
        got = native_vbz.unpack(raw, n)
        np.testing.assert_array_equal(got, ref)
        np.testing.assert_array_equal(got, sig)  # full round trip
    # Truncated stream must raise, not over-read.
    sig = rng.integers(-32768, 32767, 512).astype(np.int16)
    raw = zstandard.ZstdDecompressor().decompress(
        pod5.vbz_compress(sig), max_output_size=(512 + 7) // 8 + 1024)
    with pytest.raises(ValueError):
        native_vbz.unpack(raw[:-3], 512)
