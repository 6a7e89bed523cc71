"""Multi-process reader: parity with in-process reading + fault tolerance."""

import numpy as np
import pytest

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


def test_reader_pool_multi_pass_and_abandon(tmp_path):
    """One pool serves several passes; an abandoned pass leaks nothing."""
    from deepbinner_tpu.runner.mp_reader import ReaderPool

    simulate.make_dataset(tmp_path, reads_per_barcode=1, none_reads=2,
                          genome_length=300, seed=4, write_fastq=False)
    files = fast5_io.find_all_fast5s(tmp_path)
    expected = {}
    for path in files:
        for read_id, signal in fast5_io.iterate_reads_in_fast5(path):
            expected[read_id] = signal

    with ReaderPool(num_workers=2) as pool:
        first = dict(pool.iter_reads(files))
        assert set(first) == set(expected)
        # Abandon a pass mid-drain...
        gen = pool.iter_reads(files)
        next(gen)
        gen.close()
        # ...and the next full pass still returns exactly the dataset.
        again = dict(pool.iter_reads(files))
        assert set(again) == set(expected)
        for read_id in again:
            np.testing.assert_array_equal(again[read_id], expected[read_id])


def test_reader_pool_worker_built_batches(tmp_path):
    """Batch mode: worker-built batches carry exactly the dataset's reads."""
    from deepbinner_tpu.runner.hostbatch import BatchSpec
    from deepbinner_tpu.runner.mp_reader import ReaderPool

    simulate.make_dataset(tmp_path, reads_per_barcode=1, none_reads=2,
                          genome_length=300, seed=6, write_fastq=False)
    files = fast5_io.find_all_fast5s(tmp_path)
    full = {}
    for path in files:
        for read_id, signal in fast5_io.iterate_reads_in_fast5(path):
            full[read_id] = signal

    spec = BatchSpec(batch_size=4, buffer_size=256, dual=True)
    with ReaderPool(num_workers=2, batch_spec=spec) as pool:
        seen = {}
        for ids, start, start_len, end, end_len in pool.iter_batches(files):
            assert start.shape == (4, 256) and end.shape == (4, 256)
            assert 0 < len(ids) <= 4
            for i, read_id in enumerate(ids):
                seen[read_id] = (start[i].copy(), int(start_len[i]),
                                 end[i].copy(), int(end_len[i]))
            # Rows beyond len(ids) are zero padding.
            assert not start[len(ids):].any()
        # Second pass works too (persistent pool).
        n2 = sum(len(b[0]) for b in pool.iter_batches(files))
    assert set(seen) == set(full) and n2 == len(full)
    for read_id, signal in full.items():
        row, n, erow, en = seen[read_id]
        expect = min(signal.size, 256)
        assert n == expect and en == expect
        np.testing.assert_array_equal(row[:n], signal[:n])
        np.testing.assert_array_equal(erow[:n], signal[-n:][::-1])


@pytest.mark.parametrize("wire", ["int16", "int8"])
def test_reader_pool_shm_transport_bit_identical(tmp_path, wire):
    """Shared-memory batch transport == pickled-queue transport, bit for bit,
    across two passes (slot recycling), dual-end buffers included — at both
    wire formats (int8 slots are half-size; sizing must match)."""
    from deepbinner_tpu.runner.hostbatch import BatchSpec
    from deepbinner_tpu.runner.mp_reader import ReaderPool

    simulate.make_dataset(tmp_path, reads_per_barcode=1, none_reads=3,
                          genome_length=300, seed=16, write_fastq=False)
    files = fast5_io.find_all_fast5s(tmp_path)
    spec = BatchSpec(batch_size=4, buffer_size=256, dual=True, wire=wire)

    def collect(pool):
        out = {}
        for ids, start, start_len, end, end_len in pool.iter_batches(files):
            for i, read_id in enumerate(ids):
                out[read_id] = (start[i].copy(), int(start_len[i]),
                                end[i].copy(), int(end_len[i]))
        return out

    with ReaderPool(num_workers=2, batch_spec=spec) as pool:
        want = collect(pool)
    # 3 slots < number of batches in flight → slots really recycle.
    with ReaderPool(num_workers=2, batch_spec=spec, shm_slots=3) as pool:
        got = collect(pool)
        got2 = collect(pool)  # second pass reuses the ring
    assert set(got) == set(want) and set(got2) == set(want)
    for read_id, (row, n, erow, en) in want.items():
        for result in (got, got2):
            grow, gn, gerow, gen = result[read_id]
            assert gn == n and gen == en
            np.testing.assert_array_equal(grow, row)
            np.testing.assert_array_equal(gerow, erow)


@pytest.mark.parametrize("wire", ["int16", "int8"])
@pytest.mark.parametrize("trimmed", [False, True])
def test_build_batch_into_dirty_slot_views_bit_identical(wire, trimmed):
    """In-place assembly into recycled (dirty) slot buffers == the
    allocating path, bit for bit — every padding byte must be re-zeroed
    explicitly since slot views carry the previous batch's bytes."""
    from deepbinner_tpu.runner.hostbatch import (
        BatchScratch,
        BatchSpec,
        TrimSpec,
        build_batch_arrays,
    )

    trim = TrimSpec(trim_scan=64, trim_window=16, trim_stride=8,
                    trim_threshold=0.8, window=64,
                    scan_size=192) if trimmed else None
    spec = BatchSpec(batch_size=4, buffer_size=192, dual=True, trim=trim,
                     wire=wire)
    rng = np.random.default_rng(11)
    # 3 reads (partial batch → a pad row), one shorter than the buffer.
    reads = [
        ("a", rng.integers(300, 700, 1000).astype(np.int16)),
        ("b", rng.integers(300, 700, 120).astype(np.int16)),
        ("c", rng.integers(300, 700, 5000).astype(np.int16)),
    ]
    want = build_batch_arrays(reads, spec)

    dt = np.int8 if wire == "int8" else np.int16
    out = (np.full((4, 192), 0x55, dt), np.full((4,), 12345, np.int32),
           np.full((4, 192), 0x55, dt), np.full((4,), 12345, np.int32))
    scratch = BatchScratch(spec)
    # Two rounds through the same scratch + out buffers: reuse must not
    # leak bytes between batches.
    for _ in range(2):
        got = build_batch_arrays(reads, spec, out=out, scratch=scratch)
        assert got[0] == want[0]
        for g, w in zip(got[1:], want[1:]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        assert np.shares_memory(np.asarray(got[1]), out[0])  # wrote in place


def test_quantise_wire_out_and_scratch_bit_identical():
    from deepbinner_tpu.runner.hostbatch import quantise_wire

    rng = np.random.default_rng(7)
    sig = rng.integers(-500, 500, (5, 96)).astype(np.int16)
    lens = np.asarray([96, 40, 0, 96, 7], np.int32)
    for i, n in enumerate(lens):
        sig[i, n:] = 0  # the documented zero-padding contract
    want = quantise_wire(sig, lens)
    out = np.full((8, 96), 0x55, np.int8)  # oversized + dirty
    f32 = np.full((8, 96), np.nan, np.float32)
    got = quantise_wire(sig, lens, out=out, f32=f32)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(out[:5], want)


def test_reader_pool_zero_copy_release_cycle(tmp_path):
    """copy=False yields slot VIEWS + release; with fewer slots than
    batches the pass only progresses because releases recycle slots, and
    an abandoned (never-released) pass is reclaimed at the next pass."""
    from deepbinner_tpu.runner.hostbatch import BatchSpec
    from deepbinner_tpu.runner.mp_reader import ReaderPool

    simulate.make_dataset(tmp_path, reads_per_barcode=1, none_reads=3,
                          genome_length=300, seed=21, write_fastq=False)
    files = fast5_io.find_all_fast5s(tmp_path)
    spec = BatchSpec(batch_size=2, buffer_size=256, dual=False, wire="int16")

    def collect_copy(pool):
        out = {}
        for ids, start, start_len, _e, _el in pool.iter_batches(files):
            for i, read_id in enumerate(ids):
                out[read_id] = (start[i].copy(), int(start_len[i]))
        return out

    with ReaderPool(num_workers=2, batch_spec=spec, shm_slots=8) as pool:
        want = collect_copy(pool)

    # 2 slots, ~8 batches: progress requires the release cycle to work.
    with ReaderPool(num_workers=2, batch_spec=spec, shm_slots=2,
                    stall_timeout=30.0) as pool:
        got = {}
        for batch in pool.iter_batches(files, copy=False):
            assert len(batch) == 6
            ids, start, start_len, _e, _el, release = batch
            for i, read_id in enumerate(ids):
                got[read_id] = (start[i].copy(), int(start_len[i]))
            release()
            release()  # idempotent: a double release must not double-free
        assert set(got) == set(want)
        for read_id, (row, n) in want.items():
            np.testing.assert_array_equal(got[read_id][0], row)
            assert got[read_id][1] == n

        # Abandon a pass holding both slots un-released...
        gen = pool.iter_batches(files, copy=False)
        next(gen)
        next(gen)
        gen.close()
        # ...the next pass reclaims them and completes.
        n3 = 0
        for batch in pool.iter_batches(files, copy=False):
            n3 += len(batch[0])
            batch[5]()
        assert n3 == len(want)


def test_mp_reader_decodes_pod5(tmp_path):
    """Worker processes route .pod5 through the pure-Python parser even when
    the native (libhdf5-only) reader is enabled."""
    from deepbinner_tpu.utils import pod5

    rng = np.random.default_rng(8)
    reads = [(f"read_{i:04x}", rng.integers(200, 800, 3000).astype(np.int16))
             for i in range(3)]
    pod5.write_pod5(tmp_path / "batch.pod5", reads)
    simulate.make_dataset(tmp_path, reads_per_barcode=1, none_reads=0,
                          genome_length=300, seed=9, write_fastq=False)
    files = fast5_io.find_signal_files(tmp_path)
    assert any(f.endswith(".pod5") for f in files)

    got = dict(iter_signals_mp(files, num_workers=2, use_native=True))
    for read_id, signal in reads:
        np.testing.assert_array_equal(got[read_id], signal)
    assert len(got) > len(reads)  # the fast5s came through too


def test_reader_pool_trim_preserves_batches(tmp_path):
    """Worker-side head/tail trimming leaves built batches bit-identical."""
    from deepbinner_tpu.ops.preprocess import PreprocessConfig
    from deepbinner_tpu.runner.executor import build_batch
    from deepbinner_tpu.runner.mp_reader import ReaderPool

    simulate.make_dataset(tmp_path, reads_per_barcode=1, none_reads=2,
                          genome_length=300, seed=5, write_fastq=False)
    files = fast5_io.find_all_fast5s(tmp_path)
    full = {}
    for path in files:
        for read_id, signal in fast5_io.iterate_reads_in_fast5(path):
            full[read_id] = signal

    cfg = PreprocessConfig(scan_size=192, window=64, stride=64, trim_scan=64)
    buffer = cfg.buffer_size
    assert any(sig.size > 2 * buffer for sig in full.values())  # trim is real
    with ReaderPool(num_workers=2, trim_head=buffer, trim_tail=buffer) as pool:
        trimmed = dict(pool.iter_reads(files))

    order = sorted(full)
    ref = build_batch([(r, full[r]) for r in order], cfg, len(order), True)
    got = build_batch([(r, trimmed[r]) for r in order], cfg, len(order), True)
    assert ref[0] == got[0]
    for a, b in zip(ref[1:], got[1:]):
        np.testing.assert_array_equal(a, b)
