"""int4 wire format: σ/3.5 nibbles packed two per byte, unpacked in-graph.

A quarter of the int16 link bytes for link-starved deployments (opt-in;
int8 stays the default).  The invariance argument is the int8 wire's
(per-window z-score erases the per-read affine), with a coarser step
(0.082 σ) and a ±2 σ clip — these tests pin the pack/unpack round trip,
the batch geometry, and the same CI accuracy floor the other wires meet.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from deepbinner_tpu.ops.preprocess import PreprocessConfig, unpack_int4
from deepbinner_tpu.runner.executor import batch_spec_for, build_batch
from deepbinner_tpu.runner.hostbatch import (
    WIRE4_SCALE,
    quantise_wire,
    quantise_wire4,
)

DATA = os.path.join(os.path.dirname(__file__), "..", "deepbinner_tpu",
                    "models", "data")

PRE16 = PreprocessConfig(
    scan_size=768, window=256, stride=128, trim_scan=512,
    trim_window=64, trim_stride=16, host_trim=True,
)
PRE4 = dataclasses.replace(PRE16, wire="int4")


def test_pack_unpack_round_trip_exact(rng):
    """numpy pack (quantise_wire4) → jnp unpack_int4 recovers the exact
    quantised nibbles, including negatives, padding, and odd lengths."""
    sig = np.zeros((4, 100), np.int16)
    sig[0, :80] = (450 + 60 * rng.normal(size=80)).astype(np.int16)
    sig[1] = (450 + 60 * rng.normal(size=100)).astype(np.int16)
    sig[2, :77] = (450 + 60 * rng.normal(size=77)).astype(np.int16)  # odd len
    lens = np.asarray([80, 100, 77, 0])
    packed = quantise_wire4(sig, lens)
    assert packed.dtype == np.int8 and packed.shape == (4, 50)

    unpacked = np.asarray(unpack_int4(jnp.asarray(packed)))
    assert unpacked.shape == (4, 100)
    assert unpacked.min() >= -7 and unpacked.max() <= 7
    assert np.all(unpacked[0, 80:] == 0)
    assert np.all(unpacked[2, 77:] == 0)
    assert np.all(unpacked[3] == 0)
    # The unpacked nibbles must equal the pre-pack quantised values: redo
    # the quantisation at int8 precision and re-quantise to the int4 grid.
    from deepbinner_tpu.runner.hostbatch import _zscore_rounded

    expect, _ = _zscore_rounded(sig, lens, WIRE4_SCALE, 7.0, None)
    np.testing.assert_array_equal(unpacked, expect.astype(np.int8))


def test_quantised_range_is_healthy(rng):
    sig = (450 + 60 * rng.normal(size=(2, 768))).astype(np.int16)
    lens = np.full((2,), 768)
    packed = quantise_wire4(sig, lens)
    vals = np.asarray(unpack_int4(jnp.asarray(packed)))
    # ±2 σ range: a Gaussian read should reach the outer nibbles but not
    # saturate everywhere.
    assert np.abs(vals).max() == 7
    assert (np.abs(vals) == 7).mean() < 0.2


def test_build_batch_int4_geometry(rng):
    reads = [(f"r{i}", (450 + 60 * rng.normal(size=1500)).astype(np.int16))
             for i in range(5)]
    ids, sig, lens, end, end_len = build_batch(reads, PRE4, 8, True)
    assert sig.dtype == np.int8 and end.dtype == np.int8
    assert sig.shape == (8, PRE4.scan_size // 2)
    # lengths identical to the int16 path (trim runs before quantise)
    _, sig16, lens16, _, el16 = build_batch(reads, PRE16, 8, True)
    np.testing.assert_array_equal(lens, lens16)
    np.testing.assert_array_equal(end_len, el16)
    # and the packed buffers are exactly the int4 quantiser on the int16 ones
    np.testing.assert_array_equal(sig, quantise_wire4(sig16, lens16))


def test_wire_int4_requires_host_trim():
    with pytest.raises(ValueError):
        batch_spec_for(dataclasses.replace(PRE4, host_trim=False), 8, False)


def test_stock_model_accuracy_floor_int4():
    """The int4 wire must meet the SAME CI accuracy floor as int16/int8:
    ≥95% exact, zero wrong-barcode, on 40 fresh-seed simulated reads."""
    from deepbinner_tpu.models.checkpoint import load_model
    from deepbinner_tpu.ops.calling import CallingConfig
    from deepbinner_tpu.runner.executor import classify_stream
    from deepbinner_tpu.runner.pipeline import ClassifyConfig, ClassifyProgram
    from deepbinner_tpu.utils import simulate

    path = os.path.join(DATA, "EXP-NBD103_read_starts.dbt")
    model, variables, net_cfg, _meta = load_model(path)
    pre = PreprocessConfig(window=net_cfg.input_length,
                           stride=net_cfg.input_length // 2,
                           host_trim=True, wire="int4")
    program = ClassifyProgram(
        model, ClassifyConfig(pre, CallingConfig(), dual_model=False),
        variables)
    rng = np.random.default_rng(977)  # same seed as the int16/int8 floors
    barcodes = [b for b in range(1, 13) for _ in range(3)] + [0] * 4
    reads, truth = [], {}
    for barcode in barcodes:
        read = simulate.simulate_read(
            "EXP-NBD103", barcode, rng, genome_length=1200)
        reads.append((read.read_id, read.signal))
        truth[read.read_id] = barcode
    calls = {r.read_id: r.call
             for r in classify_stream(program, iter(reads), batch_size=8)}
    wrong = [(rid, t, calls[rid]) for rid, t in truth.items()
             if calls[rid] not in (t, 0)]
    exact = sum(1 for rid, t in truth.items() if calls[rid] == t)
    assert not wrong, f"wrong-barcode calls on int4 wire: {wrong}"
    assert exact >= 38, f"int4 wire exact {exact}/40 < 95% floor"


def test_shm_transport_int4_bit_identical(tmp_path):
    """The slot ring sizes int4 rows at half a byte per sample; batches
    crossing it must be bit-identical to the direct build."""
    from deepbinner_tpu.runner.hostbatch import BatchSpec
    from deepbinner_tpu.runner.mp_reader import ReaderPool
    from deepbinner_tpu.utils import fast5 as fast5_io
    from deepbinner_tpu.utils import simulate

    simulate.make_dataset(tmp_path, reads_per_barcode=1, none_reads=2,
                          genome_length=300, seed=33, write_fastq=False)
    files = fast5_io.find_all_fast5s(tmp_path)
    spec = BatchSpec(batch_size=4, buffer_size=256, dual=True, wire="int4")

    def collect(pool, copy):
        out = {}
        for batch in pool.iter_batches(files, copy=copy):
            ids, start, start_len, end, end_len = batch[:5]
            for i, read_id in enumerate(ids):
                out[read_id] = (start[i].copy(), int(start_len[i]),
                                end[i].copy(), int(end_len[i]))
            if len(batch) > 5:
                batch[5]()
        return out

    with ReaderPool(num_workers=2, batch_spec=spec) as pool:
        want = collect(pool, copy=True)
    with ReaderPool(num_workers=2, batch_spec=spec, shm_slots=4) as pool:
        got = collect(pool, copy=False)
    assert set(got) == set(want)
    for read_id, (row, n, erow, en) in want.items():
        grow, gn, gerow, gen = got[read_id]
        assert gn == n and gen == en
        np.testing.assert_array_equal(grow, row)
        np.testing.assert_array_equal(gerow, erow)
