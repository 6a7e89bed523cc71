"""Host-side batch assembly — numpy-only, importable by reader workers.

Reference parity: the per-batch ``np.stack`` feeding ``model.predict`` in
``deepbinner/classify.py :: classify_fast5_files`` (SURVEY.md §3.1).  Kept
free of any JAX import so multiprocessing reader workers (which must never
initialise the TPU client) can build device-ready batches themselves —
the consumer process then only forwards fixed-shape buffers to the device,
which is what lets end-to-end throughput track the device bound on a
2-CPU host.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class ExecutorStats:
    reads: int = 0
    batches: int = 0
    failed_files: int = 0
    # Which files failed and why: a transient I/O failure must be
    # re-attemptable (shard resume) and a 100%-unreadable input set must
    # fail loudly instead of emitting an empty table (round-2 ADVICE 2+4).
    failed_paths: List[str] = dataclasses.field(default_factory=list)
    failed_errors: List[str] = dataclasses.field(default_factory=list)

    def record_failure(self, path: str, error: str = "") -> None:
        self.failed_files += 1
        self.failed_paths.append(path)
        self.failed_errors.append(error)


@dataclasses.dataclass(frozen=True)
class TrimSpec:
    """Open-pore trim geometry for HOST-side pre-trimming.

    Numpy mirror of ops.preprocess.find_signal_start (reference parity:
    ``deepbinner/trim_signal.py`` — SURVEY.md §2 item 9).  When a BatchSpec
    carries one, reader workers locate the signal start themselves and ship
    only the ``scan_size`` samples the CNN consumes — cutting the
    host→device payload from (trim_scan + scan_size) to scan_size per read
    end (25% fewer bytes at the default 2048+6144 geometry; the axon tunnel
    is the throughput wall, see docs/performance.md).
    """

    trim_scan: int
    trim_window: int
    trim_stride: int
    trim_threshold: float
    window: int        # never trim past (read_len - window)
    scan_size: int

    @property
    def raw_size(self) -> int:
        """Samples of raw signal the trim search + scan region need."""
        return self.trim_scan + self.scan_size


def trim_starts_batch(
    raw: np.ndarray, lengths: np.ndarray, trim: TrimSpec
) -> np.ndarray:
    """Vectorised trim indices for a zero-padded ``(n, raw_size)`` batch.

    The device trim's exact math (ops.preprocess.find_signal_start:
    masked f32 global std + cumsum rolling variance at static stride),
    computed for every row at once — one numpy pass per batch instead of
    ~512 small per-read calls, which matters on the 2-vCPU bench host
    where worker CPU is the throughput wall once the tunnel stops being
    one.  Returns ``(n,)`` int64 trim offsets.
    """
    t = min(trim.trim_scan, raw.shape[1])
    region = raw[:, :t].astype(np.float32)
    valid_i = np.clip(lengths, 0, t).astype(np.int64)
    valid = valid_i.astype(np.float32)[:, None]
    denom = np.maximum(valid, 1.0)

    window, stride = trim.trim_window, trim.trim_stride
    n_out = (t - window) // stride + 1
    if n_out <= 0:
        return np.zeros(raw.shape[0], np.int64)
    zeros = np.zeros((raw.shape[0], 1), np.float32)
    sq = region * region
    c1 = np.concatenate([zeros, np.cumsum(region, axis=1)], axis=1)
    c2 = np.concatenate([zeros, np.cumsum(sq, axis=1)], axis=1)

    # Global stats over the valid samples, read straight off the cumsums
    # (padding past `valid` is zero, so c1[row, valid] == sum of the row).
    rows = np.arange(raw.shape[0])
    g1 = c1[rows, valid_i][:, None]
    g2 = c2[rows, valid_i][:, None]
    mean = g1 / denom
    var = g2 / denom - mean * mean
    global_std = np.sqrt(np.maximum(var, 0.0))
    starts = np.arange(n_out) * stride
    s1 = c1[:, starts + window] - c1[:, starts]
    s2 = c2[:, starts + window] - c2[:, starts]
    win_mean = s1 / window
    win_std = np.sqrt(np.maximum(s2 / window - win_mean * win_mean, 0.0))

    win_end = (starts + window)[None, :]
    in_valid = win_end <= valid  # windows straddling the pad boundary excluded
    good = (win_std >= trim.trim_threshold * global_std) & in_valid
    any_good = good.any(axis=1)
    first = good.argmax(axis=1)
    start = np.where(any_good, first * stride, 0)
    # Never trim so far that fewer than `window` samples remain.
    return np.minimum(start, np.maximum(lengths - trim.window, 0))


def pretrim_read(signal: np.ndarray, trim: TrimSpec) -> np.ndarray:
    """Trim open-pore signal from one read end; returns ≤ scan_size samples.

    Single-read wrapper over :func:`trim_starts_batch` so the per-read and
    batched paths are ONE implementation (parity vs the in-graph trim is
    pinned in tests/test_host_trim.py).  The returned array is a slice of
    the raw int16 signal — the trim index is computed in float32 but no
    sample values change.
    """
    sig = signal[: trim.raw_size]
    padded = np.zeros((1, trim.raw_size), np.float32)
    padded[0, : sig.size] = sig
    start = int(trim_starts_batch(
        padded, np.asarray([sig.size]), trim
    )[0])
    return sig[start : start + trim.scan_size]


@dataclasses.dataclass(frozen=True)
class BatchSpec:
    """Fixed batch geometry (must match the compiled classify program)."""

    batch_size: int
    buffer_size: int   # PreprocessConfig.buffer_size (trim headroom + scan)
    dual: bool         # also build the reversed end-of-read buffer
    # Host-side pre-trim: workers trim open-pore signal and ship only the
    # scan region (buffer_size == scan_size); the device skips its in-graph
    # trim (PreprocessConfig.host_trim=True builds the matching program).
    trim: Optional[TrimSpec] = None
    # Signal wire format: 'int16' raw DAC; 'int8' host-side z-score +
    # 1/16 σ quantisation (see ops.preprocess.PreprocessConfig.wire — the
    # in-graph per-window z-score erases the affine scale, so only ±1/32 σ
    # rounding noise crosses into the CNN), halving link bytes; 'int4'
    # z-score + 2/7 σ quantisation packed two samples per byte, a quarter
    # of the int16 bytes (the device unpacks in-graph —
    # ops.preprocess.unpack_int4).
    wire: str = "int16"

    @property
    def wire_np(self):
        return np.int8 if self.wire in ("int8", "int4") else np.int16

    @property
    def wire_itemsize(self) -> int:
        return 1 if self.wire in ("int8", "int4") else 2

    @property
    def wire_cols(self) -> int:
        """Columns of the on-wire signal array (int4 packs 2 per byte)."""
        if self.wire == "int4":
            if self.buffer_size % 2:
                raise ValueError("int4 wire needs an even buffer_size")
            return self.buffer_size // 2
        return self.buffer_size

    @property
    def wire_row_bytes(self) -> int:
        """Bytes of one read end's signal on the wire."""
        return self.wire_cols * self.wire_itemsize


# int8 wire: quantisation step is 1/WIRE_SCALE of the read-end's std —
# range ±127/16 ≈ ±7.9 σ, step noise std (1/16)/√12 ≈ 0.018 σ.
WIRE_SCALE = 16.0
# int4 wire: step 1/WIRE4_SCALE σ, range ±7/3.5 = ±2.0 σ, step noise std
# (1/3.5)/√12 ≈ 0.082 σ — still below the squiggle's own ~0.3 σ noise
# floor; accuracy across the eval-noise grid is pinned in
# EVAL_ROBUSTNESS artifacts and tests/test_wire_int4.py.
WIRE4_SCALE = 3.5


def _zscore_rounded(
    signal: np.ndarray,
    lengths: np.ndarray,
    scale: float,
    clip: float,
    f32: Optional[np.ndarray],
):
    """Shared quantiser core: per-row z-score × scale, rounded + clipped.

    Returns (x, lens): x is float32 holding exact small integers in
    [-clip, clip] with padding re-zeroed; lens the clipped valid counts.
    """
    n_rows, t = signal.shape
    lens = np.clip(lengths[:n_rows], 0, t).astype(np.int64)
    n = np.maximum(lens, 1).astype(np.float64)
    if f32 is None:
        x = signal.astype(np.float32)
    else:
        x = f32[:n_rows, :t]
        np.copyto(x, signal, casting="unsafe")
    # Row stats accumulate in float64: s2/n - mean² cancels catastrophically
    # in f32 when the DC offset dwarfs σ (mean²/var ~1e6 eats all 24
    # mantissa bits over a 6144-sample sum), which would blow `scale` up
    # and clip the whole read.  f64 einsum is ~1 ms at this size.
    s1 = np.einsum("ij->i", x, dtype=np.float64)
    s2 = np.einsum("ij,ij->i", x, x, dtype=np.float64)
    mean = s1 / n
    var = np.maximum(s2 / n - mean * mean, 0.0)
    row_scale = (scale / (np.sqrt(var) + 1e-8)).astype(np.float32)
    x -= mean.astype(np.float32)[:, None]
    x *= row_scale[:, None]
    np.rint(x, out=x)
    np.clip(x, -clip, clip, out=x)
    # Re-zero the padding the affine shifted (short rows only).
    for i in np.nonzero(lens < t)[0]:
        x[i, lens[i]:] = 0.0
    return x, lens


def quantise_wire(
    signal: np.ndarray,
    lengths: np.ndarray,
    out: Optional[np.ndarray] = None,
    f32: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Z-score each row over its valid samples and quantise to int8.

    ``signal``: (n, T) int16, **zero-padded past** ``lengths`` (that
    guarantee is load-bearing: row sums over the full width equal sums
    over the valid samples, so no mask matrix is ever built).  Padding
    stays exactly 0 on the wire (device masks it anyway; keeps batches
    bit-reproducible).  Pure numpy, one f32 temporary, in-place affine —
    this runs per batch in the reader workers on small hosts, so constant
    factors are throughput (measured 3.6× over the masked formulation).

    ``out``: optional (≥n, T) int8 destination written IN PLACE — pass a
    shared-memory slot view to put the quantised batch directly on the
    transport with zero further copies.  ``f32``: optional persistent
    (≥n, T) float32 scratch, so the per-batch temporary stops churning
    the allocator on hosts where worker CPU is the throughput wall.
    Returns the (n, T) result (== ``out[:n]`` when ``out`` is given).
    """
    n_rows = signal.shape[0]
    x, _lens = _zscore_rounded(signal, lengths, WIRE_SCALE, 127.0, f32)
    if out is None:
        return x.astype(np.int8)
    result = out[:n_rows]
    np.copyto(result, x, casting="unsafe")
    return result


def quantise_wire4(
    signal: np.ndarray,
    lengths: np.ndarray,
    out: Optional[np.ndarray] = None,
    f32: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Z-score, quantise at σ/WIRE4_SCALE into [-7, 7], pack 2 per byte.

    Sample ``2i`` lives in the LOW nibble of byte ``i``, sample ``2i+1``
    in the HIGH nibble (two's-complement nibbles; the device inverse is
    ops.preprocess.unpack_int4).  ``signal`` must have an even width;
    padding bytes stay exactly 0.  Returns the (n, T//2) int8 packed
    array (== ``out[:n]`` when given).
    """
    n_rows, t = signal.shape
    if t % 2:
        raise ValueError("int4 wire needs an even signal width")
    x, _lens = _zscore_rounded(signal, lengths, WIRE4_SCALE, 7.0, f32)
    q = x.astype(np.int8)
    low = q[:, 0::2]
    high = q[:, 1::2]
    packed = out[:n_rows] if out is not None else np.empty((n_rows, t // 2),
                                                           np.int8)
    # (low & 0xF) keeps the two's-complement nibble; high<<4 stays in
    # int8 range for values in [-8, 7].
    np.bitwise_or(low & 0xF, high << 4, out=packed)
    return packed


# A built batch: (read_ids, start, start_len, end, end_len).  Rows beyond
# len(read_ids) are zero padding → "none" on device, dropped by the caller.
BuiltBatch = Tuple[List[str], np.ndarray, np.ndarray,
                   Optional[np.ndarray], Optional[np.ndarray]]


class BatchScratch:
    """Persistent per-caller temporaries for batch assembly.

    A reader worker builds thousands of batches over its lifetime; with a
    scratch object the per-batch intermediates (raw trim matrix, int16
    build target for the int8 wire, f32 quantise temporary) are allocated
    ONCE instead of churning ~20 MB of allocations per batch — on the
    2-vCPU bench host, where worker CPU is the throughput wall
    (BENCH_STREAM_INT8_r04.jsonl), allocator traffic is throughput.
    Buffers are np.empty; :func:`build_batch_arrays` zeroes exactly the
    padding it needs, so reuse across batches is safe by construction.
    """

    def __init__(self, spec: BatchSpec) -> None:
        b, buf = spec.batch_size, spec.buffer_size
        self.spec = spec
        lossy = spec.wire in ("int8", "int4")
        # Lossy wires build raw int16 first, quantise into the final buffer.
        self.start16 = np.empty((b, buf), np.int16) if lossy else None
        self.end16 = np.empty((b, buf), np.int16) if lossy and spec.dual else None
        self.f32 = np.empty((b, buf), np.float32) if lossy else None
        if spec.trim is not None:
            self.raw = np.empty((b, spec.trim.raw_size), np.int16)
            self.raw_len = np.empty((b,), np.int64)
            self.tails = np.empty_like(self.raw) if spec.dual else None
        else:
            self.raw = self.raw_len = self.tails = None


def build_batch_arrays(
    reads: Sequence[Tuple[str, np.ndarray]],
    spec: BatchSpec,
    out: Optional[tuple] = None,
    scratch: Optional[BatchScratch] = None,
) -> BuiltBatch:
    """Pad reads into fixed-shape buffers.

    start buffer: first ``buffer_size`` samples of each read.
    end buffer:   last ``buffer_size`` samples **reversed**, so open-pore
    trimming runs identically for both ends (see
    ops.preprocess.extract_scan_region).

    ``out``: optional (start, start_len, end, end_len) destination buffers
    in the spec's WIRE dtype — e.g. the shared-memory slot views from
    mp_reader._slot_views — written in place, so a worker assembles (and,
    int8, quantises) the batch directly onto the transport with zero
    copy-out.  Destination buffers may hold stale bytes from a recycled
    slot; every padding byte is explicitly re-zeroed here.
    ``scratch``: persistent intermediates (see :class:`BatchScratch`);
    one is created per call when omitted.  Without ``out`` the returned
    arrays are freshly allocated (never aliases of ``scratch``).
    """
    buffer = spec.buffer_size
    trim = spec.trim
    if trim is not None and trim.scan_size != buffer:
        raise ValueError(
            f"pre-trimmed buffers must be scan_size ({trim.scan_size}), "
            f"spec has buffer_size {buffer}"
        )
    lossy = spec.wire in ("int8", "int4")
    n_reads = len(reads)
    if scratch is None:
        scratch = BatchScratch(spec)

    # The int16 build target: the final buffer itself for the int16 wire,
    # or scratch for the lossy wires (quantisation writes the final bytes).
    if out is not None:
        _o_start, start_len, _o_end, end_len = out
        start = scratch.start16 if lossy else out[0]
        end = (scratch.end16 if lossy else out[2]) if spec.dual else None
    else:
        # int16 end-to-end on the host: raw DAC values are int16 natively;
        # the device casts to f32 in-graph — half the transfer bytes.
        start = (scratch.start16 if lossy
                 else np.empty((spec.batch_size, buffer), np.int16))
        start_len = np.empty((spec.batch_size,), np.int32)
        end = None
        end_len = None
        if spec.dual:
            end = (scratch.end16 if lossy
                   else np.empty((spec.batch_size, buffer), np.int16))
            end_len = np.empty((spec.batch_size,), np.int32)

    ids: List[str] = [read_id for read_id, _signal in reads]

    if trim is not None:
        # Vectorised path: pad raw heads (and reversed tails) into one
        # matrix, trim every row in one numpy pass, gather the scan
        # regions row-wise.  Equivalent to per-read pretrim_read (same
        # trim_starts_batch math; pinned by tests/test_host_trim.py) but
        # ~an order of magnitude less Python per batch — worker CPU is
        # the wall on small hosts.
        raw = scratch.raw[:n_reads]
        raw_len = scratch.raw_len[:n_reads]
        tails = scratch.tails[:n_reads] if spec.dual else None
        for i, (_read_id, signal) in enumerate(reads):
            k = min(signal.size, trim.raw_size)
            raw[i, :k] = signal[:k]
            raw[i, k:] = 0
            raw_len[i] = k
            if spec.dual:
                tails[i, :k] = signal[signal.size - k :][::-1]
                tails[i, k:] = 0

        def gather(mat: np.ndarray, dst: np.ndarray, dst_len: np.ndarray) -> None:
            offs = trim_starts_batch(mat, raw_len, trim)
            # offs ≤ trim_scan by construction (the variance search never
            # sees past the trim region), so offs+scan_size ≤ raw_size and
            # each row slice below is in bounds.  A per-row slice copy
            # beats take_along_axis ~10× here: the (n, scan_size) index
            # matrix alone costs more to build than 512 memcpys.
            scan = trim.scan_size
            for i in range(n_reads):
                o = offs[i]
                dst[i] = mat[i, o : o + scan]
            dst[n_reads:] = 0
            dst_len[:n_reads] = np.clip(raw_len - offs, 0, scan)
            dst_len[n_reads:] = 0

        gather(raw, start, start_len)
        if spec.dual:
            gather(tails, end, end_len)
        return _finish_wire(spec, ids, start, start_len, end, end_len,
                            out, scratch)

    for i, (_read_id, signal) in enumerate(reads):
        n = min(signal.size, buffer)
        start[i, :n] = signal[:n]
        start[i, n:] = 0
        start_len[i] = n
        if spec.dual:
            tail = signal[-n:] if signal.size else signal
            end[i, :n] = tail[::-1]
            end[i, n:] = 0
            end_len[i] = n
    start[n_reads:] = 0
    start_len[n_reads:] = 0
    if spec.dual:
        end[n_reads:] = 0
        end_len[n_reads:] = 0
    return _finish_wire(spec, ids, start, start_len, end, end_len,
                        out, scratch)


def _finish_wire(spec, ids, start, start_len, end, end_len,
                 out, scratch) -> BuiltBatch:
    """Apply the spec's wire format; route the result into ``out``."""
    if spec.wire == "int16":
        # start/end ARE the destination buffers already (out or fresh).
        return ids, start, start_len, end, end_len
    quantise = quantise_wire4 if spec.wire == "int4" else quantise_wire
    dst_start = out[0] if out is not None else None
    dst_end = out[2] if out is not None and spec.dual else None
    q_start = quantise(start, start_len, out=dst_start, f32=scratch.f32)
    q_end = (quantise(end, end_len, out=dst_end, f32=scratch.f32)
             if spec.dual else None)
    return ids, q_start, start_len, q_end, end_len
