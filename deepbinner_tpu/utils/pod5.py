"""pod5 raw-signal container: pure-Python reader/writer.

The reference predates pod5 and reads only fast5 (deepbinner/load_fast5s.py
:: get_read_id_and_signal — SURVEY.md §2 item 10); modern MinKNOW emits
pod5, so the rebuild ingests it behind the same ReadFn contract the fast5
readers use (north star: "ingests raw fast5/pod5 current traces").

No pod5 library exists in this image, so this module implements the
container format directly (pyarrow + flatbuffers + zstandard are available):

- **Container** (per nanoporetech/pod5-file-format docs): an 8-byte
  signature, a 16-byte section marker, then embedded Apache-Arrow
  (FeatherV2 = Arrow IPC file) tables each followed by padding + the
  section marker, and at the tail a FlatBuffers footer describing the
  embedded tables, its int64 length, the section marker, and the signature
  again.
- **Tables**: a Signal table (``read_id`` fixed(16), ``signal``
  large_binary, ``samples`` uint32) holding vbz-compressed signal chunks,
  and a Reads table (``read_id`` fixed(16), ``signal`` list<uint64> of
  Signal-table row indices, ``read_number`` uint32).
- **vbz codec** (nanoporetech/vbz_compression): per-sample int16 delta →
  zig-zag → StreamVByte svb16 (1 control bit per value: 1 or 2 data bytes)
  → zstd.  Implemented vectorised in numpy; round-trip pinned by tests.

PARITY-REVERIFY: written against the public spec from memory in a
zero-egress environment — byte-level compatibility with files produced by
the official library is untested (no real pod5 exists here).  Field order
of the footer flatbuffer and the enum values below are the items to
re-check first against nanoporetech/pod5-file-format's footer.fbs.

Non-UUID read ids (pod5 proper allows only UUIDs) are preserved through a
``read_id_string`` extension column on the Reads table; files without it
(i.e. real pod5) present the canonical UUID string as the read id.
"""

from __future__ import annotations

import os
import struct
import uuid
from typing import List, Optional, Tuple

import numpy as np

SIGNATURE = b"\x8bPOD\r\n\x1a\n"
FORMAT_FEATHER_V2 = 0
CONTENT_READS_TABLE = 0
CONTENT_SIGNAL_TABLE = 1
CONTENT_RUN_INFO_TABLE = 2
SIGNAL_CHUNK_SIZE = 102_400  # the official writer's default chunking
_READ_ID_NAMESPACE = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")


# ---------------------------------------------------------------- vbz codec

def _zigzag_encode(values: np.ndarray) -> np.ndarray:
    v = values.astype(np.int32)
    return (((v << 1) ^ (v >> 15)) & 0xFFFF).astype(np.uint16)


def _zigzag_decode(values: np.ndarray) -> np.ndarray:
    z = values.astype(np.int32)
    return ((z >> 1) ^ -(z & 1)).astype(np.int16)


def svb16_encode(values: np.ndarray) -> bytes:
    """StreamVByte for 16-bit values: 1 control bit + 1-2 data bytes each."""
    values = np.ascontiguousarray(values, dtype=np.uint16)
    n = values.size
    if n == 0:
        return b""
    wide = values > 0xFF
    keys = np.packbits(wide.astype(np.uint8), bitorder="little")
    sizes = 1 + wide.astype(np.int64)
    ends = np.cumsum(sizes)
    starts = ends - sizes
    data = np.zeros(int(ends[-1]), np.uint8)
    data[starts] = (values & 0xFF).astype(np.uint8)
    data[starts[wide] + 1] = (values[wide] >> 8).astype(np.uint8)
    return keys.tobytes() + data.tobytes()


def svb16_decode(payload: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.zeros(0, np.uint16)
    key_len = (count + 7) // 8
    keys = np.unpackbits(
        np.frombuffer(payload[:key_len], np.uint8), bitorder="little"
    )[:count].astype(bool)
    data = np.frombuffer(payload[key_len:], np.uint8)
    sizes = 1 + keys.astype(np.int64)
    ends = np.cumsum(sizes)
    if data.size < int(ends[-1]):
        raise ValueError("svb16 stream truncated")
    starts = ends - sizes
    out = data[starts].astype(np.uint16)
    out[keys] |= data[starts[keys] + 1].astype(np.uint16) << 8
    return out


def vbz_compress(signal: np.ndarray) -> bytes:
    """int16 signal → delta → zig-zag → svb16 → zstd (vbz v1 semantics)."""
    import zstandard

    v = np.ascontiguousarray(signal, dtype=np.int16)
    delta = np.empty_like(v)
    delta[:1] = v[:1]
    # wrapping int16 difference, exactly invertible by the wrapping cumsum
    delta[1:] = (v[1:].astype(np.int32) - v[:-1].astype(np.int32)).astype(np.int16)
    return zstandard.ZstdCompressor(level=1).compress(
        svb16_encode(_zigzag_encode(delta))
    )


# One decompressor context per process (creating one per chunk showed up
# in the per-read decode profile); ZstdDecompressor is not thread-safe
# for concurrent decompress calls, but reader workers are processes.
_ZSTD_CTX = None


def vbz_decompress(payload: bytes, sample_count: int) -> np.ndarray:
    import zstandard

    global _ZSTD_CTX
    if _ZSTD_CTX is None:
        _ZSTD_CTX = zstandard.ZstdDecompressor()
    max_size = (sample_count + 7) // 8 + 2 * sample_count
    raw = _ZSTD_CTX.decompress(payload, max_output_size=max(max_size, 1))
    # Fast path: one fused C pass (svb16 + zigzag + prefix sum) — the
    # numpy chain below costs ~8 separate array passes and made pod5
    # decode 4x the fast5 reader's per-read cost (see
    # native/src/vbz_decode.cc).  numpy remains the always-available
    # oracle; parity is pinned in tests/test_native.py.
    from deepbinner_tpu.native import vbz as native_vbz

    if native_vbz.available():
        return native_vbz.unpack(raw, sample_count)
    delta = _zigzag_decode(svb16_decode(raw, sample_count))
    # int64 cumsum then int16 cast == wrapping int16 prefix sum
    return np.cumsum(delta.astype(np.int64)).astype(np.int16)


# ------------------------------------------------------------ footer codec

def _build_footer(file_identifier: str,
                  embedded: List[Tuple[int, int, int]]) -> bytes:
    """FlatBuffers footer: Footer{file_identifier, software, pod5_version,
    contents:[EmbeddedFile{offset,length,format,content_type}]}."""
    import flatbuffers

    builder = flatbuffers.Builder(256)
    fid = builder.CreateString(file_identifier)
    software = builder.CreateString("deepbinner_tpu")
    version = builder.CreateString("0.3.10")
    tables = []
    for offset, length, content_type in embedded:
        builder.StartObject(4)
        builder.PrependInt64Slot(0, offset, 0)
        builder.PrependInt64Slot(1, length, 0)
        builder.PrependInt16Slot(2, FORMAT_FEATHER_V2, 0)
        builder.PrependInt16Slot(3, content_type, 0)
        tables.append(builder.EndObject())
    builder.StartVector(4, len(tables), 4)
    for table in reversed(tables):
        builder.PrependUOffsetTRelative(table)
    contents = builder.EndVector()
    builder.StartObject(4)
    builder.PrependUOffsetTRelativeSlot(0, fid, 0)
    builder.PrependUOffsetTRelativeSlot(1, software, 0)
    builder.PrependUOffsetTRelativeSlot(2, version, 0)
    builder.PrependUOffsetTRelativeSlot(3, contents, 0)
    builder.Finish(builder.EndObject())
    return bytes(builder.Output())


class _FbTable:
    """Minimal generic FlatBuffers table accessor (slot = field index)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        from flatbuffers import table as fb_table

        self.t = fb_table.Table(buf, pos)

    def _offset(self, slot: int) -> int:
        return self.t.Offset(4 + 2 * slot)

    def int64(self, slot: int, default: int = 0) -> int:
        from flatbuffers import number_types as nt

        o = self._offset(slot)
        return self.t.Get(nt.Int64Flags, o + self.t.Pos) if o else default

    def int16(self, slot: int, default: int = 0) -> int:
        from flatbuffers import number_types as nt

        o = self._offset(slot)
        return self.t.Get(nt.Int16Flags, o + self.t.Pos) if o else default

    def string(self, slot: int) -> Optional[str]:
        o = self._offset(slot)
        return self.t.String(o + self.t.Pos).decode() if o else None

    def vector_len(self, slot: int) -> int:
        o = self._offset(slot)
        return self.t.VectorLen(o) if o else 0

    def table_in_vector(self, slot: int, index: int) -> "_FbTable":
        o = self._offset(slot)
        vec = self.t.Vector(o) + index * 4
        return _FbTable(self.t.Bytes, self.t.Indirect(vec))


def _parse_footer(buf: bytes) -> List[Tuple[int, int, int, int]]:
    """→ [(offset, length, format, content_type)] from footer flatbuffer."""
    (root,) = struct.unpack_from("<I", buf, 0)
    footer = _FbTable(buf, root)
    out = []
    for i in range(footer.vector_len(3)):
        entry = footer.table_in_vector(3, i)
        out.append((entry.int64(0), entry.int64(1),
                    entry.int16(2), entry.int16(3)))
    return out


# -------------------------------------------------------------- read/write

def _read_id_uuid(read_id: str) -> bytes:
    try:
        return uuid.UUID(read_id).bytes
    except ValueError:
        return uuid.uuid5(_READ_ID_NAMESPACE, read_id).bytes


def write_pod5(path: str | os.PathLike,
               reads: List[Tuple[str, np.ndarray]],
               chunk_size: int = SIGNAL_CHUNK_SIZE) -> None:
    """Write reads as a pod5 container (vbz-compressed, chunked signal)."""
    import pyarrow as pa

    signal_rows: List[Tuple[bytes, bytes, int]] = []  # (uuid, vbz, samples)
    read_rows: List[Tuple[bytes, List[int], str]] = []
    for number, (read_id, signal) in enumerate(reads):
        rid = _read_id_uuid(read_id)
        signal = np.ascontiguousarray(signal, dtype=np.int16)
        indices = []
        for start in range(0, max(signal.size, 1), chunk_size):
            chunk = signal[start : start + chunk_size]
            indices.append(len(signal_rows))
            signal_rows.append((rid, vbz_compress(chunk), chunk.size))
        read_rows.append((rid, indices, read_id))

    signal_table = pa.table({
        "read_id": pa.array([r[0] for r in signal_rows],
                            pa.binary(16)),
        "signal": pa.array([r[1] for r in signal_rows], pa.large_binary()),
        "samples": pa.array([r[2] for r in signal_rows], pa.uint32()),
    })
    reads_table = pa.table({
        "read_id": pa.array([r[0] for r in read_rows], pa.binary(16)),
        "signal": pa.array([r[1] for r in read_rows],
                           pa.list_(pa.uint64())),
        "read_number": pa.array(range(len(read_rows)), pa.uint32()),
        # Extension column: preserves non-UUID ids (absent in real pod5).
        "read_id_string": pa.array([r[2] for r in read_rows], pa.string()),
    })
    run_info_table = pa.table({
        "acquisition_id": pa.array(["deepbinner_tpu_fixture"], pa.string()),
    })

    file_identifier = str(uuid.uuid5(_READ_ID_NAMESPACE, os.fspath(path)))
    section_marker = uuid.uuid5(_READ_ID_NAMESPACE, file_identifier).bytes

    def feather_bytes(table) -> bytes:
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
        return sink.getvalue().to_pybytes()

    tmp = os.fspath(path) + ".tmp"
    embedded: List[Tuple[int, int, int]] = []
    with open(tmp, "wb") as handle:
        handle.write(SIGNATURE)
        handle.write(section_marker)
        for content_type, table in (
            (CONTENT_READS_TABLE, reads_table),
            (CONTENT_SIGNAL_TABLE, signal_table),
            (CONTENT_RUN_INFO_TABLE, run_info_table),
        ):
            payload = feather_bytes(table)
            embedded.append((handle.tell(), len(payload), content_type))
            handle.write(payload)
            handle.write(b"\0" * (-len(payload) % 8))  # 8-byte alignment
            handle.write(section_marker)
        footer = _build_footer(file_identifier, embedded)
        handle.write(footer)
        handle.write(struct.pack("<q", len(footer)))
        handle.write(section_marker)
        handle.write(SIGNATURE)
    os.replace(tmp, path)


def _decode_read_signal(
    payloads, samples, indices, head: int, tail: int
) -> np.ndarray:
    """Decode one read's signal from its vbz chunk rows, chunk-lazily.

    ``head``/``tail`` > 0 decode ONLY the chunks overlapping the first
    ``head`` / last ``tail`` samples and return their concatenation —
    exactly :func:`runner.mp_reader._trim_signal`'s slices of the full
    signal, at the cost of the covering chunks instead of the whole read.
    Possible because the writer compresses each SIGNAL_CHUNK_SIZE chunk
    independently (vbz delta coding restarts per chunk), so a chunk is the
    random-access unit; fast5 gets the same treatment via HDF5 hyperslabs
    (utils/fast5._slice_signal).  With the default 102,400-sample chunks a
    dual-model classify decodes ≤2 chunks per end of a long read instead
    of all of them.
    """
    counts = [int(samples[int(i)]) for i in indices]
    total = sum(counts)
    if head <= 0 or head + max(tail, 0) >= total:
        chunks = [vbz_decompress(payloads[int(i)], c)
                  for i, c in zip(indices, counts)]
        return np.concatenate(chunks) if chunks else np.zeros(0, np.int16)

    parts: List[np.ndarray] = []
    tail_lo = total - tail  # first sample index the tail slice needs
    offset = 0
    for i, count in zip(indices, counts):
        lo, hi = offset, offset + count
        offset = hi
        need_head = lo < head          # chunk overlaps [0, head)
        need_tail = tail > 0 and hi > tail_lo  # overlaps [total-tail, total)
        if not (need_head or need_tail):
            continue  # untouched chunk: never decompressed
        chunk = vbz_decompress(payloads[int(i)], count)
        if need_head:
            parts.append(chunk[: max(0, min(head - lo, count))])
        if need_tail:
            parts.append(chunk[max(0, tail_lo - lo):])
    return np.concatenate(parts) if parts else np.zeros(0, np.int16)


def read_pod5(path: str | os.PathLike, head: int = 0,
              tail: int = 0) -> List[Tuple[str, np.ndarray]]:
    """Read every read in a pod5 file → [(read_id, int16 signal)].

    ``head``/``tail`` > 0 decode only the vbz chunks covering each read's
    first-``head``/last-``tail`` samples (classify's access pattern — see
    :func:`_decode_read_signal`); 0 decodes everything (prep's).
    """
    import pyarrow as pa

    with open(path, "rb") as handle:
        buf = handle.read()
    if buf[:8] != SIGNATURE or buf[-8:] != SIGNATURE:
        raise OSError(f"{path}: not a pod5 file (bad signature)")
    (footer_len,) = struct.unpack_from("<q", buf, len(buf) - 32)
    footer = buf[len(buf) - 32 - footer_len : len(buf) - 32]
    tables = {}
    for offset, length, fmt, content_type in _parse_footer(footer):
        if fmt != FORMAT_FEATHER_V2:
            continue
        reader = pa.ipc.open_file(pa.BufferReader(buf[offset : offset + length]))
        tables[content_type] = reader.read_all()

    reads_table = tables.get(CONTENT_READS_TABLE)
    signal_table = tables.get(CONTENT_SIGNAL_TABLE)
    if reads_table is None or signal_table is None:
        raise OSError(f"{path}: pod5 footer lacks reads/signal tables")

    payloads = signal_table.column("signal").to_pylist()
    samples = signal_table.column("samples").to_pylist()
    id_strings = (
        reads_table.column("read_id_string").to_pylist()
        if "read_id_string" in reads_table.column_names else None
    )
    out: List[Tuple[str, np.ndarray]] = []
    uuid_col = reads_table.column("read_id").to_pylist()
    index_col = reads_table.column("signal").to_pylist()
    for row, indices in enumerate(index_col):
        signal = _decode_read_signal(payloads, samples, indices, head, tail)
        read_id = (id_strings[row] if id_strings is not None
                   else str(uuid.UUID(bytes=uuid_col[row])))
        out.append((read_id, signal))
    return out
