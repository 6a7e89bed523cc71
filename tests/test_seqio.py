"""Unit tests for fastq/fasta iteration and the call-table codec."""

import gzip

import pytest

from deepbinner_tpu.utils import seqio, table


FASTQ = "@read1 extra info\nACGT\n+\nIIII\n@read2\nGGCC\n+\n!!!!\n"
FASTA = ">read1 extra\nACGT\nACGT\n>read2\nGG\n"


def test_fastq_roundtrip(tmp_path):
    path = tmp_path / "reads.fastq"
    path.write_text(FASTQ)
    records = list(seqio.iterate_reads(path))
    assert [r[0] for r in records] == ["read1", "read2"]
    assert records[0][2] == "ACGT"
    assert records[0][3] == "IIII"
    assert seqio.format_record(records[1], "fastq") == "@read2\nGGCC\n+\n!!!!\n"


def test_fastq_gzip(tmp_path):
    path = tmp_path / "reads.fastq.weirdext"
    with gzip.open(path, "wt") as handle:
        handle.write(FASTQ)
    assert seqio.detect_read_format(path) == "fastq"
    assert len(list(seqio.iterate_reads(path))) == 2


def test_fasta_multiline(tmp_path):
    path = tmp_path / "reads.fasta"
    path.write_text(FASTA)
    records = list(seqio.iterate_reads(path))
    assert records[0][2] == "ACGTACGT"  # multi-line concatenated
    assert records[0][3] is None
    assert records[1][0] == "read2"


def test_bad_format(tmp_path):
    path = tmp_path / "bad.txt"
    path.write_text("not a reads file\n")
    with pytest.raises(ValueError):
        seqio.detect_read_format(path)


def test_call_codec():
    assert table.class_index_to_call(0) == "none"
    assert table.class_index_to_call(7) == "barcode07"
    assert table.call_to_class_index("barcode12") == 12
    assert table.call_to_class_index("none") == 0
    with pytest.raises(ValueError):
        table.class_index_to_call(13)
    with pytest.raises(ValueError):
        table.call_to_class_index("barcode99")


def test_classification_table_roundtrip(tmp_path):
    path = tmp_path / "calls.tsv"
    rows = [
        table.format_row("read1", "barcode03"),
        table.format_row("read2", "none", scores=[0.1, 0.9]),
    ]
    table.write_rows_atomic(path, rows, header=table.header_line(False, False))
    calls = table.parse_classification_file(path)
    assert calls == {"read1": "barcode03", "read2": "none"}


def test_merge_shards_deterministic():
    a = [("r2", "barcode01"), ("r1", "none")]
    b = [("r3", "barcode02")]
    merged = table.merge_shard_tables([a, b])
    assert merged == [("r1", "none"), ("r2", "barcode01"), ("r3", "barcode02")]
    # conflicting duplicate calls are an error
    with pytest.raises(ValueError):
        table.merge_shard_tables([[("r1", "barcode01")], [("r1", "barcode02")]])


def test_crlf_files_parse_clean(tmp_path):
    """Windows line endings must not leak '\r' into sequences/qualities."""
    from deepbinner_tpu.utils import seqio

    fq = tmp_path / "crlf.fastq"
    fq.write_bytes(b"@read1 extra\r\nACGT\r\n+\r\n!!!!\r\n")
    ((name, header, seq, quals),) = list(seqio.iterate_fastq(fq))
    assert (name, seq, quals) == ("read1", "ACGT", "!!!!")
    fa = tmp_path / "crlf.fasta"
    fa.write_bytes(b">read2\r\nACGT\r\nTTAA\r\n")
    ((name2, _h, seq2, _q),) = list(seqio.iterate_fasta(fa))
    assert (name2, seq2) == ("read2", "ACGTTTAA")


def test_whitespace_only_header_does_not_crash(tmp_path):
    from deepbinner_tpu.utils import seqio

    fq = tmp_path / "ws.fastq"
    fq.write_bytes(b"@ \nAC\n+\n!!\n")
    ((name, _h, seq, _q),) = list(seqio.iterate_fastq(fq))
    assert name == "" and seq == "AC"
