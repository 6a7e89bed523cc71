"""Classification-table (TSV) codec.

Reference parity: the TSV emitted by ``deepbinner/classify.py`` on stdout and
consumed by ``deepbinner/bin.py --classes`` (SURVEY.md §3.1/§3.3).  Format:

    read_ID<TAB>barcode_call[<TAB>score columns...]

``barcode_call`` is ``barcode01``..``barcode12`` or ``none``.  A leading
header line starting with ``read_ID`` is tolerated on parse (the reference
prints one when classifying).

The rebuild adds an *atomic shard writer* so multi-host classify can emit
per-shard tables that `bin` (or the merge step) can consume safely even if a
run is interrupted (SURVEY.md §5 checkpoint/resume row).
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Iterable, List, Sequence, Tuple

from deepbinner_tpu import NUM_CLASSES

NONE_CALL = "none"
HEADER_PREFIX = "read_ID"


def class_index_to_call(index: int) -> str:
    """0 → 'none', k → 'barcode%02d' % k."""
    if index == 0:
        return NONE_CALL
    if not 0 < index < NUM_CLASSES:
        raise ValueError(f"class index {index} out of range")
    return f"barcode{index:02d}"


def call_to_class_index(call: str) -> int:
    if call == NONE_CALL:
        return 0
    if call.startswith("barcode"):
        idx = int(call[len("barcode"):])
        if 0 < idx < NUM_CLASSES:
            return idx
    raise ValueError(f"unrecognised barcode call {call!r}")


def header_line(verbose: bool, dual: bool) -> str:
    cols = [HEADER_PREFIX, "barcode_call"]
    if verbose:
        if dual:
            cols += ["start_call", "end_call"]
        cols += [f"p{'_' if not dual else '_start_'}{k}" for k in range(NUM_CLASSES)]
        if dual:
            cols += [f"p_end_{k}" for k in range(NUM_CLASSES)]
    return "\t".join(cols)


def format_row(
    read_id: str,
    call: str,
    scores: Sequence[float] | None = None,
) -> str:
    parts = [read_id, call]
    if scores is not None:
        parts += [f"{s:.4f}" for s in scores]
    return "\t".join(parts)


def parse_classification_file(path: str | os.PathLike) -> Dict[str, str]:
    """Parse a classification TSV → {read_id: barcode_call}.

    Mirrors bin.py's tolerance: header line skipped, extra columns ignored.
    """
    calls: Dict[str, str] = {}
    with open(path) as handle:
        for line in handle:
            line = line.rstrip("\n")
            if not line:
                continue
            fields = line.split("\t")
            if fields[0] == HEADER_PREFIX:
                continue
            if len(fields) < 2:
                raise ValueError(f"bad classification line: {line!r}")
            calls[fields[0]] = fields[1]
    return calls


def write_rows_atomic(
    path: str | os.PathLike, rows: Iterable[str], header: str | None = None
) -> None:
    """Write lines to `path` atomically (tmp file + rename in same dir)."""
    path = os.fspath(path)
    directory = os.path.dirname(path) or "."
    fd, tmp = tempfile.mkstemp(dir=directory, prefix=".tmp_table_")
    try:
        with os.fdopen(fd, "w") as handle:
            if header is not None:
                handle.write(header + "\n")
            for row in rows:
                handle.write(row + "\n")
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def merge_shard_tables(shard_rows: Sequence[List[Tuple[str, str]]]) -> List[Tuple[str, str]]:
    """Deterministically merge per-shard (read_id, call) tables.

    Sorting by read_id gives a canonical order independent of shard count and
    arrival order — the invariant behind "multi-host output is byte-identical
    to single-host" (SURVEY.md §2 distributed-comm row).
    """
    merged: Dict[str, str] = {}
    for rows in shard_rows:
        for read_id, call in rows:
            previous = merged.get(read_id)
            if previous is not None and previous != call:
                raise ValueError(
                    f"conflicting calls for read {read_id}: {previous} vs {call}"
                )
            merged[read_id] = call
    return sorted(merged.items())
