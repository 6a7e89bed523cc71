"""Synthetic nanopore squiggle simulator.

The reference repo relies on externally-hosted real sequencing data for
training and evaluation (SURVEY.md §4) — none of which is available in this
build environment (the mount is empty, SURVEY.md §0).  This module generates
self-consistent synthetic data instead, providing:

- fast5 fixtures for unit/e2e tests,
- labelled training data for ``prep``/``balance``/``train``,
- ground-truth barcode assignments for the accuracy benchmark.

The physics is a deliberately simple pore model — k-mer → current level via
a seeded hash, geometric dwell times, Gaussian noise, an open-pore segment at
read start/end — enough to make barcode classification a real (non-trivial,
non-impossible) signal-processing task with the same shape as the real one.

Barcode/adapter sequences default to the REAL published ONT kit sequences
(:mod:`deepbinner_tpu.utils.kits` — round-2 VERDICT item 4), so simulated
reads, `prep` localisation, and the shipped models all agree with what a
real sequencing run contains.  ``synthetic=True`` restores the seeded
random stand-ins (kept for tests that need kit-independent sequences).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from deepbinner_tpu import KITS, NUM_BARCODES
from deepbinner_tpu.utils.fast5 import write_single_read_fast5

BASES = "ACGT"
KMER = 6

# Signal model constants (roughly MinION R9.4-shaped, in DAC units).
OPEN_PORE_LEVEL = 560.0
OPEN_PORE_NOISE = 6.0
SIGNAL_MEAN = 450.0
SIGNAL_SPREAD = 55.0
SIGNAL_NOISE = 14.0
MEAN_DWELL = 9.0  # samples per base


def _seeded_rng(*parts: str) -> np.random.Generator:
    digest = hashlib.sha256("|".join(parts).encode()).digest()
    return np.random.default_rng(np.frombuffer(digest[:16], dtype=np.uint64))


def random_dna(rng: np.random.Generator, length: int) -> str:
    return "".join(BASES[i] for i in rng.integers(0, 4, length))


def barcode_sequences(kit: str, synthetic: bool = False) -> List[str]:
    """Barcode sequences as they appear at a read start, barcode01..12.

    Default: the real published ONT kit sequences (utils.kits).  With
    ``synthetic=True``: deterministic seeded 24-mers (the pre-round-3
    stand-ins, kept for kit-independence tests)."""
    if kit not in KITS:
        raise ValueError(f"unknown kit {kit!r}; choose from {KITS}")
    if synthetic:
        return [
            random_dna(_seeded_rng("barcode", kit, str(i)), 24)
            for i in range(1, NUM_BARCODES + 1)
        ]
    from deepbinner_tpu.utils import kits

    return kits.barcode_start_forms(kit)


def adapter_sequence(kit: str, end: str, synthetic: bool = False) -> str:
    """Adapter preceding (start) / following (end) the read's genomic part."""
    if synthetic:
        return random_dna(_seeded_rng("adapter", kit, end), 40)
    from deepbinner_tpu.utils import kits

    if end == "start":
        return kits.leading_adapter(kit)
    return kits.reverse_complement(kits.LIGATION_ADAPTER_TOP)


def reverse_complement(seq: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[b] for b in reversed(seq))


_PORE_TABLE: Optional[np.ndarray] = None
_BASE_INDEX = {ord("A"): 0, ord("C"): 1, ord("G"): 2, ord("T"): 3}


def _pore_table() -> np.ndarray:
    """All 4^KMER current levels, built once (seeded, deterministic)."""
    global _PORE_TABLE
    if _PORE_TABLE is None:
        rng = _seeded_rng("pore-model-table")
        _PORE_TABLE = (
            SIGNAL_MEAN + SIGNAL_SPREAD * rng.standard_normal(4 ** KMER)
        ).astype(np.float32)
    return _PORE_TABLE


def _sequence_levels(seq: str) -> np.ndarray:
    """Vectorised k-mer → level lookup for a whole sequence."""
    codes = np.frombuffer(seq.encode(), np.uint8)
    lut = np.zeros(256, np.int64)
    for char, idx in _BASE_INDEX.items():
        lut[char] = idx
    digits = lut[codes]
    weights = 4 ** np.arange(KMER - 1, -1, -1)
    idx = np.lib.stride_tricks.sliding_window_view(digits, KMER) @ weights
    return _pore_table()[idx]


def sequence_to_squiggle(
    seq: str, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """DNA → (float signal, per-base dwell counts).

    Returns the raw (un-digitised) signal and the number of samples emitted
    for each base — the simulator's stand-in for the basecaller's move table,
    which ``prep`` uses to map base coordinates back to signal coordinates
    (SURVEY.md §3.4).
    """
    if len(seq) < KMER:
        return np.zeros(0, np.float32), np.zeros(len(seq), np.int32)
    levels = _sequence_levels(seq)
    n_levels = levels.size
    # Dwell: mean ≈ MEAN_DWELL samples/base with moderate variance.
    # (A geometric dwell is more realistic but warps time so heavily that
    # tiny CI-scale training sets can't learn; Poisson keeps the task honest
    # yet learnable at small scale.)
    dwells = np.zeros(len(seq), np.int32)
    dwells[:n_levels] = 4 + rng.poisson(MEAN_DWELL - 4.0, n_levels)
    total = int(dwells.sum())
    signal = np.repeat(levels, dwells[:n_levels]).astype(np.float32)
    signal += SIGNAL_NOISE * rng.standard_normal(total).astype(np.float32)
    return signal, dwells


@dataclasses.dataclass
class SimulatedRead:
    read_id: str
    barcode: int               # 0 = no barcode
    signal: np.ndarray         # int16 DAC
    sequence: str              # "basecalled" bases (no open-pore)
    dwells: np.ndarray         # per-base sample counts (move table stand-in)
    signal_start_of_bases: int  # first signal sample belonging to sequence


def simulate_read(
    kit: str,
    barcode: int,
    rng: np.random.Generator,
    genome_length: int = 2000,
    open_pore_length: Optional[int] = None,
    read_id: Optional[str] = None,
    synthetic: bool = False,
) -> SimulatedRead:
    """Simulate one read: [open pore] adapter+barcode+genomic(+barcode+adapter).

    EXP-NBD103 reads carry the barcode at both ends (start: barcode then
    genomic; end: genomic then reverse-complement barcode); SQK-RBK004 reads
    carry it at the start only — mirroring the kits' chemistry (SURVEY.md §1).
    barcode=0 simulates a barcode-less read (adapter straight into genomic).
    Real-sequence mode (default) includes the kits' flanking context around
    each barcode, exactly as basecalled reads do.
    """
    if not 0 <= barcode <= NUM_BARCODES:
        raise ValueError(f"barcode {barcode} out of range")
    parts = [adapter_sequence(kit, "start", synthetic=synthetic)]
    if barcode > 0:
        if synthetic:
            parts.append(barcode_sequences(kit, synthetic=True)[barcode - 1])
        else:
            from deepbinner_tpu.utils import kits

            parts.append(kits.flanked_start_region(kit, barcode))
            parts.append(kits.trailing_adapter(kit))
    parts.append(random_dna(rng, genome_length))
    if kit == "EXP-NBD103" and barcode > 0:
        if synthetic:
            parts.append(reverse_complement(
                barcode_sequences(kit, synthetic=True)[barcode - 1]))
        else:
            from deepbinner_tpu.utils import kits

            parts.append(kits.flanked_end_region(kit, barcode))
        parts.append(adapter_sequence(kit, "end", synthetic=synthetic))
    sequence = "".join(parts)

    squiggle, dwells = sequence_to_squiggle(sequence, rng)
    if open_pore_length is None:
        open_pore_length = int(rng.integers(100, 900))
    open_pore = OPEN_PORE_LEVEL + OPEN_PORE_NOISE * rng.standard_normal(open_pore_length)
    full = np.concatenate([open_pore, squiggle])
    signal = np.clip(np.round(full), -32000, 32000).astype(np.int16)

    if read_id is None:
        read_id = "read_" + _seeded_rng(kit, str(barcode), str(rng.integers(1 << 60))).bytes(8).hex()
    return SimulatedRead(
        read_id=read_id,
        barcode=barcode,
        signal=signal,
        sequence=sequence,
        dwells=dwells,
        signal_start_of_bases=open_pore_length,
    )


def phred_quals(rng: np.random.Generator, length: int) -> str:
    return "".join(chr(33 + int(q)) for q in rng.integers(10, 30, length))


def make_dataset(
    out_dir: str | os.PathLike,
    kit: str = "EXP-NBD103",
    reads_per_barcode: int = 4,
    none_reads: int = 4,
    genome_length: int = 2000,
    seed: int = 0,
    write_fastq: bool = True,
    synthetic: bool = False,
    container: str = "fast5",
    reads_per_container: int = 256,
) -> Dict[str, int]:
    """Write a labelled synthetic dataset.

    Layout under `out_dir`:
      fast5s/<read_id>.fast5   — single-read fast5 (+ dwell sidecar dataset)
      reads.fastq              — "basecalled" reads (when write_fastq)
      truth.tsv                — read_ID<TAB>barcode_call ground truth
      dataset.json             — generation parameters

    ``container``: 'fast5' (one read per file, classic MinKNOW),
    'multifast5' (modern multi-read files, ``reads_per_container`` each,
    move tables carried per read), or 'pod5' (vbz-compressed containers;
    no move tables — pod5 runs are `prep`-ed via --assignments instead).

    Returns {read_id: true_barcode}.
    """
    if container not in ("fast5", "multifast5", "pod5"):
        raise ValueError(f"unknown container {container!r}")
    out_dir = os.fspath(out_dir)
    fast5_dir = os.path.join(out_dir, "fast5s")
    os.makedirs(fast5_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    truth: Dict[str, int] = {}
    fastq_records = []
    pending = []  # (read_id, signal) for container formats
    moves = {}
    labels = [0] * none_reads + [
        b for b in range(1, NUM_BARCODES + 1) for _ in range(reads_per_barcode)
    ]
    for label in labels:
        read = simulate_read(kit, label, rng, genome_length=genome_length,
                             synthetic=synthetic)
        truth[read.read_id] = read.barcode
        if container == "fast5":
            path = os.path.join(fast5_dir, f"{read.read_id}.fast5")
            write_single_read_fast5(path, read.read_id, read.signal)
            _append_move_table(path, read)
        else:
            pending.append((read.read_id, read.signal))
            moves[read.read_id] = (read.signal_start_of_bases, read.dwells)
        if write_fastq:
            quals = phred_quals(rng, len(read.sequence))
            fastq_records.append(f"@{read.read_id}\n{read.sequence}\n+\n{quals}\n")

    if container != "fast5":
        from deepbinner_tpu.utils.fast5 import write_multi_read_fast5

        for k in range(0, len(pending), reads_per_container):
            chunk = pending[k : k + reads_per_container]
            if container == "multifast5":
                write_multi_read_fast5(
                    os.path.join(fast5_dir, f"batch_{k // reads_per_container:04d}.fast5"),
                    chunk, moves={r: moves[r] for r, _s in chunk},
                )
            else:
                from deepbinner_tpu.utils.pod5 import write_pod5

                write_pod5(
                    os.path.join(fast5_dir, f"batch_{k // reads_per_container:04d}.pod5"),
                    chunk,
                )

    if write_fastq:
        with open(os.path.join(out_dir, "reads.fastq"), "w") as handle:
            handle.writelines(fastq_records)
    with open(os.path.join(out_dir, "truth.tsv"), "w") as handle:
        for read_id, barcode in sorted(truth.items()):
            call = "none" if barcode == 0 else f"barcode{barcode:02d}"
            handle.write(f"{read_id}\t{call}\n")
    with open(os.path.join(out_dir, "dataset.json"), "w") as handle:
        json.dump(
            {"kit": kit, "reads_per_barcode": reads_per_barcode,
             "none_reads": none_reads, "seed": seed,
             "genome_length": genome_length,
             "container": container,
             "barcodes": "synthetic" if synthetic else "real-kit"},
            handle, indent=2,
        )
    return truth


def _append_move_table(path: str, read: SimulatedRead) -> None:
    """Store the dwell table + metadata the way a basecaller summary would.

    ``prep`` uses this to map basecalled coordinates → raw-signal coordinates
    (the rebuild's analog of the albacore event table, SURVEY.md §3.4).
    """
    import h5py

    with h5py.File(path, "a") as handle:
        group = handle.create_group("Analyses/Segmentation_000/Summary")
        group.attrs["first_sample_template"] = read.signal_start_of_bases
        handle.create_dataset(
            "Analyses/Basecall_1D_000/BaseCalled_template/Move",
            data=read.dwells.astype(np.int32),
        )
