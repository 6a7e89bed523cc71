"""Real ONT kit barcode/adapter sequences (EXP-NBD103, SQK-RBK004).

Reference parity: ``deepbinner/prep.py :: barcode/adapter sequence
constants`` (SURVEY.md §2 item 5) — the reference embeds the actual kit
sequences so `prep` can localise barcodes in basecalled reads.  These are
**public kit documentation** (the same sequences ship in Porechop's adapter
tables and ONT's barcoding docs), written here from knowledge of that public
documentation.

PARITY-REVERIFY: the mount was empty when this module was written
(SURVEY.md §0).  The moment /root/reference/ is populated, diff every
sequence below against the reference's constants — a single-base drift
would silently degrade prep's localisation on real runs.

Orientation conventions (all sequences 5'→3' as basecalled):

- ``BARCODES[i]`` is the canonical ONT barcode sequence BC%02d — the form
  that appears at the START of a rapid-kit (SQK-RBK004) read.
- Native-barcoding (EXP-NBD103) reads carry the REVERSE COMPLEMENT of the
  canonical barcode near the read start, flanked by the NB ligation
  context, and the canonical barcode itself near the read end:
      start:  ...adapter AAGGTTAA <revcomp(BC)> CAGCACCT genomic...
      end:    ...genomic AGGTGCTG <BC> TTAACCTT adapter...
"""

from __future__ import annotations

from typing import Dict, List

from deepbinner_tpu import KITS, NUM_BARCODES

COMPLEMENT = {"A": "T", "C": "G", "G": "C", "T": "A"}


def reverse_complement(seq: str) -> str:
    return "".join(COMPLEMENT[b] for b in reversed(seq))


# Canonical ONT barcode sequences BC01-BC12 (24-mers).  PARITY-REVERIFY
# against reference deepbinner/prep.py when the mount appears.
BARCODES: Dict[int, str] = {
    1: "AAGAAAGTTGTCGGTGTCTTTGTG",
    2: "TCGATTCCGTTTGTAGTCGTCTGT",
    3: "GAGTCTTGTGTCCCAGTTACCAGG",
    4: "TTCGGATTCTATCGTGTTTCCCTA",
    5: "CTTGTCCAGGGTTTGTGTAACCTT",
    6: "TTCTCGCAAAGGCAGAAAGTAGTC",
    7: "GTGTTACCGTGGGAATGAATCCTT",
    8: "TTCAGGGAACAAACCAAGTTACGT",
    9: "AACTAGGCACAGCGAGTCTTGGTT",
    10: "AAGCGTTGAAACCTTTGTCCTCTC",
    11: "GTTTCATCTATCGGAGGGAATGGA",
    12: "CAGGTAGAAAGAAGCAGAATCGGA",
}

# Native-barcoding flanking context (EXP-NBD103).  PARITY-REVERIFY.
NATIVE_START_FLANK_LEFT = "AAGGTTAA"
NATIVE_START_FLANK_RIGHT = "CAGCACCT"
NATIVE_END_FLANK_LEFT = "AGGTGCTG"
NATIVE_END_FLANK_RIGHT = "TTAACCTT"

# Ligation-kit Y-adapter (top/bottom strands) and the rapid-kit adapter
# that follows the barcode in SQK-RBK004 reads.  PARITY-REVERIFY.
LIGATION_ADAPTER_TOP = "AATGTACTTCGTTCAGTTACGTATTGCT"
LIGATION_ADAPTER_BOTTOM = "GCAATACGTAACTGAACGAAGT"
RAPID_ADAPTER = "GTTTTCGCATTTATCGTGAAACGCTTTCGCGTTTTTCGTGCGCCGCTTCA"


def _check_kit(kit: str) -> None:
    if kit not in KITS:
        raise ValueError(f"unknown kit {kit!r}; choose from {KITS}")


def barcode_start_forms(kit: str) -> List[str]:
    """Barcode sequences as they appear at the START of a read, in order
    barcode01..barcode12.  This is the orientation `prep` probes for with
    ``--end start`` (and reverse-complements for ``--end end``)."""
    _check_kit(kit)
    if kit == "EXP-NBD103":
        return [reverse_complement(BARCODES[i])
                for i in range(1, NUM_BARCODES + 1)]
    return [BARCODES[i] for i in range(1, NUM_BARCODES + 1)]


def flanked_start_region(kit: str, barcode: int) -> str:
    """The full barcode region at a read start (flanks included)."""
    _check_kit(kit)
    form = barcode_start_forms(kit)[barcode - 1]
    if kit == "EXP-NBD103":
        return NATIVE_START_FLANK_LEFT + form + NATIVE_START_FLANK_RIGHT
    return form  # rapid: the barcode leads straight into the rapid adapter


def flanked_end_region(kit: str, barcode: int) -> str:
    """The full barcode region at a read end (EXP-NBD103 only)."""
    if kit != "EXP-NBD103":
        raise ValueError("only EXP-NBD103 reads carry an end barcode")
    return (NATIVE_END_FLANK_LEFT + BARCODES[barcode]
            + NATIVE_END_FLANK_RIGHT)


def leading_adapter(kit: str) -> str:
    """Adapter sequence preceding the barcode region at a read start."""
    _check_kit(kit)
    return LIGATION_ADAPTER_TOP  # both kits basecall a short leader first


def trailing_adapter(kit: str) -> str:
    """Sequence following the start-barcode region (rapid kit only; native
    reads run straight into genomic sequence after the flank)."""
    _check_kit(kit)
    return RAPID_ADAPTER if kit == "SQK-RBK004" else ""
